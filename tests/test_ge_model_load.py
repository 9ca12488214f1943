"""KGEModel.load fallback: trainer-style prefixed checkpoints load directly."""

import numpy as np
import pytest

from dglke_tpu.models import TransE_l2Model


def test_load_prefixed_trainer_checkpoint(tmp_path):
    ent = np.random.default_rng(0).normal(size=(10, 8)).astype(np.float32)
    rel = np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32)
    np.save(tmp_path / "fakekg_TransE_l2_entity.npy", ent)
    np.save(tmp_path / "fakekg_TransE_l2_relation.npy", rel)
    # optimizer-state files must not confuse the glob
    np.save(tmp_path / "fakekg_TransE_l2_entity_state.npy",
            np.zeros(10, np.float32))
    np.save(tmp_path / "fakekg_TransE_l2_relation_state.npy",
            np.zeros(3, np.float32))
    m = TransE_l2Model(gamma=5.0)
    m.load(str(tmp_path))
    np.testing.assert_array_equal(m.entity_embed, ent)
    np.testing.assert_array_equal(m.relation_embed, rel)


def test_load_ambiguous_prefixed_checkpoint_raises(tmp_path):
    for prefix in ("a_TransE_l2", "b_TransE_l2"):
        np.save(tmp_path / f"{prefix}_entity.npy",
                np.zeros((4, 8), np.float32))
        np.save(tmp_path / f"{prefix}_relation.npy",
                np.zeros((2, 8), np.float32))
    m = TransE_l2Model(gamma=5.0)
    with pytest.raises(FileNotFoundError, match="ambiguous"):
        m.load(str(tmp_path))
