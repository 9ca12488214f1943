"""Sharded (orbax) checkpointing: save/restore of a vocab-sharded
TrainState on an 8-device mesh without ever replicating the table, and
CLI resume from a sharded checkpoint."""

import os

import numpy as np
import pytest

import jax

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.trainer import train
from dglke_tpu.utils.io import has_sharded, load_sharded, save_sharded


def _cfg(**kw):
    base = dict(model_name="TransE_l2", hidden_dim=16, gamma=6.0, lr=0.25,
                batch_size=128, neg_sample_size=32, max_step=60,
                log_interval=30, dataset="synthetic", seed=5)
    base.update(kw)
    return KGEConfig(**base)


def test_sharded_roundtrip_vocab_mesh(tmp_path):
    ds = synthetic_dataset(n_entities=201, n_relations=5, n_train=2000,
                           seed=3)
    cfg = _cfg()
    plan = ShardingPlan(make_mesh(len(jax.devices())),
                        table_sharding="vocab")
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    model, state, _ = train(cfg, ds, model=model, plan=plan,
                            log=lambda *a: None)
    save_sharded(state, str(tmp_path))
    assert has_sharded(str(tmp_path))

    template = plan.put_state(model.init_state(jax.random.PRNGKey(cfg.seed)))
    restored = load_sharded(template, str(tmp_path))
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # restored arrays keep the vocab sharding layout
    assert restored.entity.emb.sharding == state.entity.emb.sharding
    assert int(restored.step) == cfg.max_step


def test_cli_sharded_save_and_resume(tmp_path):
    from dglke_tpu.cli.train import main as train_main
    d = str(tmp_path / "data")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    with open(os.path.join(d, "train.txt"), "w") as f:
        for _ in range(600):
            f.write(f"e{rng.randint(40)}\tr{rng.randint(4)}"
                    f"\te{rng.randint(40)}\n")
    save_root = str(tmp_path / "ckpts")
    common = ["--model_name", "TransE_l2", "--dataset", "skg",
              "--data_path", d, "--format", "raw_udd_hrt",
              "--data_files", "train.txt",
              "--batch_size", "64", "--neg_sample_size", "16",
              "--hidden_dim", "16", "--gamma", "5.0", "--lr", "0.3",
              "--log_interval", "50", "--save_path", save_root]
    rc = train_main(common + ["--max_step", "100", "--sharded_ckpt"])
    assert rc == 0
    ckpt = os.path.join(save_root, "TransE_l2_skg_0")
    assert has_sharded(ckpt)
    assert os.path.exists(os.path.join(ckpt, "config.json"))
    # resume from the sharded checkpoint (auto-detected)
    rc = train_main(common + ["--max_step", "50", "--init_from", ckpt])
    assert rc == 0


def test_cli_periodic_save_interval(tmp_path):
    from dglke_tpu.cli.train import main as train_main
    d = str(tmp_path / "data")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    with open(os.path.join(d, "train.txt"), "w") as f:
        for _ in range(600):
            f.write(f"e{rng.randint(40)}\tr{rng.randint(4)}"
                    f"\te{rng.randint(40)}\n")
    save_root = str(tmp_path / "ckpts")
    rc = train_main(["--model_name", "TransE_l2", "--dataset", "pkg",
                     "--data_path", d, "--format", "raw_udd_hrt",
                     "--data_files", "train.txt",
                     "--batch_size", "64", "--neg_sample_size", "16",
                     "--hidden_dim", "16", "--gamma", "5.0", "--lr", "0.3",
                     "--log_interval", "50", "--max_step", "100",
                     "--save_interval", "50", "--save_path", save_root])
    assert rc == 0
    ckpt = os.path.join(save_root, "TransE_l2_pkg_0")
    # periodic save leaves a loadable mid-run checkpoint (overwritten at end)
    assert os.path.exists(os.path.join(ckpt, "pkg_TransE_l2_step.npy"))
    assert int(np.load(os.path.join(ckpt, "pkg_TransE_l2_step.npy"))) == 100


def test_cli_eval_loads_sharded(tmp_path, capsys):
    """dglke_tpu-eval restores sharded checkpoints DETERMINISTICALLY from
    the layout metadata recorded at save time (ckpt_table_sharding /
    ckpt_mesh_size in config.json) — every save-layout x eval-layout
    combination, including the mesh-PADDED entity rows of a vocab-sharded
    save (43 entities on an 8-device mesh pad to 48), and all four
    combinations agree on the metrics."""
    import json
    import re

    from dglke_tpu.cli.train import main as train_main
    from dglke_tpu.cli.eval import main as eval_main
    d = str(tmp_path / "data")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    for name, n in (("train.txt", 600), ("valid.txt", 60), ("test.txt", 60)):
        with open(os.path.join(d, name), "w") as f:
            for _ in range(n):
                # 43 entities: NOT a multiple of the 8-device mesh, so the
                # vocab-sharded save stores padded (48-row) tables
                f.write(f"e{rng.randint(43)}\tr{rng.randint(4)}"
                        f"\te{rng.randint(43)}\n")
    n_dev = len(jax.devices())
    mrrs = {}
    for sharding in ("replicated", "vocab"):
        save_root = str(tmp_path / f"ckpts_{sharding}")
        common = ["--model_name", "TransE_l2", "--dataset", "skg",
                  "--data_path", d, "--format", "raw_udd_hrt",
                  "--data_files", "train.txt", "valid.txt", "test.txt",
                  "--batch_size", "64", "--neg_sample_size", "16",
                  "--hidden_dim", "16", "--gamma", "5.0", "--lr", "0.3",
                  "--log_interval", "50"]
        rc = train_main(common + ["--max_step", "100", "--sharded_ckpt",
                                  "--table_sharding", sharding,
                                  "--save_path", save_root])
        assert rc == 0
        ckpt = os.path.join(save_root, "TransE_l2_skg_0")
        with open(os.path.join(ckpt, "config.json")) as f:
            meta = json.load(f)
        assert meta["ckpt_table_sharding"] == (
            sharding if n_dev > 1 else "replicated")
        assert meta["ckpt_mesh_size"] == (n_dev if n_dev > 1 else 1)
        for eval_sharding in ("replicated", "vocab"):
            capsys.readouterr()
            rc = eval_main(common + ["--model_path", ckpt,
                                     "--batch_size_eval", "8",
                                     "--table_sharding", eval_sharding])
            assert rc == 0
            out = capsys.readouterr().out
            m = re.search(r"Test average MRR: (\d+\.\d+)", out)
            assert m, out
            mrrs[(sharding, eval_sharding)] = float(m.group(1))
    assert all(0.0 < v <= 1.0 for v in mrrs.values()), mrrs
    # the same trained tables must rank identically however they are laid
    # out at eval time (the two SAVES are different training runs —
    # replicated vs vocab-sharded training may differ by reduction order —
    # so only same-checkpoint pairs are compared)
    for s in ("replicated", "vocab"):
        assert abs(mrrs[(s, "replicated")]
                   - mrrs[(s, "vocab")]) < 1e-6, mrrs
