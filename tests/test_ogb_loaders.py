"""Gated-import loader coverage: ogb (wikikg2/biokg) and wikikg90M.

The real `ogb` package is not installed here, so `_load_ogb` /
`_load_wiki90m` (data/dataset.py) would otherwise be dead code paths in
CI.  These tests install tiny fake `ogb.linkproppred` / `ogb.lsc`
modules into sys.modules and drive the loaders — and the wikikg90M
candidate-dict protocol end to end through the train CLI (--valid
--test), matching the reference's KGDatasetWiki90M / WikiEvalSampler
flow (KGDataset.py:405-503, sampler.py:599-648,
train_pytorch.py:208-234).
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

N_ENT, N_REL = 60, 4
N_CAND = 8


def _fake_split(rng, n):
    return {"head": rng.randint(0, N_ENT, n),
            "relation": rng.randint(0, N_REL, n),
            "tail": rng.randint(0, N_ENT, n)}


def _install_fake_ogb(monkeypatch, reltype_shape="2d"):
    """Register fake ogb / ogb.linkproppred / ogb.lsc modules."""
    rng = np.random.RandomState(0)

    class FakeLinkPropPredDataset:
        def __init__(self, name, root):
            assert name.startswith("ogbl-"), name
            self.name = name
            self.root = root

        def get_edge_split(self):
            return {"train": _fake_split(rng, 200),
                    "valid": _fake_split(rng, 40),
                    "test": _fake_split(rng, 40)}

        def __getitem__(self, i):
            assert i == 0
            rel = np.arange(200) % N_REL
            if reltype_shape == "2d":
                rel = rel[:, None]  # ogb's native [E, 1] layout
            return {"num_nodes": N_ENT, "edge_reltype": rel}

    class FakeWikiKG90MDataset:
        def __init__(self, root):
            self.root = root
            r = np.random.RandomState(1)
            hrt = np.stack([r.randint(0, N_ENT, 400),
                            r.randint(0, N_REL, 400),
                            r.randint(0, N_ENT, 400)], axis=1)
            self.train_hrt = hrt
            self.num_entities = N_ENT
            self.num_relations = N_REL

            def qdict(n, with_ans):
                hr = np.stack([r.randint(0, N_ENT, n),
                               r.randint(0, N_REL, n)], axis=1)
                cand = r.randint(0, N_ENT, (n, N_CAND))
                d = {"hr": hr, "t_candidate": cand}
                if with_ans:
                    d["t_correct_index"] = r.randint(0, N_CAND, n)
                return {"h,r->t": d}

            self.valid_dict = qdict(20, with_ans=True)
            # test split ships no answers (reference writes top-10 pkl)
            self.test_dict = qdict(20, with_ans=False)

    ogb = types.ModuleType("ogb")
    linkproppred = types.ModuleType("ogb.linkproppred")
    linkproppred.LinkPropPredDataset = FakeLinkPropPredDataset
    lsc = types.ModuleType("ogb.lsc")
    lsc.WikiKG90MDataset = FakeWikiKG90MDataset
    ogb.linkproppred = linkproppred
    ogb.lsc = lsc
    monkeypatch.setitem(sys.modules, "ogb", ogb)
    monkeypatch.setitem(sys.modules, "ogb.linkproppred", linkproppred)
    monkeypatch.setitem(sys.modules, "ogb.lsc", lsc)


@pytest.mark.parametrize("reltype_shape", ["2d", "1d"])
def test_load_ogb(monkeypatch, tmp_path, reltype_shape):
    """_load_ogb handles both the [E,1] edge_reltype ogb ships and a 1-D
    variant (the reference's max(...)[0] idiom breaks on 1-D)."""
    _install_fake_ogb(monkeypatch, reltype_shape)
    from dglke_tpu.data.dataset import get_dataset
    ds = get_dataset(str(tmp_path), "wikikg2", "built_in")
    assert ds.n_entities == N_ENT
    assert ds.n_relations == N_REL
    assert len(ds.train[0]) == 200
    assert len(ds.valid[0]) == 40 and len(ds.test[0]) == 40
    for arr in (*ds.train, *ds.valid, *ds.test):
        assert arr.dtype == np.int64


def test_load_ogb_without_package_raises(tmp_path):
    from dglke_tpu.data.dataset import get_dataset
    with pytest.raises(ImportError, match="ogb"):
        get_dataset(str(tmp_path), "biokg", "built_in")


def test_load_wiki90m(monkeypatch, tmp_path):
    _install_fake_ogb(monkeypatch)
    from dglke_tpu.data.dataset import get_dataset
    ds = get_dataset(str(tmp_path), "wikikg90M", "built_in")
    assert ds.n_entities == N_ENT and ds.n_relations == N_REL
    assert len(ds.train[0]) == 400
    d = ds.valid_dict["h,r->t"]
    assert d["hr"].shape == (20, 2)
    assert d["t_candidate"].shape == (20, N_CAND)
    assert "t_correct_index" in d
    assert "t_correct_index" not in ds.test_dict["h,r->t"]


def test_wiki90m_cli_train_valid_test(monkeypatch, tmp_path):
    """The full wikikg90M protocol from the CLI: candidate-list valid
    metrics during training, top-10 test_{rank}.pkl at the end
    (reference train_pytorch.py:208-234)."""
    _install_fake_ogb(monkeypatch)
    from dglke_tpu.cli.train import main as train_main
    save_root = str(tmp_path / "ckpts")
    rc = train_main([
        "--model_name", "TransE_l2", "--dataset", "wikikg90M",
        "--data_path", str(tmp_path), "--format", "built_in",
        "--batch_size", "32", "--neg_sample_size", "8",
        "--hidden_dim", "16", "--gamma", "5.0", "--lr", "0.2",
        "--max_step", "40", "--log_interval", "20",
        "--valid", "--eval_interval", "20",
        "--test", "--batch_size_eval", "5",
        "--save_path", save_root,
    ])
    assert rc == 0
    ckpt = os.path.join(save_root, "TransE_l2_wikikg90M_0")
    pkl = os.path.join(ckpt, "test_0.pkl")
    assert os.path.exists(pkl), os.listdir(ckpt)
    with open(pkl, "rb") as f:
        out = pickle.load(f)
    top10 = out["h,r->t"]["t_pred_top10"]
    assert top10.shape == (20, min(10, N_CAND))
    assert (top10 >= 0).all() and (top10 < N_CAND).all()

    # standalone eval CLI on the same candidate-list dataset: it must
    # route to evaluate_candidates (it used to call evaluate() on the
    # None "test" split and die in EvalSampler), writing the reference's
    # top-10 pkl since the test split ships no answers
    from dglke_tpu.cli.eval import main as eval_main
    os.remove(pkl)
    rc = eval_main([
        "--dataset", "wikikg90M", "--data_path", str(tmp_path),
        "--format", "built_in", "--model_path", ckpt,
        "--batch_size_eval", "5",
    ])
    assert rc == 0
    assert os.path.exists(pkl), os.listdir(ckpt)
    with open(pkl, "rb") as f:
        out = pickle.load(f)
    assert out["h,r->t"]["t_pred_top10"].shape == (20, min(10, N_CAND))
