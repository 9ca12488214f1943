"""Tests for the topK inference engines (ScoreInfer / EmbSimInfer) through
the checkpoint path, mirroring the reference's test_topk.py strategy:
write a real checkpoint (config.json + .npy), reload it, and compare topK
results against explicit numpy loops."""

import os

import numpy as np
import pytest

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.infer import EmbSimInfer, ScoreInfer, SIM_FUNCS
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.utils.io import save_model

N_ENT, N_REL, DIM = 30, 6, 8


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import jax
    path = str(tmp_path_factory.mktemp("ckpt"))
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=DIM, gamma=3.0,
                    dataset="toy", save_path=path)
    model = KEModel(cfg, N_ENT, N_REL)
    state = model.init_state(jax.random.PRNGKey(0))
    save_model(cfg, model, state)
    return cfg, path, np.asarray(state.entity.emb), \
        np.asarray(state.relation.emb)


def naive_scores(ent, rel, h, r, t, gamma):
    out = np.zeros((len(h), len(r), len(t)), np.float32)
    for i, hh in enumerate(h):
        for j, rr in enumerate(r):
            for k, tt in enumerate(t):
                d = np.linalg.norm(ent[hh] + rel[rr] - ent[tt])
                out[i, j, k] = gamma - d
    return out


def test_score_infer_all(ckpt):
    cfg, path, ent, rel = ckpt
    si = ScoreInfer(-1, cfg, path, "none")
    si.load_model()
    h, r, t = [1, 2, 3], [0, 1], [4, 5, 6, 7]
    res = si.topK(h, r, t, exec_mode="all", k=5)
    naive = naive_scores(ent, rel, h, r, t, gamma=0.0)  # none => gamma 0
    flat = naive.reshape(-1)
    order = np.argsort(-flat)[:5]
    (rh, rr, rt, rs) = res[0]
    np.testing.assert_allclose(rs, flat[order], rtol=1e-4, atol=1e-5)
    want_t = order % len(t)
    want_r = (order // len(t)) % len(r)
    want_h = order // (len(t) * len(r))
    np.testing.assert_array_equal(rh, np.asarray(h)[want_h])
    np.testing.assert_array_equal(rr, np.asarray(r)[want_r])
    np.testing.assert_array_equal(rt, np.asarray(t)[want_t])


def test_score_infer_triplet_wise(ckpt):
    cfg, path, ent, rel = ckpt
    si = ScoreInfer(-1, cfg, path, "logsigmoid")
    si.load_model()
    h, r, t = [1, 2, 3, 4], [0, 1, 2, 3], [5, 6, 7, 8]
    res = si.topK(h, r, t, exec_mode="triplet_wise", k=3)
    raw = np.array([cfg.gamma - np.linalg.norm(ent[h[i]] + rel[r[i]]
                                               - ent[t[i]])
                    for i in range(4)])
    score = np.log(1.0 / (1.0 + np.exp(-raw)))
    order = np.argsort(-score)[:3]
    np.testing.assert_allclose(res[0][3], score[order], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["batch_head", "batch_rel", "batch_tail"])
def test_score_infer_batch_modes(ckpt, mode):
    cfg, path, ent, rel = ckpt
    si = ScoreInfer(-1, cfg, path, "none")
    si.load_model()
    h, r, t = [1, 2], [0, 1, 2], [4, 5]
    res = si.topK(h, r, t, exec_mode=mode, k=3)
    naive = naive_scores(ent, rel, h, r, t, gamma=0.0)
    n_expected = {"batch_head": len(h), "batch_rel": len(r),
                  "batch_tail": len(t)}[mode]
    assert len(res) == n_expected
    for i, (rh, rr, rt, rs) in enumerate(res):
        if mode == "batch_head":
            sub = naive[i].reshape(-1)
        elif mode == "batch_rel":
            sub = naive[:, i, :].reshape(-1)
        else:
            sub = naive[:, :, i].reshape(-1)
        np.testing.assert_allclose(rs, np.sort(sub)[::-1][:3], rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("sfunc", list(SIM_FUNCS))
def test_emb_sim(ckpt, sfunc):
    cfg, path, ent, rel = ckpt
    emb_file = os.path.join(path, f"toy_TransE_l2_entity.npy")
    es = EmbSimInfer(-1, emb_file, sfunc, batch_size=7)
    es.load_emb()
    left, right = [0, 1, 2], [3, 4, 5, 6]
    res = es.topK(left, right, k=4)

    def naive_sim(x, y):
        if sfunc == "l2":
            return -np.linalg.norm(x - y)
        if sfunc == "l1":
            return -np.abs(x - y).sum()
        d = float(x @ y)
        if sfunc == "dot":
            return d
        if sfunc == "cosine":
            return d / (np.linalg.norm(x) * np.linalg.norm(y))
        return d / (x @ x + y @ y - d)

    naive = np.array([[naive_sim(ent[l], ent[rr]) for rr in right]
                      for l in left]).reshape(-1)
    order = np.argsort(-naive)[:4]
    np.testing.assert_allclose(res[0][2], naive[order], rtol=1e-4, atol=1e-5)


def test_emb_sim_pairwise_and_bcast(ckpt):
    cfg, path, ent, _ = ckpt
    emb_file = os.path.join(path, "toy_TransE_l2_entity.npy")
    es = EmbSimInfer(-1, emb_file, "cosine")
    es.load_emb()
    left, right = [0, 1, 2, 3], [4, 5, 6, 7]
    res = es.topK(left, right, pair_ws=True, k=2)
    assert len(res[0][0]) == 2
    res_b = es.topK(left, right, bcast=True, k=2)
    assert len(res_b) == len(left)
    for i, (hl, tl, sl) in enumerate(res_b):
        assert (hl == left[i]).all()


def test_score_infer_reference_layout_transr(tmp_path):
    """A TransR checkpoint in the REFERENCE's file layout (projection file
    spelled without the separating underscore, score_fun.py:179-180) loads
    and scores."""
    rng = np.random.RandomState(0)
    d = str(tmp_path)
    ent = rng.randn(20, 4).astype(np.float32)
    rel = rng.randn(3, 4).astype(np.float32)
    proj = rng.randn(3, 16).astype(np.float32)  # [nr, De*Dr] = [3, 4*4]
    np.save(os.path.join(d, "kg_TransR_entity.npy"), ent)
    np.save(os.path.join(d, "kg_TransR_relation.npy"), rel)
    np.save(os.path.join(d, "kg_TransRprojection.npy"), proj)  # ref spelling
    cfg = KGEConfig(model_name="TransR", hidden_dim=4, gamma=5.0,
                    dataset="kg", double_ent=False)
    si = ScoreInfer(-1, cfg, d, "none")
    si.load_model()
    res = si.topK(np.array([0, 1]), np.array([0]), np.array([2, 3]), k=2)
    assert res and len(res[0]) > 0  # loaded + scored (ref projection file)


ALL_MODELS = ["TransE_l1", "TransE_l2", "TransR", "DistMult", "ComplEx",
              "RESCAL", "RotatE", "SimplE"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_score_infer_every_model_matches_pos_score(name, tmp_path):
    """ScoreInfer's all-pairs broadcast path cross-checked against the
    training-path pos_score on the expanded (h, r, t) cross product for
    EVERY model family — the reference's test_infer.py strategy (infer vs
    edge_func) widened to its test_topk.py model coverage."""
    import jax
    path = str(tmp_path)
    kw = {}
    if name == "RotatE":
        kw["double_ent"] = True
    cfg = KGEConfig(model_name=name, hidden_dim=DIM, gamma=4.0,
                    dataset="toy", save_path=path, **kw)
    model = KEModel(cfg, N_ENT, N_REL)
    state = model.init_state(jax.random.PRNGKey(1))
    save_model(cfg, model, state)

    si = ScoreInfer(-1, cfg, path, "none")
    si.load_model()
    h, r, t = [1, 2, 3], [0, 1], [4, 5, 6, 7]
    res = si.topK(h, r, t, exec_mode="all", k=8)

    # oracle: the training-path positive score on each expanded triple,
    # built at gamma=0 (sfunc='none' scores raw, ScoreInfer.load_model)
    from dglke_tpu.models.score_functions import make_score_function
    sf0, _, _ = make_score_function(name, 0.0, DIM, cfg.double_ent,
                                    cfg.double_rel)
    hh, rr, tt = np.meshgrid(h, r, t, indexing="ij")
    hh, rr, tt = (x.reshape(-1).astype(np.int32) for x in (hh, rr, tt))
    from dglke_tpu.ops.embedding import gather_rows
    h_rows = gather_rows(state.entity, hh, dim=model.entity_dim)
    t_rows = gather_rows(state.entity, tt, dim=model.entity_dim)
    r_rows = gather_rows(state.relation, rr, dim=model.relation_dim)
    if model.is_transr:
        p_rows = gather_rows(state.projection, rr, dim=model.proj_dim)
        h_rows = sf0.project(h_rows, p_rows)
        t_rows = sf0.project(t_rows, p_rows)
    naive = np.asarray(sf0.pos_score(h_rows, r_rows, t_rows))
    order = np.argsort(-naive, kind="stable")[:8]
    got = res[0][3]
    np.testing.assert_allclose(got, naive[order], rtol=2e-4, atol=1e-4)
