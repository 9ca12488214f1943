"""Candidate-list evaluation tests (wikikg90M-style 'h,r->t' protocol)."""

import os
import pickle

import numpy as np

import jax

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import CandidateEvalSampler, evaluate_candidates


def _setup():
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=8, gamma=4.0)
    model = KEModel(cfg, 50, 5)
    state = model.init_state(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    n, k = 23, 12
    hr = rng.randint(0, 50, (n, 2)).astype(np.int64)
    hr[:, 1] = rng.randint(0, 5, n)
    cand = rng.randint(0, 50, (n, k)).astype(np.int64)
    ans = rng.randint(0, k, n).astype(np.int64)
    edges = {"h,r->t": {"hr": hr, "t_correct_index": ans,
                        "t_candidate": cand}}
    return cfg, model, state, edges


def test_candidate_valid_metrics():
    cfg, model, state, edges = _setup()
    sampler = CandidateEvalSampler(edges, batch_size=8)
    logs = []
    metrics = evaluate_candidates(model, state, sampler, mode="Valid",
                                  log=logs.append)
    assert 0 < metrics["MRR"] <= 1.0
    assert metrics["MR"] >= 1.0

    # cross-check one batch against numpy scoring
    hr = edges["h,r->t"]["hr"]
    cand = edges["h,r->t"]["t_candidate"]
    ans = edges["h,r->t"]["t_correct_index"]
    ent = np.asarray(state.entity.emb)
    rel = np.asarray(state.relation.emb)
    scores = np.array([[cfg.gamma - np.linalg.norm(
        ent[hr[i, 0]] + rel[hr[i, 1]] - ent[cand[i, j]])
        for j in range(cand.shape[1])] for i in range(len(hr))])
    pos = scores[np.arange(len(hr)), ans]
    # the reference's ranking self-counts the answer among the ties
    # (sum(neg >= neg[ans]) + 1, min rank 2 — general_models.py:504)
    ranks = (scores >= pos[:, None] - 1e-5).sum(axis=1) + 1
    want_mr_low = ((scores >= pos[:, None] + 1e-5).sum(axis=1) + 1).mean()
    assert want_mr_low <= metrics["MR"] <= ranks.mean() + 1e-6


def test_transr_candidate_scores():
    """TransR candidate scoring projects the query row AND each row's
    candidates with that row's own relation matrix (it used to crash at
    trace time on a shape mismatch — raw [B, De] rows fed to a score
    form expecting projected [.., Dr] rows).  Cross-checked against
    per-row numpy: score = gamma - L1(h P_r + r - c P_r)."""
    cfg = KGEConfig(model_name="TransR", hidden_dim=6, gamma=4.0)
    model = KEModel(cfg, 30, 4)
    state = model.init_state(jax.random.PRNGKey(2))
    rng = np.random.RandomState(1)
    b, k = 5, 7
    h = rng.randint(0, 30, b).astype(np.int32)
    r = rng.randint(0, 4, b).astype(np.int32)
    cand = rng.randint(0, 30, (b, k)).astype(np.int32)
    s = np.asarray(model.candidate_scores(state, h, r, cand,
                                          neg_head=False))
    assert s.shape == (b, k)
    ent = np.asarray(state.entity.emb, np.float64)
    rel = np.asarray(state.relation.emb, np.float64)
    proj = np.asarray(state.projection.emb, np.float64)
    de, dr = model.entity_dim, model.relation_dim
    for i in range(b):
        p = proj[r[i]].reshape(de, dr)
        hp = ent[h[i]] @ p
        for j in range(k):
            cp = ent[cand[i, j]] @ p
            want = cfg.gamma - np.abs(hp + rel[r[i]] - cp).sum()
            np.testing.assert_allclose(s[i, j], want, rtol=2e-4,
                                       atol=2e-4)


def test_valid_hook_routes_candidate_sampler():
    """The periodic-validation hook dispatches candidate-list samplers to
    evaluate_candidates (the wikikg90M --valid path in the train CLI)."""
    from dglke_tpu.trainer import evaluate_with_samplers
    cfg, model, state, edges = _setup()
    sampler = CandidateEvalSampler(edges, batch_size=8)
    direct = evaluate_candidates(model, state, sampler, mode="Valid",
                                 log=lambda *a: None)
    routed = evaluate_with_samplers(model, state, [sampler],
                                    phase="Valid", log=lambda *a: None)
    assert routed == direct


def test_dataset_candidate_fields():
    """KGDataset carries candidate-eval splits for the wikikg90M loader."""
    from dglke_tpu.data.dataset import KGDataset
    d = KGDataset(name="x", n_entities=4, n_relations=2,
                  train=(np.zeros(3, np.int64),) * 3,
                  valid_dict={"h,r->t": {}})
    assert d.valid_dict is not None and d.test_dict is None


def test_candidate_test_pkl(tmp_path):
    cfg, model, state, edges = _setup()
    sampler = CandidateEvalSampler(edges, batch_size=8)
    out = evaluate_candidates(model, state, sampler, mode="Test",
                              save_path=str(tmp_path), rank=3,
                              log=lambda *a: None)
    assert out is None
    with open(os.path.join(str(tmp_path), "test_3.pkl"), "rb") as f:
        d = pickle.load(f)
    top10 = d["h,r->t"]["t_pred_top10"]
    assert top10.shape == (23, 10)
    assert (top10 < 12).all()
