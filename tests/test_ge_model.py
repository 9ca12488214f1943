"""Tests for the object-level model API (dglke_tpu/models/ge_model.py).

Mirrors the reference's test_topk.py strategy
(/root/reference/python/dglke/tests/test_topk.py): save .npy checkpoints to
a tempdir, reload through the model classes, and compare link_predict /
embed_sim topK against explicit numpy loops.  Exclude/mask modes are
checked against brute-force membership."""

import os

import numpy as np
import pytest

from dglke_tpu.models.ge_model import (
    BasicGEModel,
    ComplExModel,
    DistMultModel,
    GNNModel,
    KGEModel,
    RESCALModel,
    RotatEModel,
    TransE_l1Model,
    TransE_l2Model,
    TransRModel,
    TripleSet,
)

N_ENT, N_REL, DIM = 40, 6, 16


def _save_ckpt(tmp_path, rng, rel_dim=DIM, proj=False):
    ent = rng.uniform(-1, 1, (N_ENT, DIM)).astype(np.float32)
    rel = rng.uniform(-1, 1, (N_REL, rel_dim)).astype(np.float32)
    np.save(tmp_path / "entity.npy", ent)
    np.save(tmp_path / "relation.npy", rel)
    if proj:
        p = rng.uniform(-1, 1, (N_REL, DIM * rel_dim)).astype(np.float32)
        np.save(tmp_path / "TransRprojection.npy", p)
        return ent, rel, p
    return ent, rel


def _random_graph(rng, n=120):
    h = rng.integers(0, N_ENT, n)
    r = rng.integers(0, N_REL, n)
    t = rng.integers(0, N_ENT, n)
    return h.astype(np.int64), r.astype(np.int64), t.astype(np.int64)


# ---------------------------------------------------------------------------
# TripleSet


def test_triple_set_membership():
    rng = np.random.default_rng(0)
    h, r, t = _random_graph(rng)
    ts = TripleSet(h, r, t, N_ENT, N_REL)
    # every stored triple is contained
    assert ts.contains(h, r, t).all()
    # perturbed relations mostly are not
    r2 = (r + 1) % N_REL
    known = set(zip(h.tolist(), r2.tolist(), t.tolist()))
    real = set(zip(h.tolist(), r.tolist(), t.tolist()))
    expected = np.array([(a, b, c) in real
                         for a, b, c in zip(h, r2, t)])
    np.testing.assert_array_equal(ts.contains(h, r2, t), expected)


def test_triple_set_empty():
    ts = TripleSet(np.array([]), np.array([]), np.array([]), N_ENT, N_REL)
    assert not ts.contains(np.array([1]), np.array([2]), np.array([3])).any()


def test_triple_set_no_int64_overflow():
    # Freebase-scale ids must not overflow the composite keys
    n_ent, n_rel = 86_054_151, 14_824
    h = np.array([n_ent - 1, 12345])
    r = np.array([n_rel - 1, 77])
    t = np.array([n_ent - 2, 999])
    ts = TripleSet(h, r, t, n_ent, n_rel)
    assert ts.contains(h, r, t).all()
    assert not ts.contains(h, (r + 1) % n_rel, t).any()


# ---------------------------------------------------------------------------
# Reference-loop score helpers


def _score_loop(model_name, ent, rel_emb, h, r, t, proj=None, gamma=12.0):
    """Explicit per-triple score, written independently of the jnp kernels."""
    he, te = ent[h], ent[t]
    re = rel_emb[r]
    if model_name in ("TransE", "TransE_l2"):
        return gamma - np.linalg.norm(he + re - te, ord=2, axis=-1)
    if model_name == "TransE_l1":
        return gamma - np.linalg.norm(he + re - te, ord=1, axis=-1)
    if model_name == "TransR":
        p = proj[r].reshape(-1, ent.shape[1], rel_emb.shape[1])
        hp = np.einsum("bd,bdk->bk", he, p)
        tp = np.einsum("bd,bdk->bk", te, p)
        return gamma - np.abs(hp + re - tp).sum(-1)
    if model_name == "DistMult":
        return (he * re * te).sum(-1)
    if model_name == "ComplEx":
        d = ent.shape[1] // 2
        rh, ih, rt, it = he[:, :d], he[:, d:], te[:, :d], te[:, d:]
        rr, ir = re[:, :d], re[:, d:]
        return (rh * rt * rr + ih * it * rr + rh * it * ir
                - ih * rt * ir).sum(-1)
    if model_name == "RESCAL":
        dr = rel_emb.shape[1] // ent.shape[1]
        m = re.reshape(-1, dr, ent.shape[1])
        return (he * np.einsum("bre,be->br", m, te)).sum(-1)
    if model_name == "RotatE":
        d = ent.shape[1] // 2
        emb_init = (gamma + 2.0) / d
        ph = re / (emb_init / np.pi)
        rh, ih, rt, it = he[:, :d], he[:, d:], te[:, :d], te[:, d:]
        rr, ir = np.cos(ph), np.sin(ph)
        rs = rh * rr - ih * ir - rt
        is_ = rh * ir + ih * rr - it
        return gamma - np.sqrt(rs ** 2 + is_ ** 2).sum(-1)
    raise ValueError(model_name)


MODELS = [
    ("TransE_l2", TransE_l2Model, {}),
    ("TransE_l1", TransE_l1Model, {}),
    ("DistMult", DistMultModel, {}),
    ("ComplEx", ComplExModel, {}),
    ("RotatE", RotatEModel, {}),
]


@pytest.mark.parametrize("name,cls,kw", MODELS)
def test_link_predict_all_mode(tmp_path, name, cls, kw):
    rng = np.random.default_rng(1)
    # RotatE splits the entity into re/im halves: relation dim = DIM // 2
    rel_dim = DIM // 2 if name == "RotatE" else DIM
    ent, rel_emb = _save_ckpt(tmp_path, rng, rel_dim=rel_dim)
    model = cls(**kw) if name in ("DistMult", "ComplEx") else cls(gamma=12.0)
    model.load(str(tmp_path))

    head = np.array([0, 1, 2, 3])
    rel = np.array([0, 1])
    tail = np.array([4, 5, 6])
    res = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                             topk=5)
    h, r, t, score, mask = res[0]
    assert mask is None

    # brute force over all combinations
    hh, rr, tt = np.meshgrid(head, rel, tail, indexing="ij")
    hh, rr, tt = hh.ravel(), rr.ravel(), tt.ravel()
    ref = _score_loop(name, ent, rel_emb, hh, rr, tt)
    order = np.argsort(-ref, kind="stable")[:5]
    np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(h, hh[order])
    np.testing.assert_array_equal(r, rr[order])
    np.testing.assert_array_equal(t, tt[order])


def test_link_predict_transr(tmp_path):
    rng = np.random.default_rng(2)
    ent, rel_emb, proj = _save_ckpt(tmp_path, rng, rel_dim=8, proj=True)
    model = TransRModel(gamma=12.0)
    model.load(str(tmp_path))
    head = np.array([0, 1, 2])
    rel = np.array([0, 1])
    tail = np.array([3, 4])
    res = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                             topk=4)
    h, r, t, score, _ = res[0]
    hh, rr, tt = np.meshgrid(head, rel, tail, indexing="ij")
    hh, rr, tt = hh.ravel(), rr.ravel(), tt.ravel()
    ref = _score_loop("TransR", ent, rel_emb, hh, rr, tt, proj=proj)
    order = np.argsort(-ref, kind="stable")[:4]
    np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(t, tt[order])


def test_link_predict_rescal(tmp_path):
    rng = np.random.default_rng(3)
    ent, rel_emb = _save_ckpt(tmp_path, rng, rel_dim=DIM * DIM)
    model = RESCALModel()
    model.load(str(tmp_path))
    assert model._score_func.relation_dim == DIM
    head = np.array([0, 1])
    rel = np.array([0, 1, 2])
    tail = np.array([2, 3])
    res = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                             topk=6)
    h, r, t, score, _ = res[0]
    hh, rr, tt = np.meshgrid(head, rel, tail, indexing="ij")
    hh, rr, tt = hh.ravel(), rr.ravel(), tt.ravel()
    ref = _score_loop("RESCAL", ent, rel_emb, hh, rr, tt)
    order = np.argsort(-ref, kind="stable")[:6]
    np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)


def test_link_predict_triplet_wise_and_logsigmoid(tmp_path):
    rng = np.random.default_rng(4)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = TransE_l2Model(gamma=12.0)
    model.load(str(tmp_path))
    h = rng.integers(0, N_ENT, 20)
    r = rng.integers(0, N_REL, 20)
    t = rng.integers(0, N_ENT, 20)
    res = model.link_predict(head=h, rel=r, tail=t, exec_mode="triplet_wise",
                             sfunc="logsigmoid", topk=7)
    rh, rr, rt, score, _ = res[0]
    ref = _score_loop("TransE_l2", ent, rel_emb, h, r, t)
    ref = np.log(1.0 / (1.0 + np.exp(-ref)))
    order = np.argsort(-ref, kind="stable")[:7]
    np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(rh, h[order])


def test_link_predict_batch_modes(tmp_path):
    rng = np.random.default_rng(5)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = DistMultModel()
    model.load(str(tmp_path))
    head = np.array([0, 1, 2])
    rel = np.array([0, 1])
    tail = np.array([3, 4, 5, 6])

    res = model.link_predict(head=head, rel=rel, tail=tail,
                             exec_mode="batch_head", topk=3)
    assert len(res) == len(head)
    for i, (h, r, t, score, _) in enumerate(res):
        assert (h == head[i]).all()
        rr, tt = np.meshgrid(rel, tail, indexing="ij")
        ref = _score_loop("DistMult", ent, rel_emb,
                          np.full(rr.size, head[i]), rr.ravel(), tt.ravel())
        order = np.argsort(-ref, kind="stable")[:3]
        np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(r, rr.ravel()[order])
        np.testing.assert_array_equal(t, tt.ravel()[order])

    res = model.link_predict(head=head, rel=rel, tail=tail,
                             exec_mode="batch_rel", topk=3)
    assert len(res) == len(rel)
    for i, (h, r, t, score, _) in enumerate(res):
        assert (r == rel[i]).all()

    res = model.link_predict(head=head, rel=rel, tail=tail,
                             exec_mode="batch_tail", topk=3)
    assert len(res) == len(tail)
    for i, (h, r, t, score, _) in enumerate(res):
        assert (t == tail[i]).all()


def test_link_predict_exclude_and_mask(tmp_path):
    rng = np.random.default_rng(6)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = TransE_l2Model(gamma=12.0)
    model.load(str(tmp_path))

    head = np.arange(8)
    rel = np.arange(3)
    tail = np.arange(8, 20)

    # graph = the top-scoring triples themselves, so exclusion bites
    res = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                             topk=12)
    th_, tr_, tt_ = res[0][0][:6], res[0][1][:6], res[0][2][:6]
    model.attach_graph((th_, tr_, tt_))

    # mask mode: same topk, with the known edges flagged
    res_m = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                               topk=12, exclude_mode="mask")
    h, r, t, score, mask = res_m[0]
    assert mask[:6].all() and not mask[6:].any()

    # exclude mode: known edges disappear, scores stay sorted desc
    res_e = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                               topk=6, exclude_mode="exclude")
    h, r, t, score, mask = res_e[0]
    assert mask is None
    assert len(h) == 6
    known = model.graph.contains(h, r, t)
    assert not known.any()
    assert (np.diff(score) <= 1e-6).all()
    # they must equal positions 6..11 of the unfiltered ranking
    np.testing.assert_array_equal(h, res[0][0][6:12])

    # exclude without attach_graph raises
    model2 = TransE_l2Model(gamma=12.0)
    model2.load(str(tmp_path))
    with pytest.raises(AssertionError):
        model2.link_predict(head=head, rel=rel, tail=tail,
                            exclude_mode="exclude")


def test_link_predict_exclude_escalates_beyond_4k(tmp_path):
    """If >3/4 of the top-4k candidates are known edges, the search must
    widen to the full candidate list (reference ke_model.py:403-440)."""
    rng = np.random.default_rng(7)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = DistMultModel()
    model.load(str(tmp_path))
    head = np.arange(10)
    rel = np.arange(2)
    tail = np.arange(10, 25)
    full = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                              topk=10 * 2 * 15)
    fh, fr, ft = full[0][0], full[0][1], full[0][2]
    # mark the top 11 as known; ask for topk=2 (topk*4=8 < 11 known)
    model.attach_graph((fh[:11], fr[:11], ft[:11]))
    res = model.link_predict(head=head, rel=rel, tail=tail, exec_mode="all",
                             topk=2, exclude_mode="exclude")
    h, r, t, score, _ = res[0]
    assert len(h) == 2
    np.testing.assert_array_equal(h, fh[11:13])
    np.testing.assert_array_equal(t, ft[11:13])


def test_embed_sim_modes(tmp_path):
    rng = np.random.default_rng(8)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = TransE_l2Model(gamma=12.0)
    model.load(str(tmp_path))

    left = np.array([0, 1, 2, 3])
    right = np.array([4, 5, 6])

    # all-pairs cosine
    res = model.embed_sim(left=left, right=right, sfunc="cosine", topk=5)
    l, r, score = res[0]
    le, re_ = ent[left], ent[right]
    ref = (le @ re_.T) / (np.linalg.norm(le, axis=1)[:, None]
                          * np.linalg.norm(re_, axis=1)[None, :])
    flat = ref.ravel()
    order = np.argsort(-flat, kind="stable")[:5]
    np.testing.assert_allclose(score, flat[order], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(l, left[order // len(right)])
    np.testing.assert_array_equal(r, right[order % len(right)])

    # pairwise l2 over relations
    res = model.embed_sim(left=np.array([0, 1, 2]), right=np.array([3, 4, 5]),
                          embed_type="relation", sfunc="l2", pair_ws=True,
                          topk=2)
    l, r, score = res[0]
    ref = -np.linalg.norm(rel_emb[[0, 1, 2]] - rel_emb[[3, 4, 5]], axis=1)
    order = np.argsort(-ref, kind="stable")[:2]
    np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)

    # bcast returns one row per left element
    res = model.embed_sim(left=left, right=right, sfunc="dot", bcast=True,
                          topk=2)
    assert len(res) == len(left)
    for i, (l, r, score) in enumerate(res):
        ref = ent[left[i]] @ ent[right].T
        order = np.argsort(-ref, kind="stable")[:2]
        np.testing.assert_allclose(score, ref[order], rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(r, right[order])


def test_gnn_model_load_and_predict(tmp_path):
    rng = np.random.default_rng(9)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = GNNModel(model_name="DistMult")
    model.load(str(tmp_path))
    res = model.link_predict(head=np.array([0, 1]), rel=np.array([0]),
                             tail=np.array([2, 3]), topk=2)
    assert len(res[0][0]) == 2
    with pytest.raises(ValueError):
        GNNModel(model_name="RotatE")


def test_attach_graph_from_dataset(tmp_path):
    from dglke_tpu.data.dataset import synthetic_dataset
    rng = np.random.default_rng(10)
    ds = synthetic_dataset(n_entities=N_ENT, n_relations=N_REL, n_train=64,
                           seed=0)
    ent, rel_emb = _save_ckpt(tmp_path, rng)
    model = TransE_l2Model(gamma=12.0)
    model.load(str(tmp_path))
    model.attach_graph(ds)
    h, r, t = ds.train
    assert model.graph.contains(h[:10], r[:10], t[:10]).all()


def test_gnnmodel_constructs_all_supported():
    """GNNModel TransE variants crashed at construction (ord= vs dist_ord)."""
    from dglke_tpu.models.ge_model import GNNModel
    for name in ("TransE", "TransE_l2", "TransE_l1", "DistMult"):
        m = GNNModel(model_name=name, gamma=5.0)
        assert m is not None
    import pytest
    with pytest.raises(ValueError):
        GNNModel(model_name="RotatE")


def test_tripleset_order_independent_attach():
    """attach_graph before load_emb must not build colliding keys
    (num_entity == -1): previously contains() gave false positives."""
    from dglke_tpu.models.ge_model import TripleSet
    ts = TripleSet([1], [0], [3], -1, 5)
    assert not ts.contains([2], [0], [4])[0]
    assert ts.contains([1], [0], [3])[0]
    # out-of-range candidates are never members
    assert not ts.contains([100], [0], [100])[0]
