"""Reference-transcription oracle tests.

Every oracle in this file is a LITERAL hand-transcription into numpy
(float64) of the reference implementation's torch code, with a file:line
citation per formula (paths relative to /root/reference/python/dglke).
These are the strongest parity evidence available in this environment
(torch/dgl cannot be installed; no egress): the jnp kernels are checked
against an *independently authored* copy of the reference math, so a
transcription-level sign / phase / temperature / ordering error in the
production kernels cannot pass.

Covers, per the reference test strategy (SURVEY.md section 4):
  * all 8 score functions x {pos edge_func, chunked create_neg head+tail,
    all-pairs infer}            (models/pytorch/score_fun.py:26-641)
  * all 4 loss genres, pairwise, self-adversarial weighting and
    edge-importance weighting    (models/pytorch/loss.py:10-98)
  * the row-sparse Adagrad update incl. duplicate-id semantics
                                 (models/pytorch/tensor_models.py:304-362)
  * the filtered-ranking metric  (models/general_models.py:436-485)

The repo documents THREE deliberate deviations from the reference; each is
pinned below as a PAIRED test asserting the repo (a) matches its own
documented variant and (b) differs from the reference-faithful oracle
exactly where claimed:
  1. TransR tail-corrupt create_neg: reference scores |h - r - t'|
     (score_fun.py:214-220), inconsistent with its own positive
     |h + r - t|; repo keeps h + r (score_functions.py TransRScore).
  2. RESCAL tail-corrupt create_neg: reference scores (R h) . t'
     (score_fun.py:440-449), inconsistent with its own positive
     h . (R t); repo uses (h^T R) . t' (score_functions.py RESCALScore).
  3. Edge-weighted positive loss: reference multiplies a [B] loss by a
     [B,1] weight (loss.py:82), broadcasting to [B,B] so the mean
     degenerates to mean(loss)*mean(w); repo weights per-edge
     (models/loss.py:82-87).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.models.loss import LossGenerator
from dglke_tpu.models.score_functions import make_score_function
from dglke_tpu.ops.embedding import EmbeddingState, sparse_adagrad_update

# ---------------------------------------------------------------------------
# shared shapes

HIDDEN = 8
GAMMA = 12.0
C, BC, K = 3, 5, 7          # num_chunks, chunk_size, neg_sample_size
B = C * BC
EMB_INIT = (GAMMA + 2.0) / HIDDEN   # general_models.py:248-268 / RotatE ctor


def _chunk2(x):
    """th.chunk(x, 2, dim=-1)."""
    h = x.shape[-1] // 2
    return x[..., :h], x[..., h:]


def _pnorm(x, p, axis=-1):
    """th.norm(x, p=p, dim=axis)."""
    if p == 1:
        return np.sum(np.abs(x), axis=axis)
    return np.sqrt(np.sum(x * x, axis=axis))


# ---------------------------------------------------------------------------
# distance oracles (score_fun.py:26-38)


def ref_batched_l2_dist(a, b):
    """score_fun.py:26-34: baddbmm expansion, clamp_min(1e-30), sqrt."""
    a_sq = np.sum(a * a, axis=-1)
    b_sq = np.sum(b * b, axis=-1)
    ab = np.einsum("...md,...nd->...mn", a, b)
    sq = b_sq[..., None, :] - 2.0 * ab + a_sq[..., :, None]
    return np.sqrt(np.maximum(sq, 1e-30))


def ref_batched_l1_dist(a, b):
    """score_fun.py:36-38: th.cdist(a, b, p=1)."""
    return np.sum(np.abs(a[..., :, None, :] - b[..., None, :, :]), axis=-1)


# ---------------------------------------------------------------------------
# TransE (score_fun.py:40-108)


def ref_transe_pos(h, r, t, p):
    """edge_func score_fun.py:54-59: gamma - ||h + r - t||_p."""
    return GAMMA - _pnorm(h + r - t, p)


def ref_transe_neg(heads, relations, tails, neg_head, p):
    """create_neg score_fun.py:91-108 (heads/tails: whichever side is
    corrupted carries C*K rows, the other B rows, exactly as the reference
    closure receives them)."""
    dist = ref_batched_l2_dist if p == 2 else ref_batched_l1_dist
    if neg_head:
        d = heads.shape[1]
        heads = heads.reshape(C, K, d)
        tails = (tails - relations).reshape(C, BC, d)
        return GAMMA - dist(tails, heads)
    d = heads.shape[1]
    heads = (heads + relations).reshape(C, BC, d)
    tails = tails.reshape(C, K, d)
    return GAMMA - dist(heads, tails)


def ref_transe_infer(h, r, t, p):
    """infer score_fun.py:61-66."""
    score = (h[:, None, :] + r[None, :, :])[:, :, None, :] - t[None, None]
    return GAMMA - _pnorm(score, p)


# ---------------------------------------------------------------------------
# TransR (score_fun.py:110-220)


def ref_transr_project(ent, proj, de, dr):
    """prepare score_fun.py:131-136: th.einsum('ab,abc->ac', ent, proj)."""
    return np.einsum("ab,abc->ac", ent, proj.reshape(-1, de, dr))


def ref_transr_pos(h_proj, r, t_proj):
    """edge_func score_fun.py:121-126: gamma - ||h_p + r - t_p||_1."""
    return GAMMA - _pnorm(h_proj + r - t_proj, 1)


def ref_transr_neg_prepare(rel_proj, head, tail, neg_head, de, dr):
    """create_neg_prepare score_fun.py:138-168: positive side projected by
    its own edge's relation; negative side projected against ALL chunk
    relations -> [C, Bc, K, Dr]."""
    proj = rel_proj.reshape(C, -1, de, dr)
    if neg_head:
        t = tail.reshape(C, -1, 1, de) @ proj           # [C, Bc, 1, Dr]
        t = t.reshape(C, -1, dr)
        h = head.reshape(C, 1, -1, de) @ proj           # [C, Bc, K, Dr]
        return h, t
    h = head.reshape(C, -1, 1, de) @ proj
    h = h.reshape(C, -1, dr)
    t = tail.reshape(C, 1, -1, de) @ proj
    return h, t


def ref_transr_neg(heads, relations, tails, neg_head, dr):
    """create_neg score_fun.py:203-220 — REFERENCE-FAITHFUL, including its
    tail-corrupt sign: heads - relations (:217), i.e. |h - r - t'|."""
    relations = relations.reshape(C, -1, dr)
    if neg_head:
        t = (tails - relations).reshape(C, -1, 1, dr)
        return GAMMA - _pnorm(heads - t, 1)
    h = (heads - relations).reshape(C, -1, 1, dr)
    return GAMMA - _pnorm(h - tails, 1)


def ref_transr_neg_consistent(heads, relations, tails, neg_head, dr):
    """The repo's documented variant: tail-corrupt keeps h + r - t' so the
    negative score of a triple equals its positive score (the head-corrupt
    branch is unchanged — it already equals |h' + r - t|)."""
    relations = relations.reshape(C, -1, dr)
    if neg_head:
        t = (tails - relations).reshape(C, -1, 1, dr)
        return GAMMA - _pnorm(heads - t, 1)
    h = (heads + relations).reshape(C, -1, 1, dr)
    return GAMMA - _pnorm(h - tails, 1)


# ---------------------------------------------------------------------------
# DistMult (score_fun.py:222-286)


def ref_distmult_pos(h, r, t):
    """edge_func score_fun.py:229-235: sum(h * r * t)."""
    return np.sum(h * r * t, axis=-1)


def ref_distmult_neg(heads, relations, tails, neg_head):
    """create_neg score_fun.py:268-286: bmm((pos*rel), neg^T)."""
    if neg_head:
        d = heads.shape[1]
        hh = np.transpose(heads.reshape(C, K, d), (0, 2, 1))
        tmp = (tails * relations).reshape(C, BC, d)
        return tmp @ hh
    d = tails.shape[1]
    tt = np.transpose(tails.reshape(C, K, d), (0, 2, 1))
    tmp = (heads * relations).reshape(C, BC, d)
    return tmp @ tt


def ref_distmult_infer(h, r, t):
    """infer score_fun.py:237-242."""
    hr = (h[:, None, :] * r[None, :, :])[:, :, None, :]
    return np.sum(hr * t[None, None], axis=-1)


# ---------------------------------------------------------------------------
# ComplEx (score_fun.py:289-376)


def ref_complex_pos(h, r, t):
    """edge_func score_fun.py:297-307."""
    re_h, im_h = _chunk2(h)
    re_t, im_t = _chunk2(t)
    re_r, im_r = _chunk2(r)
    s = (re_h * re_t * re_r + im_h * im_t * re_r
         + re_h * im_t * im_r - im_h * re_t * im_r)
    return np.sum(s, axis=-1)


def ref_complex_neg(heads, relations, tails, neg_head):
    """create_neg score_fun.py:345-376: conjugate-rotate the positive side,
    bmm against negatives."""
    if neg_head:
        d = heads.shape[1]
        e_re, e_im = _chunk2(tails)
        r_re, r_im = _chunk2(relations)
        real = e_re * r_re + e_im * r_im
        imag = -e_re * r_im + e_im * r_re
        tmp = np.concatenate([real, imag], axis=-1).reshape(C, BC, d)
        hh = np.transpose(heads.reshape(C, K, d), (0, 2, 1))
        return tmp @ hh
    d = heads.shape[1]
    e_re, e_im = _chunk2(heads)
    r_re, r_im = _chunk2(relations)
    real = e_re * r_re - e_im * r_im
    imag = e_re * r_im + e_im * r_re
    tmp = np.concatenate([real, imag], axis=-1).reshape(C, BC, d)
    tt = np.transpose(tails.reshape(C, K, d), (0, 2, 1))
    return tmp @ tt


def ref_complex_infer(h, r, t):
    """infer score_fun.py:309-319."""
    re_h, im_h = _chunk2(h)
    re_t, im_t = _chunk2(t)
    re_r, im_r = _chunk2(r)

    def bc(x, y):  # (x_h[:,None]*y_r[None,:])[:,:,None,:]
        return (x[:, None, :] * y[None, :, :])[:, :, None, :]

    s = (bc(re_h, re_r) * re_t[None, None]
         + bc(im_h, re_r) * im_t[None, None]
         + bc(re_h, im_r) * im_t[None, None]
         - bc(im_h, im_r) * re_t[None, None])
    return np.sum(s, axis=-1)


# ---------------------------------------------------------------------------
# RESCAL (score_fun.py:378-449)


def ref_rescal_pos(h, r, t, dr, de):
    """edge_func score_fun.py:387-394: sum(h * (R @ t))."""
    rmat = r.reshape(-1, dr, de)
    rt = np.einsum("bre,be->br", rmat, t)
    return np.sum(h * rt, axis=-1)


def ref_rescal_neg(heads, relations, tails, neg_head, dr, de):
    """create_neg score_fun.py:427-449 — REFERENCE-FAITHFUL, including its
    tail-corrupt branch tmp = R @ h (:444-446), i.e. (R h) . t'."""
    rmat = relations.reshape(-1, dr, de)
    if neg_head:
        d = heads.shape[1]
        hh = np.transpose(heads.reshape(C, K, d), (0, 2, 1))
        tmp = np.einsum("bre,be->br", rmat, tails).reshape(C, BC, d)
        return tmp @ hh
    d = heads.shape[1]
    tt = np.transpose(tails.reshape(C, K, d), (0, 2, 1))
    tmp = np.einsum("bre,be->br", rmat, heads).reshape(C, BC, d)
    return tmp @ tt


def ref_rescal_neg_consistent(heads, relations, tails, neg_head, dr, de):
    """The repo's documented variant: tail-corrupt uses tmp = h^T R so the
    negative score equals the positive formula h . (R t')."""
    rmat = relations.reshape(-1, dr, de)
    if neg_head:
        return ref_rescal_neg(heads, relations, tails, True, dr, de)
    d = heads.shape[1]
    tt = np.transpose(tails.reshape(C, K, d), (0, 2, 1))
    tmp = np.einsum("bre,br->be", rmat, heads).reshape(C, BC, d)
    return tmp @ tt


def ref_rescal_infer(h, r, t, dr, de):
    """infer score_fun.py:397-402: h[:,None,None] * einsum('abc,dc->adb')."""
    rmat = r.reshape(-1, dr, de)
    rt = np.einsum("abc,dc->adb", rmat, t)          # [R, T, Dr]
    s = h[:, None, None, :] * rt[None]
    return np.sum(s, axis=-1)


# ---------------------------------------------------------------------------
# RotatE (score_fun.py:451-554)


def ref_rotate_pos(h, r, t):
    """edge_func score_fun.py:460-472."""
    re_h, im_h = _chunk2(h)
    re_t, im_t = _chunk2(t)
    phase = r / (EMB_INIT / np.pi)
    re_r, im_r = np.cos(phase), np.sin(phase)
    re_s = re_h * re_r - im_h * im_r - re_t
    im_s = re_h * im_r + im_h * re_r - im_t
    score = np.sqrt(re_s * re_s + im_s * im_s)   # stack([re,im]).norm(dim=0)
    return GAMMA - np.sum(score, axis=-1)


def ref_rotate_neg(heads, relations, tails, neg_head):
    """create_neg score_fun.py:512-554."""
    phase = relations / (EMB_INIT / np.pi)
    r_re, r_im = np.cos(phase), np.sin(phase)
    if neg_head:
        d = heads.shape[1]
        e_re, e_im = _chunk2(tails)
        real = e_re * r_re + e_im * r_im
        imag = -e_re * r_im + e_im * r_re
        tmp = np.concatenate([real, imag], -1).reshape(C, BC, 1, d)
        neg = heads.reshape(C, 1, K, d)
    else:
        d = heads.shape[1]
        e_re, e_im = _chunk2(heads)
        real = e_re * r_re - e_im * r_im
        imag = e_re * r_im + e_im * r_re
        tmp = np.concatenate([real, imag], -1).reshape(C, BC, 1, d)
        neg = tails.reshape(C, 1, K, d)
    score = tmp - neg
    # th.stack([score[..., :d//2], score[..., d//2:]], -1).norm(dim=-1)
    s_re, s_im = _chunk2(score)
    mod = np.sqrt(s_re * s_re + s_im * s_im)
    return GAMMA - np.sum(mod, axis=-1)


def ref_rotate_infer(h, r, t):
    """infer score_fun.py:474-487."""
    re_h, im_h = _chunk2(h)
    re_t, im_t = _chunk2(t)
    phase = r / (EMB_INIT / np.pi)
    re_r, im_r = np.cos(phase), np.sin(phase)
    re_s = (re_h[:, None, :] * re_r[None] - im_h[:, None, :] * im_r[None])
    im_s = (re_h[:, None, :] * im_r[None] + im_h[:, None, :] * re_r[None])
    re_s = re_s[:, :, None, :] - re_t[None, None]
    im_s = im_s[:, :, None, :] - im_t[None, None]
    mod = np.sqrt(re_s * re_s + im_s * im_s)
    return GAMMA - np.sum(mod, axis=-1)


# ---------------------------------------------------------------------------
# SimplE (score_fun.py:556-641)


def ref_simple_pos(h, r, t):
    """edge_func score_fun.py:563-572: clamp(0.5*(fwd+bwd).sum, -20, 20)."""
    h_i, h_j = _chunk2(h)
    t_i, t_j = _chunk2(t)
    rel, rel_inv = _chunk2(r)
    fwd = h_i * rel * t_j
    bwd = t_i * rel_inv * h_j
    return np.clip(0.5 * np.sum(fwd + bwd, axis=-1), -20, 20)


def ref_simple_neg(heads, relations, tails, neg_head):
    """create_neg score_fun.py:607-641."""
    if neg_head:
        d = tails.shape[1]
        t_i, t_j = _chunk2(tails)
        rel, rel_inv = _chunk2(relations)
        fwd = (rel * t_j).reshape(C, BC, d // 2)
        bwd = (rel_inv * t_i).reshape(C, BC, d // 2)
        hh = np.transpose(heads.reshape(C, K, d), (0, 2, 1))  # [C, d, K]
        h_i = hh[:, :d // 2, :]
        h_j = hh[:, d // 2:, :]
        return np.clip(0.5 * (fwd @ h_i + bwd @ h_j), -20, 20)
    d = heads.shape[1]
    h_i, h_j = _chunk2(heads)
    rel, rel_inv = _chunk2(relations)
    fwd = (h_i * rel).reshape(C, BC, d // 2)
    bwd = (rel_inv * h_j).reshape(C, BC, d // 2)
    tt = np.transpose(tails.reshape(C, K, d), (0, 2, 1))
    t_i = tt[:, :d // 2, :]
    t_j = tt[:, d // 2:, :]
    return np.clip(0.5 * (fwd @ t_j + bwd @ t_i), -20, 20)


def ref_simple_infer(h, r, t):
    """infer score_fun.py:574-581 (NO clamp on the infer path)."""
    h_i, h_j = _chunk2(h[:, None, :])
    t_i, t_j = _chunk2(t[None, None])
    rel, rel_inv = _chunk2(r[None])
    fwd = (h_i * rel)[:, :, None, :] * t_j
    bwd = (h_j * rel_inv)[:, :, None, :] * t_i
    return np.sum((fwd + bwd) * 0.5, axis=-1)


# ---------------------------------------------------------------------------
# fixtures


MODELS = ["TransE_l1", "TransE_l2", "DistMult", "ComplEx", "RESCAL",
          "RotatE", "SimplE", "TransR"]
# models whose neg kernels agree with the faithful reference in BOTH modes
AGREEING = ["TransE_l1", "TransE_l2", "DistMult", "ComplEx", "RotatE",
            "SimplE"]


def _make(model):
    double = model in ("ComplEx", "RotatE", "SimplE")
    return make_score_function(model, GAMMA, HIDDEN,
                               double_ent=double,
                               double_rel=model in ("ComplEx", "SimplE"))


def _embs(model, seed=7):
    rng = np.random.RandomState(seed)
    sf, ent_dim, rel_dim = _make(model)
    h = rng.uniform(-1, 1, (B, ent_dim))
    t = rng.uniform(-1, 1, (B, ent_dim))
    r = rng.uniform(-1, 1, (B, rel_dim))
    neg = rng.uniform(-1, 1, (C * K, ent_dim))
    proj = rng.uniform(-1, 1, (B, ent_dim * rel_dim)) \
        if model == "TransR" else None
    return sf, h, r, t, neg, proj


def _f32(*xs):
    return [jnp.asarray(x, jnp.float32) for x in xs]


TOL = dict(rtol=3e-4, atol=3e-4)
TOL_L2 = dict(rtol=2e-3, atol=5e-3)   # |a|^2+|b|^2-2ab cancellation in fp32


def _oracle_pos(model, h, r, t, proj, sf):
    if model in ("TransE_l1", "TransE_l2"):
        return ref_transe_pos(h, r, t, 1 if model.endswith("l1") else 2)
    if model == "DistMult":
        return ref_distmult_pos(h, r, t)
    if model == "ComplEx":
        return ref_complex_pos(h, r, t)
    if model == "RESCAL":
        return ref_rescal_pos(h, r, t, sf.relation_dim, sf.entity_dim)
    if model == "RotatE":
        return ref_rotate_pos(h, r, t)
    if model == "SimplE":
        return ref_simple_pos(h, r, t)
    if model == "TransR":
        de, dr = sf.entity_dim, sf.relation_dim
        hp = ref_transr_project(h, proj, de, dr)
        tp = ref_transr_project(t, proj, de, dr)
        return ref_transr_pos(hp, r, tp)
    raise AssertionError(model)


def _oracle_neg(model, heads, relations, tails, neg_head, sf):
    if model in ("TransE_l1", "TransE_l2"):
        return ref_transe_neg(heads, relations, tails, neg_head,
                              1 if model.endswith("l1") else 2)
    if model == "DistMult":
        return ref_distmult_neg(heads, relations, tails, neg_head)
    if model == "ComplEx":
        return ref_complex_neg(heads, relations, tails, neg_head)
    if model == "RotatE":
        return ref_rotate_neg(heads, relations, tails, neg_head)
    if model == "SimplE":
        return ref_simple_neg(heads, relations, tails, neg_head)
    raise AssertionError(model)


def _repo_neg(sf, model, h, r, t, neg, proj, neg_head):
    """Drive the repo's chunked kernel exactly as KEModel does."""
    if model == "TransR":
        hj, rj, tj, negj, projj = _f32(h, r, t, neg, proj)
        h_p = sf.project(hj, projj)
        t_p = sf.project(tj, projj)
        neg_p = sf.neg_project(negj, projj, C)
        side = (t_p if neg_head else h_p).reshape(C, BC, -1)
        return np.asarray(sf.neg_score(
            side, rj, neg_p, neg_head=neg_head, num_chunks=C,
            chunk_size=BC, neg_sample_size=K))
    hj, rj, tj, negj = _f32(h, r, t, neg)
    emb = tj if neg_head else hj
    return np.asarray(sf.neg_score(
        emb, rj, negj, neg_head=neg_head, num_chunks=C, chunk_size=BC,
        neg_sample_size=K))


# ---------------------------------------------------------------------------
# score-function parity


@pytest.mark.parametrize("model", MODELS)
def test_pos_score_matches_reference(model):
    sf, h, r, t, neg, proj = _embs(model)
    oracle = _oracle_pos(model, h, r, t, proj, sf)
    if model == "TransR":
        hj, rj, tj, projj = _f32(h, r, t, proj)
        got = np.asarray(sf.pos_score(sf.project(hj, projj), rj,
                                      sf.project(tj, projj)))
    else:
        hj, rj, tj = _f32(h, r, t)
        got = np.asarray(sf.pos_score(hj, rj, tj))
    np.testing.assert_allclose(got, oracle, **TOL)


@pytest.mark.parametrize("neg_head", [True, False])
@pytest.mark.parametrize("model", AGREEING)
def test_neg_score_matches_reference(model, neg_head):
    """Chunked negatives vs the faithful reference closure, both modes."""
    sf, h, r, t, neg, proj = _embs(model)
    heads, tails = (neg, t) if neg_head else (h, neg)
    oracle = _oracle_neg(model, heads, r, tails, neg_head, sf)
    got = _repo_neg(sf, model, h, r, t, neg, proj, neg_head)
    tol = TOL_L2 if model == "TransE_l2" else TOL
    np.testing.assert_allclose(got, oracle, **tol)


def test_transr_head_neg_matches_reference():
    """TransR head-corrupt agrees with the faithful reference transcription
    end-to-end (create_neg_prepare + create_neg, score_fun.py:138-153,
    206-212)."""
    sf, h, r, t, neg, proj = _embs("TransR")
    de, dr = sf.entity_dim, sf.relation_dim
    h_neg_p, t_p = ref_transr_neg_prepare(proj, neg, t, True, de, dr)
    oracle = ref_transr_neg(h_neg_p, r, t_p, True, dr)
    got = _repo_neg(sf, "TransR", h, r, t, neg, proj, True)
    np.testing.assert_allclose(got, oracle, **TOL)


def test_transr_tail_neg_deviation_pinned():
    """Deviation #1: repo == consistent |h + r - t'| variant, repo !=
    reference-faithful |h - r - t'| (score_fun.py:214-220)."""
    sf, h, r, t, neg, proj = _embs("TransR")
    de, dr = sf.entity_dim, sf.relation_dim
    h_p, t_neg_p = ref_transr_neg_prepare(proj, h, neg, False, de, dr)
    faithful = ref_transr_neg(h_p, r, t_neg_p, False, dr)
    consistent = ref_transr_neg_consistent(h_p, r, t_neg_p, False, dr)
    got = _repo_neg(sf, "TransR", h, r, t, neg, proj, False)
    np.testing.assert_allclose(got, consistent, **TOL)
    assert np.max(np.abs(got - faithful)) > 0.1, \
        "deviation documented but kernels agree with the reference bug"
    # and the documented variant really equals the reference POSITIVE formula
    # applied to the corrupted triple (edge (c,b) vs chunk-negative k, both
    # projected by edge (c,b)'s relation):
    c, b, k = 1, 2, 3
    e = c * BC + b
    pmat = proj[e].reshape(de, dr)
    h_pe = h[e] @ pmat
    t_neg = neg[c * K + k] @ pmat
    tri = ref_transr_pos(h_pe[None], r[e][None], t_neg[None])
    np.testing.assert_allclose(got[c, b, k], tri[0], **TOL)


def test_rescal_head_neg_matches_reference():
    sf, h, r, t, neg, proj = _embs("RESCAL")
    oracle = ref_rescal_neg(neg, r, t, True, sf.relation_dim, sf.entity_dim)
    got = _repo_neg(sf, "RESCAL", h, r, t, neg, proj, True)
    np.testing.assert_allclose(got, oracle, **TOL)


def test_rescal_tail_neg_deviation_pinned():
    """Deviation #2: repo == (h^T R) . t' variant, repo != reference-faithful
    (R h) . t' (score_fun.py:440-449)."""
    sf, h, r, t, neg, proj = _embs("RESCAL")
    dr, de = sf.relation_dim, sf.entity_dim
    faithful = ref_rescal_neg(h, r, neg, False, dr, de)
    consistent = ref_rescal_neg_consistent(h, r, neg, False, dr, de)
    got = _repo_neg(sf, "RESCAL", h, r, t, neg, proj, False)
    np.testing.assert_allclose(got, consistent, **TOL)
    assert np.max(np.abs(got - faithful)) > 0.1
    # the consistent variant equals the positive formula on corrupted triples:
    for k in range(3):
        tri = ref_rescal_pos(h[0:1], r[0:1], neg[k:k + 1], dr, de)
        np.testing.assert_allclose(consistent[0, 0, k], tri[0], **TOL)


@pytest.mark.parametrize("model", MODELS)
def test_infer_matches_reference(model):
    if model == "TransR":
        pytest.skip("reference TransR.infer is an empty stub "
                    "(score_fun.py:128-129); repo adds all-pairs TransR "
                    "beyond the reference")
    sf, h, r, t, _, _ = _embs(model)
    rng = np.random.RandomState(3)
    hh = h[:4]
    rr = r[:3]
    tt = t[:5]
    if model in ("TransE_l1", "TransE_l2"):
        oracle = ref_transe_infer(hh, rr, tt, 1 if model.endswith("l1") else 2)
    elif model == "DistMult":
        oracle = ref_distmult_infer(hh, rr, tt)
    elif model == "ComplEx":
        oracle = ref_complex_infer(hh, rr, tt)
    elif model == "RESCAL":
        oracle = ref_rescal_infer(hh, rr, tt, sf.relation_dim, sf.entity_dim)
    elif model == "RotatE":
        oracle = ref_rotate_infer(hh, rr, tt)
    elif model == "SimplE":
        oracle = ref_simple_infer(hh, rr, tt)
    hj, rj, tj = _f32(hh, rr, tt)
    got = np.asarray(sf.infer_score(hj, rj, tj))
    tol = TOL_L2 if model == "TransE_l2" else TOL
    np.testing.assert_allclose(got, oracle, **tol)


def test_rotate_phase_convention():
    """RotatE's phase scaling is rel / (emb_init / pi) with emb_init =
    (gamma + 2) / hidden_dim (score_fun.py:464, general_models.py ctor):
    a relation row of emb_init must rotate by exactly pi (multiply by -1)."""
    sf, _, _, _, _, _ = _embs("RotatE")
    d2 = HIDDEN
    h = np.zeros((1, 2 * d2))
    h[0, :d2] = 1.0                      # unit real vector
    r = np.full((1, d2), EMB_INIT)       # phase pi everywhere
    t = np.zeros((1, 2 * d2))
    t[0, :d2] = -1.0                     # exactly the rotated head
    hj, rj, tj = _f32(h, r, t)
    got = float(np.asarray(sf.pos_score(hj, rj, tj))[0])
    assert abs(got - GAMMA) < 1e-3       # zero distance -> score == gamma


# ---------------------------------------------------------------------------
# loss parity (pytorch/loss.py:10-98, base_loss.py:61-161)


def ref_criterion(genre, margin):
    if genre == "Hinge":
        def crit(score, label):        # loss.py:14-17
            loss = margin - label * score
            return np.where(loss < 0, 0.0, loss)
    elif genre == "Logistic":
        def crit(score, label):        # loss.py:23-24: softplus(-l*s)
            return np.logaddexp(0.0, -label * score)
    elif genre == "Logsigmoid":
        def crit(score, label):        # loss.py:37-38: -logsigmoid(l*s)
            return np.logaddexp(0.0, -label * score)
    elif genre == "BCE":
        def crit(score, label):        # loss.py:30-31
            sig = 1.0 / (1.0 + np.exp(-score))
            return -(label * np.log(sig) + (1 - label) * np.log(1 - sig))
    else:
        raise AssertionError(genre)
    return crit


def _softmax(x, axis=-1):
    e = np.exp(x - np.max(x, axis=axis, keepdims=True))
    return e / np.sum(e, axis=axis, keepdims=True)


def ref_get_total_loss(pos, neg, genre="Logsigmoid", margin=1.0,
                       adversarial=False, temperature=1.0, pairwise=False,
                       edge_weight=None, faithful_pos_weight=True):
    """LossGenerator.get_total_loss transcription (loss.py:69-98).

    faithful_pos_weight=True reproduces the reference's [B]x[B,1]->[B,B]
    positive-weight broadcast verbatim (loss.py:82); False applies the
    repo's documented per-edge weighting instead.
    """
    crit = ref_criterion(genre, margin)
    neg_label = 0.0 if genre == "BCE" else -1.0
    if edge_weight is None:
        w = 1.0
        w_pos = 1.0
    else:
        w = edge_weight.reshape(-1, 1)
        w_pos = w if faithful_pos_weight else edge_weight
    if pairwise:
        return np.mean(crit(pos[:, None] - neg, 1.0) * w)
    pos_loss = crit(pos, 1.0) * w_pos     # [B,B] when faithful & weighted!
    neg_loss = crit(neg, neg_label) * w
    if adversarial:
        neg_loss = np.sum(_softmax(neg * temperature) * neg_loss, axis=-1)
    else:
        neg_loss = np.mean(neg_loss, axis=-1)
    return (np.mean(neg_loss) + np.mean(pos_loss)) / 2


def _loss_inputs(seed=11):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-4, 4, (B,))
    neg = rng.uniform(-4, 4, (B, K))
    w = rng.uniform(0.2, 2.0, (B,))
    return pos, neg, w


@pytest.mark.parametrize("genre", ["Hinge", "Logistic", "Logsigmoid", "BCE"])
def test_loss_pointwise_matches_reference(genre):
    pos, neg, _ = _loss_inputs()
    gen = LossGenerator(loss_genre=genre, margin=2.0)
    got, _ = gen.get_total_loss(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(neg, jnp.float32))
    oracle = ref_get_total_loss(pos, neg, genre, margin=2.0)
    np.testing.assert_allclose(float(got), oracle, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("temperature", [0.5, 1.0, 2.0])
def test_loss_self_adversarial_matches_reference(temperature):
    """softmax(neg_score * T).detach() weighting (loss.py:88)."""
    pos, neg, _ = _loss_inputs()
    gen = LossGenerator(loss_genre="Logsigmoid",
                        neg_adversarial_sampling=True,
                        adversarial_temperature=temperature)
    got, _ = gen.get_total_loss(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(neg, jnp.float32))
    oracle = ref_get_total_loss(pos, neg, adversarial=True,
                                temperature=temperature)
    np.testing.assert_allclose(float(got), oracle, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("genre", ["Hinge", "Logistic"])
def test_loss_pairwise_matches_reference(genre):
    pos, neg, w = _loss_inputs()
    gen = LossGenerator(loss_genre=genre, pairwise=True, margin=1.5)
    got, _ = gen.get_total_loss(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(neg, jnp.float32),
                                jnp.asarray(w, jnp.float32))
    oracle = ref_get_total_loss(pos, neg, genre, margin=1.5, pairwise=True,
                                edge_weight=w)
    np.testing.assert_allclose(float(got), oracle, rtol=1e-5, atol=1e-5)


def test_loss_edge_weight_deviation_pinned():
    """Deviation #3: with non-uniform edge weights the repo weights each
    positive by its own edge; the reference's [B,B] broadcast degenerates
    to mean(loss)*mean(w) (loss.py:82). Both agree when weights are
    uniform."""
    pos, neg, w = _loss_inputs()
    gen = LossGenerator(loss_genre="Logsigmoid")
    got, _ = gen.get_total_loss(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(neg, jnp.float32),
                                jnp.asarray(w, jnp.float32))
    repo_oracle = ref_get_total_loss(pos, neg, edge_weight=w,
                                     faithful_pos_weight=False)
    faithful = ref_get_total_loss(pos, neg, edge_weight=w,
                                  faithful_pos_weight=True)
    np.testing.assert_allclose(float(got), repo_oracle, rtol=1e-5, atol=1e-5)
    assert abs(float(got) - faithful) > 1e-4
    # the faithful [B,B] mean really is mean(crit)*mean(w):
    crit = ref_criterion("Logsigmoid", 1.0)
    neg_part = np.mean(np.mean(crit(neg, -1.0) * w.reshape(-1, 1), -1))
    degenerate = (np.mean(crit(pos, 1.0)) * np.mean(w) + neg_part) / 2
    np.testing.assert_allclose(faithful, degenerate, rtol=1e-12)
    # uniform weights: all three agree
    ones = np.ones_like(w)
    got_u, _ = gen.get_total_loss(jnp.asarray(pos, jnp.float32),
                                  jnp.asarray(neg, jnp.float32),
                                  jnp.asarray(ones, jnp.float32))
    np.testing.assert_allclose(
        float(got_u), ref_get_total_loss(pos, neg, edge_weight=ones), 1e-5)


def test_weighted_adversarial_neg_matches_reference():
    """Edge weight composes with self-adversarial weighting on the negative
    term exactly as the reference (loss.py:83-88): weight first, softmax
    re-weighting after."""
    pos, neg, w = _loss_inputs()
    gen = LossGenerator(loss_genre="Logsigmoid",
                        neg_adversarial_sampling=True,
                        adversarial_temperature=0.7)
    _, log = gen.get_total_loss(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(neg, jnp.float32),
                                jnp.asarray(w, jnp.float32))
    crit = ref_criterion("Logsigmoid", 1.0)
    neg_loss = crit(neg, -1.0) * w.reshape(-1, 1)
    neg_loss = np.sum(_softmax(neg * 0.7) * neg_loss, axis=-1)
    np.testing.assert_allclose(float(log["neg_loss"]), np.mean(neg_loss),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# sparse Adagrad parity (tensor_models.py:304-362)


def ref_adagrad_update(emb, state_sum, idx, grad, lr):
    """ExternalEmbedding.update transcription: grad_sum = mean(grad^2, 1);
    state_sum.index_add_(0, idx, grad_sum); std gathered AFTER the full
    accumulation; emb.index_add_(0, idx, -lr*grad/(sqrt(std)+1e-10))
    (tensor_models.py:330-361). Duplicate ids accumulate in both
    index_add_ calls."""
    emb = emb.copy()
    state_sum = state_sum.copy()
    grad_sum = np.mean(grad * grad, axis=1)
    for j in range(len(idx)):                 # index_add_ :352
        state_sum[idx[j]] += grad_sum[j]
    std = np.sqrt(state_sum[idx]) + 1e-10     # gather :353-356
    tmp = -lr * grad / std[:, None]
    for j in range(len(idx)):                 # index_add_ :361
        emb[idx[j]] += tmp[j]
    return emb, state_sum


@pytest.mark.parametrize("dup", [False, True])
def test_sparse_adagrad_matches_reference(dup):
    rng = np.random.RandomState(5)
    n_rows, dim, n = 50, 12, 16
    emb = rng.uniform(-1, 1, (n_rows, dim)).astype(np.float32)
    state = rng.uniform(0, 0.5, (n_rows,)).astype(np.float32)
    if dup:
        idx = rng.randint(0, 8, (n,))         # heavy duplication
    else:
        idx = rng.permutation(n_rows)[:n]
    grad = rng.normal(0, 1, (n, dim)).astype(np.float32)
    lr = 0.17

    oracle_emb, oracle_state = ref_adagrad_update(
        emb.astype(np.float64), state.astype(np.float64), idx,
        grad.astype(np.float64), lr)

    table = EmbeddingState(emb=jnp.asarray(emb), state_sum=jnp.asarray(state))
    out = sparse_adagrad_update(table, jnp.asarray(idx, jnp.int32),
                                jnp.asarray(grad), lr)
    np.testing.assert_allclose(np.asarray(out.state_sum), oracle_state,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.emb), oracle_emb,
                               rtol=1e-5, atol=1e-6)


def test_adagrad_multi_step_sequence():
    """Three consecutive batches (overlapping rows) stay allclose to the
    reference loop — guards the state-accumulation ordering across steps."""
    rng = np.random.RandomState(9)
    n_rows, dim, n = 30, 6, 10
    emb = rng.uniform(-1, 1, (n_rows, dim)).astype(np.float32)
    state = np.zeros((n_rows,), np.float32)
    o_emb, o_state = emb.astype(np.float64), state.astype(np.float64)
    table = EmbeddingState(emb=jnp.asarray(emb), state_sum=jnp.asarray(state))
    for step in range(3):
        idx = rng.randint(0, n_rows, (n,))
        grad = rng.normal(0, 1, (n, dim)).astype(np.float32)
        o_emb, o_state = ref_adagrad_update(o_emb, o_state, idx,
                                            grad.astype(np.float64), 0.1)
        table = sparse_adagrad_update(table, jnp.asarray(idx, jnp.int32),
                                      jnp.asarray(grad), 0.1)
    np.testing.assert_allclose(np.asarray(table.emb), o_emb,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(table.state_sum), o_state,
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# ranking / metric parity (general_models.py:436-485)


def ref_ranking(pos_scores, neg_scores, mask):
    """forward_test transcription: rank_i = sum over the mask of
    (neg >= pos) + 1; metrics per edge (general_models.py:473-485)."""
    logs = []
    for i in range(len(pos_scores)):
        ranking = np.sum((neg_scores[i] >= pos_scores[i]) & mask[i]) + 1
        logs.append({
            "MRR": 1.0 / ranking,
            "MR": float(ranking),
            "HITS@1": 1.0 if ranking <= 1 else 0.0,
            "HITS@3": 1.0 if ranking <= 3 else 0.0,
            "HITS@10": 1.0 if ranking <= 10 else 0.0,
        })
    return logs


@pytest.mark.parametrize("model,neg_head", [
    ("DistMult", False), ("DistMult", True),
    ("TransE_l2", False), ("RotatE", True),
])
def test_eval_ranks_matches_reference_ranking(model, neg_head):
    """End-to-end: KEModel.eval_ranks against a from-scratch oracle that
    scores every entity with the reference pos formula and ranks with the
    reference's masked counting. Filter semantics: candidates whose triple
    exists (incl. the true entity) are excluded, exactly the bias != -1
    mask of general_models.py:463-478."""
    n_ent, n_rel, bsz = 40, 3, 10
    dim = HIDDEN
    double = model in ("RotatE",)
    cfg = KGEConfig(model_name=model, hidden_dim=dim, gamma=GAMMA,
                    double_ent=double)
    mdl = KEModel(cfg, n_ent, n_rel)
    state = mdl.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(21)
    h = rng.randint(0, n_ent, (bsz,))
    r = rng.randint(0, n_rel, (bsz,))
    t = rng.randint(0, n_ent, (bsz,))
    # filter list: a few random entities + the true one (mirrors the false-
    # negative bias of EvalSampler, sampler.py:563-591).  Ids are UNIQUE per
    # row, matching the FilterIndex contract (eval_ranks subtracts one count
    # per filter entry, so duplicates would double-subtract).
    F = 5
    true_ent = h if neg_head else t
    filter_ids = np.zeros((bsz, F), np.int64)
    for i in range(bsz):
        others = rng.choice(
            np.setdiff1d(np.arange(n_ent), [true_ent[i]]), F - 1,
            replace=False)
        filter_ids[i] = np.concatenate([[true_ent[i]], others])
    filter_mask = np.ones((bsz, F), np.uint8)
    filter_mask[:, -1] = 0                    # one pad slot per row

    ranks = np.asarray(mdl.eval_ranks(
        state, jnp.asarray(h), jnp.asarray(r), jnp.asarray(t),
        jnp.asarray(filter_ids), jnp.asarray(filter_mask),
        neg_head=neg_head, block=16))

    ent = np.asarray(state.entity.emb)[:n_ent, :mdl.entity_dim] \
        .astype(np.float64)
    rel = np.asarray(state.relation.emb)[:n_rel, :mdl.relation_dim] \
        .astype(np.float64)

    def pos_fn(hh, rr, tt):
        if model == "DistMult":
            return ref_distmult_pos(hh, rr, tt)
        if model == "TransE_l2":
            return ref_transe_pos(hh, rr, tt, 2)
        if model == "RotatE":
            return ref_rotate_pos(hh, rr, tt)
        raise AssertionError(model)

    pos = pos_fn(ent[h], rel[r], ent[t])
    cands = np.arange(n_ent)
    neg_scores = np.zeros((bsz, n_ent))
    for i in range(bsz):
        if neg_head:
            neg_scores[i] = pos_fn(ent[cands], np.tile(rel[r[i]], (n_ent, 1)),
                                   np.tile(ent[t[i]], (n_ent, 1)))
        else:
            neg_scores[i] = pos_fn(np.tile(ent[h[i]], (n_ent, 1)),
                                   np.tile(rel[r[i]], (n_ent, 1)), ent[cands])
    mask = np.ones((bsz, n_ent), bool)
    for i in range(bsz):
        for f in range(F):
            if filter_mask[i, f]:
                mask[i, filter_ids[i, f]] = False
    logs = ref_ranking(pos, neg_scores, mask)
    oracle_ranks = np.array([l["MR"] for l in logs])
    np.testing.assert_array_equal(ranks, oracle_ranks)
    # and the derived metrics agree with the reference's per-edge dicts
    mrr = np.mean([l["MRR"] for l in logs])
    np.testing.assert_allclose(np.mean(1.0 / ranks), mrr, rtol=1e-12)


def test_embedding_init_matches_reference_range():
    """ExternalEmbedding.init: uniform(-emb_init, emb_init) with emb_init =
    (gamma + 2) / hidden_dim, zero Adagrad state (tensor_models.py:240-248)."""
    from dglke_tpu.ops.embedding import init_embedding
    table = init_embedding(jax.random.PRNGKey(1), 200, HIDDEN, EMB_INIT)
    emb = np.asarray(table.emb)[:, :HIDDEN]
    assert emb.min() >= -EMB_INIT and emb.max() <= EMB_INIT
    # fills the range (not degenerate)
    assert emb.max() > 0.8 * EMB_INIT and emb.min() < -0.8 * EMB_INIT
    assert np.all(np.asarray(table.state_sum) == 0.0)


# ---------------------------------------------------------------------------
# sampled-negative eval parity (--neg_sample_size_eval protocol:
# sampler.py:563-591 false_neg bias + general_models.py:436-478 masked rank)


@pytest.mark.parametrize("neg_head", [False, True])
def test_sampled_eval_matches_reference_transcription(neg_head):
    """The sampled-negative eval against a from-scratch oracle: the
    reference's EdgeSampler marks candidate j false-negative for row i
    when the corrupted triple EXISTS in the full graph — including the
    row's own answer drawn among the candidates — sets bias = -1 there
    (sampler.py:586-591), and forward_test counts neg >= pos only where
    bias != -1 (general_models.py:463-478).  The oracle recomputes the
    mask with a python set (independent of FilterIndex's searchsorted)
    and the scores with the float64 TransE_l2 formula."""
    from dglke_tpu.data.dataset import KGDataset
    from dglke_tpu.data.sampler import FilterIndex

    n_ent, n_rel, bsz, k = 30, 3, 8, 12
    rng = np.random.RandomState(4)
    h = rng.randint(0, n_ent, 60)
    r = rng.randint(0, n_rel, 60)
    t = rng.randint(0, n_ent, 60)
    ds = KGDataset(name="x", n_entities=n_ent, n_relations=n_rel,
                   train=(h[:40].astype(np.int64), r[:40].astype(np.int64),
                          t[:40].astype(np.int64)),
                   test=(h[40:48].astype(np.int64),
                         r[40:48].astype(np.int64),
                         t[40:48].astype(np.int64)))
    fi = FilterIndex(ds)
    triples = set(zip(h.tolist(), r.tolist(), t.tolist()))
    qh, qr, qt = (np.asarray(x, np.int32) for x in ds.test[:3])
    # engineered candidates: each row's own answer appears (cols 0..B-1 are
    # the batch's answers), guaranteeing own-answer collisions; the rest
    # uniform
    own = (qh if neg_head else qt).astype(np.int32)
    neg = np.concatenate([own[: k // 2],
                          rng.randint(0, n_ent, k - k // 2)]).astype(np.int32)

    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=HIDDEN, gamma=GAMMA)
    model = KEModel(cfg, n_ent, n_rel)
    state = model.init_state(jax.random.PRNGKey(5))
    keep = fi.false_neg_mask("head" if neg_head else "tail", qh, qr, qt, neg)
    got = np.asarray(model.eval_ranks_sampled(
        state, jnp.asarray(qh), jnp.asarray(qr), jnp.asarray(qt),
        jnp.asarray(neg), jnp.asarray(keep), neg_head=neg_head))

    # oracle in float64 with set-membership bias
    ent = np.asarray(state.entity.emb, np.float64)[:, :HIDDEN]
    rel = np.asarray(state.relation.emb, np.float64)

    def score(hh, rr, tt):
        return GAMMA - np.sqrt(
            np.sum((ent[hh] + rel[rr] - ent[tt]) ** 2, axis=-1) + 1e-30)

    for i in range(bsz):
        pos = score(qh[i], qr[i], qt[i])
        if neg_head:
            s = score(neg, np.full(k, qr[i]), np.full(k, qt[i]))
            bias = np.array([-1.0 if (int(c), int(qr[i]), int(qt[i]))
                             in triples else 0.0 for c in neg])
        else:
            s = score(np.full(k, qh[i]), np.full(k, qr[i]), neg)
            bias = np.array([-1.0 if (int(qh[i]), int(qr[i]), int(c))
                             in triples else 0.0 for c in neg])
        mask = bias != -1.0
        # the row's own answer must actually occur among the candidates
        # for at least the first half of rows (engineered above)
        if i < k // 2:
            assert not mask[i], "engineered own-answer collision missing"
        want = np.sum((s >= pos) & mask) + 1
        assert got[i] == want, (i, got[i], want)
