"""Score-function consistency tests.

Mirrors the reference's core algebraic cross-check
(/root/reference/python/dglke/tests/test_score.py): the chunked negative
kernel must produce the same score as the naive positive-score formula
applied to each (pos, neg) pair — for BOTH head- and tail-corrupt modes
(the reference only tests chunk-head).  Also checks `infer` (all-pairs
broadcast) against pos_score (mirrors test_infer.py).

The naive side is computed with broadcast `pos_score` (elementwise formula),
which is an independent code path from the chunked matmul-form kernels.
TransE_l2 tolerance is looser: the MXU-friendly |a|^2+|b|^2-2ab expansion
(same trick as the reference's baddbmm, score_fun.py:26-34) cancels a few
digits vs the direct difference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dglke_tpu.models.score_functions import make_score_function

MODELS = ["TransE_l1", "TransE_l2", "DistMult", "ComplEx", "RESCAL",
          "RotatE", "SimplE", "TransR"]

HIDDEN = 8
GAMMA = 12.0
NUM_CHUNKS = 3
CHUNK_SIZE = 5
NEG = 7
B = NUM_CHUNKS * CHUNK_SIZE


def _make(model):
    double = model in ("ComplEx", "RotatE", "SimplE")
    return make_score_function(model, GAMMA, HIDDEN,
                               double_ent=double,
                               double_rel=model in ("ComplEx", "SimplE"))


def _rand_embs(model, seed=0):
    rng = np.random.RandomState(seed)
    sf, ent_dim, rel_dim = _make(model)
    h = rng.uniform(-1, 1, (B, ent_dim)).astype(np.float32)
    t = rng.uniform(-1, 1, (B, ent_dim)).astype(np.float32)
    r = rng.uniform(-1, 1, (B, rel_dim)).astype(np.float32)
    neg = rng.uniform(-1, 1, (NUM_CHUNKS * NEG, ent_dim)).astype(np.float32)
    proj = rng.uniform(-1, 1, (B, ent_dim * rel_dim)).astype(np.float32) \
        if model == "TransR" else None
    return sf, h, r, t, neg, proj


def _tol(model):
    return dict(rtol=1e-3, atol=5e-3) if model == "TransE_l2" \
        else dict(rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("model", MODELS)
@pytest.mark.parametrize("neg_head", [True, False])
def test_chunked_neg_matches_naive_pos(model, neg_head):
    """neg_score[c, i, j] == pos_score(neg_j, r_i, t_i) (head corrupt)
    or pos_score(h_i, r_i, neg_j) (tail corrupt), broadcast-vectorized."""
    sf, h, r, t, neg, proj = _rand_embs(model)

    if model == "TransR":
        h_p = sf.project(jnp.asarray(h), jnp.asarray(proj))
        t_p = sf.project(jnp.asarray(t), jnp.asarray(proj))
        neg_p = sf.neg_project(jnp.asarray(neg), jnp.asarray(proj),
                               NUM_CHUNKS)                  # [C, Bc, K, Dr]
        side = (t_p if neg_head else h_p).reshape(NUM_CHUNKS, CHUNK_SIZE, -1)
        chunked = np.asarray(sf.neg_score(
            side, jnp.asarray(r), neg_p, neg_head=neg_head,
            num_chunks=NUM_CHUNKS, chunk_size=CHUNK_SIZE,
            neg_sample_size=NEG))
        r4 = jnp.asarray(r).reshape(NUM_CHUNKS, CHUNK_SIZE, 1, -1)
        hp4 = h_p.reshape(NUM_CHUNKS, CHUNK_SIZE, 1, -1)
        tp4 = t_p.reshape(NUM_CHUNKS, CHUNK_SIZE, 1, -1)
        if neg_head:
            naive = np.asarray(sf.pos_score(neg_p, r4, tp4))
        else:
            naive = np.asarray(sf.pos_score(hp4, r4, neg_p))
        np.testing.assert_allclose(chunked, naive, **_tol(model))
        return

    side = t if neg_head else h
    chunked = np.asarray(sf.neg_score(
        jnp.asarray(side), jnp.asarray(r), jnp.asarray(neg),
        neg_head=neg_head, num_chunks=NUM_CHUNKS, chunk_size=CHUNK_SIZE,
        neg_sample_size=NEG))
    assert chunked.shape == (NUM_CHUNKS, CHUNK_SIZE, NEG)

    # broadcast naive: [C, Bc, K, D] operand layout
    neg4 = jnp.asarray(neg.reshape(NUM_CHUNKS, 1, NEG, -1))
    h4 = jnp.asarray(h.reshape(NUM_CHUNKS, CHUNK_SIZE, 1, -1))
    t4 = jnp.asarray(t.reshape(NUM_CHUNKS, CHUNK_SIZE, 1, -1))
    r4 = jnp.asarray(r.reshape(NUM_CHUNKS, CHUNK_SIZE, 1, -1))
    if neg_head:
        naive = np.asarray(sf.pos_score(neg4, r4, t4))
    else:
        naive = np.asarray(sf.pos_score(h4, r4, neg4))
    np.testing.assert_allclose(chunked, naive, **_tol(model))


@pytest.mark.parametrize("model", [m for m in MODELS if m != "TransR"])
def test_infer_matches_pos(model):
    sf, h, r, t, _, _ = _rand_embs(model, seed=1)
    H, R, T = 4, 3, 5
    hh, rr, tt = h[:H], r[:R], t[:T]
    allp = np.asarray(sf.infer_score(jnp.asarray(hh), jnp.asarray(rr),
                                     jnp.asarray(tt)))
    assert allp.shape == (H, R, T)
    naive = np.asarray(sf.pos_score(
        jnp.asarray(hh.reshape(H, 1, 1, -1)),
        jnp.asarray(rr.reshape(1, R, 1, -1)),
        jnp.asarray(tt.reshape(1, 1, T, -1))))
    if model == "SimplE":
        # SimplE pos clamps to [-20, 20]; infer does not (reference parity) —
        # values here are within range so both agree.
        pass
    np.testing.assert_allclose(allp, naive, **_tol(model))


@pytest.mark.parametrize("model", MODELS)
def test_pos_score_batch_shape(model):
    sf, h, r, t, _, proj = _rand_embs(model, seed=2)
    if model == "TransR":
        h = np.asarray(sf.project(jnp.asarray(h), jnp.asarray(proj)))
        t = np.asarray(sf.project(jnp.asarray(t), jnp.asarray(proj)))
    s = sf.pos_score(jnp.asarray(h), jnp.asarray(r), jnp.asarray(t))
    assert s.shape == (B,)
    assert np.isfinite(np.asarray(s)).all()


def test_transr_allpairs_tiling_invariant():
    """transr_allpairs_score is tile-size invariant: many small relation
    tiles (budget forces Rt=1) give bit-identical scores to one big tile,
    and match a per-relation numpy loop."""
    import numpy as np
    from dglke_tpu.models.score_functions import transr_allpairs_score
    rng = np.random.RandomState(0)
    hn, tn, rn, de, dr = 5, 6, 7, 4, 3
    h = rng.randn(hn, de).astype(np.float32)
    t = rng.randn(tn, de).astype(np.float32)
    r = rng.randn(rn, dr).astype(np.float32)
    proj = rng.randn(rn, de * dr).astype(np.float32)
    big = transr_allpairs_score(h, t, proj, r, 5.0, de, dr)
    small = transr_allpairs_score(h, t, proj, r, 5.0, de, dr, budget=1)
    assert big.shape == (hn, rn, tn)
    # tile size changes the einsum contraction grouping -> ulp-level only
    np.testing.assert_allclose(big, small, rtol=1e-5, atol=1e-5)
    # numpy brute force
    want = np.empty((hn, rn, tn), np.float32)
    for j in range(rn):
        p = proj[j].reshape(de, dr)
        hp, tp = h @ p, t @ p
        want[:, j, :] = 5.0 - np.abs(
            hp[:, None, :] + r[j][None, None, :] - tp[None, :, :]).sum(-1)
    np.testing.assert_allclose(big, want, rtol=2e-5, atol=2e-5)
