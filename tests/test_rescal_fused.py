"""Fused RESCAL relation path (DGLKE_TPU_RESCAL_FUSED=1): the factored
rank-1 relation gradients + the Pallas outer-product Adagrad kernel must
reproduce the stock autodiff + sparse_adagrad_update step exactly (to
fp32 rounding), including duplicate relation ids, both corruption
directions, and the norm-3 regularization whose relation-row gradient is
applied in-kernel."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.ops.embedding import EmbeddingState, sparse_adagrad_update
from dglke_tpu.ops.pallas.outer_update import outer_adagrad_update


def test_outer_adagrad_update_matches_materialized():
    """Kernel semantics vs sparse_adagrad_update on the explicitly
    materialized outer-product + regularization gradient."""
    rng = np.random.RandomState(0)
    e, da, db, n = 17, 8, 12, 25
    emb = rng.randn(e, da * db).astype(np.float32)
    ss = np.abs(rng.randn(e)).astype(np.float32)
    ids = rng.randint(0, e, n).astype(np.int32)    # duplicates guaranteed
    a = rng.randn(n, da).astype(np.float32)
    bv = rng.randn(n, db).astype(np.float32)
    lr, coef, p = 0.3, 2e-3, 3

    g = np.einsum("bi,bj->bij", a, bv).reshape(n, -1)
    rows = emb[ids]
    g_ref = g + coef * p * np.abs(rows) ** (p - 1) * np.sign(rows)
    want = sparse_adagrad_update(
        EmbeddingState(emb=jnp.array(emb), state_sum=jnp.array(ss)),
        jnp.array(ids), jnp.array(g_ref), lr)
    got = outer_adagrad_update(
        EmbeddingState(emb=jnp.array(emb), state_sum=jnp.array(ss)),
        jnp.array(ids), jnp.array(a), jnp.array(bv), lr,
        reg_coef=coef, reg_norm=p, interpret=True)
    np.testing.assert_allclose(got.state_sum, want.state_sum, atol=1e-6)
    np.testing.assert_allclose(got.emb, want.emb, atol=1e-6)
    untouched = np.setdiff1d(np.arange(e), ids)
    np.testing.assert_array_equal(np.asarray(got.emb)[untouched],
                                  emb[untouched])


@pytest.mark.parametrize("neg_head", [True, False])
def test_fused_step_matches_stock(monkeypatch, neg_head):
    cfg = KGEConfig(model_name="RESCAL", hidden_dim=16, gamma=6.0, lr=0.1,
                    batch_size=32, neg_sample_size=8,
                    regularization_coef=2e-6, regularization_norm=3,
                    neg_adversarial_sampling=True)
    model = KEModel(cfg, 50, 7)
    state0 = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    h = rng.randint(0, 50, 32).astype(np.int32)
    r = rng.randint(0, 7, 32).astype(np.int32)     # heavy duplication
    t = rng.randint(0, 50, 32).astype(np.int32)
    neg = rng.randint(0, 50, 4 * 8).astype(np.int32)

    monkeypatch.delenv("DGLKE_TPU_RESCAL_FUSED", raising=False)
    st0, log0 = model.train_step(state0, h, r, t, neg, None,
                                 neg_head=neg_head)
    monkeypatch.setenv("DGLKE_TPU_RESCAL_FUSED", "1")
    st1, log1 = model.train_step(state0, h, r, t, neg, None,
                                 neg_head=neg_head)
    for leaf0, leaf1 in zip(jax.tree.leaves(st0), jax.tree.leaves(st1)):
        np.testing.assert_allclose(np.asarray(leaf0), np.asarray(leaf1),
                                   atol=5e-6)
    for k in log0:
        assert abs(float(log0[k]) - float(log1[k])) \
            < 1e-5 * (1 + abs(float(log0[k]))), (k, log0[k], log1[k])
