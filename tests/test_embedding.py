"""Sparse Adagrad parity tests.

The reference applies per-occurrence index_add_ updates where std is read
after full state accumulation (tensor_models.py:304-362); our segment-dedup
kernel must match a literal numpy transcription of that algorithm exactly,
including duplicate ids.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dglke_tpu.ops.embedding import (
    init_embedding, segment_dedup, sparse_adagrad_update)


def reference_adagrad(emb, state_sum, ids, grads, lr):
    """Literal numpy version of the reference's ExternalEmbedding.update."""
    emb = emb.copy()
    state_sum = state_sum.copy()
    grad_sum = (grads * grads).mean(axis=1)
    np.add.at(state_sum, ids, grad_sum)
    std = np.sqrt(state_sum[ids]) + 1e-10
    tmp = -lr * grads / std[:, None]
    np.add.at(emb, ids, tmp)
    return emb, state_sum


def test_segment_dedup_sums_duplicates():
    ids = jnp.asarray(np.array([3, 1, 3, 3, 7, 1], np.int32))
    grads = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    uids, ugrads, usq = segment_dedup(ids, grads)
    uids, ugrads, usq = map(np.asarray, (uids, ugrads, usq))
    got = {}
    for i, u in enumerate(uids):
        if ugrads[i].any() or usq[i]:
            got.setdefault(int(u), np.zeros(2))
            got[int(u)] += ugrads[i]
    want = {}
    g = np.asarray(grads)
    for i, u in enumerate(np.asarray(ids)):
        want.setdefault(int(u), np.zeros(2))
        want[int(u)] += g[i]
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)


def test_adagrad_matches_reference_with_duplicates():
    rng = np.random.RandomState(0)
    num, dim, n = 50, 16, 40
    emb = rng.randn(num, dim).astype(np.float32)
    state = np.abs(rng.randn(num)).astype(np.float32)
    ids = rng.randint(0, num, n).astype(np.int32)
    grads = rng.randn(n, dim).astype(np.float32)
    lr = 0.1

    want_emb, want_state = reference_adagrad(emb, state, ids, grads, lr)

    from dglke_tpu.ops.embedding import EmbeddingState
    table = EmbeddingState(emb=jnp.asarray(emb), state_sum=jnp.asarray(state))
    out = sparse_adagrad_update(table, jnp.asarray(ids), jnp.asarray(grads),
                                lr)
    np.testing.assert_allclose(np.asarray(out.state_sum), want_state,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.emb), want_emb,
                               rtol=1e-4, atol=1e-5)


def test_adagrad_under_jit_and_grad_flow():
    """The update must be jittable and leave untouched rows bit-identical."""
    num, dim = 32, 8
    key = jax.random.PRNGKey(0)
    table = init_embedding(key, num, dim, 0.5)
    ids = jnp.asarray([1, 5, 5], jnp.int32)
    grads = jnp.ones((3, dim), jnp.float32)
    fn = jax.jit(lambda t, i, g: sparse_adagrad_update(t, i, g, 0.1))
    out = fn(table, ids, grads)
    touched = {0: False}
    before, after = np.asarray(table.emb), np.asarray(out.emb)
    for row in range(num):
        if row in (1, 5):
            assert not np.allclose(before[row], after[row])
        else:
            np.testing.assert_array_equal(before[row], after[row])


def test_init_embedding_range():
    key = jax.random.PRNGKey(42)
    table = init_embedding(key, 100, 10, 0.25)
    e = np.asarray(table.emb)
    assert e.min() >= -0.25 and e.max() <= 0.25
    assert np.asarray(table.state_sum).sum() == 0.0
