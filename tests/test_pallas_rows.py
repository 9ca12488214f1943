"""Pallas row gather / scatter-add kernels vs XLA reference (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dglke_tpu.ops.pallas.rows import (  # noqa: E402
    gather_rows, scatter_add_rows, window_conflicts)


def _rng(seed):
    return np.random.default_rng(seed)


def test_gather_rows_matches_take():
    r = _rng(0)
    table = r.normal(size=(500, 64)).astype(np.float32)
    ids = r.integers(0, 500, size=200).astype(np.int32)
    out = gather_rows(jnp.asarray(table), jnp.asarray(ids), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), table[ids])


def test_gather_rows_short_batch():
    """n < ring depth exercises the warmup bound."""
    r = _rng(1)
    table = r.normal(size=(40, 128)).astype(np.float32)
    ids = r.integers(0, 40, size=5).astype(np.int32)
    out = gather_rows(jnp.asarray(table), jnp.asarray(ids), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), table[ids])


def test_window_conflicts():
    ids = jnp.asarray(np.array([3, 5, 3, 7, 7, 9], np.int32))
    c = np.asarray(window_conflicts(ids, window=2))
    # 3 at pos 2 conflicts with pos 0 (distance 2); 7 at pos 4 with pos 3.
    np.testing.assert_array_equal(c, [0, 0, 1, 0, 1, 0])
    c32 = np.asarray(window_conflicts(ids))
    np.testing.assert_array_equal(c32, [0, 0, 1, 0, 1, 0])


def test_scatter_add_no_duplicates():
    r = _rng(2)
    table = r.normal(size=(300, 64)).astype(np.float32)
    ids = r.permutation(300)[:100].astype(np.int32)
    delta = r.normal(size=(100, 64)).astype(np.float32)
    want = table.copy()
    np.add.at(want, ids, delta)
    got = scatter_add_rows(jnp.asarray(table), jnp.asarray(ids),
                           jnp.asarray(delta), interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_scatter_add_heavy_duplicates():
    """Many in-window duplicates: the conflict/drain path must accumulate
    exactly like np.add.at."""
    r = _rng(3)
    table = r.normal(size=(10, 32)).astype(np.float32)
    ids = r.integers(0, 10, size=200).astype(np.int32)   # guaranteed dups
    delta = r.normal(size=(200, 32)).astype(np.float32)
    want = table.copy()
    np.add.at(want, ids, delta)
    got = scatter_add_rows(jnp.asarray(table), jnp.asarray(ids),
                           jnp.asarray(delta), interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_scatter_add_adjacent_duplicates():
    """Back-to-back duplicate ids (distance 1) — the tightest race."""
    table = np.zeros((4, 32), np.float32)
    ids = np.array([2, 2, 2, 1, 1, 2], np.int32)
    delta = np.arange(6 * 32, dtype=np.float32).reshape(6, 32)
    want = table.copy()
    np.add.at(want, ids, delta)
    got = scatter_add_rows(jnp.asarray(table), jnp.asarray(ids),
                           jnp.asarray(delta), interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
