"""Wide-row relation write-back: dense one-hot vs column-chunked scatter.

The RESCAL/TransR relation tables have very wide rows (RESCAL dim 200 ->
40,000 floats/row).  XLA's scatter-add collapses on >= 4096-wide rows
(11.5 ms for 1000 x 40000 on a v5e), so sparse_adagrad_update routes
them through a dense one-hot matmul (~107 GFLOP at the RESCAL shape =
MXU time + a full-table add).  Hypotheses probed here:

  1. the scatter collapse is a function of ROW WIDTH, so scattering the
     same update as W/chunk column slices of narrow rows may run at HBM
     bandwidth and beat the dense matmul (touched rows only, no
     full-table add);
  2. the dense arm's DEFAULT-precision matmul rounds deltas to bf16 on
     TPU (the scatter arm is exact f32) — a hi + lo split restores ~f32
     fidelity at 2x the matmul cost; is that affordable at both the wide
     (RESCAL) and the narrow headline relation shape?

Usage:  python tools/diag_widerow.py   (repo root, on TPU)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S = 64
N = 1000


def timed(name, step, tab0, consts):
    from tools._timing import fetch_timed

    @jax.jit
    def loop(tab):
        def body(c, _):
            return step(c, *consts), ()
        c, _ = lax.scan(body, tab, None, length=S)
        return c

    tab = tab0

    def run():
        nonlocal tab
        tab = loop(tab)
        float(tab[0, 0])

    dt = fetch_timed(run, S)
    print(f"  {name:42s} {dt * 1e6:9.1f} us", flush=True)


def variants(e, w):
    def dense(tab, ids, delta):
        onehot = (ids[None, :] == jnp.arange(e)[:, None]).astype(delta.dtype)
        return tab + jnp.einsum("en,nd->ed", onehot, delta,
                                preferred_element_type=tab.dtype)

    def dense_hilo(tab, ids, delta):
        # exactness variant: DEFAULT-precision TPU matmul rounds delta to
        # bf16; splitting delta = hi + lo (hi exactly representable in
        # bf16) recovers ~f32 fidelity at 2x the matmul cost.  The one-hot
        # side is 0/1 — exact in bf16 either way.
        onehot = (ids[None, :] == jnp.arange(e)[:, None]).astype(delta.dtype)
        hi = delta.astype(jnp.bfloat16).astype(jnp.float32)
        lo = delta - hi
        acc = (jnp.einsum("en,nd->ed", onehot, hi,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("en,nd->ed", onehot, lo,
                            preferred_element_type=jnp.float32))
        return tab + acc

    def plain_scatter(tab, ids, delta):
        return tab.at[ids].add(delta)

    def chunked_scatter(chunk):
        # in-place column-range scatters: no concat/rebuild of the table
        def f(tab, ids, delta):
            for j in range(0, w, chunk):
                tab = tab.at[ids, j:j + chunk].add(delta[:, j:j + chunk])
            return tab
        return f

    return dense, dense_hilo, plain_scatter, chunked_scatter


def main():
    print(f"device={jax.devices()[0].platform}  N={N} S={S}")
    rng = np.random.RandomState(0)

    e, w = 1345, 40000
    print(f"RESCAL relation shape E={e} W={w}")
    ids = jnp.asarray(rng.randint(0, e, N), jnp.int32)
    delta = jnp.asarray(rng.randn(N, w), jnp.float32)
    tab0 = jnp.zeros((e, w), jnp.float32)
    dense, dense_hilo, plain_scatter, chunked_scatter = variants(e, w)
    timed("dense one-hot matmul + table add", dense, tab0, (ids, delta))
    timed("dense hi/lo (f32-exact) + table add", dense_hilo, tab0,
          (ids, delta))
    for chunk in (2048, 4000, 8000):
        timed(f"column-chunked scatter ({chunk})",
              chunked_scatter(chunk), tab0, (ids, delta))
    timed("plain wide scatter (known collapse)", plain_scatter, tab0,
          (ids, delta))

    e, w = 1345, 400
    print(f"headline relation shape E={e} W={w}")
    ids = jnp.asarray(rng.randint(0, e, N), jnp.int32)
    delta = jnp.asarray(rng.randn(N, w), jnp.float32)
    tab0 = jnp.zeros((e, w), jnp.float32)
    dense, dense_hilo, plain_scatter, _ = variants(e, w)
    timed("dense one-hot (default prec)", dense, tab0, (ids, delta))
    timed("dense hi/lo (f32-exact)", dense_hilo, tab0, (ids, delta))
    timed("scatter-add", plain_scatter, tab0, (ids, delta))


if __name__ == "__main__":
    main()
