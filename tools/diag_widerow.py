"""Wide-row relation write-back: dense one-hot vs column-chunked scatter.

The RESCAL/TransR relation tables have very wide rows (RESCAL dim 200 ->
40,000 floats/row).  XLA's scatter-add collapses on >= 4096-wide rows
(11.5 ms for 1000 x 40000 on a v5e), so sparse_adagrad_update routes
them through a dense one-hot matmul (~107 GFLOP at the RESCAL shape =
MXU time + a full-table add).  Hypothesis: the collapse is a function of
ROW WIDTH, so scattering the same update as W/4000 column slices of
4000-wide rows may run at HBM bandwidth and beat the dense matmul —
writing only touched rows instead of the whole table.

Usage:  python tools/diag_widerow.py   (repo root, on TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S = 64
OVERHEAD_S = 0.040
E, W, N = 1345, 40000, 1000


def timed(name, step, tab0, consts):
    @jax.jit
    def loop(tab):
        def body(c, _):
            return step(c, *consts), ()
        c, _ = lax.scan(body, tab, None, length=S)
        return c

    tab = loop(tab0)
    float(tab[0, 0])
    t0 = time.time()
    tab = loop(tab)
    float(tab[0, 0])
    dt = (time.time() - t0 - OVERHEAD_S) / S
    print(f"  {name:40s} {dt * 1e6:9.1f} us", flush=True)


def main():
    print(f"device={jax.devices()[0].platform}  E={E} W={W} N={N} S={S}")
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, E, N), jnp.int32)
    delta = jnp.asarray(rng.randn(N, W), jnp.float32)
    tab0 = jnp.zeros((E, W), jnp.float32)

    def dense(tab, ids, delta):
        onehot = (ids[None, :] == jnp.arange(E)[:, None]).astype(delta.dtype)
        return tab + jnp.einsum("en,nd->ed", onehot, delta,
                                preferred_element_type=tab.dtype)

    def plain_scatter(tab, ids, delta):
        return tab.at[ids].add(delta)

    def chunked_scatter(chunk):
        # in-place column-range scatters: no concat/rebuild of the table
        def f(tab, ids, delta):
            for j in range(0, W, chunk):
                tab = tab.at[ids, j:j + chunk].add(delta[:, j:j + chunk])
            return tab
        return f

    timed("dense one-hot matmul + table add", dense, tab0, (ids, delta))
    for chunk in (2048, 4000, 8000):
        timed(f"column-chunked scatter ({chunk})",
              chunked_scatter(chunk), tab0, (ids, delta))
    timed("plain wide scatter (known collapse)", plain_scatter, tab0,
          (ids, delta))


if __name__ == "__main__":
    main()
