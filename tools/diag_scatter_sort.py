"""Does sorting ids before the Adagrad scatter-add help HBM locality?

The headline step's biggest single kernel is the entity scatter-add
(~112 us for 4000 random x 400-f32 rows — 142 GB/s vs the gather's
231 GB/s).  Random row order means random 1600-byte segments; sorting
the batch ids first (argsort [4000] + one extra pass over the rows)
makes the writes near-sequential and lets XLA take the
indices_are_sorted path.  Scatter-add is order-independent (addition
commutes; only fp summation order of duplicate ids changes), so this is
a legal drop-in if it wins.

Usage:  python tools/diag_scatter_sort.py   (repo root, on TPU)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S = 512
E, D, N = 14951, 400, 4000


def bench(tag, step):
    from tools._timing import fetch_timed

    @jax.jit
    def loop(tab):
        def body(c, i):
            return step(c, i), ()
        c, _ = lax.scan(body, tab, jnp.arange(S))
        return c

    tab = jnp.zeros((E, D), jnp.float32)

    def run():
        nonlocal tab
        tab = loop(tab)
        float(tab[0, 0])

    dt = fetch_timed(run, S)
    print(f"  {tag:44s} {dt * 1e6:9.1f} us", flush=True)


def main():
    print(f"device={jax.devices()[0].platform}  E={E} D={D} N={N} S={S}")
    rng = np.random.RandomState(0)
    ids0 = jnp.asarray(rng.randint(0, E, N), jnp.int32)
    rows = jnp.asarray(rng.randn(N, D).astype(np.float32))

    def plain(tab, i):
        ids = (ids0 + i) % E
        return tab.at[ids].add(rows)

    def sorted_add(tab, i):
        ids = (ids0 + i) % E
        order = jnp.argsort(ids)
        return tab.at[ids[order]].add(rows[order],
                                      indices_are_sorted=True)

    def sorted_add_nohint(tab, i):
        ids = (ids0 + i) % E
        order = jnp.argsort(ids)
        return tab.at[ids[order]].add(rows[order])

    def gather_ref(tab, i):
        ids = (ids0 + i) % E
        return tab.at[jnp.int32(0), jnp.int32(0)].add(
            jnp.sum(tab[ids]) * 1e-30)

    bench("scatter-add, random order (current)", plain)
    bench("scatter-add, sorted + sorted-hint", sorted_add)
    bench("scatter-add, sorted, no hint", sorted_add_nohint)
    bench("gather same rows (bandwidth reference)", gather_ref)


if __name__ == "__main__":
    main()
