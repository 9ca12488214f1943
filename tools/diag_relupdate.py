"""Relation-table Adagrad: scatter-add vs dense one-hot accumulation.

The per-step relation update writes N=batch dup-heavy rows into a SMALL
table ([n_rel, dim], e.g. FB15k 1345 x 400).  XLA's scatter-add runs at
~140 GB/s of row traffic; a dense one-hot matmul (onehot [E, N] @ delta
[N, D]) turns the same accumulation into one MXU op whose cost is
E*N*D flops — potentially cheaper whenever E is small.  This probe
measures both (and the full Adagrad built on each) at relation-table
shapes to pick the sparse_adagrad_update dispatch threshold.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def timed_chain(fn, carry, consts, iters=3):
    carry = fn(carry, *consts)
    fence(carry)
    t0 = time.time()
    for _ in range(iters):
        carry = fn(carry, *consts)
    fence(carry)
    return (time.time() - t0) / iters


def scan_loop(body, steps):
    def run(carry, *consts):
        carry, _ = jax.lax.scan(lambda c, _: (body(c, *consts), 0.0), carry,
                                None, length=steps)
        return carry
    return jax.jit(run, donate_argnums=(0,))


def main():
    steps = 256
    key = jax.random.PRNGKey(0)
    per = 1e6 / steps

    for e, d, n in [(1345, 400, 1000), (1345, 512, 1000), (535, 200, 1000),
                    (11, 400, 1000), (14951, 512, 2200)]:
        emb = jax.random.uniform(key, (e, d), jnp.float32)
        ssum = jnp.zeros((e,), jnp.float32)
        # dup-heavy ids: zipf-ish via squaring a uniform draw
        u = np.random.RandomState(0).rand(steps, n)
        ids = jnp.asarray((u * u * e).astype(np.int32))
        grads = jax.random.uniform(key, (n, d), jnp.float32)

        def sc_body(c, emb, ids, grads):
            tab, st, i = c
            rid = ids[i % steps]
            sq = jnp.mean(grads * grads, axis=1)
            st = st.at[rid].add(sq)
            std = jnp.sqrt(st[rid]) + 1e-10
            tab = tab.at[rid].add(-0.25 * grads / std[:, None])
            return tab, st, i + 1
        tsc = timed_chain(scan_loop(sc_body, steps),
                          (emb + 0, ssum + 0, jnp.int32(0)),
                          (emb, ids, grads))

        def dn_body(c, emb, ids, grads):
            tab, st, i = c
            rid = ids[i % steps]
            sq = jnp.mean(grads * grads, axis=1)
            onehot = (rid[None, :] == jnp.arange(e)[:, None])
            st = st + onehot.astype(jnp.float32) @ sq
            std = jnp.sqrt(st[rid]) + 1e-10
            delta = -0.25 * grads / std[:, None]
            tab = tab + jnp.einsum("en,nd->ed", onehot.astype(jnp.float32),
                                   delta, preferred_element_type=jnp.float32)
            return tab, st, i + 1
        tdn = timed_chain(scan_loop(dn_body, steps),
                          (emb + 0, ssum + 0, jnp.int32(0)),
                          (emb, ids, grads))

        print(f"E={e:>6} D={d} N={n}: scatter-adagrad {tsc*per:7.1f} us/step"
              f"   dense-adagrad {tdn*per:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
