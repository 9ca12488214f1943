"""Diagnose the large-vocab slowdown: isolate per-step costs vs table size.

Round-1 session measured the SAME step config at 3.42M triples/s on the
FB15k shape (15k x 512) but only 0.22M triples/s at wikikg2 scale
(2.5M x 256) — a 15x gap that per-batch work cannot explain.  This probe
times, at several table sizes, a scanned loop over (a) gather only,
(b) scatter-add only, (c) the full Adagrad update — to find which
primitive's cost scales with TABLE size.

Run on TPU inside tools/tpu_session.sh (each section under timeout).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(carry):
    leaf = jax.tree_util.tree_leaves(carry)[0]
    float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def timed_chain(fn, carry, consts, iters=3):
    """Time donated-carry chained calls: carry = fn(carry, *consts)."""
    carry = fn(carry, *consts)   # compile + warm
    fence(carry)
    t0 = time.time()
    for _ in range(iters):
        carry = fn(carry, *consts)
    fence(carry)
    return (time.time() - t0) / iters


def scan_loop(body, steps):
    # consts ride as jit args (NOT closure captures: a captured 2.5 GB
    # table would be embedded as a compile-time constant)
    def run(carry, *consts):
        carry, _ = jax.lax.scan(lambda c, _: (body(c, *consts), 0.0), carry,
                                None, length=steps)
        return carry
    return jax.jit(run, donate_argnums=(0,))


def main():
    steps = 256
    n = 2200          # rows touched per step (batch 1000: h+t+neg200)
    key = jax.random.PRNGKey(0)

    for e, d in [(14_951, 512), (250_000, 256), (1_000_000, 256),
                 (2_500_604, 256)]:
        emb = jax.random.uniform(key, (e, d), jnp.float32)
        ssum = jnp.zeros((e,), jnp.float32)
        ids = jax.random.randint(key, (steps, n), 0, e, dtype=jnp.int32)
        grads = jax.random.uniform(key, (n, d), jnp.float32)
        per = 1e6 / steps

        # (a) gather only: scalar accumulator carry, read rows each step
        def g_body(c, emb, ids, grads):
            acc, i = c
            rows = emb[ids[i % steps]]
            return acc + jnp.sum(rows[:, 0]), i + 1
        tg = timed_chain(scan_loop(g_body, steps),
                         (jnp.float32(0), jnp.int32(0)), (emb, ids, grads))

        # (b) scatter-add only
        def s_body(c, emb, ids, grads):
            tab, i = c
            return tab.at[ids[i % steps]].add(grads), i + 1
        ts = timed_chain(scan_loop(s_body, steps), (emb + 0, jnp.int32(0)),
                         (emb, ids, grads))

        # (c) full sparse Adagrad (scatter state, gather std, scatter emb)
        def a_body(c, emb, ids, grads):
            tab, st, i = c
            rid = ids[i % steps]
            sq = jnp.mean(grads * grads, axis=1)
            st = st.at[rid].add(sq)
            std = jnp.sqrt(st[rid]) + 1e-10
            tab = tab.at[rid].add(-0.25 * grads / std[:, None])
            return tab, st, i + 1
        ta = timed_chain(scan_loop(a_body, steps),
                         (emb + 0, ssum + 0, jnp.int32(0)),
                         (emb, ids, grads))

        # (d) scatter-add ceiling: pre-sorted unique ids (what a
        # sort+segment-sum dedup pass would buy if XLA's unique-indices
        # scatter is materially faster than the duplicate-tolerant one)
        uids = np.sort(np.stack([
            np.random.RandomState(s).choice(e, n, replace=False)
            for s in range(8)])).astype(np.int32) if e >= n else None
        tu = float("nan")
        if uids is not None:
            uids = jnp.asarray(uids)

            def u_body(c, emb, uids, grads):
                tab, i = c
                rid = uids[i % 8]
                return tab.at[rid].add(grads, indices_are_sorted=True,
                                       unique_indices=True), i + 1
            tu = timed_chain(scan_loop(u_body, steps),
                             (emb + 0, jnp.int32(0)), (emb, uids, grads))

        print(f"E={e:>9,} D={d}: gather {tg*per:7.1f} us/step  "
              f"scatter {ts*per:7.1f} us/step  adagrad {ta*per:7.1f} us/step"
              f"  uniq-scatter {tu*per:7.1f} us/step",
              flush=True)


if __name__ == "__main__":
    main()
