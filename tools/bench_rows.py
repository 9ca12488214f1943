"""Micro-benchmark: Pallas row kernels vs XLA gather/scatter on the
current default device.

Times the two row-movement primitives of the training step at the
flagship shape (N=3000 rows x D=400 fp32 over a 14951-row table, the
FB15k TransE_l2 step's entity traffic) plus the full sparse-Adagrad
update, each scanned S times inside one jit so per-call overhead
amortizes.  Completion is forced by fetching a scalar (the tunneled test
TPU does not reliably block in block_until_ready).

Usage:  python tools/bench_rows.py [N] [D] [E]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 400
E = int(sys.argv[3]) if len(sys.argv) > 3 else 14951
S = 2048  # the tunneled link adds ~40ms per device call; big S amortizes it
# Raw Pallas kernels move lane-padded rows (tables store dim 400 as 512;
# ops/embedding.py pads transparently) — bench the padded width they move.
DP = -(-D // 128) * 128


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(name, fn, *args, bytes_per_step=None):
    r = fn(*args)
    fetch(r[0] if isinstance(r, tuple) else r)     # compile + warmup
    t0 = time.time()
    r = fn(*args)
    fetch(r[0] if isinstance(r, tuple) else r)
    dt = (time.time() - t0) / S
    gbs = (f"  {bytes_per_step / dt / 1e9:7.1f} GB/s"
           if bytes_per_step else "")
    print(f"{name:34s} {dt * 1e6:9.1f} us/step{gbs}")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (E, DP), jnp.float32)
    ids0 = jax.random.randint(key, (N,), 0, E, jnp.int32)
    delta = jax.random.normal(key, (N, DP), jnp.float32) * 1e-3
    # logical-width grads for the embedding-layer path (it pads internally)
    delta_l = delta[:, :D]
    row_bytes = N * DP * 4

    @jax.jit
    def xla_gather(t):
        def body(acc, i):
            rows = t[(ids0 + i) % E]
            return acc + rows[0, 0], None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(S))
        return acc

    @jax.jit
    def xla_scatter(t):
        def body(tt, i):
            return tt.at[(ids0 + i) % E].add(delta), None
        tt, _ = lax.scan(body, t, jnp.arange(S))
        return tt[0, 0]

    from dglke_tpu.ops.pallas.rows import gather_rows, scatter_add_rows

    @jax.jit
    def pallas_gather(t):
        def body(acc, i):
            rows = gather_rows(t, (ids0 + i) % E)
            return acc + rows[0, 0], None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(S))
        return acc

    @jax.jit
    def pallas_scatter(t):
        def body(tt, i):
            return scatter_add_rows(tt, (ids0 + i) % E, delta), None
        tt, _ = lax.scan(body, t, jnp.arange(S))
        return tt[0, 0]

    from dglke_tpu.ops.embedding import EmbeddingState, sparse_adagrad_update

    def adagrad(mode):
        import dglke_tpu.ops.embedding as emb_mod
        emb_mod.set_pallas_rows(mode)

        @jax.jit
        def run(t, ss):
            def body(carry, i):
                st = sparse_adagrad_update(
                    EmbeddingState(*carry), (ids0 + i) % E, delta_l, 0.1)
                return (st.emb, st.state_sum), None
            (emb, ss2), _ = lax.scan(body, (t, ss), jnp.arange(S))
            return emb[0, 0] + ss2[0]
        return run

    print(f"device={jax.devices()[0].platform}  N={N} D={D}(pad {DP}) E={E} S={S}")
    timed("XLA gather", xla_gather, table, bytes_per_step=2 * row_bytes)
    timed("Pallas gather", pallas_gather, table,
          bytes_per_step=2 * row_bytes)
    timed("XLA scatter-add", xla_scatter, table,
          bytes_per_step=3 * row_bytes)
    timed("Pallas scatter-add (RMW)", pallas_scatter, table,
          bytes_per_step=3 * row_bytes)
    ss = jnp.zeros((E,), jnp.float32)
    timed("sparse Adagrad (XLA rows)", adagrad("off"), table, ss,
          bytes_per_step=5 * row_bytes)
    timed("sparse Adagrad (Pallas rows)", adagrad("on"), table, ss,
          bytes_per_step=5 * row_bytes)


if __name__ == "__main__":
    main()
