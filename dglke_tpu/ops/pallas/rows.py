"""Pallas TPU kernels for embedding-row movement (EXPERIMENTAL, default off).

The training step's cost is dominated by moving ~4k embedding rows per step
between HBM and compute: gather (h, t, negatives) and the row-sparse Adagrad
write-back.  These kernels issue one async DMA per row with a K-deep
in-flight ring so row latency overlaps, playing the role of torch's batched
index kernels in the reference
(/root/reference/python/dglke/models/pytorch/tensor_models.py:270-302,
304-362 — `ExternalEmbedding.__call__` / `.update`).

Measured reality on a v5e (tools/bench_rows.py, overhead-corrected): XLA's
scattered-row lowering runs near HBM bandwidth (gather 231 GB/s), while
per-row DMA is issue-rate bound at ~60-90 ns/row; deeper rings, bulk
semaphore waits, and staged chunked writes do not close the gap (all
tried).
XLA therefore remains the default row path (`ops/embedding.py`
`_pallas_rows_enabled`); these kernels are kept for experimentation on
other TPU generations.  Caveats when enabling: tables must be lane-padded
(feature dim a multiple of 128 — `ops/embedding.py` does this), and the
rank-2->rank-3 reshape at the call boundary can defeat XLA's
input/output aliasing inside a scan, inserting a full-table copy per call
(catastrophic for large tables).

Duplicate ids in the Adagrad write-back (`index_add_` semantics: duplicates
accumulate) are handled without any sort/dedup: a host-precomputed
"conflict" flag marks rows whose id appeared within the pipeline window; for
those (rare) rows the kernel drains outstanding writes and performs the
read synchronously, so the read always observes every earlier duplicate's
write.  This preserves the reference's exact read-after-all-adds ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# In-flight DMA ring depth.  16 rows x 1.6 KB keeps ~26 KB in flight per
# direction — enough to hide HBM latency without stressing VMEM.
_K = 16


def _gather_kernel(ids_ref, table_ref, out_ref, sems):
    # table_ref/out_ref are rank-3 [rows, 1, D]: the row index is a LEADING
    # (untiled) dim, so single-row memref slices are legal — rank-2 [rows, D]
    # would put rows on the sublane dim, where Mosaic requires slices to be
    # 8-aligned ("Slice shape along dimension 0 must be aligned to tiling").
    n = out_ref.shape[0]

    def make(i):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[i]], out_ref.at[i], sems.at[jax.lax.rem(i, _K)])

    def warm(i, _):
        make(i).start()
        return _

    jax.lax.fori_loop(0, min(_K, n), warm, None, unroll=True)

    def body(i, _):
        make(i).wait()

        @pl.when(i + _K < n)
        def _start_next():
            make(i + _K).start()
        return _

    jax.lax.fori_loop(0, n, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jnp.ndarray, ids: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """table: [E, D]; ids: [N] int32 -> [N, D] (table[ids])."""
    n = ids.shape[0]
    d = table.shape[1]
    # Tables are pinned to HBM and viewed rank-3 [E, 1, D] so the row index
    # is a leading untiled dim (see _gather_kernel).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_K,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, d), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table.reshape(table.shape[0], 1, d))
    return out.reshape(n, d)


def window_conflicts(ids: jnp.ndarray, window: int = 2 * _K) -> jnp.ndarray:
    """conflict[i] = 1 iff ids[i] appears in ids[i-window:i].

    Rows flagged here are the only ones whose pipelined read could race an
    outstanding duplicate write in `adagrad_update_rows`; everything further
    apart is ordered by the K-deep ring itself.
    """
    n = ids.shape[0]
    c = jnp.zeros((n,), jnp.bool_)
    for s in range(1, min(window, n - 1) + 1):
        c = c.at[s:].set(c[s:] | (ids[:-s] == ids[s:]))
    return c.astype(jnp.int32)


def _rmw_kernel(ids_ref, conflict_ref, delta_ref, table_in_ref, table_out_ref,
                rbuf, wbuf, read_sems, write_sems, drained_ref):
    """Pipelined row read-modify-write: table[ids[i]] += delta[i].

    Separate read (rbuf) and write (wbuf) rings: the read for row i+K may
    land in rbuf slot i%K only after read(i) was waited (same iteration,
    earlier), and compute may overwrite wbuf slot i%K only after write(i-K)
    was retired (start of iteration i).  Invariant at compute iteration i:
    writes <= i-K have been waited (steady-state retire or conflict drain);
    outstanding writes live in [max(drained, i-K+1), i-1].  `drained_ref[0]`
    is the exclusive upper bound of force-drained writes so no semaphore is
    ever waited twice.
    """
    n = delta_ref.shape[0]

    del table_in_ref  # aliased with table_out_ref; read+write one ref so
    # interpret mode (separate sim buffers) matches hardware (same buffer).

    def read(i):
        return pltpu.make_async_copy(
            table_out_ref.at[ids_ref[i]], rbuf.at[jax.lax.rem(i, _K)],
            read_sems.at[jax.lax.rem(i, _K)])

    def write(i):
        return pltpu.make_async_copy(
            wbuf.at[jax.lax.rem(i, _K)], table_out_ref.at[ids_ref[i]],
            write_sems.at[jax.lax.rem(i, _K)])

    drained_ref[0] = 0

    def maybe_start_read(i):
        @pl.when(jnp.logical_and(i < n, conflict_ref[i] == 0))
        def _():
            read(i).start()

    def warm(i, _):
        maybe_start_read(i)
        return _

    jax.lax.fori_loop(0, min(_K, n), warm, None, unroll=True)

    def body(i, _):
        # Retire the write that used wbuf slot i%K, freeing it for reuse
        # below (skip if a conflict drain already consumed its semaphore).
        @pl.when(jnp.logical_and(i - _K >= 0, i - _K >= drained_ref[0]))
        def _retire():
            write(i - _K).wait()

        @pl.when(conflict_ref[i] != 0)
        def _conflict():
            # Drain outstanding writes [max(drained, i-K+1), i-1], then read
            # synchronously: the row now reflects every earlier duplicate's
            # write (reference index_add_ ordering, tensor_models.py:304-362).
            lo = jnp.maximum(drained_ref[0], i - _K + 1)

            def drain(j, _):
                write(j).wait()
                return _

            jax.lax.fori_loop(lo, i, drain, None)
            drained_ref[0] = i
            read(i).start()

        read(i).wait()
        wbuf[jax.lax.rem(i, _K)] = rbuf[jax.lax.rem(i, _K)] + delta_ref[i]
        write(i).start()

        # Keep the read pipeline full (rbuf slot i%K is free: read(i) above).
        maybe_start_read(i + _K)
        return _

    jax.lax.fori_loop(0, n, body, None)

    # Drain the tail: writes in [max(drained, n-K), n).
    def tail(j, _):
        write(j).wait()
        return _

    jax.lax.fori_loop(jnp.maximum(drained_ref[0], n - _K), n, tail, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_add_rows(table: jnp.ndarray, ids: jnp.ndarray,
                     delta: jnp.ndarray, conflict: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """table[ids] += delta with exact duplicate accumulation.

    Equivalent to ``table.at[ids].add(delta)`` but runs at DMA roofline:
    per-row RMW with a K-deep in-flight ring, duplicates within the pipeline
    window serialized via precomputed `conflict` flags (see
    `window_conflicts`; computed here if not supplied).
    """
    if conflict is None:
        conflict = window_conflicts(ids)
    n, d = delta.shape
    e = table.shape[0]
    # All row-indexed refs are rank-3 [rows, 1, D]: leading untiled row dim
    # (see _gather_kernel).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # delta
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((_K, 1, d), table.dtype),   # rbuf
            pltpu.VMEM((_K, 1, d), table.dtype),   # wbuf
            pltpu.SemaphoreType.DMA((_K,)),
            pltpu.SemaphoreType.DMA((_K,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((e, 1, d), table.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},   # table (after 2 scalar-prefetch args + delta)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, conflict, delta.astype(table.dtype).reshape(n, 1, d),
      table.reshape(e, 1, d))
    return out.reshape(e, d)
