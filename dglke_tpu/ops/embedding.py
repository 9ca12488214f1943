"""Embedding tables + row-sparse Adagrad, TPU-native.

The reference keeps embeddings in a CPU/shm ``ExternalEmbedding`` with a
per-row Adagrad accumulator and applies updates with ``index_add_``
(/root/reference/python/dglke/models/pytorch/tensor_models.py:304-362):

    state_sum[ids] += mean(grad**2, dim=1)          # per occurrence
    std = sqrt(state_sum[ids]) + 1e-10              # read AFTER all adds
    emb[ids]       += -lr * grad / std              # per occurrence

Because ``std`` is gathered after the full accumulation, duplicate ids are
mathematically equivalent to a *deduplicated* update with segment-summed
gradients:

    per unique id u:  state_sum[u] += sum_occ mean(grad_occ**2, dim=1)
                      emb[u]       += -lr * (sum_occ grad_occ) / sqrt(state')

which is exactly what we compute here with a static-shape sort + segment-sum
(no jnp.unique — shapes stay static for XLA).  The scatter itself is an XLA
scatter-add whose cost scales with the batch, not the table.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


_PALLAS_MODE = "auto"


def set_pallas_rows(mode: str) -> None:
    """Select the row-movement backend: "auto" (= XLA; see
    _pallas_rows_enabled), "on" (experimental Pallas row DMA), "off".

    ShardingPlan(table_sharding="vocab") forces "off": a pallas_call is an
    opaque custom call to the SPMD partitioner, so the vocab-sharded path
    must keep XLA gather/scatter (which partition cleanly into
    all-to-alls).
    """
    global _PALLAS_MODE
    assert mode in ("auto", "on", "off"), mode
    _PALLAS_MODE = mode


def _pallas_rows_enabled() -> bool:
    """Pallas row kernels: EXPERIMENTAL, default off.

    Measured on a v5e (tools/bench_rows.py, N=3000 D=512, overhead-
    corrected): XLA's scattered-row movement runs near HBM bandwidth
    (gather 231 GB/s, scatter-add 142 GB/s) while the per-row-DMA kernels
    are issue-bound at ~60-90 ns/row — XLA wins at every shape tried
    (E=15k..1M, D=512..2048).  Kept behind DGLKE_TPU_PALLAS_ROWS=1 /
    set_pallas_rows("on") for experimentation."""
    # Precedence: an explicit set_pallas_rows("off") (the vocab-sharding
    # invariant — pallas_call is opaque to the SPMD partitioner) outranks
    # the env override; the env then decides for the remaining modes.
    if _PALLAS_MODE == "off":
        return False
    env = os.environ.get("DGLKE_TPU_PALLAS_ROWS", "")
    if env in ("0", "false"):
        return False
    if env in ("1", "true"):
        return True
    return _PALLAS_MODE == "on"


# Tables smaller than this keep the XLA path even when Pallas is enabled:
# per-row DMA pipelining only pays off when ids rarely collide inside the
# in-flight window (entity tables); small dup-heavy tables (relations)
# would serialize on the duplicate drain.
_PALLAS_MIN_ROWS = 8192

# TPU vector lane width.  Row DMAs move full (8, 128) tiles, so Pallas-path
# tables store their feature dim padded to a lane multiple (e.g. 400 -> 512);
# the pad columns are zero forever (gathers slice them off, scatter deltas
# pad with zeros) and XLA would pad rows to the same tile in VMEM anyway.
_LANE = 128

# Rows at least this wide switch the Adagrad write-back from scatter-add to
# dense one-hot-matmul accumulation when the table is small relative to the
# batch (see sparse_adagrad_update).
_DENSE_WIDE_DIM = 4096

# Tables with at most this many rows always take the dense one-hot
# write-back: the [E, N] matmul beats the scatter's random row writes up
# to E ~ 2k and loses by E ~ 15k (v5e, tools/diag_relupdate.py), and both
# scale ~linearly in N so the crossover is a fixed row count.
_DENSE_SMALL_ROWS = 2048


def padded_dim(dim: int) -> int:
    return -(-dim // _LANE) * _LANE


def _pallas_ok(emb: jnp.ndarray) -> bool:
    """Pallas row kernels require lane-aligned rows (full-tile DMAs)."""
    return (emb.shape[0] >= _PALLAS_MIN_ROWS
            and emb.shape[1] % _LANE == 0
            and _pallas_rows_enabled())


class EmbeddingState(NamedTuple):
    """One embedding table plus its Adagrad row accumulator."""

    emb: jnp.ndarray        # [num, dim] fp32
    state_sum: jnp.ndarray  # [num] fp32


def init_embedding(key: jax.Array, num: int, dim: int,
                   emb_init: float, dtype=jnp.float32) -> EmbeddingState:
    """Uniform(-emb_init, emb_init) init, zero Adagrad state
    (reference tensor_models.py:240-248).

    Pallas-eligible tables are stored lane-padded ([num, padded_dim(dim)],
    pad columns zero); callers recover logical rows via
    ``gather_rows(..., dim=dim)`` and checkpoint save slices the pad off.
    """
    # One jitted program creates the final table directly: the bf16 cast
    # FUSES into the RNG kernel (an eager uniform(...).astype(bf16)
    # materializes a transient fp32 table first) and the lane padding is
    # written in place (an eager pad would hold two full tables at once).
    # Either transient would halve the single-chip capacity ceiling.
    pdim = padded_dim(dim) if _should_pad_features(num, dim) else dim

    def make(k):
        # drawn at the PADDED shape with an elementwise mask (a jnp.pad of
        # the logical-shape draw is a separate HLO that breaks the
        # RNG->cast fusion and materializes the fp32 table: 14.9 GB at
        # 10M x 400); padded tables therefore draw different (still
        # seeded-deterministic) init values than unpadded ones
        e = jax.random.uniform(k, (num, pdim), dtype=jnp.float32,
                               minval=-emb_init, maxval=emb_init)
        e = e.astype(dtype)
        if pdim != dim:
            e = jnp.where(jnp.arange(pdim) < dim, e, jnp.zeros((), dtype))
        return e

    emb = jax.jit(make)(key)
    # the Adagrad accumulator stays fp32 regardless of table dtype: its
    # monotone sum of squares underflows quickly in bf16
    return EmbeddingState(emb=emb,
                          state_sum=jnp.zeros((num,), jnp.float32))


def _default_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _should_pad_features(num: int, dim: int) -> bool:
    """Whether a [num, dim] table stores its feature dim lane-padded
    (init_embedding draws at the padded shape; utils/io restores pad
    columns on load; gathers slice back to the logical dim).

    On TPU the padding is FREE in HBM — XLA already tiles a bf16
    [N, 400] array to 512 physical lanes (T(8,128)(2,1)) — but an
    explicitly [N, 512] table keeps XLA's layout assignment in plain
    row-major: with a sub-tile logical dim the device-pipeline step
    inserts two FULL-TABLE transpose copies ({1,0} <-> {0,1} relayouts)
    that cannot alias the donated input, capping single-chip capacity at
    ~half of HBM (a 10M x 400 bf16 table compiles to 17.1G > 15.75G;
    padded to 512 the copies vanish and 12M x 512 = 11.4 GB trains at
    903k triples/s — tools/capacity_probe.py).  Also required by the
    Pallas row kernels (full-tile DMAs).  The pad columns are zero
    forever: gathers slice back to the logical dim, scatter deltas pad
    with zeros, checkpoint save slices them off.  Off on CPU/GPU, small
    tables, and rows already lane-aligned."""
    return (num >= _PALLAS_MIN_ROWS and dim % _LANE != 0
            and (_pallas_rows_enabled() or _default_is_tpu()))


def segment_dedup(ids: jnp.ndarray, grads: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape dedup: sum gradient rows of duplicate ids.

    NOT on the production path: sparse_adagrad_update needs no dedup (see
    its docstring for the ordering proof).  Kept as the documented
    equivalence BASELINE — tests/test_embedding.py checks the dedup-free
    update against an explicitly deduplicated one built on this.

    Returns (uniq_ids [N], uniq_grads [N, D], uniq_sq [N]) where only the
    first `n_unique` slots are populated; the rest have id 0 and zero grads
    (safe no-op rows for scatter-add).  uniq_sq is the segment sum of
    mean(grad**2, axis=1) — the reference's per-occurrence state increment.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sids = ids[order]
    sgrads = grads[order]
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sids[1:] != sids[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(head) - 1                     # segment index per position
    uniq_grads = jnp.zeros_like(grads).at[seg].add(sgrads)
    sq = jnp.mean(sgrads * sgrads, axis=1)
    uniq_sq = jnp.zeros((n,), grads.dtype).at[seg].add(sq)
    uniq_ids = jnp.zeros((n,), ids.dtype).at[seg].max(sids)
    # Unused slots keep id 0 with zero grads/sq: harmless under scatter-add.
    return uniq_ids, uniq_grads, uniq_sq


def sparse_adagrad_update(table: EmbeddingState, ids: jnp.ndarray,
                          grads: jnp.ndarray, lr: float) -> EmbeddingState:
    """Apply the reference's row-sparse Adagrad for one (ids, grads) batch.

    ids: [N] int32 (duplicates allowed); grads: [N, D] fp32.

    Duplicates need NO dedup pass: scatter-add accumulates every
    occurrence's mean(grad², axis=1) into state_sum first, the per-row
    ``std`` is gathered AFTER that full accumulation (exactly the
    reference's read-after-all-index_add_ ordering, tensor_models.py:
    304-362), and the emb scatter-add of -lr·grad/std then sums over
    occurrences — identical to a segment-summed deduplicated update.
    Skipping the dedup removes a [N] argsort + two segment-sums from the
    hot step (~160us/step on a v5e at N=3000)."""
    # sq is the mean over the LOGICAL dim (grads are unpadded rows); padding
    # only enters below, as zero delta columns that keep the pad at zero.
    grads = grads.astype(jnp.float32)  # optimizer math is always fp32
    sq = jnp.mean(grads * grads, axis=1)
    state_sum = table.state_sum.at[ids].add(sq)
    std = jnp.sqrt(state_sum[ids]) + 1e-10
    delta = (-lr) * grads / std[:, None]
    delta = delta.astype(table.emb.dtype)
    if delta.shape[1] != table.emb.shape[1]:
        delta = jnp.pad(delta,
                        ((0, 0), (0, table.emb.shape[1] - delta.shape[1])))
    e, d = table.emb.shape
    if (d >= _DENSE_WIDE_DIM and e * d <= 4 * delta.size) \
            or e <= _DENSE_SMALL_ROWS:
        # WIDE rows over a SMALL table (RESCAL relation matrices, TransR
        # projections): XLA's scatter-add collapses on wide rows (measured
        # 11.5 ms for 1000x40000 rows on a v5e vs 0.3 ms for the gather;
        # splitting the scatter into narrow column chunks makes it WORSE —
        # 31-93 ms, tools/diag_widerow.py — while the dense arm runs the
        # same write-back in 0.43 ms).  Precision note: the one-hot matmul
        # at DEFAULT TPU precision rounds the deltas to bf16 (~2^-9
        # relative, f32 accumulate; the one-hot side is exact).  Measured
        # acceptable: a hi/lo split restoring f32 fidelity costs 4.3x
        # (1.88 ms), and the full RESCAL step is precision-insensitive
        # (default == highest within noise, tools/diag_rescal_step.py).
        # Also any SMALL table (relation tables): the [E, N] one-hot
        # matmul is then cheaper than the scatter's random row writes
        # (tools/diag_relupdate.py on a v5e: dense 51 vs scatter 72 us at
        # E=1345 D=400 N=1000, dense 294 vs scatter 211 us at E=14951).
        # Both paths scale ~linearly in N, so the crossover is a fixed E
        # (~2k by linear interpolation of the dense cost), NOT a function
        # of the batch.  Only replicated tables can hit this arm —
        # vocab-sharded entity tables are far larger.
        # Accumulate per-occurrence deltas densely on the MXU instead:
        # onehot [E, N] @ delta [N, D] sums duplicates exactly like the
        # scatter (std is per-id so summing deltas == summing grads), then
        # one elementwise add over the whole (small) table.
        onehot = (ids[None, :] == jnp.arange(e)[:, None]).astype(delta.dtype)
        dense = jnp.einsum("en,nd->ed", onehot, delta,
                           preferred_element_type=table.emb.dtype)
        emb = table.emb + dense
    elif _pallas_ok(table.emb):
        from dglke_tpu.ops.pallas.rows import scatter_add_rows
        emb = scatter_add_rows(table.emb, ids, delta)
    else:
        emb = table.emb.at[ids].add(delta)
    return EmbeddingState(emb=emb, state_sum=state_sum)


def gather_rows(table: EmbeddingState, ids: jnp.ndarray,
                dtype=None, dim: int | None = None,
                sorted_ids: bool = False) -> jnp.ndarray:
    """Minibatch gather (the reference's ExternalEmbedding.__call__).

    ``dim`` is the table's LOGICAL feature width: lane-padded tables (see
    ``init_embedding``) return rows sliced back to it.  ``sorted_ids``
    passes the monotone-indices hint to XLA (eval candidate blocks are
    iota slices).
    """
    if _pallas_ok(table.emb):
        from dglke_tpu.ops.pallas.rows import gather_rows as pallas_gather
        rows = pallas_gather(table.emb, ids)
    elif sorted_ids:
        rows = table.emb.at[ids].get(indices_are_sorted=True)
    else:
        rows = table.emb[ids]
    if dim is not None and rows.shape[-1] != dim:
        rows = rows[..., :dim]
    if dtype is not None and rows.dtype != dtype:
        rows = rows.astype(dtype)
    return rows
