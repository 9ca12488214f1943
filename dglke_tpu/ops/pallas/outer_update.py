"""Fused factored-gradient Adagrad for WIDE relation rows (RESCAL).

RESCAL's per-edge relation gradient is RANK-1: with tail corruption the
score path is ``tmp = R_bᵀ h_b``, ``pos = tmp·t``, ``negs = tmp·n_k``, so
``dR_b = h_b ⊗ d_tmp_b`` (head corruption symmetric) — yet the stock
autodiff + sparse update materializes it as a dense ``[B, Dr·De]`` array
(160 MB at the benchmark shape) and then pays one-hot accumulation plus
three more full passes in the dense Adagrad arm
(ops/embedding.py:sparse_adagrad_update).  This kernel consumes the
FACTORS directly and performs the reference's exact update ordering
(tensor_models.py:304-362: all ``state_sum`` increments land before any
``std`` read) in two serial passes over only the touched rows:

  pass 0 (per edge, ids sorted):  g = a⊗b + reg'(R[r]);
                                  ss[r] += mean(g²)
  pass 1 (per edge):              R[r] -= lr · g / (sqrt(ss[r]) + 1e-10)

HBM traffic is 2 reads + 2 writes of the touched rows (~640 MB/step at
B=1000, D=40000) versus the unfused path's ~1.2 GB (gradient
materialization + one-hot dR table + 3 dense-arm passes).  The norm-p
regularization gradient on relation rows (general_models.py:572-576) is
applied IN-KERNEL from the row value itself, so it never materializes
either.

Correctness with duplicate ids relies on the caller sorting ``ids`` (and
factors) so duplicates are CONSECUTIVE: Pallas keeps a revisited block
resident in VMEM between same-index grid steps, making the in-place
accumulation exact; ``first visit`` is detected from the prefetched ids.
The two grid passes share one ``ss`` VMEM accumulator, giving the
read-after-all-adds ordering without a host round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dglke_tpu.ops.embedding import EmbeddingState


def _reg_grad(x, coef: float, norm_ord: int):
    """d/dx of coef * sum|x|^p  (models/loss.py:regularization)."""
    if coef == 0.0 or norm_ord <= 0:
        return 0.0
    return coef * norm_ord * jnp.abs(x) ** (norm_ord - 1) * jnp.sign(x)


def _kernel(ids_ref, emb_in, ss_in, a_ref, b_ref, emb_out, ss_out, *,
            lr: float, reg_coef: float, reg_norm: int, d2: int):
    p = pl.program_id(0)
    b = pl.program_id(1)
    r = ids_ref[b]
    prev = ids_ref[jnp.maximum(b - 1, 0)]
    first_visit = jnp.logical_or(b == 0, prev != r)

    da = a_ref.shape[-1]
    db = b_ref.shape[-1]
    row = emb_in[0]                                   # [Da, Db] fp32
    g = (a_ref[:].reshape(da, 1) * b_ref[:].reshape(1, db)
         + _reg_grad(row, reg_coef, reg_norm))

    @pl.when(p == 0)
    def _accumulate_ss():
        @pl.when(b == 0)
        def _init():
            ss_out[...] = ss_in[...]

        # the writeback at every block change must carry valid data even
        # though pass 0 only reads the row
        @pl.when(first_visit)
        def _copy_through():
            emb_out[...] = emb_in[...]

        ms = jnp.sum(g * g) / d2
        ss_out[pl.ds(r, 1), :] = ss_out[pl.ds(r, 1), :] + ms

    @pl.when(p == 1)
    def _apply():
        @pl.when(first_visit)
        def _seed():
            emb_out[...] = emb_in[...]

        ss_r = ss_out[pl.ds(r, 1), :]
        std = jnp.sqrt(ss_r[0, 0]) + 1e-10
        emb_out[0] = emb_out[0] - (lr / std) * g


def _call(emb3, ss2, ids, a, bv, *, lr, reg_coef, reg_norm, da, interpret):
    # NOT jitted itself: this runs inside the train step's jit, where the
    # pallas_call's input_output_aliases let XLA update the (donated)
    # table in place.
    e, _, db = emb3.shape
    n = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, n),
        in_specs=[
            pl.BlockSpec((1, da, db), lambda p, b, ids: (ids[b], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ss_in: whole array
            # factors ride as [B, 1, D]: Mosaic requires the last two
            # block dims be (8, 128)-divisible or full — a leading
            # untiled row index with a singleton sublane satisfies it
            # (same rank-3 trick as ops/pallas/rows.py)
            pl.BlockSpec((1, 1, da), lambda p, b, ids: (b, 0, 0)),
            pl.BlockSpec((1, 1, db), lambda p, b, ids: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, da, db), lambda p, b, ids: (ids[b], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ss accumulator
        ],
    )
    kernel = functools.partial(_kernel, lr=lr, reg_coef=reg_coef,
                               reg_norm=reg_norm, d2=da * db)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(emb3.shape, emb3.dtype),
                   jax.ShapeDtypeStruct(ss2.shape, ss2.dtype)],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(ids, emb3, ss2, a, bv)


def outer_adagrad_update(table: EmbeddingState, ids: jnp.ndarray,
                         a: jnp.ndarray, bv: jnp.ndarray, lr: float,
                         reg_coef: float = 0.0, reg_norm: int = 0,
                         interpret: bool = False) -> EmbeddingState:
    """Row-sparse Adagrad where grad[i] = a[i] ⊗ bv[i] (+ in-kernel norm-p
    regularization gradient of the row itself).

    table.emb: [E, Da*Db] fp32; ids: [B] int32 (duplicates fine — sorted
    here); a: [B, Da]; bv: [B, Db].  Exact same semantics as
    ``sparse_adagrad_update(table, ids, outer+reg', lr)``.
    """
    e, d2 = table.emb.shape
    n, da = a.shape
    db = bv.shape[1]
    assert da * db == d2, (da, db, d2)
    assert table.emb.dtype == jnp.float32, "fused path requires fp32 table"
    order = jnp.argsort(ids)
    ids_s = ids[order].astype(jnp.int32)
    a_s = a[order].astype(jnp.float32).reshape(n, 1, da)
    b_s = bv[order].astype(jnp.float32).reshape(n, 1, db)
    emb3 = table.emb.reshape(e, da, db)
    ss2 = table.state_sum.reshape(e, 1)
    emb3, ss2 = _call(emb3, ss2, ids_s, a_s, b_s, lr=float(lr),
                      reg_coef=float(reg_coef), reg_norm=int(reg_norm),
                      da=da, interpret=interpret)
    return EmbeddingState(emb=emb3.reshape(e, d2),
                          state_sum=ss2.reshape(e))
