"""Sub-kernel diagnosis of the RESCAL/TransR step-time outliers.

docs/benchmarks.md round-2 table: RESCAL 5354 us/step and TransR 2678
us/step vs DistMult 227 us at the same batch — a 5-20x family-relative
gap.  Hypothesis: the per-edge matvec einsums ("bre,be->br" /
"bd,bdr->br") are batched matvecs whose M=1 tiles pad catastrophically
on the MXU, amplified by precision="highest" (6-pass f32 emulation),
while an explicit broadcast-multiply + reduce runs on the VPU at HBM
bandwidth with exact f32 math.  This script times each candidate form
fwd+bwd in a scanned loop (S iterations, carry-dependent inputs so XLA
cannot hoist the work out of the scan; ~40 ms link overhead subtracted).

Usage:  python tools/diag_bilinear.py   (repo root, on TPU)
"""

import sys

sys.path.insert(0, ".")  # PYTHONPATH breaks the axon plugin registration

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S = 256

B, DR, DE = 1000, 200, 200          # RESCAL shape (dim 200)
C, BC, K, TD = 5, 200, 200, 100     # TransR shape (dim 100)


def timeit(name, fn, *args):
    """Time fn(carry, *args) -> scalar, scanned S times."""
    from tools._timing import fetch_timed

    @jax.jit
    def loop(a0):
        def body(c, _):
            return fn(c, *args), ()
        c, _ = lax.scan(body, a0, None, length=S)
        return c

    z = jnp.zeros((), jnp.float32)
    dt = fetch_timed(lambda: float(loop(z)), S)
    print(f"  {name:44s} {dt * 1e6:9.1f} us")
    return dt


def grad_of(score_fn):
    """fwd+bwd: d/d(inputs) sum(score)."""
    def f(c, *args):
        args = tuple(a + c * 1e-30 for a in args)  # carry-dep: no hoisting
        val, grads = jax.value_and_grad(
            lambda *xs: jnp.sum(score_fn(*xs)), argnums=tuple(range(len(args)))
        )(*args)
        return val * 1e-30 + sum(jnp.sum(g) * 1e-30 for g in grads)
    return f


def main():
    print(f"device={jax.devices()[0].platform}  S={S}")
    rng = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32)  # noqa: E731

    print(f"RESCAL per-edge matvec tmp = h^T R  [B={B}, {DR}x{DE}] fwd+bwd")
    rmat, emb = f32(B, DR, DE), f32(B, DR)
    for prec in ("highest", "high", "default"):
        timeit(f"einsum bre,br->be prec={prec}",
               grad_of(lambda m, e, p=prec: jnp.einsum(
                   "bre,br->be", m, e, precision=p,
                   preferred_element_type=jnp.float32)), rmat, emb)
    timeit("broadcast-mul reduce (VPU)",
           grad_of(lambda m, e: jnp.sum(m * e[:, :, None], axis=1)),
           rmat, emb)

    print(f"RESCAL pos rt = R t  [B={B}, {DR}x{DE}] fwd+bwd")
    tail = f32(B, DE)
    for prec in ("highest", "high"):
        timeit(f"einsum bre,be->br prec={prec}",
               grad_of(lambda m, t, p=prec: jnp.einsum(
                   "bre,be->br", m, t, precision=p,
                   preferred_element_type=jnp.float32)), rmat, tail)
    timeit("broadcast-mul reduce (VPU)",
           grad_of(lambda m, t: jnp.sum(m * t[:, None, :], axis=2)),
           rmat, tail)

    print(f"TransR neg_project [C={C},K={K},{TD}x{TD}] + L1 score fwd+bwd")
    negs, proj = f32(C, 1, K, TD), f32(C, BC, TD, TD)
    posd = f32(C, BC, 1, TD)

    def transr_core(prec):
        def f(n, p, q):
            np_ = jnp.einsum("cxkd,cbdr->cbkr", n, p, precision=prec,
                             preferred_element_type=jnp.float32)
            return jnp.sum(jnp.abs(q - np_), axis=-1)
        return f

    for prec in ("highest", "high", "default"):
        timeit(f"einsum cxkd,cbdr->cbkr prec={prec}",
               grad_of(transr_core(prec)), negs, proj, posd)

    print(f"TransR project bd,bdr->br [B={B}, {TD}x{TD}] fwd+bwd")
    ent, pm = f32(B, TD), f32(B, TD, TD)
    for prec in ("highest", "high"):
        timeit(f"einsum bd,bdr->br prec={prec}",
               grad_of(lambda e, p_, pr=prec: jnp.einsum(
                   "bd,bdr->br", e, p_, precision=pr,
                   preferred_element_type=jnp.float32)), ent, pm)
    timeit("broadcast-mul reduce (VPU)",
           grad_of(lambda e, p_: jnp.sum(e[:, :, None] * p_, axis=1)),
           ent, pm)

    print(f"RESCAL relation one-hot dense update [{1345}x{DR * DE}]")
    ids = jnp.asarray(rng.randint(0, 1345, B), jnp.int32)
    delta = f32(B, DR * DE)
    table = f32(1345, DR * DE)

    def dense_update(c, tb, dl):
        dl = dl + c * 1e-30
        onehot = (ids[None, :] == jnp.arange(1345)[:, None]).astype(dl.dtype)
        dense = jnp.einsum("en,nd->ed", onehot, dl,
                           preferred_element_type=tb.dtype)
        return jnp.sum((tb + dense)[0]) * 1e-30

    timeit("one-hot matmul + table add (default prec)",
           dense_update, table, delta)


if __name__ == "__main__":
    main()
