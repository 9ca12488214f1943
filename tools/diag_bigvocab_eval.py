"""Decompose the big-vocab full-entity eval cost on TPU (VERDICT r4 #5).

The r4 12M-entity filtered eval ran at 7.6 edges/s (4,000 edges in
525 s) — ~300x off the matmul roofline for the work actually required
(2 directions x 8 groups x [2048, 12M] x 128-dim GE-counts ~ 50 TFLOP
with precision="highest" ~ a few seconds).  The CPU repro showed one
structural waste (group padding to G=32, fixed in trainer._mega_eval by
the pow2 group ladder); this probe isolates the remaining on-device
terms at the real 12M x 128 shape:

  A. full eval_ranks call (the megastep body) at [rows, 12M];
  B. candidate-gather only (same block schedule, trivial reduce);
  C. matmul only (one resident block reused — no gather);
  D. B+C with precision="default" instead of "highest";
  E. the whole megastep at the group-ladder shape [1, 8, 256].

The table is generated ON DEVICE (no 6 GB upload).  Timing forces
completion by fetching a scalar (bench.py protocol).  Appends a JSON
line per section; run inside tools/tpu_hunt.sh.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ENT = 12_000_000
DIM = 128
ROWS = 2048          # flattened eval rows (g=8 x B=256)
BLOCK = 16384
F = 32


def fence(x):
    float(np.asarray(jax.tree_util.tree_leaves(x)[0],
                     dtype=np.float32).ravel()[0])


def timed(fn, *args, iters=3):
    out = fn(*args)
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    key = jax.random.PRNGKey(0)
    emb = jax.jit(lambda k: jax.random.normal(k, (N_ENT, DIM), jnp.float32)
                  * 0.01)(key)
    fence(emb)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N_ENT, (ROWS,), dtype=np.int64)
                      .astype(np.int32))
    side = jax.jit(lambda k: jax.random.normal(k, (ROWS, DIM), jnp.float32)
                   )(key)
    pos = jnp.zeros((ROWS,), jnp.float32)
    n_blocks = -(-N_ENT // BLOCK)
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLOCK

    results = {}

    # B: gather-only — stream every block's candidate rows, trivial reduce
    @jax.jit
    def gather_only(emb):
        def body(start):
            ids_l = start + jnp.arange(BLOCK)
            cand = emb[jnp.minimum(ids_l, N_ENT - 1)]
            return jnp.sum(cand, axis=0)
        return jnp.sum(jax.lax.map(body, starts))

    results["gather_only_s"] = round(timed(gather_only, emb), 3)
    results["gather_GBps"] = round(N_ENT * DIM * 4 / 2**30
                                   / results["gather_only_s"], 1)

    # B2: dynamic-slice-only — the ids are contiguous, so a true slice
    # is the roofline for this access pattern
    @jax.jit
    def slice_only(emb):
        def body(start):
            cand = jax.lax.dynamic_slice(
                emb, (jnp.minimum(start, N_ENT - BLOCK), 0), (BLOCK, DIM))
            return jnp.sum(cand, axis=0)
        return jnp.sum(jax.lax.map(body, starts))

    results["slice_only_s"] = round(timed(slice_only, emb), 3)

    # C: matmul-only — one resident candidate block, same matmul count
    cand0 = jax.jit(lambda k: jax.random.normal(
        k, (BLOCK, DIM), jnp.float32))(key)

    def matmul_only_p(precision):
        @jax.jit
        def f(side, cand0):
            def body(_):
                ab = jnp.einsum("md,nd->mn", side, cand0,
                                preferred_element_type=jnp.float32,
                                precision=precision)
                return jnp.sum(ab >= pos[:, None], axis=1,
                               dtype=jnp.int32)
            return jnp.sum(jax.lax.map(body, starts), axis=0)
        return f

    for prec in ("highest", "default"):
        s = timed(matmul_only_p(prec), side, cand0)
        results[f"matmul_only_{prec}_s"] = round(s, 3)
        results[f"matmul_{prec}_TFLOPs"] = round(
            ROWS * N_ENT * DIM * 2 / 1e12 / s, 1)

    # A: the real eval_ranks body at this shape (gather + l2-matmul +
    # GE-counts + filter subtraction), both precisions via env toggle
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.models.ke_model import KEModel

    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=DIM, gamma=4.0,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    batch_size_eval=256, dataset="diag", seed=0)
    model = KEModel(cfg, N_ENT, 3)
    state = model.init_state(jax.random.PRNGKey(1))
    fence(state.entity.emb)
    fid = jnp.asarray(rng.integers(0, N_ENT, (ROWS, F), dtype=np.int64)
                      .astype(np.int32))
    fm = jnp.ones((ROWS, F), jnp.uint8)
    h = ids
    r = jnp.zeros((ROWS,), jnp.int32)
    t = jnp.asarray(rng.integers(0, N_ENT, (ROWS,), dtype=np.int64)
                    .astype(np.int32))

    eval_fn = jax.jit(lambda st, h, r, t, fid, fm: model.eval_ranks(
        st, h, r, t, fid, fm, neg_head=False))
    s = timed(eval_fn, state, h, r, t, fid, fm)
    results["eval_ranks_s"] = round(s, 3)
    results["eval_edges_per_s"] = round(ROWS / s, 1)

    # E: the megastep at the ladder shape [1, 8, 256]
    mega = model.make_eval_megastep()
    g, b = 8, 256
    s = timed(lambda: mega(state, h.reshape(1, g, b), r.reshape(1, g, b),
                           t.reshape(1, g, b), fid.reshape(1, g, b, F),
                           fm.reshape(1, g, b, F), False), iters=3)
    results["megastep_ladder_s"] = round(s, 3)
    results["megastep_edges_per_s"] = round(ROWS / s, 1)

    rec = {"metric": "diag_bigvocab_eval", "n_entities": N_ENT,
           "dim": DIM, "rows": ROWS, "block": BLOCK,
           "n_blocks": int(n_blocks),
           "backend": jax.default_backend(), **results,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "session_r5_diag_bigvocab_eval.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
