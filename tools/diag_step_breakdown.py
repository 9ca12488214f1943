"""Decompose the flagship fused train step (TransE_l2, bench shape) into
its components on a real chip, to see where the ~290 us/step go.

Motivation: at 3.44M triples/s the full step takes ~290 us, but its raw
data movement is tiny — ~2,200 gathered rows + state and the scatter
back, ~10-20 MB/step, which at the v5e's HBM rate (231 GB/s measured
for scattered rows, tools/bench_rows.py) is <100 us.  Each variant
below is the SAME scanned 1024-step program with components removed, so
pairwise deltas attribute the time:

  rng_only      epoch-slice + per-step negative draw (hybrid keys)
  gather_only   + the [3B+CK, D] entity / [B, Dr] relation gathers
  fwd_only      + scores, self-adv softmax, logsigmoid loss
  no_update     + backward (value_and_grad), grads discarded
  full_step     + sparse Adagrad scatter update of both tables
  update_only   rng + gather-ids + scatter update with synthetic grads
                (the update arm in isolation)

Protocol: same completion fence as bench.py (fetch a dependent scalar),
2 calls per timed group, median of 3 groups, compile excluded.  Writes
tools/session_r5_step_breakdown.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1000
K = 200
S = 1024
N_ENT, N_REL = 14951, 1345
N_EDGES = 4_096_000
GROUP_CALLS = 2
N_GROUPS = 3


def build_variant(model, kind, triples):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dglke_tpu.models.ke_model import (TrainState, _pipeline_step_keys)
    from dglke_tpu.ops.embedding import gather_rows, sparse_adagrad_update

    cfg = model.config

    def fwd_loss(st, h, r, t, neg):
        ent_ids = jnp.concatenate([h, t, neg])
        ent_rows = gather_rows(st.entity, ent_ids, dim=model.entity_dim,
                               dtype=jnp.float32)
        rel_rows = gather_rows(st.relation, r, dim=model.relation_dim,
                               dtype=jnp.float32)
        pos, negs, _ = model._pos_neg_scores(
            (ent_rows[:B], ent_rows[B:2 * B]), rel_rows, ent_rows[2 * B:],
            None, neg_head=False, num_chunks=1, chunk_size=B,
            neg_sample_size=K)
        loss, _log = model.loss_gen.get_total_loss(pos, negs, None)
        return loss

    def one(st, acc, row_idx, k, neg_head):
        h = triples[0, row_idx]
        r = triples[1, row_idx]
        t = triples[2, row_idx]
        neg = jax.random.randint(k, (K,), 0, model.n_entities, jnp.int32)
        if kind == "rng_only":
            return st, acc + jnp.sum(h) + jnp.sum(neg)
        if kind == "gather_only":
            ent_ids = jnp.concatenate([h, t, neg])
            ent_rows = gather_rows(st.entity, ent_ids,
                                   dim=model.entity_dim, dtype=jnp.float32)
            rel_rows = gather_rows(st.relation, r,
                                   dim=model.relation_dim,
                                   dtype=jnp.float32)
            return st, acc + jnp.sum(ent_rows) + jnp.sum(rel_rows)
        if kind == "fwd_only":
            return st, acc + fwd_loss(st, h, r, t, neg)
        if kind == "no_update":
            loss, log, grads = model.loss_and_grads(
                st, h, r, t, neg, None, neg_head=neg_head)
            ent_ids, ent_grads, g_r, _ = grads
            return st, acc + loss + ent_grads[0, 0] + g_r[0, 0]
        if kind == "update_only":
            ent_ids = jnp.concatenate([h, t, neg])
            # synthetic grads, data-dependent on acc so nothing folds away
            ge = jnp.full((ent_ids.shape[0], model.entity_dim), 1e-9,
                          jnp.float32) * (1.0 + 1e-12 * acc)
            gr = jnp.full((B, model.relation_dim), 1e-9,
                          jnp.float32) * (1.0 + 1e-12 * acc)
            entity = sparse_adagrad_update(st.entity, ent_ids, ge, cfg.lr)
            relation = sparse_adagrad_update(st.relation, r, gr, cfg.lr)
            st = TrainState(entity=entity, relation=relation,
                            projection=st.projection, step=st.step + 1)
            return st, acc
        if kind == "full_step":
            st, log = model.train_step(st, h, r, t, neg, None,
                                       neg_head=neg_head)
            return st, acc + log["loss"]
        raise ValueError(kind)

    def call(state, cur, pos, base_key, acc0):
        idx = lax.dynamic_slice(cur, (pos,), (S * B,)).reshape(S // 2, 2, B)
        keys = _pipeline_step_keys(base_key, 0, S)

        def body(carry, xs):
            st, acc = carry
            row_pair, key_pair = xs
            st, acc = one(st, acc, row_pair[0], key_pair[0], True)
            st, acc = one(st, acc, row_pair[1], key_pair[1], False)
            return (st, acc), ()

        (state, acc), _ = lax.scan(body, (state, acc0), (idx, keys))
        return state, acc

    return jax.jit(call, donate_argnums=(0,))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dglke_tpu.config import KGEConfig
    from dglke_tpu.models.ke_model import KEModel

    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=B, neg_sample_size=K,
                    neg_adversarial_sampling=True,
                    regularization_coef=1e-9, steps_per_call=S)
    model = KEModel(cfg, N_ENT, N_REL)

    rng = np.random.RandomState(0)
    triples_h = np.stack([
        rng.randint(0, N_ENT, N_EDGES).astype(np.int32),
        rng.randint(0, N_REL, N_EDGES).astype(np.int32),
        rng.randint(0, N_ENT, N_EDGES).astype(np.int32)])
    triples = jax.device_put(triples_h)
    perm = jax.device_put(
        rng.permutation(N_EDGES).astype(np.int32))
    base_key = jax.random.PRNGKey(7)
    jax.block_until_ready((triples, perm))

    out = {"metric": "step_breakdown_transe_l2_bench_shape",
           "batch": B, "neg": K, "dim": 400, "steps_per_call": S,
           "backend": jax.default_backend(), "variants": {}}
    results = {}
    for kind in ["rng_only", "gather_only", "fwd_only", "no_update",
                 "full_step", "update_only"]:
        fn = build_variant(model, kind, triples)
        # fresh state per variant: the donated table is consumed by each
        # variant's calls
        st = model.init_state(jax.random.PRNGKey(0))
        acc = jnp.float32(0.0)
        pos = 0
        t_compile = time.time()
        st, acc = fn(st, perm, pos, base_key, acc)
        float(acc)  # fence
        compile_s = time.time() - t_compile
        pos = S * B
        groups = []
        for _ in range(N_GROUPS):
            t0 = time.time()
            for _ in range(GROUP_CALLS):
                st, acc = fn(st, perm, pos % (N_EDGES - S * B), base_key,
                             acc)
                pos += S * B
            float(acc)  # fence: dependent scalar to host
            groups.append(time.time() - t0)
        med = sorted(groups)[len(groups) // 2]
        us_per_step = med / (GROUP_CALLS * S) * 1e6
        results[kind] = us_per_step
        out["variants"][kind] = {
            "us_per_step": round(us_per_step, 1),
            "compile_s": round(compile_s, 1),
            "groups_s": [round(g, 3) for g in groups]}
        print(f"[{kind}] {us_per_step:.1f} us/step "
              f"(compile {compile_s:.1f}s)", flush=True)
        del st

    d = results
    out["attribution_us"] = {
        "rng_sampling": round(d["rng_only"], 1),
        "gathers": round(d["gather_only"] - d["rng_only"], 1),
        "forward": round(d["fwd_only"] - d["gather_only"], 1),
        "backward": round(d["no_update"] - d["fwd_only"], 1),
        "update_scatter": round(d["full_step"] - d["no_update"], 1),
        "update_only_direct": round(d["update_only"], 1),
        "full": round(d["full_step"], 1),
    }
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "session_r5_step_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["attribution_us"]))


if __name__ == "__main__":
    main()
