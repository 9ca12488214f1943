"""Single-chip large-vocab capacity probe (Freebase-direction rehearsal).

Usage: python tools/capacity_probe.py N_ENTITIES [DIM] [STEPS_PER_CALL]

Builds the flagship training pipeline (TransE_l2, batch 1000, neg 200,
self-adversarial) with a bf16-stored entity table of N_ENTITIES x DIM and
measures device-pipeline throughput — the answer to "what is the largest
vocab one v5e can train at speed?" (BASELINE.md north-star: Freebase 86M
entities needs either sharding or ~4+ chips; this probe maps the
one-chip ceiling).  Prints one JSON line per run.

Run each size in its OWN process (an HBM OOM kills the process):
  for n in 10000000 14000000 16000000; do
    timeout 580 python tools/capacity_probe.py $n || echo "$n FAILED"
  done
"""

import json
import sys
import time


def main():
    n_ent = int(sys.argv[1])
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spc = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    import jax

    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import DevicePipeline

    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=dim, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True,
                    regularization_coef=1e-9, steps_per_call=spc,
                    emb_dtype="bfloat16")
    ds = synthetic_dataset(n_entities=n_ent, n_relations=535,
                           n_train=2_048_000, seed=0)
    model = KEModel(cfg, n_ent, 535)
    t0 = time.time()
    state = model.init_state(jax.random.PRNGKey(0))
    jax.block_until_ready(state.entity.emb)
    init_s = time.time() - t0
    table_gb = n_ent * dim * 2 / 2**30

    pipe = DevicePipeline(model, ds, cfg.batch_size,
                          cfg.num_chunks * cfg.neg_sample_size, spc, seed=0)

    def run(n_calls):
        nonlocal state
        log = None
        for _ in range(n_calls):
            state, log = pipe.run_call(state)
        return float(log["loss"])  # host fetch = completion fence

    run(3)  # compile (both jit variants straddle at 2.048M/512k)
    groups = []
    for _ in range(3):
        t0 = time.time()
        run(2)
        groups.append(time.time() - t0)
    med = sorted(groups)[1]
    tps = 2 * spc * cfg.batch_size / med
    print(json.dumps({
        "metric": "capacity_probe", "n_entities": n_ent, "dim": dim,
        "table_gb_bf16": round(table_gb, 2),
        "value": round(tps, 1), "unit": "triples/s",
        "init_s": round(init_s, 1),
        "groups_s": [round(g, 3) for g in groups],
    }))


if __name__ == "__main__":
    sys.exit(main())
