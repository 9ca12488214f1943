"""Benchmark: training throughput of the flagship config on real hardware.

Measures triples/s for TransE_l2 with the reference FB15k headline
hyper-parameters (batch 1000, neg 200, dim 400, self-adversarial — the
config behind DGL-KE's "167 s on 1x V100" number).  Baseline:
24000 steps x 1000 triples / 167.1 s = 143.6k triples/s on one V100
(/root/reference/examples/fb15k/multi_gpu.sh "Script Result").

Timing protocol: the pipeline is fully device-resident (triples in HBM,
batches + negatives sampled on device, steps fused into one scanned call);
completion is FORCED by fetching the final loss to the host, because on the
tunneled test platform block_until_ready does not reliably wait.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

V100_TRIPLES_PER_S = 24000 * 1000 / 167.1  # reference 1-GPU FB15k anchor


def main():
    import jax

    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import DevicePipeline

    n_entities, n_relations = 14951, 1345
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True, regularization_coef=1e-9,
                    steps_per_call=1024)
    # Edge count is a free parameter for a throughput benchmark; use enough
    # synthetic edges that one scanned device call stays within an epoch.
    ds = synthetic_dataset(n_entities=n_entities, n_relations=n_relations,
                           n_train=4_096_000, seed=0)
    model = KEModel(cfg, n_entities, n_relations)
    state = model.init_state(jax.random.PRNGKey(0))
    pipe = DevicePipeline(model, ds, cfg.batch_size,
                          cfg.num_chunks * cfg.neg_sample_size,
                          cfg.steps_per_call, seed=0)

    def run(n_calls):
        nonlocal state
        log = None
        for _ in range(n_calls):
            state, log = pipe.run_call(state)
        return float(log["loss"])  # host fetch = completion fence

    # Warm one full epoch + 1: compiles BOTH jit variants (the straddling
    # call that regenerates the next epoch's permutation is a second
    # specialization — without this the 20s+ tunnel compile lands inside
    # the timed window).
    import math
    run(math.ceil(4_096_000 / (cfg.steps_per_call * cfg.batch_size)) + 1)
    s = cfg.steps_per_call
    n_calls = 24
    t0 = time.time()
    final_loss = run(n_calls)
    dt = time.time() - t0
    triples_per_s = n_calls * s * cfg.batch_size / dt

    print(json.dumps({
        "metric": "fb15k_transe_l2_train_throughput",
        "value": round(triples_per_s, 1),
        "unit": "triples/s",
        "vs_baseline": round(triples_per_s / V100_TRIPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
