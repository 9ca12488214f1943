"""Benchmark: training throughput of the flagship config on real hardware.

Measures triples/s for TransE_l2 with the reference FB15k headline
hyper-parameters (batch 1000, neg 200, dim 400, self-adversarial — the
config behind DGL-KE's "167 s on 1x V100" number).  Baseline:
24000 steps x 1000 triples / 167.1 s = 143.6k triples/s on one V100
(/root/reference/examples/fb15k/multi_gpu.sh "Script Result").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

V100_TRIPLES_PER_S = 24000 * 1000 / 167.1  # reference 1-GPU FB15k anchor


def main():
    import jax

    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.data.sampler import TrainSampler
    from dglke_tpu.models.ke_model import KEModel

    n_entities, n_relations = 14951, 1345
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True, regularization_coef=1e-9,
                    steps_per_call=256)
    from dglke_tpu.data.sampler import SuperbatchSampler

    ds = synthetic_dataset(n_entities=n_entities, n_relations=n_relations,
                           n_train=400_000, seed=0)
    model = KEModel(cfg, n_entities, n_relations)
    state = model.init_state(jax.random.PRNGKey(0))
    sampler = TrainSampler(ds, cfg.batch_size, cfg.neg_sample_size, seed=0)
    from dglke_tpu.trainer import Prefetcher

    s = cfg.steps_per_call
    try:
        from dglke_tpu.data import native
        src = native.NativeSuperbatchSampler(
            sampler.h, sampler.r, sampler.t, sampler.n_entities,
            cfg.batch_size, sampler.num_chunks * sampler.neg_sample_size,
            s, seed=0) if native.available() else SuperbatchSampler(
                sampler, s)
    except Exception:
        src = SuperbatchSampler(sampler, s)
    feeder = Prefetcher(src, lambda b: b, depth=4, stage_in_worker=False)
    step_fn = model.make_train_superstep(cfg.batch_size, s)

    def run(n_calls):
        nonlocal state
        for _ in range(n_calls):
            b = next(feeder)
            state, log = step_fn(state, b["packed"], b["impts"])
        jax.block_until_ready(state.entity.emb)
        return log

    run(2)  # warmup/compile
    # long enough that the prefetch queue's head start cannot flatter the
    # steady-state rate
    n_calls = 60
    t0 = time.time()
    run(n_calls)
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
