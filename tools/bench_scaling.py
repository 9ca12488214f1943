"""Scaling-efficiency harness: device-pipeline training throughput at mesh
sizes 1..N on the local host (SURVEY.md build plan step 7).

Prints triples/s per mesh size plus scaling efficiency vs 1 device.  On
CPU (virtual devices) the absolute numbers are meaningless but the
mechanics — sharded tables, dp-split batches, scanned pipeline — are the
production path.

Usage: python tools/bench_scaling.py [table_sharding] [n_entities]
"""

import sys
import time

import jax

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.trainer import DevicePipeline


def run(n_dev, sharding, n_entities, n_calls=8):
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True, steps_per_call=256)
    ds = synthetic_dataset(n_entities=n_entities, n_relations=1345,
                           n_train=cfg.steps_per_call * cfg.batch_size,
                           seed=0)
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    plan = (ShardingPlan(make_mesh(n_dev), table_sharding=sharding)
            if n_dev > 1 else None)
    state = model.init_state(jax.random.PRNGKey(0))
    if plan is not None:
        state = plan.put_state(state)
    pipe = DevicePipeline(model, ds, cfg.batch_size,
                          cfg.num_chunks * cfg.neg_sample_size,
                          cfg.steps_per_call, seed=0, plan=plan)
    state, log = pipe.run_call(state)          # compile
    float(log["loss"])
    t0 = time.time()
    for _ in range(n_calls):
        state, log = pipe.run_call(state)
    float(log["loss"])                         # completion fence
    dt = time.time() - t0
    return n_calls * cfg.steps_per_call * cfg.batch_size / dt


def main():
    sharding = sys.argv[1] if len(sys.argv) > 1 else "vocab"
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= total]
    base = None
    for n in sizes:
        tps = run(n, sharding, n_entities)
        base = base or tps
        eff = tps / (base * n)
        print(f"{n:3d} devices: {tps / 1e6:8.2f}M triples/s  "
              f"scaling efficiency {eff:5.1%}")


if __name__ == "__main__":
    main()
