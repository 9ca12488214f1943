"""2-process A/B: fused device-resident --dist hot loop vs per-step
host-fed dispatch.

The round-3 review noted the multi-host throughput story was 100% proxy
(compiled-HLO bytes).  With the fused pipeline landed, this measures the
real thing the fusion removes — per-step host work + dispatch — by
training the same workload over 2 Gloo processes x 2 virtual CPU devices
both ways:

  fused:    DevicePipeline multihost path (steps_per_call=16, batches
            assembled on device, 3 int32 scalars per call);
  per-step: steps_per_call=1 (one plan.put_batch — per-array
            make_array_from_process_local_data — plus one global
            dispatch per step; trainer.py's pre-round-4 --dist path).

CPU Gloo under-states the gap a tunneled/real pod sees (its dispatch
costs ~ms, not ~40 ms), so the ratio here is a LOWER bound on the fused
path's win.  Writes tools/session_r4_dist_ab.json from rank 0.

Usage:  python tools/dist_ab.py          (spawns its own 2 workers, CPU)
"""

import json
import os
import socket
import subprocess
import sys
import time

_WORKER = r"""
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank,
                           cluster_detection_method="deactivate")
sys.path.insert(0, os.environ["DGLKE_REPO"])
import numpy as np
from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import KGDataset, synthetic_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.trainer import train

full = synthetic_dataset(n_entities=5000, n_relations=11, n_train=60000,
                         seed=3)
h, r, t = full.train
part = slice(rank, None, 2)
ds = KGDataset(name="ab", n_entities=5000, n_relations=11,
               train=(h[part], r[part], t[part]))

out = {}
# the per-step arm runs ~1 s/step on CPU Gloo (that gap IS the result),
# so it times fewer steps; us_per_step normalizes
import dataclasses
for label, spc, steps in (("fused", 16, 512), ("per_step", 1, 64)):
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=64, gamma=10.0,
                    lr=0.1, batch_size=512, neg_sample_size=64,
                    max_step=steps, log_interval=10**9, seed=5,
                    steps_per_call=spc, dataset="ab")
    plan = ShardingPlan(make_mesh(4), table_sharding="vocab")
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    # warmup run (compiles); then timed run on a fresh state
    warm = dataclasses.replace(cfg, max_step=32 if spc == 1 else steps)
    train(warm, ds, model=model, plan=plan, log=lambda *a: None)
    t0 = time.time()
    train(cfg, ds, model=model, plan=plan, log=lambda *a: None)
    dt = time.time() - t0
    out[label] = {"s_total": round(dt, 3), "steps": steps,
                  "us_per_step": round(dt / cfg.max_step * 1e6, 1)}
print("ABRESULT" + str(rank) + __import__("json").dumps(out))
"""


def main():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = "/tmp/dist_ab_worker.py"
    with open(worker, "w") as f:
        f.write(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["DGLKE_REPO"] = repo
    procs = [subprocess.Popen([sys.executable, worker, str(rank),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, cwd=repo)
             for rank in (0, 1)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            raise SystemExit(f"rank {rank} failed")
    import re
    m = re.search(r"ABRESULT0(\{.*\})", outs[0])
    rec = json.loads(m.group(1))
    rec = {"metric": "dist_fused_vs_per_step_cpu_gloo",
           "note": "2 proc x 2 virtual CPU devices; CPU dispatch is ~ms "
                   "so this is a LOWER bound on the fused win",
           **rec,
           "speedup": round(rec["per_step"]["us_per_step"]
                            / rec["fused"]["us_per_step"], 2),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    with open(os.path.join(repo, "tools", "session_r4_dist_ab.json"),
              "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
