"""Single-process 8-virtual-device A/B: the fused multi-host pipeline
program vs per-step plan.put_batch dispatch (VERDICT r4 next #6).

The 2-process Gloo A/B (tools/dist_ab.py) is collective-latency-dominated
and undersells the fused path's win; this variant removes Gloo entirely
by executing the EXACT multi-host program (make_device_pipeline_step_
multihost, nproc=4 x local=2 — the same lowering the HLO gate checks,
tests/test_hlo_sharding.py:218-241) on one process's 8 virtual CPU
devices, against the pre-round-4 per-step --dist path (one
plan.put_batch + one global dispatch per step).

Measured per arm:
  * wall time per step (after a full compile + warm pass);
  * host->device TRANSFERS per step, counted by running one timed
    segment under jax.transfer_guard("log") with stderr captured at the
    fd level (absl C++ log lines carry the aval of every transfer), and
    the transferred bytes summed from those avals.

The fused program's per-call host traffic is 3 int32 scalars + the raw
key data — O(1) per CALL of steps_per_call steps; the per-step path
uploads 4 batch-sized arrays per STEP.  Writes
tools/session_r5_dist_ab_8dev.json.

Usage: python tools/dist_ab_8dev.py        (CPU, ~2 min)
"""

import json
import os
import re
import sys
import tempfile
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dglke_tpu.config import KGEConfig  # noqa: E402
from dglke_tpu.data.dataset import synthetic_dataset  # noqa: E402
from dglke_tpu.data.sampler import TrainSampler  # noqa: E402
from dglke_tpu.models.ke_model import KEModel  # noqa: E402
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh  # noqa: E402

N_ENT, N_REL = 20_000, 11
N_EDGES = 200_000
BATCH = 512           # global batch (so put_batch arrays match)
NEG = 64
SPC = 16              # fused steps per call
NPROC, LOCAL = 4, 2   # faked pod topology over the 8-device mesh

_AVAL = re.compile(r"aval=ShapedArray\((\w+)\[([\d,]*)\]")
_BYTES = {"float32": 4, "int32": 4, "uint32": 4, "uint8": 1,
          "bfloat16": 2, "float64": 8, "int64": 8, "key": 4}


def _parse_transfers(path):
    n, total = 0, 0
    with open(path) as f:
        for line in f:
            if "host-to-device transfer" not in line:
                continue
            n += 1
            m = _AVAL.search(line)
            if m:
                dt, dims = m.groups()
                elems = int(np.prod([int(d) for d in dims.split(",")
                                     if d])) if dims else 1
                total += elems * _BYTES.get(dt, 4)
    return n, total


class _CaptureStderrFd:
    """Redirect fd 2 into a file for the duration (absl C++ logging
    writes to the raw fd, so Python-level sys.stderr capture misses it)."""

    def __init__(self, path):
        self.path = path

    def __enter__(self):
        sys.stderr.flush()
        self.saved = os.dup(2)
        self.f = open(self.path, "w")
        os.dup2(self.f.fileno(), 2)
        return self

    def __exit__(self, *a):
        os.dup2(self.saved, 2)
        os.close(self.saved)
        self.f.close()


def fence(x):
    float(np.asarray(jax.tree_util.tree_leaves(x)[0],
                     dtype=np.float32).ravel()[0])


def run_fused(model, state, plan, triples, timed_calls=32):
    """Execute the multi-host fused program single-process (the
    construction mirrors DevicePipeline._init_multihost with the pod
    topology faked as nproc=4 x local=2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = plan.mesh.devices.size
    sh_plane = NamedSharding(plan.mesh, P(plan.axis, None, None))
    sh_rows = NamedSharding(plan.mesh, P(plan.axis, None))
    plane = jax.device_put(
        np.ascontiguousarray(np.broadcast_to(triples[None],
                                             (ndev, 3, N_EDGES))), sh_plane)
    kd = np.asarray(jax.random.key_data(jax.random.key(0)))
    fn = model.make_device_pipeline_step_multihost(
        N_EDGES, BATCH // NPROC, model.config.num_chunks * NEG, SPC, plan,
        nproc=NPROC, local=LOCAL, key_impl=None)

    def gen(kd, e):
        base = jax.random.wrap_key_data(kd)
        host = jnp.arange(ndev, dtype=jnp.int32) // LOCAL
        keys = jax.vmap(lambda hh: jax.random.fold_in(base,
                                                      e * NPROC + hh))(host)
        return jax.vmap(lambda k: jax.random.permutation(k, N_EDGES)
                        )(keys).astype(jnp.int32)

    gen = jax.jit(gen, static_argnums=(1,), out_shardings=sh_rows)
    cur, nxt = gen(kd, 0), gen(kd, 1)

    def call(state, nxt, pos, epoch, ci):
        (state, nxt), logs = fn(state, plane, None, cur, nxt,
                                np.int32(pos), np.int32(epoch),
                                np.int32(ci), kd, refresh_next=False)
        return state, nxt, logs

    # compile + warm (donated buffers need fresh pos each call)
    state, nxt, logs = call(state, nxt, 0, 0, 0)
    fence(logs)
    t0 = time.time()
    pos = SPC * (BATCH // NPROC)
    for i in range(timed_calls):
        state, nxt, logs = call(state, nxt, pos, 0, i + 1)
        pos += SPC * (BATCH // NPROC)
    fence(logs)
    wall = time.time() - t0

    # transfer count over a short segment under the guard
    log_path = tempfile.mktemp(suffix=".log")
    with _CaptureStderrFd(log_path):
        with jax.transfer_guard("log_explicit"):
            for i in range(4):
                state, nxt, logs = call(state, nxt, pos, 0,
                                        timed_calls + 1 + i)
                pos += SPC * (BATCH // NPROC)
        fence(logs)
    n_tr, tr_bytes = _parse_transfers(log_path)
    os.unlink(log_path)
    steps = timed_calls * SPC
    return {"wall_s": round(wall, 3), "steps": steps,
            "us_per_step": round(wall / steps * 1e6, 1),
            "h2d_transfers_per_step": round(n_tr / (4 * SPC), 3),
            "h2d_bytes_per_step": round(tr_bytes / (4 * SPC), 1)}


def run_per_step(model, state, plan, ds, timed_steps=128):
    """Pre-round-4 --dist hot loop: one put_batch + one dispatch/step."""
    sampler = TrainSampler(ds, BATCH, NEG, seed=5)
    step_fn = model.make_train_step()
    it = iter(sampler)

    def one(state):
        batch = next(it)
        arrs = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        batch.update(plan.put_batch(arrs))
        return step_fn(state, batch["h"], batch["r"], batch["t"],
                       batch["neg"], batch.get("impts"),
                       batch["neg_head"])

    state, logs = one(state)  # compile + warm
    fence(logs)
    for _ in range(4):
        state, logs = one(state)
    fence(logs)
    t0 = time.time()
    for _ in range(timed_steps):
        state, logs = one(state)
    fence(logs)
    wall = time.time() - t0

    log_path = tempfile.mktemp(suffix=".log")
    with _CaptureStderrFd(log_path):
        with jax.transfer_guard("log_explicit"):
            for _ in range(8):
                state, logs = one(state)
        fence(logs)
    n_tr, tr_bytes = _parse_transfers(log_path)
    os.unlink(log_path)
    return {"wall_s": round(wall, 3), "steps": timed_steps,
            "us_per_step": round(wall / timed_steps * 1e6, 1),
            "h2d_transfers_per_step": round(n_tr / 8, 3),
            "h2d_bytes_per_step": round(tr_bytes / 8, 1)}


def main():
    assert len(jax.devices()) == 8, jax.devices()
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=64, gamma=10.0,
                    lr=0.1, batch_size=BATCH, neg_sample_size=NEG,
                    steps_per_call=SPC, dataset="ab8", seed=5)
    ds = synthetic_dataset(n_entities=N_ENT, n_relations=N_REL,
                           n_train=N_EDGES, seed=3)
    triples = np.stack(ds.train[:3]).astype(np.int32)
    plan = ShardingPlan(make_mesh(8), table_sharding="vocab")
    model = KEModel(cfg, N_ENT, N_REL)

    state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
    fused = run_fused(model, state, plan, triples)
    state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
    per_step = run_per_step(model, state, plan, ds)

    rec = {
        "metric": "dist_ab_8dev",
        "topology": f"single process, 8 virtual CPU devices, "
                    f"fused program built as nproc={NPROC} x local={LOCAL}",
        "batch_size": BATCH, "neg_sample_size": NEG,
        "steps_per_call_fused": SPC,
        "fused": fused, "per_step": per_step,
        "dispatch_ratio": round(per_step["h2d_transfers_per_step"]
                                / max(fused["h2d_transfers_per_step"],
                                      1e-9), 1),
        "h2d_bytes_ratio": round(per_step["h2d_bytes_per_step"]
                                 / max(fused["h2d_bytes_per_step"], 1e-9),
                                 1),
        "wall_speedup": round(per_step["us_per_step"]
                              / fused["us_per_step"], 2),
        "note": "CPU wall time is a LOWER bound on the fused win: the "
                "tunneled/real-pod dispatch+transfer latency this "
                "removes is ~40 ms per host round trip, vs ~ms on CPU",
        "backend": "cpu",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "session_r5_dist_ab_8dev.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
