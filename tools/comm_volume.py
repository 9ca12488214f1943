"""Comm-volume scaling record: collective bytes vs mesh size (P5 proxy).

Multi-chip hardware is unavailable in this environment, so the
vocab-sharded scaling claim rests on the best measurable proxy: the
COMPILED HLO's collective traffic.  For n = 8 / 16 / 32 virtual devices
this script lowers the device-resident train step and the vocab-sharded
eval megastep, sums the bytes moved by every collective
(all-gather / all-reduce / all-to-all / collective-permute /
reduce-scatter), and reports:

  * train-step collective bytes per step — must scale with the BATCH
    (doubling the batch ~doubles it) and must NOT scale with the table;
  * eval collective bytes per call — candidate/batch-proportional;
  * per-device entity-table residency — exactly ceil(E / n) rows (the
    1/n HBM scaling that lets a pod hold Freebase-scale tables).

This is the quantitative record behind the PARITY.md claim that the
SPMD design reproduces the reference KVStore's "only the batch's rows
ever cross the network" contract (kvserver.py:41-51) at every mesh
size, with the reference's measured-dist-throughput table
(docs/source/benchmarks.rst:203-207) as the analogous upstream record.

Usage:  python tools/comm_volume.py [--json]     (runs on CPU, ~2 min)
"""

import json
import re
import sys

import os
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=32")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dglke_tpu.config import KGEConfig  # noqa: E402
from dglke_tpu.data.dataset import synthetic_dataset  # noqa: E402
from dglke_tpu.models.ke_model import KEModel  # noqa: E402
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh  # noqa: E402
from dglke_tpu.trainer import DevicePipeline  # noqa: E402

# One instruction DEFINITION line: `%name = <result shape> opcode(...)`.
# Anchoring to the line start (name, `=`, shape, opcode immediately
# followed by `(`) is load-bearing: consumer lines that merely reference
# a collective-named operand (`fusion(%all-gather.33, ...)`,
# `get-tuple-element(%all-reduce.40), index=0`) must NOT count — the
# `.N` name suffix fails the required `(`, so only definitions match.
# `-start` matches the async forms; `-done` lines deliberately do NOT
# match (the start already carries the shapes — counting both would
# double-count).
_COLLECTIVE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+ = ([^=]*?)\s*"
    r"(all-gather|all-reduce|collective-permute|all-to-all|reduce-scatter)"
    r"(-start)?\(", re.M)
_SHAPE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
          "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
          "pred": 1}

N_ENT, N_REL = 5000, 11
HID = 32


def collective_bytes(hlo: str) -> int:
    """Total bytes in all collective results (every shape of a tuple
    result counts: variadic all-reduces move each member).  For async
    `-start` ops the result tuple also aliases the operand buffer, so
    this slightly OVERcounts them — safe for the upper-bound guards in
    tests/test_comm_volume.py (an undercount could never trip one)."""
    total = 0
    for m in _COLLECTIVE.finditer(hlo):
        for dtype, dims_s in _SHAPE.findall(m.group(1)):
            dims = [int(d) for d in dims_s.split(",") if d]
            total += int(np.prod(dims or [1])) * _BYTES.get(dtype, 4)
    return total


def train_step_bytes(n_dev: int, batch: int) -> int:
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=HID, gamma=6.0,
                    lr=0.1, batch_size=batch, neg_sample_size=16,
                    steps_per_call=2)
    ds = synthetic_dataset(n_entities=N_ENT, n_relations=N_REL,
                           n_train=max(2000, 4 * batch))
    plan = ShardingPlan(make_mesh(n_dev), table_sharding="vocab")
    model = KEModel(cfg, N_ENT, N_REL)
    state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
    pipe = DevicePipeline(model, ds, batch, cfg.num_chunks * 16, 2,
                          seed=0, plan=plan)
    fn = model.make_device_pipeline_step(ds.n_train, batch,
                                         cfg.num_chunks * 16, 2,
                                         donate=False, plan=plan)
    hlo = fn.lower(state, pipe.triples, pipe.impts, pipe.cur, pipe.nxt,
                   jnp.int32(0), jnp.int32(0), jnp.int32(0),
                   jax.random.PRNGKey(0),
                   refresh_next=False).compile().as_text()
    return collective_bytes(hlo) // 2  # the call fuses 2 steps


def eval_call_bytes(n_dev: int, batch: int, f: int = 64) -> int:
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=HID, gamma=6.0,
                    batch_size_eval=batch)
    plan = ShardingPlan(make_mesh(n_dev), table_sharding="vocab")
    model = KEModel(cfg, N_ENT, N_REL)
    state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
    fn = model.make_sharded_eval_megastep(plan)
    m, g = 1, 2
    i = lambda *s: jax.ShapeDtypeStruct(s, np.int32)  # noqa: E731
    hlo = fn.lower(state, i(m, g, batch), i(m, g, batch), i(m, g, batch),
                   i(m, g, batch, f),
                   jax.ShapeDtypeStruct((m, g, batch, f), np.uint8),
                   True).compile().as_text()
    return collective_bytes(hlo)


def main():
    as_json = "--json" in sys.argv
    total = len(jax.devices())
    # DGLKE_COMM_SIZES=8,16 lets CI run a reduced sweep
    want = [int(x) for x in
            os.environ.get("DGLKE_COMM_SIZES", "8,16,32").split(",")]
    sizes = [n for n in want if n <= total]
    rows = []
    for n in sizes:
        tb = train_step_bytes(n, 64)
        tb2 = train_step_bytes(n, 128)
        ev = eval_call_bytes(n, 16)
        res_rows = -(-N_ENT // n)
        rows.append({"n_devices": n,
                     "train_bytes_per_step_b64": tb,
                     "train_bytes_per_step_b128": tb2,
                     "batch_ratio": round(tb2 / tb, 3),
                     "eval_bytes_per_call": ev,
                     "table_rows_per_device": res_rows,
                     "table_bytes_per_device": res_rows * HID * 4})
    out = {"n_entities": N_ENT, "hidden_dim": HID, "rows": rows}
    if as_json:
        print(json.dumps(out))
        return
    print(f"entity table: {N_ENT} x {HID} f32 "
          f"({N_ENT * HID * 4 / 1e6:.2f} MB global)")
    print(f"{'n':>4} {'train B/step (b=64)':>20} {'b=128':>10} "
          f"{'ratio':>6} {'eval B/call':>12} {'rows/dev':>9}")
    for r in rows:
        print(f"{r['n_devices']:>4} {r['train_bytes_per_step_b64']:>20,} "
              f"{r['train_bytes_per_step_b128']:>10,} "
              f"{r['batch_ratio']:>6} {r['eval_bytes_per_call']:>12,} "
              f"{r['table_rows_per_device']:>9}")


if __name__ == "__main__":
    main()
