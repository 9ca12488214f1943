"""CI guard on the comm-volume scaling record (tools/comm_volume.py).

The multi-chip claim's quantitative proxy: compiled-HLO collective bytes
must scale with the BATCH and not with the mesh or the table, and the
per-device table residency must fall as 1/n.  Runs the tool in a
subprocess because it needs its own device count (32 virtual CPUs vs
conftest's 8); covers the full n = 8/16/32 sweep that the
docs/benchmarks.md table publishes."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_comm_volume_scaling_record():
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=32",
               DGLKE_COMM_SIZES="8,16,32")
    env.pop("PYTHONPATH", None)  # the tool inserts the repo root itself
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "comm_volume.py"),
         "--json"],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rows = {r["n_devices"]: r for r in rec["rows"]}
    assert set(rows) == {8, 16, 32}
    for n, r in rows.items():
        # comm ∝ batch: doubling the batch ~doubles the collective bytes
        assert 1.6 <= r["batch_ratio"] <= 2.4, r
        # comm NOT ∝ table: a table gather would cost >= E*H*4 bytes alone
        table_bytes = rec["n_entities"] * rec["hidden_dim"] * 4
        assert r["train_bytes_per_step_b64"] < table_bytes, r
        # 1/n residency
        assert r["table_rows_per_device"] == -(-rec["n_entities"] // n)
    # growing the mesh must not grow per-step collective traffic
    for n in (16, 32):
        assert (rows[n]["train_bytes_per_step_b64"]
                <= 1.1 * rows[8]["train_bytes_per_step_b64"]), rows
    # eval traffic is batch-derived, so it is mesh-size-invariant
    assert (rows[8]["eval_bytes_per_call"]
            == rows[16]["eval_bytes_per_call"]
            == rows[32]["eval_bytes_per_call"])


def test_collective_bytes_counting_rule():
    """Locks the HLO counting rule: every member of a tuple result is
    summed, async -start forms count once, and -done lines do not add
    (the start already carried the shapes)."""
    sys.path.insert(0, REPO)
    from tools.comm_volume import collective_bytes

    sync = "  %ar = f32[8,64]{1,0} all-reduce(f32[8,64] %p), to_apply=%add\n"
    assert collective_bytes(sync) == 8 * 64 * 4

    tup = ("  %v = (f32[8,64], bf16[4,4]) all-reduce(%a, %b), "
           "to_apply=%add\n")
    assert collective_bytes(tup) == 8 * 64 * 4 + 4 * 4 * 2

    start_done = (
        "  %ags = (f32[2,8], f32[16,8]) all-gather-start(f32[2,8] %p), "
        "dimensions={0}\n"
        "  %agd = f32[16,8] all-gather-done((f32[2,8], f32[16,8]) %ags)\n")
    # start counts its full tuple (operand alias included — errs high,
    # never low); done adds nothing
    assert collective_bytes(start_done) == (2 * 8 + 16 * 8) * 4

    none = "  %f = f32[128,128] fusion(f32[128,128] %p), kind=kLoop\n"
    assert collective_bytes(none) == 0

    # consumer lines that merely REFERENCE a collective-named operand
    # must not count: only instruction definitions move bytes
    consumers = (
        "  %fusion.3 = f32[64,32] fusion(f32[64,32] %all-gather.33, "
        "f32[64,32] %p), kind=kLoop\n"
        "  %gte.1 = f32[8,64] get-tuple-element((f32[8,64], f32[8,64]) "
        "%all-reduce.40), index=0\n"
        "  %copy.2 = f32[4,4] copy(f32[4,4] %reduce-scatter.7)\n")
    assert collective_bytes(consumers) == 0

    # ...and a real definition amid consumers counts exactly once
    mixed = consumers + (
        "  %all-reduce.40 = f32[8,64] all-reduce(f32[8,64] %p), "
        "to_apply=%add\n")
    assert collective_bytes(mixed) == 8 * 64 * 4
