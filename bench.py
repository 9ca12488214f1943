"""Benchmark: training throughput of the flagship config on real hardware.

Measures triples/s for TransE_l2 with the reference FB15k headline
hyper-parameters (batch 1000, neg 200, dim 400, self-adversarial — the
config behind DGL-KE's "167 s on 1x V100" number).  Baseline:
24000 steps x 1000 triples / 167.1 s = 143.6k triples/s on one V100
(/root/reference/examples/fb15k/multi_gpu.sh "Script Result").

Timing protocol (hardened against the tunneled-TPU flaps documented in
CLAUDE.md — one degraded window must not poison the record):
  * the pipeline is fully device-resident (triples in HBM, batches +
    negatives sampled on device, steps fused into one scanned call);
  * completion is FORCED by fetching the final loss to the host, because
    on the tunneled test platform block_until_ready does not reliably wait;
  * calls are timed in GROUPS of 4 (calls within a group pipeline without a
    host sync, so the ~40 ms tunnel fence amortizes to ~2% of a group);
  * warmup continues until two consecutive groups agree within 10%;
  * throughput comes from the MEDIAN group, and if the max/min group spread
    exceeds 3x the whole measurement is retried once.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...diag}.
"""

import json
import math
import statistics
import subprocess
import sys
import time

V100_TRIPLES_PER_S = 24000 * 1000 / 167.1  # reference 1-GPU FB15k anchor

# The probe matmul uses FRESH random dims each attempt: the execution
# path and the remote compile service wedge independently, and a fixed
# shape hits the persistent compile cache — it would pass while compiles
# hang (the tools/tpu_hunt.sh lesson, commit-documented in CLAUDE.md).
# TWO random dims give ~10^6 distinct shapes (compile keys on both), so
# cache collisions across a long hunt with a persistent cache stay
# negligible, while the matmul itself stays <1 ms / <1 s to compile.
_PROBE = """
import random
import jax, jax.numpy as jnp
d1 = 257 + random.randrange(1000)
d2 = 129 + random.randrange(1000)
x = jnp.ones((d1, d2)) @ jnp.ones((d2, d1))
assert float(x[0, 0]) == float(d2)
"""


def wait_healthy(max_wait_s=1500, probe_timeout_s=150):
    """Block until the device answers a tiny matmul, or max_wait_s.

    The tunneled test TPU wedges intermittently (ops hang indefinitely,
    flapping on the scale of tens of minutes) — a measurement started in
    a wedged window would hang forever instead of recording a number.
    The probe runs in a SUBPROCESS because a hung device op cannot be
    cancelled in-process.  On a healthy device (or CPU) the first probe
    passes in seconds; the timeout budgets a fresh small compile per
    attempt (the probe shape is drawn from ~10^6 possibilities, so a
    persistent-cache hit is negligible — same 150 s budget as
    tools/tpu_hunt.sh).
    """
    deadline = time.time() + max_wait_s
    while True:
        try:
            subprocess.run([sys.executable, "-c", _PROBE], check=True,
                           timeout=probe_timeout_s,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() >= deadline:
                return False  # proceed anyway; better a late hang than none
            time.sleep(45)

GROUP_CALLS = 4       # calls per fenced timing group
N_GROUPS = 8          # groups per measurement
STABLE_RTOL = 0.10    # consecutive-group agreement that ends warmup
MAX_WARM_GROUPS = 8   # cap on stability-warmup groups
RETRY_SPREAD = 3.0    # max/min group spread that triggers one retry
# A uniformly slow tunnel window passes the spread check (r4 recorded
# 2.19M triples/s at spread 1.086 while the same round's fresh-window
# fragment read 3.44M) — so the median is ALSO checked against the best
# prior round record; >25% below triggers one wait-and-remeasure in a
# later window, and a persistent shortfall is flagged in the output.
DEGRADED_VS_PRIOR = 0.75   # median below this fraction of best prior
DEGRADED_WAIT_S = 300      # cool-off before the fresh-window remeasure


def best_prior_record(metric, pattern="BENCH_r*.json"):
    """Best prior round record for `metric` from the driver's artifacts.

    Round-over-round comparisons are only meaningful against the best
    prior measurement of the SAME metric; a missing/corrupt artifact
    contributes nothing (first round, renamed metric, ...).
    """
    import glob
    best = None
    for p in sorted(glob.glob(pattern)):
        try:
            with open(p) as f:
                d = json.load(f)
            d = d.get("parsed", d)  # driver wraps the JSON line
            if d.get("metric") == metric and not d.get("window_degraded"):
                v = float(d["value"])
                best = v if best is None else max(best, v)
        except Exception:  # noqa: BLE001 - artifacts are advisory
            continue
    return best


_EGRESS_PROBE_SRC = """
import json, socket, sys
rec = {"host": "data.dgl.ai", "egress": False, "detail": ""}
try:
    socket.setdefaulttimeout(10)
    ip = socket.gethostbyname(rec["host"])
    rec["detail"] = f"resolved {ip}"
    import urllib.request
    r = urllib.request.urlopen(
        "https://data.dgl.ai/dataset/FB15k.zip", timeout=10)
    rec["egress"] = True
    rec["detail"] += (f"; HTTP {r.status}, "
                      f"{r.headers.get('Content-Length')} bytes available")
    r.close()
except Exception as e:
    rec["detail"] += f"; {type(e).__name__}: {e}"
print(json.dumps(rec))
"""


def probe_egress(out_path="EGRESS_PROBE.json", budget_s=20):
    """Record whether THIS environment can reach the reference datasets.

    Quality parity against the reference's published FB15k/wn18 tables
    (/root/reference/docs/source/benchmarks.rst:37-49) requires downloading
    the real datasets (data.dgl.ai).  The build environment has no egress
    (DNS fails); the bench/driver environment may differ, so every bench
    run re-probes and leaves a dated artifact either way — making the
    claim surface honest: if "egress" is false in EGRESS_PROBE.json, every
    MRR in this repo is synthetic-only by necessity, not by choice.
    Runs in a SUBPROCESS under a hard timeout: socket.setdefaulttimeout
    does not bound gethostbyname (the libc resolver has its own retry
    schedule, unbounded on a DNS blackhole), so an in-process probe could
    stall the bench.  Non-fatal; runs before warmup.
    """
    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "host": "data.dgl.ai", "egress": False,
           "detail": "probe subprocess failed/timed out"}
    try:
        out = subprocess.run([sys.executable, "-c", _EGRESS_PROBE_SRC],
                             capture_output=True, text=True,
                             timeout=budget_s)
        rec.update(json.loads(out.stdout.strip().splitlines()[-1]))
    except Exception:  # noqa: BLE001 - probe must never kill the bench
        pass
    try:
        with open(out_path, "w") as f:
            json.dump(rec, f)
    except OSError:
        pass
    return rec["egress"]


def main():
    egress = probe_egress()
    wait_healthy()

    import jax

    try:
        # Persist compiled executables across processes: a cold compile of
        # the scanned superstep costs minutes over the tunneled link (it
        # exceeded a 500 s window budget on 2026-08-19), while a cache hit
        # is seconds.  Any prior run of this script (e.g. a
        # tools/tpu_session.sh window) pre-warms the official capture.
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; proceed without it

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

    def timed_group():
        t0 = time.time()
        run(GROUP_CALLS)
        return time.time() - t0

    # Compile warmup: one full epoch + 1 call compiles BOTH jit variants
    # (the straddling call that regenerates the next epoch's permutation is
    # a second specialization — without this the 20s+ tunnel compile lands
    # inside the timed window).  Derived from the dataset so the two stay
    # in sync.
    calls_per_epoch = math.ceil(ds.n_train / (cfg.steps_per_call
                                              * cfg.batch_size))
    run(calls_per_epoch + 1)

    # Stability warmup: keep timing single groups until two consecutive
    # groups agree within STABLE_RTOL (the first post-compile groups can
    # still carry cache/transfer residue; a flapping tunnel never settles
    # and simply exhausts the cap — the retry logic below handles it).
    prev = timed_group()
    warm_groups = 1
    for _ in range(MAX_WARM_GROUPS - 1):
        cur = timed_group()
        warm_groups += 1
        if abs(cur - prev) <= STABLE_RTOL * min(cur, prev):
            break
        prev = cur

    def measure():
        return [timed_group() for _ in range(N_GROUPS)]

    times = measure()
    retried = False
    if max(times) / min(times) > RETRY_SPREAD:
        retried = True
        times = measure()

    triples_per_group = GROUP_CALLS * cfg.steps_per_call * cfg.batch_size
    metric = "fb15k_transe_l2_train_throughput"

    # Degraded-window guard: a slow-but-STABLE tunnel window sails past
    # the spread retry.  If the median lands >25% below the best prior
    # round record, cool off, re-verify device health, and remeasure once
    # in what is hopefully a fresh window; keep the better measurement.
    # If the shortfall persists, the output self-describes it so a driver
    # comparing BENCH_r{N-1} -> BENCH_r{N} does not read window luck as a
    # regression.
    best_prior = best_prior_record(metric)
    window_degraded = False
    remeasured_after_wait = False
    if (best_prior is not None
            and triples_per_group / statistics.median(times)
            < DEGRADED_VS_PRIOR * best_prior):
        remeasured_after_wait = True
        time.sleep(DEGRADED_WAIT_S)
        wait_healthy(max_wait_s=900)
        run(2)  # re-warm transfer path after the idle gap
        times2 = measure()
        if statistics.median(times2) < statistics.median(times):
            times = times2
        window_degraded = (triples_per_group / statistics.median(times)
                           < DEGRADED_VS_PRIOR * best_prior)

    median_group = statistics.median(times)
    spread = max(times) / min(times)
    triples_per_s = triples_per_group / median_group

    out = {
        "metric": metric,
        "value": round(triples_per_s, 1),
        "unit": "triples/s",
        "vs_baseline": round(triples_per_s / V100_TRIPLES_PER_S, 3),
        # synthetic edges at FB15k's exact vocab/hyperparameter shape:
        # valid for THROUGHPUT (edge content cannot change the kernel),
        # NOT a quality/MRR claim — see EGRESS_PROBE.json
        "data": "synthetic(fb15k-shape)",
        "egress": egress,
        "median_group_s": round(median_group, 4),
        "group_spread": round(spread, 3),
        "warm_groups": warm_groups,
        "retried": retried,
    }
    if best_prior is not None:
        out["best_prior"] = round(best_prior, 1)
    if remeasured_after_wait:
        out["remeasured_after_wait"] = True
    if window_degraded:
        out["window_degraded"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
