"""Round-3 TPU-window captures -> driver-visible artifacts.

Each step runs standalone (its own process under its own timeout in
tools/tpu_session.sh style) and writes a JSON fragment under tools/;
`merge` composes BENCH_EXTRA_r03.json at the repo root from whatever
fragments exist, so a wedged tunnel mid-window still yields a partial
record with session provenance.

Steps:
  models   — RESCAL / TransR full train step after the round-3 kernel
             restructure (VPU broadcast-reduce matvecs, bf16x3
             neg_project); shapes of docs/benchmarks.md's model table.
  wikikg2  — large-vocab (2.5M entities) device-pipeline throughput.
  eval     — fused filtered full-entity eval, FB15k shape, B=512.
  merge    — compose BENCH_EXTRA_r03.json.

Usage:  python tools/capture_r3.py <step>
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")  # repo root; PYTHONPATH breaks the axon plugin

FRAG = {
    "transr": "tools/session_r3_transr.json",
    "rescal": "tools/session_r3_rescal.json",
    "wikikg2": "tools/session_r3_wikikg2.json",
    "eval": "tools/session_r3_eval.json",
    "bf16": "tools/session_r3_bf16.json",
}


def _write(step, payload):
    payload["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(FRAG[step], "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


def step_model(step_key, name, dim):
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.models.ke_model import KEModel
    from tools._timing import fetch_timed, train_step_harness

    S = 512  # overhead still amortizes to < 0.1 us/step
    cfg = KGEConfig(model_name=name, hidden_dim=dim, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    loop = train_step_harness(model, S)
    dt = fetch_timed(lambda: float(loop(state)), S)
    _write(step_key, {"model": name, "hidden_dim": dim,
                      "us_per_step": round(dt * 1e6, 1),
                      "mtriples_per_s": round(1000 / dt / 1e6, 3)})


def step_bf16():
    """Headline shape with bf16 TABLE STORAGE (optimizer math stays f32;
    --emb_dtype bfloat16).  The matmul-form models sit at the row-movement
    floor (docs/benchmarks.md), so halving the row bytes is the next
    lever; labeled as a storage-dtype variant — the reference stores f32."""
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import DevicePipeline

    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True,
                    regularization_coef=1e-9, steps_per_call=1024,
                    emb_dtype="bfloat16")
    n_ent, n_rel = 14951, 1345
    ds = synthetic_dataset(n_entities=n_ent, n_relations=n_rel,
                           n_train=4_096_000, seed=0)
    model = KEModel(cfg, n_ent, n_rel)
    state = model.init_state(jax.random.PRNGKey(0))
    pipe = DevicePipeline(model, ds, cfg.batch_size,
                          cfg.num_chunks * cfg.neg_sample_size,
                          cfg.steps_per_call, seed=0)
    log = None
    for _ in range(5):   # one epoch (4 calls) + 1: both jit variants
        state, log = pipe.run_call(state)
    float(log["loss"])
    t0 = time.time()
    for _ in range(8):
        state, log = pipe.run_call(state)
    float(log["loss"])
    dt = time.time() - t0
    _write("bf16", {
        "metric": "fb15k_transe_l2_train_throughput_bf16_tables",
        "data": "synthetic(fb15k-shape)", "emb_dtype": "bfloat16",
        "value": round(8 * 1024 * 1000 / dt, 1), "unit": "triples/s"})


def step_wikikg2():
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import DevicePipeline

    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=200, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True, steps_per_call=512)
    n_ent, n_rel = 2_500_604, 535
    ds = synthetic_dataset(n_entities=n_ent, n_relations=n_rel,
                           n_train=4_096_000, seed=0)
    model = KEModel(cfg, n_ent, n_rel)
    state = model.init_state(jax.random.PRNGKey(0))
    pipe = DevicePipeline(model, ds, cfg.batch_size,
                          cfg.num_chunks * cfg.neg_sample_size,
                          cfg.steps_per_call, seed=0)
    log = None
    for _ in range(9):     # one epoch + 1: compiles both jit variants
        state, log = pipe.run_call(state)
    float(log["loss"])
    t0 = time.time()
    for _ in range(12):
        state, log = pipe.run_call(state)
    float(log["loss"])
    dt = time.time() - t0
    _write("wikikg2", {
        "metric": "wikikg2_scale_train_throughput",
        "n_entities": n_ent, "hidden_dim": 200,
        "data": "synthetic(wikikg2-shape)",
        "value": round(12 * 512 * 1000 / dt / 1e6, 3),
        "unit": "Mtriples/s"})


def step_eval():
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import evaluate

    ds = synthetic_dataset(n_entities=14951, n_relations=1345,
                           n_train=483142, n_test=10000, seed=0)
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    batch_size_eval=512)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    fi = FilterIndex(ds)
    evaluate(cfg, ds, model, state, "test", filter_index=fi,
             log=lambda *a: None)   # compile
    t0 = time.time()
    evaluate(cfg, ds, model, state, "test", filter_index=fi,
             log=lambda *a: None)
    dt = time.time() - t0
    _write("eval", {
        "metric": "fb15k_shape_filtered_eval_throughput",
        "data": "synthetic(fb15k-shape)", "batch_size_eval": 512,
        "value": round(10000 / dt, 1), "unit": "edges/s"})


def step_merge():
    rec = {"round": 3, "device": "1x v5e (tunneled)",
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "provenance": "tools/tpu_session.sh round-3 window; "
                         "fragments under tools/session_r3_*.json"}
    for step, path in FRAG.items():
        if os.path.exists(path):
            with open(path) as f:
                rec[step] = json.load(f)
    with open("BENCH_EXTRA_r03.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    {"transr": lambda: step_model("transr", "TransR", 100),
     "rescal": lambda: step_model("rescal", "RESCAL", 200),
     "wikikg2": step_wikikg2, "bf16": step_bf16,
     "eval": step_eval, "merge": step_merge}[sys.argv[1]]()
