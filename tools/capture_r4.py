"""Round-4 TPU-window captures -> driver-visible artifacts.

Each step runs standalone (its own process under its own timeout via
tools/tpu_hunt.sh) and writes a JSON fragment under tools/; `merge`
composes BENCH_EXTRA_r04.json at the repo root from whatever fragments
exist, so a wedged tunnel mid-window still yields a partial record.

All throughput steps use the bench.py hardened protocol (timed GROUPS,
median group, spread, one retry on >3x spread) so every number in the
round record carries the same provenance fields.

Steps:
  transr / rescal — VPU-family full train step (model-table shapes).
  wikikg2         — large-vocab (2.5M entities) device-pipeline throughput.
  eval            — fused filtered full-entity eval, FB15k shape, B=512.
  quality_<model> — FB15k-SCALE planted-structure quality gate: >=15k
                    entities / ~0.5M edges, train + filtered eval ->
                    (MRR, Hits@10, triples/s, eval edges/s) for each of
                    the 8 families (VERDICT r3 #4; reference per-model
                    table: docs/source/benchmarks.rst:37-49).
  fb12m_train     — 12M-entity / 48M-edge planted line: train + npy
                    checkpoint (VERDICT r3 #3; reference anchor:
                    benchmarks.rst:175, Freebase 8-GPU).
  fb12m_eval      — filtered full-entity eval of that checkpoint over all
                    12M candidates + MRR gate.
  fb12m_resume    — resume from the checkpoint, train on, verify step.
  merge           — compose BENCH_EXTRA_r04.json.

Usage:  python tools/capture_r4.py <step>   (env knobs: FB12M_EPOCHS)
"""

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")  # repo root; PYTHONPATH breaks the axon plugin

if os.environ.get("DGLKE_CAPTURE_CPU"):
    # smoke-test mode: the machine's sitecustomize ignores JAX_PLATFORMS,
    # so CPU must be forced in-process before the backend initializes
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

QUALITY_MODELS = ["TransE_l2", "TransE_l1", "TransR", "RotatE",
                  "DistMult", "ComplEx", "SimplE", "RESCAL"]

FRAG = {
    "bench": "tools/session_r4_bench.json",   # written by tpu_session.sh
    "transr": "tools/session_r4_transr.json",
    "rescal": "tools/session_r4_rescal.json",
    "wikikg2": "tools/session_r4_wikikg2.json",
    "eval": "tools/session_r4_eval.json",
    "fb12m_train": "tools/session_r4_fb12m_train.json",
    "fb12m_eval": "tools/session_r4_fb12m_eval.json",
    "fb12m_resume": "tools/session_r4_fb12m_resume.json",
    # produced by tools/diag_rescal_fused.py / tools/dist_ab.py
    "rescal_fused": "tools/session_r4_rescal_fused.json",
    "dist_ab": "tools/session_r4_dist_ab.json",
}
for _m in QUALITY_MODELS:
    FRAG[f"quality_{_m}"] = f"tools/session_r4_quality_{_m}.json"

FB12M_CKPT = "tools/fb12m_ckpt"


def _write(step, payload):
    # every fragment records the backend it was measured on: CPU smoke /
    # calibration runs share these filenames with the real TPU captures,
    # and a CPU number must never masquerade as a chip measurement
    import jax
    payload["backend"] = jax.default_backend()
    payload["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(FRAG[step], "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


def _measure_groups(run_group, n_groups=6, retry_spread=3.0):
    """bench.py protocol: median of n timed groups + spread + one retry."""
    def once():
        return [run_group() for _ in range(n_groups)]
    times = once()
    retried = False
    if max(times) / min(times) > retry_spread:
        retried = True
        times = once()
    return {"median_group_s": round(statistics.median(times), 4),
            "group_spread": round(max(times) / min(times), 3),
            "retried": retried}


def _enable_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def step_model(step_key, name, dim):
    """VPU-family full train step, hardened protocol (groups of scanned
    512-step calls; each call's loss fetch is the completion fence)."""
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.models.ke_model import KEModel
    from tools._timing import train_step_harness

    _enable_cache()
    S = 512
    cfg = KGEConfig(model_name=name, hidden_dim=dim, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    loop = train_step_harness(model, S)
    float(loop(state))  # compile + warm

    def group():
        t0 = time.time()
        float(loop(state))
        return time.time() - t0

    prot = _measure_groups(group)
    dt = prot["median_group_s"] / S
    _write(step_key, {"metric": f"{name.lower()}_train_step",
                      "model": name, "hidden_dim": dim,
                      "data": "synthetic(fb15k-shape)",
                      "us_per_step": round(dt * 1e6, 1),
                      "value": round(1000 / dt, 1),
                      "unit": "triples/s", **prot})


def step_wikikg2():
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import DevicePipeline

    _enable_cache()
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
    holder = [state]

    def run(n):
        log = None
        for _ in range(n):
            holder[0], log = pipe.run_call(holder[0])
        return float(log["loss"])

    run(9)       # one epoch + 1: compiles both jit variants

    def group():
        t0 = time.time()
        run(4)
        return time.time() - t0

    prot = _measure_groups(group)
    _write("wikikg2", {
        "metric": "wikikg2_scale_train_throughput",
        "n_entities": n_ent, "hidden_dim": 200,
        "data": "synthetic(wikikg2-shape)",
        "value": round(4 * 512 * 1000 / prot["median_group_s"] / 1e6, 3),
        "unit": "Mtriples/s", **prot})


def step_eval():
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import synthetic_dataset
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import evaluate

    _enable_cache()
    ds = synthetic_dataset(n_entities=14951, n_relations=1345,
                           n_train=483142, n_test=10000, seed=0)
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=400, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    batch_size_eval=512)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    fi = FilterIndex(ds)

    def group():
        t0 = time.time()
        evaluate(cfg, ds, model, state, "test", filter_index=fi,
                 log=lambda *a: None)
        return time.time() - t0

    group()  # compile
    prot = _measure_groups(group, n_groups=4)
    _write("eval", {
        "metric": "fb15k_shape_filtered_eval_throughput",
        "data": "synthetic(fb15k-shape)", "batch_size_eval": 512,
        "value": round(10000 / prot["median_group_s"], 1),
        "unit": "edges/s", **prot})


# -- FB15k-SCALE planted quality gates (VERDICT r3 #4) ------------------------
#
# Structures sized to the reference benchmark scale (>=15k entities,
# ~0.5M edges; FB15k is 14,951 / 483k) so the per-family MRR column in
# docs/benchmarks.md is measured at benchmark shape, not toy shape.
# Hyper-parameters start from the calibrated toy gates
# (tests/test_planted_quality.py) with reference-scale dims/batch.

def _quality_dataset(structure):
    """Scale-invariant planted structures at FB15k shape (FB15k:
    14,951 entities / 483k train edges).  Long single chains/cycles are
    measurably unlearnable at benchmark scale (a C=4000 line plateaus at
    MRR ~0.1; see planted_line_big docstring), so the translation and
    bilinear structures use parallel SHORT lines/rings — the calibrated
    toy gates' local geometry at 250x the entity count."""
    from dglke_tpu.data.dataset import planted_dataset, planted_line_big, \
        planted_ring_big
    if structure == "line":
        return planted_line_big(n_clusters=2500, per=6, n_relations=6,
                                line_len=20, n_test=4000)
        # 15,000 entities / ~445k edges
    if structure == "cliques":
        # self_loops=True: without planted (x, r, x) edges a symmetric
        # model's filtered eval hits a structural ceiling — the self
        # candidate ties every query at rank 2 (measured MRR exactly
        # 0.75); see planted_dataset
        return planted_dataset("cliques", n_clusters=520, per=32,
                               n_relations=8, test_frac=0.01,
                               self_loops=True)
        # 16,640 entities / ~528k edges
    return planted_ring_big(n_clusters=2496, ring_len=12, per=6,
                            n_relations=6, n_test=4000)
    # 14,976 entities / ~535k edges


# Calibrated on CPU at this exact scale (gamma is the binding knob: the
# line structure solves at gamma ~4-6 and plateaus at gamma >= 10 —
# smaller required cluster separation = reachable within the Adagrad
# movement budget).
QUALITY_CASES = {
    # model: (structure, config overrides)
    "TransE_l2": ("line", dict(gamma=5.0, lr=0.25)),
    "TransE_l1": ("line", dict(gamma=8.0, lr=0.25)),
    "TransR": ("line", dict(hidden_dim=100, gamma=5.0, lr=0.15)),
    "RotatE": ("line", dict(double_ent=True, hidden_dim=200, gamma=6.0,
                            lr=0.1)),
    "DistMult": ("cliques", dict(gamma=6.0, lr=0.15,
                                 neg_adversarial_sampling=False,
                                 regularization_coef=2e-6)),
    "ComplEx": ("cycle", dict(gamma=6.0, lr=0.15,
                              neg_adversarial_sampling=False,
                              regularization_coef=2e-6)),
    # SimplE is the most lr-sensitive family at scale: lr 0.15 collapses
    # early (MRR 0.155), lr 0.1 peaks ~131k steps (0.8328) then
    # COLLAPSES (packed 0.2213 / pipeline 0.497 @ 262k — preserved red
    # fragments), reg 1e-5 collapses (0.1142).  The round-5 sweep
    # (tools/diag_simple_sweep.py, TPU 2026-08-21) found the stable
    # region: lr 0.07 @ 262144 steps -> MRR 1.0, lr 0.05 -> 0.999.
    "SimplE": ("cycle", dict(gamma=6.0, lr=0.07, max_step=262144,
                             neg_adversarial_sampling=False,
                             regularization_coef=2e-6)),
    "RESCAL": ("cycle", dict(hidden_dim=200, gamma=6.0, lr=0.1,
                             neg_adversarial_sampling=False)),
}


def step_quality(model_name):
    import jax
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.trainer import evaluate, train

    _enable_cache()
    structure, over = QUALITY_CASES[model_name]
    ds = _quality_dataset(structure)
    base = dict(model_name=model_name, hidden_dim=400, gamma=19.9,
                lr=0.25, batch_size=1000, neg_sample_size=200,
                neg_adversarial_sampling=True, regularization_coef=1e-9,
                max_step=int(os.environ.get("QUALITY_STEPS", 65536)),
                steps_per_call=1024, log_interval=16384,
                batch_size_eval=512, dataset=ds.name, seed=7)
    base.update(over)
    cfg = KGEConfig(**base)
    t0 = time.time()
    model, state, info = train(cfg, ds, log=lambda *a: None)
    train_s = time.time() - t0
    fi = FilterIndex(ds)
    t0 = time.time()
    m = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                 log=lambda *a: None)
    eval_s = time.time() - t0
    n_eval = 2 * int(len(ds.test[0]) * cfg.eval_percent)  # both directions
    _write(f"quality_{model_name}", {
        "metric": "planted_quality_at_fb15k_scale",
        "model": model_name, "structure": structure,
        "n_entities": ds.n_entities, "n_train": ds.n_train,
        "hidden_dim": cfg.entity_dim, "max_step": cfg.max_step,
        "MRR": round(m["MRR"], 4), "HITS@10": round(m["HITS@10"], 4),
        "gate_0.85": bool(m["MRR"] >= 0.85),
        "train_s": round(train_s, 1),
        "triples_per_s": round(cfg.max_step * cfg.batch_size / train_s, 1),
        "eval_edges_per_s": round(n_eval / eval_s, 1)})


# -- 12M-entity end-to-end record (VERDICT r3 #3) -----------------------------

# Calibrated at C=4000 (16k entities): R=3 short lines at gamma 4 /
# lr 0.25 reach MRR 0.982 by 50 epochs (R=1 needs 150 epochs for 0.947;
# sweep logs, 2026-08-21).  60 epochs at 12M = ~6.9B triples, trained in
# resumable segments so the record accumulates across flaky tunnel
# windows.
FB12M = dict(n_clusters=int(os.environ.get("FB12M_CLUSTERS", 3_000_000)),
             per=4, n_relations=3, line_len=10, n_test=2000)
FB12M_CFG = dict(model_name="TransE_l2", hidden_dim=128, gamma=4.0,
                 lr=0.25, batch_size=1000, neg_sample_size=200,
                 neg_adversarial_sampling=True, regularization_coef=1e-9,
                 steps_per_call=1024, log_interval=131072,
                 batch_size_eval=256, dataset="planted_line_big", seed=0)


def _fb12m_setup():
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import planted_line_big
    from dglke_tpu.models.ke_model import KEModel

    ds = planted_line_big(**FB12M)
    cfg = KGEConfig(**FB12M_CFG)
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    return ds, cfg, model


def step_fb12m_train():
    """Train toward FB12M_EPOCHS total, in SEGMENTS: loads the existing
    checkpoint (if any), trains min(remaining, FB12M_SEGMENT) steps,
    saves, and records cumulative progress — re-runnable every tunnel
    window until `done` is true."""
    import dataclasses

    import jax
    from dglke_tpu.trainer import train
    from dglke_tpu.utils.io import load_model_state, save_model

    _enable_cache()
    ds, cfg, model = _fb12m_setup()
    # 27 epochs: the 16k-entity calibration reaches MRR 0.72 by 25
    # epochs and 0.982 by 50; trimmed twice (60 -> 42 -> 27) as tunnel
    # wedges consumed round-4 windows, so the full train->eval->resume
    # record lands this round (the fragment records epochs honestly, and
    # later rounds can resume the checkpoint toward the 0.982 regime)
    epochs = float(os.environ.get("FB12M_EPOCHS", 27))
    total = int(epochs * ds.n_train / cfg.batch_size)
    align = 2 * cfg.steps_per_call
    total = max(align, total - total % align)
    segment = int(os.environ.get("FB12M_SEGMENT", 2 ** 62))
    state = None
    start = 0
    if os.path.exists(os.path.join(
            FB12M_CKPT, f"{cfg.dataset}_{cfg.model_name}_step.npy")):
        state = load_model_state(cfg, model, FB12M_CKPT)
        start = int(state.step)
    run = min(total - start, max(align, segment - segment % align))
    if run <= 0:
        print(f"fb12m_train already at {start}/{total} steps")
        return
    cfg = dataclasses.replace(cfg, max_step=run)
    t0 = time.time()
    model, state, info = train(cfg, ds, model=model, state=state, log=print)
    train_s = time.time() - t0
    os.makedirs(FB12M_CKPT, exist_ok=True)
    t1 = time.time()
    save_model(cfg, model, state, save_path=FB12M_CKPT)
    done_steps = start + run
    _write("fb12m_train", {
        "metric": "planted12m_train", "n_entities": ds.n_entities,
        "n_train": ds.n_train, "hidden_dim": cfg.entity_dim,
        "target_epochs": epochs, "steps_done": done_steps,
        "steps_target": total, "done": done_steps >= total,
        "segment_steps": run, "segment_train_s": round(train_s, 1),
        "value": round(run * cfg.batch_size / train_s, 1),
        "unit": "triples/s",
        "ckpt_save_s": round(time.time() - t1, 1)})


def step_fb12m_eval():
    import jax
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.trainer import evaluate
    from dglke_tpu.utils.io import load_model_state

    _enable_cache()
    ds, cfg, model = _fb12m_setup()
    t0 = time.time()
    state = load_model_state(cfg, model, FB12M_CKPT)
    # the 6.1 GB table upload is dispatched ASYNC by load_model_state;
    # without this fence it completes inside the first eval device call
    # and the "eval" number measures the tunnel upload (~20 MB/s -> 300+
    # s), not ranking — which is exactly what happened to every prior
    # fb12m_eval capture (7.6-10.4 edges/s while the warm kernel runs
    # 1,780; tools/diag_bigvocab_eval.py vs session logs)
    jax.block_until_ready(state.entity.emb)
    load_s = time.time() - t0
    fi = FilterIndex(ds)
    t0 = time.time()
    m = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                 log=print)
    eval_s = time.time() - t0
    # second pass: the first call carries the megastep jit compile —
    # ~426 s on the tunneled remote compile service vs 0.5-0.7 s warm
    # execution (tools/session_r5_eval_phase.json); the warm number is
    # the steady-state eval rate (periodic valid evals, repeated tests)
    t0 = time.time()
    m2 = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                  log=lambda *a: None)
    warm_s = time.time() - t0
    assert abs(m2["MRR"] - m["MRR"]) < 1e-12
    _write("fb12m_eval", {
        "metric": "planted12m_filtered_eval", "n_entities": ds.n_entities,
        "n_eval_edges": 2 * len(ds.test[0]),
        "MRR": round(m["MRR"], 4), "HITS@10": round(m["HITS@10"], 4),
        "gate_0.85": bool(m["MRR"] >= 0.85),
        "value": round(2 * len(ds.test[0]) / warm_s, 1),
        "unit": "edges/s (warm; first-pass value below includes the "
                "one-time jit compile)",
        "first_pass_edges_per_s": round(2 * len(ds.test[0]) / eval_s, 1),
        "first_pass_s": round(eval_s, 1),
        "warm_s": round(warm_s, 1),
        "state_upload_s": round(load_s, 1)})


def step_fb12m_resume():
    import dataclasses

    import jax
    from dglke_tpu.trainer import train
    from dglke_tpu.utils.io import load_model_state

    _enable_cache()
    ds, cfg, model = _fb12m_setup()
    state = load_model_state(cfg, model, FB12M_CKPT)
    start_step = int(state.step)
    extra = 2 * cfg.steps_per_call
    cfg = dataclasses.replace(cfg, max_step=extra)
    t0 = time.time()
    model, state, info = train(cfg, ds, model=model, state=state,
                               log=print)
    assert int(state.step) == start_step + extra, (int(state.step),
                                                   start_step, extra)
    _write("fb12m_resume", {
        "metric": "planted12m_resume", "resumed_from_step": start_step,
        "extra_steps": extra, "final_step": int(state.step),
        "resume_train_s": round(time.time() - t0, 1)})


def step_merge():
    rec = {"round": 4, "device": "1x v5e (tunneled); per-fragment "
                                 "'backend' tags are authoritative "
                                 "(cpu = calibration, tpu = capture)",
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "provenance": "tools/tpu_hunt.sh round-4 windows; "
                         "fragments under tools/session_r4_*.json"}
    quality = {}
    for step, path in FRAG.items():
        if not os.path.exists(path):
            continue
        with open(path) as f:
            frag = json.load(f)
        if step.startswith("quality_"):
            quality[step[len("quality_"):]] = frag
        else:
            rec[step] = frag
    if quality:
        rec["quality_at_scale"] = quality
    with open("BENCH_EXTRA_r04.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    step = sys.argv[1]
    if step == "transr":
        step_model("transr", "TransR", 100)
    elif step == "rescal":
        step_model("rescal", "RESCAL", 200)
    elif step.startswith("quality_"):
        step_quality(step[len("quality_"):])
    else:
        {"wikikg2": step_wikikg2, "eval": step_eval,
         "fb12m_train": step_fb12m_train, "fb12m_eval": step_fb12m_eval,
         "fb12m_resume": step_fb12m_resume, "merge": step_merge}[step]()
