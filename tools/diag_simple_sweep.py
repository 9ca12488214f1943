"""SimplE at-scale recipe sweep (device pipeline, hybrid RNG).

Measured so far at the full benchmark scale (14,976 entities / 535k
edges, batch 1000):
  lr 0.15            -> collapses early  (MRR 0.155 @ 65k)
  lr 0.10            -> peaks ~131k (0.8328) then COLLAPSES
                        (packed 0.2213 @ 262k, pipeline-rbg 0.497)
so the stable region is below 0.1.  This sweep probes candidate
(lr, regularization, steps) recipes; whichever goes green becomes the
staged QUALITY_CASES config and the official capture re-runs.

Usage: python tools/diag_simple_sweep.py [index]
  (no index: run all pending candidates; with index: just that one)
Writes tools/session_r5_simple_sweep_<tag>.json per candidate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = [
    ("lr007", dict(lr=0.07, regularization_coef=2e-6, max_step=262144)),
    ("lr007_reg1e5", dict(lr=0.07, regularization_coef=1e-5,
                          max_step=262144)),
    ("lr005", dict(lr=0.05, regularization_coef=2e-6, max_step=262144)),
    ("lr01_reg1e5", dict(lr=0.1, regularization_coef=1e-5,
                         max_step=262144)),
]


def run_one(tag, over):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.trainer import evaluate, train
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from capture_r4 import _quality_dataset

    ds = _quality_dataset("cycle")
    base = dict(model_name="SimplE", hidden_dim=400, gamma=6.0,
                batch_size=1000, neg_sample_size=200,
                neg_adversarial_sampling=False, steps_per_call=1024,
                log_interval=16384, batch_size_eval=512, dataset=ds.name,
                seed=7)
    base.update(over)
    cfg = KGEConfig(**base)
    t0 = time.time()
    model, state, _ = train(cfg, ds, log=lambda *a: None)
    train_s = time.time() - t0
    fi = FilterIndex(ds)
    m = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                 log=lambda *a: None)
    rec = {"metric": "simple_sweep", "tag": tag, **over,
           "MRR": round(m["MRR"], 4), "HITS@10": round(m["HITS@10"], 4),
           "gate_0.85": bool(m["MRR"] >= 0.85),
           "train_s": round(train_s, 1),
           "backend": jax.default_backend(),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"session_r5_simple_sweep_{tag}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    todo = CANDIDATES
    if len(sys.argv) > 1:
        todo = [CANDIDATES[int(sys.argv[1])]]
    for tag, over in todo:
        if os.path.exists(os.path.join(
                here, f"session_r5_simple_sweep_{tag}.json")):
            continue
        run_one(tag, over)


if __name__ == "__main__":
    main()
