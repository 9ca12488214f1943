"""Re-capture the per-family quality table through the SHIPPED CLI path.

The round-4 quality fragments (session_r4_quality_*.json) measured the
host-fed packed superstep; round 5 made the device-resident pipeline the
default single-chip path in `trainer.train` (the same path bench.py
measures at ~3.4M triples/s for TransE_l2 vs ~2.76M packed).  This tool
re-runs every family's EXACT quality protocol (same planted structure,
config, seed, filtered eval — capture_r4.step_quality) through that
default path so the table reflects what `dglke_tpu-train` actually
runs, and the MRR column re-proves the gate on the pipeline's hybrid
threefry/RBG negative stream.

Timing protocol: `train()`'s first fused call includes the jit compile
(over the tunnel that is ~60-90 s per family — each family's
gamma/dim/lr constants bake into a distinct program), so total-wall
throughput conflates compile with execution.  The trainer logs wall
time per `log_interval` window; this tool collects those logs and
reports BOTH `triples_per_s` (total, compile included — comparable to
the r4 fragments, which enjoyed warm packed-path caches) and
`triples_per_s_steady` (the last 16,384-step window — pure execution).
The first sweep also warms the persistent compile cache, so a re-run
(after deleting the fragment) measures warm-total directly.

SimplE is not re-run: its 262,144-step official fragment
(session_r4_quality_SimplE.json, ts 11:24Z) was already captured AFTER
the pipeline became the default, so it is copied in verbatim.

Writes tools/session_r5_pipeline_quality.json INCREMENTALLY (one family
at a time, cheapest first) so a truncated TPU window still lands the
families it finished; re-runs skip already-captured families.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   os.environ.get("RECAPTURE_OUT",
                                  "session_r5_pipeline_quality.json"))
SIMPLE_FRAG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "session_r4_quality_SimplE.json")

# cheapest-first so a short window lands the most families
ORDER = ["TransE_l2", "ComplEx", "DistMult", "TransE_l1", "RotatE",
         "TransR", "RESCAL"]

_WINDOW_RE = re.compile(r"\[Train\] (\d+) steps take ([\d.]+) seconds")


def _load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {
        "metric": "quality_at_fb15k_scale_pipeline_path",
        "note": "same protocol as quality_at_scale (capture_r4."
                "step_quality) but through trainer.train's round-5 "
                "default single-chip path: the device-resident pipeline "
                "(scanned superstep, on-device sampling, hybrid "
                "threefry/RBG negative keys). triples_per_s includes "
                "the one-time jit compile; _steady is the last "
                "log-interval window (pure execution). SimplE copied "
                "from its official fragment, which already ran this "
                "path.",
        "families": {},
    }


def _save(rec):
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, OUT)


def run_quality(model_name):
    """capture_r4.step_quality's exact protocol, plus per-window timing
    (the r4 fragments stay untouched — they are the round-4 record)."""
    import jax
    import capture_r4
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.trainer import evaluate, train

    capture_r4._enable_cache()
    structure, over = capture_r4.QUALITY_CASES[model_name]
    ds = capture_r4._quality_dataset(structure)
    base = dict(model_name=model_name, hidden_dim=400, gamma=19.9,
                lr=0.25, batch_size=1000, neg_sample_size=200,
                neg_adversarial_sampling=True, regularization_coef=1e-9,
                max_step=int(os.environ.get("QUALITY_STEPS", 65536)),
                steps_per_call=1024, log_interval=16384,
                batch_size_eval=512, dataset=ds.name, seed=7)
    base.update(over)
    cfg = KGEConfig(**base)

    windows = []  # (steps, seconds) per log_interval window

    def log(msg, *a):
        m = _WINDOW_RE.search(str(msg))
        if m:
            windows.append((int(m.group(1)), float(m.group(2))))

    t0 = time.time()
    model, state, info = train(cfg, ds, log=log)
    train_s = time.time() - t0
    fi = FilterIndex(ds)
    t0 = time.time()
    m = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                 log=lambda *a: None)
    eval_s = time.time() - t0
    n_eval = 2 * int(len(ds.test[0]) * cfg.eval_percent)
    frag = {
        "metric": "planted_quality_at_fb15k_scale",
        "model": model_name, "structure": structure,
        "n_entities": ds.n_entities, "n_train": ds.n_train,
        "hidden_dim": cfg.entity_dim, "max_step": cfg.max_step,
        "MRR": round(m["MRR"], 4), "HITS@10": round(m["HITS@10"], 4),
        "gate_0.85": bool(m["MRR"] >= 0.85),
        "train_s": round(train_s, 1),
        "triples_per_s": round(cfg.max_step * cfg.batch_size / train_s, 1),
        "eval_edges_per_s": round(n_eval / eval_s, 1),
        "backend": jax.default_backend(),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if len(windows) >= 2:
        steps, secs = windows[-1]
        frag["triples_per_s_steady"] = round(steps * cfg.batch_size / secs, 1)
        frag["first_window_s"] = round(windows[0][1], 1)  # includes compile
        frag["last_window_s"] = round(secs, 1)
    print(json.dumps(frag), flush=True)
    return frag


def main():
    rec = _load()
    fams = rec["families"]
    if os.environ.get("RECAPTURE_ALL"):
        # post-RNG-change sweeps: SimplE's official fragment measured the
        # old negative stream, so re-run it instead of copying it in
        ORDER.insert(ORDER.index("RESCAL"), "SimplE")
    elif "SimplE" not in fams and os.path.exists(SIMPLE_FRAG):
        with open(SIMPLE_FRAG) as f:
            frag = json.load(f)
        frag["path_note"] = ("official 262k capture, already measured on "
                            "the pipeline path (post round-5 default)")
        fams["SimplE"] = frag
        _save(rec)

    only = set(sys.argv[1:])  # optional family filter (smoke tests)
    for name in ORDER:
        if name in fams or (only and name not in only):
            continue
        t0 = time.time()
        frag = run_quality(name)
        frag["wall_s"] = round(time.time() - t0, 1)
        fams[name] = frag
        _save(rec)
        print(f"[recapture] {name} done in {frag['wall_s']}s "
              f"MRR={frag['MRR']} {frag['triples_per_s']} triples/s "
              f"(steady {frag.get('triples_per_s_steady')})", flush=True)
    n_green = sum(1 for v in fams.values() if v.get("gate_0.85"))
    rec["gate_summary"] = f"{n_green}/{len(fams)} green at 0.85"
    _save(rec)
    print(json.dumps({"families": sorted(fams),
                      "gate_summary": rec["gate_summary"]}))
    if not only and any(n not in fams for n in ORDER):
        sys.exit(5)  # incomplete — supervisor keeps hunting windows


if __name__ == "__main__":
    main()
