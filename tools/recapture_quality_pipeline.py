"""Re-capture the per-family quality table through the SHIPPED CLI path.

The round-4 quality fragments (session_r4_quality_*.json) measured the
host-fed packed superstep; round 5 made the device-resident pipeline the
default single-chip path in `trainer.train` (the same path bench.py
measures at ~3.4M triples/s for TransE_l2 vs ~2.76M packed).  This tool
re-runs every family's EXACT quality protocol (same planted structure,
config, seed, filtered eval — capture_r4.step_quality) through that
default path so the table's throughput column reflects what
`dglke_tpu-train` actually runs, and the MRR column re-proves the gate
on the pipeline's hybrid threefry/RBG negative stream.

SimplE is not re-run: its 262,144-step official fragment
(session_r4_quality_SimplE.json, ts 11:24Z) was already captured AFTER
the pipeline became the default, so it is copied in verbatim.

Writes tools/session_r5_pipeline_quality.json INCREMENTALLY (one family
at a time, cheapest first) so a truncated TPU window still lands the
families it finished; re-runs skip already-captured families.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "session_r5_pipeline_quality.json")
SIMPLE_FRAG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "session_r4_quality_SimplE.json")

# cheapest-first so a short window lands the most families
ORDER = ["TransE_l2", "ComplEx", "DistMult", "TransE_l1", "RotatE",
         "TransR", "RESCAL"]


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
                "threefry/RBG negative keys). SimplE copied from its "
                "official fragment, which already ran this path.",
        "families": {},
    }


def _save(rec):
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, OUT)


def main():
    import capture_r4

    rec = _load()
    fams = rec["families"]
    if "SimplE" not in fams and os.path.exists(SIMPLE_FRAG):
        with open(SIMPLE_FRAG) as f:
            frag = json.load(f)
        frag["path_note"] = ("official 262k capture, already measured on "
                            "the pipeline path (post round-5 default)")
        fams["SimplE"] = frag
        _save(rec)

    # Redirect capture_r4._write into this record: the r4 fragments (and
    # the BENCH_EXTRA_r04.json they merge into) are the ROUND-4 record
    # and must not be rewritten by round-5 measurements.
    captured = {}

    def _capture_write(step, payload):
        import jax
        payload["backend"] = jax.default_backend()
        payload["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        captured[step] = payload
        print(json.dumps(payload), flush=True)

    capture_r4._write = _capture_write

    only = set(sys.argv[1:])  # optional family filter (smoke tests)
    for name in ORDER:
        if name in fams or (only and name not in only):
            continue
        t0 = time.time()
        capture_r4.step_quality(name)
        frag = captured[f"quality_{name}"]
        frag["wall_s"] = round(time.time() - t0, 1)
        fams[name] = frag
        _save(rec)
        print(f"[recapture] {name} done in {frag['wall_s']}s "
              f"MRR={frag['MRR']} {frag['triples_per_s']} triples/s",
              flush=True)
    n_green = sum(1 for v in fams.values() if v.get("gate_0.85"))
    rec["gate_summary"] = f"{n_green}/{len(fams)} green at 0.85"
    _save(rec)
    print(json.dumps({"families": sorted(fams),
                      "gate_summary": rec["gate_summary"]}))
    if not only and any(n not in fams for n in ORDER):
        sys.exit(5)  # incomplete — supervisor keeps hunting windows


if __name__ == "__main__":
    main()
