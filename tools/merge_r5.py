"""Assemble BENCH_EXTRA_r05.json from every round-4 and round-5 capture
fragment (tools/session_r4_*.json + tools/session_r5_*.json).

Round-5 additions over the r4 artifact:
  * quality_at_scale gains the recaptured SimplE row (honest: whatever
    the last TPU measurement says, green or red — the preserved red
    131k fragment rides along as `SimplE_131k_red`);
  * fb12m record: train done:true + post-target eval + resume fragment
    (the r4-final eval is preserved as fb12m_eval_r4final; the postfix
    one measures the round-5 eval-path fixes);
  * dist_ab_8dev — dispatch/transfer-count A/B of the fused multi-host
    program (VERDICT r4 #6);
  * diag_bigvocab_eval / diag_ckpt_save — decompositions behind the
    round-5 eval and checkpoint-save optimizations.
"""

import glob
import json
import os
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rec = {
    "round": 5,
    "device": "1x v5e (tunneled); per-fragment 'backend' tags are "
              "authoritative (cpu = calibration, tpu = capture)",
    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "provenance": "tools/tpu_hunt.sh round-4/5 windows; fragments under "
                  "tools/session_r{4,5}_*.json",
}
quality = {}
for path in sorted(glob.glob("tools/session_r4_*.json")
                   + glob.glob("tools/session_r5_*.json")):
    name = os.path.basename(path)
    key = name.replace("session_r4_", "").replace("session_r5_", "")
    key = key[:-len(".json")]
    try:
        with open(path) as f:
            frag = json.load(f)
    except Exception as e:  # noqa: BLE001 - skip unreadable fragments
        rec.setdefault("unreadable", []).append(f"{name}: {e}")
        continue
    if key.startswith("quality_"):
        quality[key[len("quality_"):]] = frag
    else:
        rec[key] = frag
if quality:
    rec["quality_at_scale"] = quality
    n_green = sum(1 for k, v in quality.items()
                  if "_red" not in k and v.get("gate_0.85"))
    n = sum(1 for k in quality if "_red" not in k)
    rec["quality_gate_summary"] = f"{n_green}/{n} families green at 0.85"
with open("BENCH_EXTRA_r05.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps({"families": sorted(quality),
                  "keys": sorted(k for k in rec
                                 if k not in ("round", "device", "ts",
                                              "provenance"))}))
