#!/bin/bash
# Round-5 final TPU window: (a) headline bench on the landed code (the
# degraded-window guard now globs all prior rounds), (b) the official
# FB15k-shape eval fragment re-captured after the round-5 eval-ladder
# changes.  Idempotent; exit 0 only when both artifacts exist.
#   nohup bash -c 'while ! bash tools/tpu_hunt.sh 1800 bash \
#     tools/r5b_session.sh; do sleep 45; done' &
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
T=tools
MISSING=0

if ! [ -s "$T/session_r5_bench_final.json" ]; then
  timeout -k 10 900 python bench.py > /tmp/r5b_bench.json \
    2>> $T/tpu_session.log \
    && tail -1 /tmp/r5b_bench.json > "$T/session_r5_bench_final.json" \
    || MISSING=1
  cat "$T/session_r5_bench_final.json" >> $T/tpu_session.log 2>/dev/null
fi

if ! [ -s "$T/session_r5_eval_postladder.json" ]; then
  timeout -k 10 600 python - >> $T/tpu_session.log 2>&1 <<'EOF' || MISSING=1
# step_eval with _write redirected (the r4 fragment is the round-4
# record; this re-measures the same protocol post-eval-ladder)
import json, sys, time
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
import capture_r4

def _w(step, payload):
    import jax
    payload["backend"] = jax.default_backend()
    payload["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open("tools/session_r5_eval_postladder.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))

capture_r4._write = _w
capture_r4.step_eval()
EOF
  [ -s "$T/session_r5_eval_postladder.json" ] || MISSING=1
fi

python $T/merge_r5.py >> $T/tpu_session.log 2>&1
[ "$MISSING" -eq 0 ] && exit 0 || exit 5
