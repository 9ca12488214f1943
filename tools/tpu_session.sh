#!/bin/bash
# One TPU window, maximum data: run captures in priority order, each under
# its own timeout, appending results to tools/tpu_session.log.  The
# tunneled test TPU wedges intermittently — a hang in any step must not
# lose the rest of the window, and a mid-session wedge must not burn the
# remaining steps' timeouts: health is re-probed (fresh matmul shapes)
# before each step, and a failed probe exits 124 so tools/tpu_hunt.sh
# treats the session like a hang and retries in the next window.
# Steps whose TPU fragment already exists are SKIPPED, so each fresh
# window spends its minutes on uncaptured work instead of re-measuring
# (~12 min of repeated prefix per window before this guard).
# NOTE: do not set PYTHONPATH (it breaks the axon plugin registration);
# run from the repo root instead.
cd "$(dirname "$0")/.."
LOG=tools/tpu_session.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
stamp() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> $LOG; }

probe() {
  D1=$((257 + RANDOM % 1000)); D2=$((129 + RANDOM % 1000))
  timeout -k 10 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones(($D1, $D2)) @ jnp.ones(($D2, $D1))
assert float(x[0, 0]) == $D2" 2>/dev/null
}

frag_done() {  # 0 when the fragment exists AND was measured on tpu
  python - "$1" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
sys.exit(0 if d.get("backend", "tpu") == "tpu" else 1)
EOF
}

step() {  # step <budget_s> <frag-or-"-"> <label> <cmd...>
  BUDGET=$1; FRAGF=$2; LABEL=$3; shift 3
  if [ "$FRAGF" != "-" ] && frag_done "$FRAGF"; then
    return
  fi
  if ! probe; then
    stamp "TUNNEL WEDGED before '$LABEL' — aborting session (retry)"
    exit 124
  fi
  stamp "$LABEL"
  timeout -k 10 "$BUDGET" "$@" >> $LOG 2>&1 || stamp "$LABEL FAILED/HUNG"
}

stamp "=== round-4 session start ==="
if ! frag_done tools/session_r4_bench.json; then
  if ! probe; then stamp "TUNNEL WEDGED before bench"; exit 124; fi
  stamp "bench.py (headline)"
  timeout -k 10 900 python bench.py > /tmp/bench_r4.out 2>&1
  cat /tmp/bench_r4.out >> $LOG
  grep -E '^\{"metric"' /tmp/bench_r4.out | tail -1 \
    | python -c "import json,sys; d=json.loads(sys.stdin.read()); d['backend']='tpu'; print(json.dumps(d))" \
    > tools/session_r4_bench.json 2>/dev/null
  [ -s tools/session_r4_bench.json ] || rm -f tools/session_r4_bench.json
fi

step 500 tools/session_r4_eval.json \
  "capture_r4 eval (filtered full-entity, FB15k shape)" \
  python tools/capture_r4.py eval
step 580 tools/session_r4_wikikg2.json \
  "capture_r4 wikikg2 (2.5M-entity pipeline)" \
  python tools/capture_r4.py wikikg2
step 500 tools/session_r4_transr.json \
  "capture_r4 transr (VPU family step)" \
  python tools/capture_r4.py transr
step 500 tools/session_r4_rescal.json \
  "capture_r4 rescal (VPU family step)" \
  python tools/capture_r4.py rescal
step 580 tools/session_r4_rescal_fused.json \
  "diag_rescal_fused (stock vs Pallas factored, same session)" \
  python tools/diag_rescal_fused.py
timeout 60 python tools/capture_r4.py merge >> $LOG 2>&1

# 8-family quality-at-FB15k-scale gates (~66M train triples each);
# already-captured families are skipped, so fresh windows go straight to
# the uncompiled ones
for M in TransE_l2 TransE_l1 DistMult ComplEx SimplE RotatE TransR RESCAL; do
  step 580 "tools/session_r4_quality_$M.json" \
    "capture_r4 quality_$M" python tools/capture_r4.py "quality_$M"
done
timeout 60 python tools/capture_r4.py merge >> $LOG 2>&1

# one resumable 12M-entity training segment rides the tail of every
# completed session; the dedicated fb12m_chain supervisor finishes the
# record (eval + resume) once the step target is reached
step 1400 - "fb12m segment (resumable, 1M steps)" \
  env FB12M_SEGMENT=1048576 bash tools/fb12m_chain.sh

stamp "done"
tail -20 $LOG
