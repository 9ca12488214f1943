#!/bin/bash
# One TPU window, maximum data: run captures in priority order, each under
# its own timeout, appending results to tools/tpu_session.log.  The
# tunneled test TPU wedges intermittently — a hang in any step must not
# lose the rest of the window, and a mid-session wedge must not burn the
# remaining steps' timeouts: health is re-probed (fresh matmul shapes)
# before each step, and a failed probe exits 124 so tools/tpu_hunt.sh
# treats the session like a hang and retries in the next window.
# NOTE: do not set PYTHONPATH (it breaks the axon plugin registration);
# run from the repo root instead.
cd "$(dirname "$0")/.."
LOG=tools/tpu_session.log
# Persist compiles across windows: a superstep compile costs minutes over
# the tunnel and used to be re-paid every window; with the cache a repeat
# window spends its ~10-15 min on measurements instead.
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

step() {  # step <budget_s> <label> <cmd...>
  BUDGET=$1; LABEL=$2; shift 2
  if ! probe; then
    stamp "TUNNEL WEDGED before '$LABEL' — aborting session (retry)"
    exit 124
  fi
  stamp "$LABEL"
  timeout -k 10 "$BUDGET" "$@" >> $LOG 2>&1 || stamp "$LABEL FAILED/HUNG"
}

stamp "=== round-4 session start ==="
# bench.py FIRST and with the longest budget: it is the official record
# path, and a code change that invalidates the compile cache costs
# minutes of tunnel compile before a single timed group runs.
step 900 "bench.py (headline)" python bench.py

step 500 "capture_r4 eval (filtered full-entity, FB15k shape)" \
  python tools/capture_r4.py eval
step 580 "capture_r4 wikikg2 (2.5M-entity pipeline)" \
  python tools/capture_r4.py wikikg2
step 500 "capture_r4 transr (VPU family step)" \
  python tools/capture_r4.py transr
step 500 "capture_r4 rescal (VPU family step)" \
  python tools/capture_r4.py rescal
step 580 "diag_rescal_fused (stock vs Pallas factored, same session)" \
  python tools/diag_rescal_fused.py
timeout 60 python tools/capture_r4.py merge >> $LOG 2>&1

# 8-family quality-at-FB15k-scale gates (~66M train triples each; the
# matmul family takes ~30 s + compile, TransR/RESCAL a few minutes)
for M in TransE_l2 TransE_l1 DistMult ComplEx SimplE RotatE TransR RESCAL; do
  step 580 "capture_r4 quality_$M" python tools/capture_r4.py "quality_$M"
done
timeout 60 python tools/capture_r4.py merge >> $LOG 2>&1

# one resumable 12M-entity training segment rides the tail of every
# completed session; the dedicated fb12m_chain supervisor finishes the
# record (eval + resume) once the step target is reached
step 1400 "fb12m segment (resumable, 1M steps)" \
  env FB12M_SEGMENT=1048576 bash tools/fb12m_chain.sh

stamp "done"
tail -40 $LOG
