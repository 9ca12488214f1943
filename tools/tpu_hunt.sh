#!/bin/bash
# Catch-a-window runner for the tunneled test TPU.
#
# The tunnel wedges intermittently (flaps on the scale of minutes to
# hours; see CLAUDE.md).  This loop probes with a tiny matmul in a
# SIGKILL-hardened timeout (a wedged device op can survive SIGTERM and
# stall a plain `timeout`), and runs the given command once in the first
# healthy window.  Compile caches persist across attempts, so a window
# that dies mid-compile still makes the next attempt cheaper.
#
# Usage:  bash tools/tpu_hunt.sh [budget_s] <command...>
#   e.g.  bash tools/tpu_hunt.sh 580 python -u tools/diag_rescal_parts.py
#
# Appends all output to tools/tpu_session.log.  Exits with the command's
# own exit code once it has run to completion (so supervisors can tell a
# failed run from a good one); a hang (timeout) or a crash carrying a
# tunnel-wedge signature retries, so run it under nohup / a supervisor.
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=tools/tpu_session.log
case "${1:-}" in
  ''|*[!0-9]*)  # no numeric budget given: default and treat $1 as command
    BUDGET=580 ;;
  *)
    BUDGET=$1; shift ;;
esac
if [ $# -eq 0 ]; then
  echo "usage: tpu_hunt.sh [budget_s] <command...>" >&2
  exit 2
fi
OUT=$(mktemp /tmp/tpu_hunt.XXXXXX)
trap 'rm -f "$OUT"' EXIT
while true; do
  # Probe with FRESH matmul shapes each attempt: a fixed tiny matmul
  # hits the persistent compile cache and can pass while the remote
  # compile service is wedged — the very capability most runs need.
  # Two random dims give ~10^6 distinct shapes (compile keys on both),
  # so cache collisions over a long hunt stay negligible.
  D1=$((257 + RANDOM % 1000))
  D2=$((129 + RANDOM % 1000))
  if timeout -k 10 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones(($D1, $D2)) @ jnp.ones(($D2, $D1))
assert float(x[0, 0]) == $D2" 2>/dev/null; then
    echo "=== $(date -u +%H:%M:%S) tpu_hunt: running '$*' (budget ${BUDGET}s) ===" >> "$LOG"
    timeout -k 10 "$BUDGET" "$@" > "$OUT" 2>&1
    RC=$?
    cat "$OUT" >> "$LOG"
    # 124 = timed out, 137 = needed the -k SIGKILL: a HANG retries.  A
    # nonzero rc whose output tail carries a tunnel-wedge signature
    # (RPC deadline, plugin init failure) is a wedge-CRASH — also retry;
    # any other rc means the command ran to completion and propagates
    # (retrying a deterministic failure would burn every healthy window
    # repeating it).
    if [ "$RC" -ne 124 ] && [ "$RC" -ne 137 ]; then
      if [ "$RC" -ne 0 ] && tail -n 40 "$OUT" | grep -qiE \
          'DEADLINE_EXCEEDED|backend .?axon|UNAVAILABLE: |Socket closed|failed to connect to'; then
        echo "=== $(date -u +%H:%M:%S) tpu_hunt: WEDGE-CRASH (rc $RC), will retry ===" >> "$LOG"
      else
        echo "=== $(date -u +%H:%M:%S) tpu_hunt: COMPLETE (rc $RC) ===" >> "$LOG"
        exit "$RC"
      fi
    else
      echo "=== $(date -u +%H:%M:%S) tpu_hunt: HUNG (rc $RC), will retry ===" >> "$LOG"
    fi
  else
    echo "=== $(date -u +%H:%M:%S) tpu_hunt: wedged ===" >> "$LOG"
  fi
  sleep 45
done
