#!/bin/bash
# One TPU window, maximum data: run checks in priority order, each under
# its own timeout, appending results to tools/tpu_session.log.  The
# tunneled test TPU wedges intermittently — a hang in any step must not
# lose the rest of the window.  NOTE: do not set PYTHONPATH (it breaks
# the axon plugin registration); run from the repo root instead.
cd "$(dirname "$0")/.."
LOG=tools/tpu_session.log
# Persist compiles across windows: a superstep compile costs minutes over
# the tunnel and used to be re-paid every window; with the cache a repeat
# window spends its ~10-15 min on measurements instead.
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
stamp() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> $LOG; }

stamp "health"
timeout 90 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); x = jnp.ones((512,512)) @ jnp.ones((512,512))
print('health ok', float(x[0,0]), round(time.time()-t0,1))" >> $LOG 2>&1 || { stamp "health FAILED"; exit 1; }

# bench.py FIRST and with the longest budget: it is the official record
# path, and a code change that invalidates the compile cache costs
# minutes of tunnel compile before a single timed group runs (17:53
# window: killed at exactly the old 500 s timeout, mid-compile).
stamp "bench.py (headline, XLA rows)"
timeout 900 python bench.py >> $LOG 2>&1 || stamp "bench FAILED/HUNG"




stamp "fused filtered eval (FB15k shape) -> fragment"
timeout 500 python tools/capture_r3.py eval >> $LOG 2>&1 || stamp "eval FAILED/HUNG"

stamp "diag_relupdate (scatter vs dense one-hot Adagrad, small tables)"
timeout 600 python -c "
import sys; sys.path.insert(0, '.')
import runpy; runpy.run_path('tools/diag_relupdate.py', run_name='__main__')" >> $LOG 2>&1 || stamp "relupdate FAILED/HUNG"

stamp "large-vocab train (wikikg2 scale) -> fragment"
timeout 580 python tools/capture_r3.py wikikg2 >> $LOG 2>&1 || stamp "large-vocab FAILED/HUNG"

stamp "refresh driver-visible BENCH_EXTRA from whatever fragments exist"
timeout 60 python tools/capture_r3.py merge >> $LOG 2>&1 || stamp "merge FAILED"

stamp "diag_transfer (h2d paths: bulk vs jit-arg vs dispatch)"
timeout 400 python tools/diag_transfer.py >> $LOG 2>&1 || stamp "diag_transfer FAILED/HUNG"

stamp "done"
tail -30 $LOG
