#!/bin/bash
# One TPU window, maximum data: run checks in priority order, each under
# its own timeout, appending results to tools/tpu_session.log.  The
# tunneled test TPU wedges intermittently — a hang in any step must not
# lose the rest of the window.
cd "$(dirname "$0")/.."
LOG=tools/tpu_session.log
stamp() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> $LOG; }

stamp "health"
timeout 90 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); x = jnp.ones((512,512)) @ jnp.ones((512,512))
print('health ok', float(x[0,0]), round(time.time()-t0,1))" >> $LOG 2>&1 || { stamp "health FAILED"; exit 1; }

stamp "pallas gather alone"
timeout 240 python -c "
import jax, jax.numpy as jnp, numpy as np
from dglke_tpu.ops.pallas.rows import gather_rows
k = jax.random.PRNGKey(0)
t = jax.random.normal(k, (14951, 400), jnp.float32)
ids = jax.random.randint(k, (3000,), 0, 14951, jnp.int32)
out = gather_rows(t, ids)
ref = t[ids]
print('gather allclose:', bool(jnp.allclose(out, ref)))" >> $LOG 2>&1 || stamp "gather FAILED/HUNG"

stamp "pallas scatter alone"
timeout 240 python -c "
import jax, jax.numpy as jnp, numpy as np
from dglke_tpu.ops.pallas.rows import scatter_add_rows
k = jax.random.PRNGKey(0)
t = jax.random.normal(k, (14951, 400), jnp.float32)
ids = jax.random.randint(k, (3000,), 0, 14951, jnp.int32)
d = jax.random.normal(k, (3000, 400), jnp.float32)
out = scatter_add_rows(t, ids, d)
ref = t.at[ids].add(d)
print('scatter allclose:', bool(jnp.allclose(out, ref, atol=1e-5)))" >> $LOG 2>&1 || stamp "scatter FAILED/HUNG"

stamp "bench_rows"
timeout 420 python tools/bench_rows.py >> $LOG 2>&1 || stamp "bench_rows FAILED/HUNG"

stamp "bench.py pallas ON"
DGLKE_TPU_PALLAS_ROWS=1 timeout 500 python bench.py >> $LOG 2>&1 || stamp "bench ON FAILED/HUNG"

stamp "bench.py pallas OFF"
DGLKE_TPU_PALLAS_ROWS=0 timeout 500 python bench.py >> $LOG 2>&1 || stamp "bench OFF FAILED/HUNG"

stamp "done"
tail -40 $LOG
