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




stamp "fused filtered eval (FB15k shape)"
timeout 500 python -c "
import sys, time; sys.path.insert(0, '.')
import jax
from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import evaluate
ds = synthetic_dataset(n_entities=14951, n_relations=1345, n_train=483142, n_test=10000, seed=0)
cfg = KGEConfig(model_name='TransE_l2', hidden_dim=400, gamma=19.9, lr=0.25,
                batch_size=1000, neg_sample_size=200, batch_size_eval=64)
model = KEModel(cfg, 14951, 1345)
state = model.init_state(jax.random.PRNGKey(0))
from dglke_tpu.data.sampler import FilterIndex
fi = FilterIndex(ds)
evaluate(cfg, ds, model, state, 'test', filter_index=fi, log=lambda *a: None)
t0 = time.time()
evaluate(cfg, ds, model, state, 'test', filter_index=fi, log=lambda *a: None)
dt = time.time() - t0
print(f'fused eval (B=64): {10000/dt:.0f} edges/s')
import dataclasses
cfg2 = dataclasses.replace(cfg, batch_size_eval=512)
evaluate(cfg2, ds, model, state, 'test', filter_index=fi, log=lambda *a: None)
t0 = time.time()
evaluate(cfg2, ds, model, state, 'test', filter_index=fi, log=lambda *a: None)
dt = time.time() - t0
print(f'fused eval (B=512): {10000/dt:.0f} edges/s')" >> $LOG 2>&1 || stamp "eval FAILED/HUNG"

stamp "diag_relupdate (scatter vs dense one-hot Adagrad, small tables)"
timeout 600 python -c "
import sys; sys.path.insert(0, '.')
import runpy; runpy.run_path('tools/diag_relupdate.py', run_name='__main__')" >> $LOG 2>&1 || stamp "relupdate FAILED/HUNG"

stamp "large-vocab train (wikikg2 scale)"
timeout 580 python -c "
import sys, time; sys.path.insert(0, '.')
import jax
from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import DevicePipeline
cfg = KGEConfig(model_name='TransE_l2', hidden_dim=200, gamma=19.9, lr=0.25,
                batch_size=1000, neg_sample_size=200,
                neg_adversarial_sampling=True, steps_per_call=512)
ds = synthetic_dataset(n_entities=2_500_604, n_relations=535, n_train=4_096_000, seed=0)
model = KEModel(cfg, 2_500_604, 535)
state = model.init_state(jax.random.PRNGKey(0))
pipe = DevicePipeline(model, ds, cfg.batch_size,
                      cfg.num_chunks * cfg.neg_sample_size, cfg.steps_per_call, seed=0)
log = None
# warm one full epoch + 1: the straddling call is a second jit variant
for _ in range(9): state, log = pipe.run_call(state)
float(log['loss'])
t0 = time.time()
for _ in range(12): state, log = pipe.run_call(state)
float(log['loss']); dt = time.time() - t0
print(f'wikikg2-scale: {12*512*1000/dt/1e6:.2f}M triples/s')" >> $LOG 2>&1 || stamp "large-vocab FAILED/HUNG"

stamp "diag_transfer (h2d paths: bulk vs jit-arg vs dispatch)"
timeout 400 python tools/diag_transfer.py >> $LOG 2>&1 || stamp "diag_transfer FAILED/HUNG"

stamp "done"
tail -30 $LOG
