"""Phase-time the REAL 12M-entity eval to locate the ~380 s that the
kernel diag (tools/diag_bigvocab_eval.py: warm megastep 1.15 s / 2048
rows) cannot see.  Prints per-phase wall times and, crucially, times the
SAME mega call twice — a cheap second call means the cost is compile
(and the persistent cache is not protecting cross-process runs on this
backend); an expensive second call means real execution this probe must
chase further.  JAX_LOG_COMPILES output goes to stderr for the log.

Run under tools/tpu_hunt.sh; writes tools/session_r5_eval_phase.json.
"""

import json
import os
import sys
import time

os.environ["JAX_LOG_COMPILES"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass

    from capture_r4 import FB12M_CKPT, _fb12m_setup
    from dglke_tpu.data.sampler import EvalSampler, FilterIndex
    from dglke_tpu.trainer import _mega_eval
    from dglke_tpu.utils.io import load_model_state

    rec = {"metric": "eval_phase_12m"}
    t0 = time.time()
    ds, cfg, model = _fb12m_setup()
    rec["setup_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    state = load_model_state(cfg, model, FB12M_CKPT)
    jax.block_until_ready(state.entity.emb)
    rec["state_load_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    fi = FilterIndex(ds)
    rec["filter_index_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    sampler = EvalSampler(ds, "test", cfg.batch_size_eval, "tail", fi,
                          seed=cfg.seed)
    batches = list(sampler)
    rec["sampler_iter_s"] = round(time.time() - t0, 1)
    rec["n_batches"] = len(batches)
    rec["filter_width"] = int(batches[0]["filter_ids"].shape[1])

    mega_fn = model.make_eval_megastep()
    t0 = time.time()
    r1 = _mega_eval(mega_fn, state, batches, 32)
    rec["mega_call1_s"] = round(time.time() - t0, 1)   # compile + run
    t0 = time.time()
    r2 = _mega_eval(mega_fn, state, batches, 32)
    rec["mega_call2_s"] = round(time.time() - t0, 1)   # warm repeat
    assert all(np.array_equal(a, b) for a, b in zip(r1, r2))

    # other direction: second specialization (neg_head=True)
    sampler_h = EvalSampler(ds, "test", cfg.batch_size_eval, "head", fi,
                            seed=cfg.seed)
    batches_h = list(sampler_h)
    t0 = time.time()
    _mega_eval(mega_fn, state, batches_h, 32)
    rec["mega_head_call1_s"] = round(time.time() - t0, 1)

    rec["backend"] = jax.default_backend()
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "session_r5_eval_phase.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
