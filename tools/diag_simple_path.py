"""Discriminate WHY the at-scale SimplE 262k capture went red (MRR
0.4971 via the device pipeline, vs 0.8328 at 131k via the packed path):

  packed@262k            — same step count, old path: if green, the
                           PIPELINE at scale is at fault; if red too,
                           it's SimplE's training dynamics (lr 0.1 is
                           non-monotone past ~131k steps at this scale).
  pipeline_threefry@262k — pipeline with the threefry stream: isolates
                           the TPU hardware-RBG fold_in/split
                           derivation as the variable.
  pipeline@131072        — pipeline at the step count the packed path
                           measured 0.8328: a matched-steps path A/B.

Usage: python tools/diag_simple_path.py <mode> <steps>
  mode in {packed, pipeline, pipeline_threefry}
Writes tools/session_r5_simple_<mode>_<steps>.json; run under
tools/tpu_hunt.sh.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode, steps = sys.argv[1], int(sys.argv[2])
    assert mode in ("packed", "pipeline", "pipeline_threefry")
    if mode == "packed":
        os.environ["DGLKE_TPU_FORCE_PACKED"] = "1"
    elif mode == "pipeline_threefry":
        os.environ["DGLKE_TPU_PIPELINE_THREEFRY"] = "1"

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.sampler import FilterIndex
    from dglke_tpu.trainer import evaluate, train
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from capture_r4 import _quality_dataset

    ds = _quality_dataset("cycle")
    cfg = KGEConfig(model_name="SimplE", hidden_dim=400, gamma=6.0,
                    lr=0.1, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=False,
                    regularization_coef=2e-6, max_step=steps,
                    steps_per_call=1024, log_interval=16384,
                    batch_size_eval=512, dataset=ds.name, seed=7)
    t0 = time.time()
    model, state, info = train(cfg, ds, log=print)
    train_s = time.time() - t0
    fi = FilterIndex(ds)
    t0 = time.time()
    m = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                 log=lambda *a: None)
    rec = {"metric": "simple_path_ab", "mode": mode, "max_step": steps,
           "MRR": round(m["MRR"], 4), "HITS@10": round(m["HITS@10"], 4),
           "gate_0.85": bool(m["MRR"] >= 0.85),
           "train_s": round(train_s, 1),
           "eval_s": round(time.time() - t0, 1),
           "backend": jax.default_backend(),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"session_r5_simple_{mode}_{steps}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
