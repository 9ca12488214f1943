"""Same-session A/B of the FULL RESCAL train step: stock autodiff +
dense-arm Adagrad vs the fused factored path (DGLKE_TPU_RESCAL_FUSED=1:
rank-1 relation gradients + the Pallas outer-product Adagrad kernel,
ops/pallas/outer_update.py).

Round-3 lesson (tools/diag_rescal_step.py): VPU-heavy models vary +-25%
between sessions and isolated kernel wins can invert inside the full
jitted step, so only this same-session whole-step comparison decides
whether the fused path ships as a default.

Usage:  python tools/diag_rescal_fused.py   (repo root, on TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

S = 512


def step_time(tag):
    from dglke_tpu.config import KGEConfig
    from dglke_tpu.models.ke_model import KEModel
    from tools._timing import fetch_timed, train_step_harness
    cfg = KGEConfig(model_name="RESCAL", hidden_dim=200, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    loop = train_step_harness(model, S)
    dt = fetch_timed(lambda: float(loop(state)), S)
    print(f"  {tag:34s} {dt * 1e6:9.1f} us/step", flush=True)
    return dt


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print("RESCAL full-step A/B (stock vs fused factored relation path)")
    os.environ.pop("DGLKE_TPU_RESCAL_FUSED", None)
    dt_stock = step_time("stock (einsum + dense one-hot)")
    os.environ["DGLKE_TPU_RESCAL_FUSED"] = "1"
    dt_fused = step_time("fused (factored + Pallas outer)")
    # repeat stock to bound within-session drift
    os.environ.pop("DGLKE_TPU_RESCAL_FUSED", None)
    dt_stock2 = step_time("stock again (drift check)")
    rec = {"metric": "rescal_fused_step_ab",
           "us_stock": round(dt_stock * 1e6, 1),
           "us_fused": round(dt_fused * 1e6, 1),
           "us_stock_repeat": round(dt_stock2 * 1e6, 1),
           "speedup": round(dt_stock / dt_fused, 3),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    with open("tools/session_r4_rescal_fused.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
