"""Per-model training-step microbenchmark (fixed-id harness).

Times one full train step (gather -> score -> loss -> grads -> sparse
Adagrad) for every score function at the FB15k flagship shape, with the
state carried through a 1024-step scan so buffers donate in place and the
~40 ms/call link overhead amortizes (subtracted too).  Feeds fixed ids so
the number isolates the model, not the sampler.

Usage:  python tools/bench_models.py   (run from the repo root on TPU)
"""

import sys

sys.path.insert(0, ".")  # repo root; PYTHONPATH breaks the axon plugin

import jax

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel

S = 1024


def step_time(name, **extra):
    from tools._timing import fetch_timed, train_step_harness
    dim = extra.pop("hidden_dim", 400)
    cfg = KGEConfig(model_name=name, hidden_dim=dim, gamma=19.9, lr=0.25,
                    batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True, **extra)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    loop = train_step_harness(model, S)
    dt = fetch_timed(lambda: float(loop(state)), S)
    print(f"{name:10s} dim={dim:4d}: {dt * 1e6:8.1f} us/step "
          f"= {1000 / dt / 1e6:5.2f}M triples/s")


def main():
    print(f"device={jax.devices()[0].platform}  batch=1000 neg=200 S={S}")
    step_time("TransE_l2")
    step_time("DistMult")
    step_time("ComplEx")
    step_time("SimplE")
    step_time("TransE_l1")
    step_time("RotatE", double_ent=True)
    step_time("TransR", hidden_dim=100)
    step_time("RESCAL", hidden_dim=200)


if __name__ == "__main__":
    main()
