"""Same-session A/B of the FULL TransR train step: round-3 kernels
(VPU broadcast project + bf16x3 neg_project) vs the round-2 originals
(einsum-highest both).

The RESCAL A/B (tools/diag_rescal_step.py) showed isolated-kernel wins
can invert inside the jitted step; this attributes TransR's measured
2086-vs-2678 us/step improvement within one session.

Usage:  python tools/diag_transr_step.py   (repo root, on TPU)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import dglke_tpu.models.score_functions as SF
from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel

S = 512


def step_time(tag):
    from tools._timing import fetch_timed, train_step_harness
    cfg = KGEConfig(model_name="TransR", hidden_dim=100, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    loop = train_step_harness(model, S)
    dt = fetch_timed(lambda: float(loop(state)), S)
    print(f"  {tag:44s} {dt * 1e6:9.1f} us/step", flush=True)
    return dt


def project_bcast(self, ent, proj):
    p = proj.reshape(-1, self.entity_dim, self.relation_dim)
    return jnp.sum(ent[:, :, None] * p, axis=1)


def make_project_einsum(prec):
    def f(self, ent, proj):
        p = proj.reshape(-1, self.entity_dim, self.relation_dim)
        return jnp.einsum("bd,bdr->br", ent, p,
                          preferred_element_type=jnp.float32, precision=prec)
    return f


def make_neg_project(prec):
    def f(self, neg_ent, proj, num_chunks):
        p = proj.reshape(num_chunks, -1, self.entity_dim, self.relation_dim)
        n = neg_ent.reshape(num_chunks, 1, -1, self.entity_dim)
        return jnp.einsum("cxkd,cbdr->cbkr", n, p,
                          preferred_element_type=jnp.float32, precision=prec)
    return f


def main():
    print(f"device={jax.devices()[0].platform}  TransR dim=100 "
          f"B=1000 K=200 S={S}")
    combos = [
        ("bcast proj + high negproj (r3 current)",
         project_bcast, make_neg_project("high")),
        ("einsum-highest both (r2 original)",
         make_project_einsum("highest"), make_neg_project("highest")),
        ("bcast proj + highest negproj",
         project_bcast, make_neg_project("highest")),
        ("einsum-highest proj + high negproj",
         make_project_einsum("highest"), make_neg_project("high")),
        ("bcast proj + default negproj",
         project_bcast, make_neg_project("default")),
    ]
    orig = (SF.TransRScore.project, SF.TransRScore.neg_project)
    for tag, proj_fn, negp_fn in combos:
        SF.TransRScore.project = proj_fn
        SF.TransRScore.neg_project = negp_fn
        step_time(tag)
    SF.TransRScore.project, SF.TransRScore.neg_project = orig


if __name__ == "__main__":
    main()
