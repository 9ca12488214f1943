"""Same-session A/B of the FULL RESCAL train step: broadcast-reduce vs
einsum per-edge matvecs.

tools/diag_bilinear.py showed the isolated matvec kernels 5x faster in
broadcast-reduce form, but the round-3 full-step capture measured RESCAL
*slower* than round 2's einsum-based step (5992 vs 5354 us) — within the
documented +-25% session-to-session variance of the VPU-heavy models, so
only a SAME-SESSION comparison can attribute it.  This times the whole
train step (gather -> score -> loss -> grads -> Adagrad incl. the dense
one-hot relation write-back) for each matvec form by monkeypatching
RESCALScore.

Usage:  python tools/diag_rescal_step.py   (repo root, on TPU)
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
    cfg = KGEConfig(model_name="RESCAL", hidden_dim=200, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True)
    model = KEModel(cfg, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    loop = train_step_harness(model, S)
    dt = fetch_timed(lambda: float(loop(state)), S)
    print(f"  {tag:34s} {dt * 1e6:9.1f} us/step", flush=True)
    return dt


def pos_bcast(self, head, rel, tail):
    rt = jnp.sum(self._mat(rel) * tail[..., None, :], axis=-1)
    return jnp.sum(head * rt, axis=-1)


def neg_bcast(self, emb, rel, neg_emb, *, neg_head, num_chunks,
              chunk_size, neg_sample_size):
    d = emb.shape[-1]
    rmat = self._mat(rel)
    if neg_head:
        tmp = jnp.sum(rmat * emb[:, None, :], axis=-1)
    else:
        tmp = jnp.sum(rmat * emb[:, :, None], axis=1)
    tmp = tmp.reshape(num_chunks, chunk_size, d)
    neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
    return jnp.einsum("cbd,ckd->cbk", tmp, neg,
                      preferred_element_type=jnp.float32,
                      precision="highest")


def make_einsum(prec):
    def pos_e(self, head, rel, tail):
        rt = jnp.einsum("...re,...e->...r", self._mat(rel), tail,
                        preferred_element_type=jnp.float32, precision=prec)
        return jnp.sum(head * rt, axis=-1)

    def neg_e(self, emb, rel, neg_emb, *, neg_head, num_chunks,
              chunk_size, neg_sample_size):
        d = emb.shape[-1]
        rmat = self._mat(rel)
        if neg_head:
            tmp = jnp.einsum("bre,be->br", rmat, emb,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        else:
            tmp = jnp.einsum("bre,br->be", rmat, emb,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        tmp = tmp.reshape(num_chunks, chunk_size, d)
        neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
        return jnp.einsum("cbd,ckd->cbk", tmp, neg,
                          preferred_element_type=jnp.float32,
                          precision="highest")
    return pos_e, neg_e


def main():
    print(f"device={jax.devices()[0].platform}  RESCAL dim=200 "
          f"B=1000 K=200 S={S}")
    orig = (SF.RESCALScore.pos_score, SF.RESCALScore.neg_score)

    SF.RESCALScore.pos_score, SF.RESCALScore.neg_score = pos_bcast, neg_bcast
    step_time("broadcast-reduce (round-3 current)")

    for prec in ("highest", "default"):
        pe, ne = make_einsum(prec)
        SF.RESCALScore.pos_score, SF.RESCALScore.neg_score = pe, ne
        step_time(f"einsum matvecs prec={prec}")

    SF.RESCALScore.pos_score, SF.RESCALScore.neg_score = orig


if __name__ == "__main__":
    main()
