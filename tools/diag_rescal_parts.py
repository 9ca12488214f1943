"""RESCAL step attribution: where do the 5.4 ms/step actually go?

Times nested prefixes of the step same-session — relation gather only,
+forward scores+loss, +backward, full step — plus the relation Adagrad
write-back alone and a no-regularization variant, so each component's
cost falls out by subtraction.  Decides whether a fused custom kernel
(fewer HBM passes over the [1000, 40000] relation rows) has enough
headroom to be worth building.

Usage:  python tools/diag_rescal_parts.py   (repo root, on TPU)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.ops.embedding import gather_rows, sparse_adagrad_update

S = 256


def bench(tag, make_body, state):
    from tools._timing import fetch_timed

    @jax.jit
    def loop(st):
        def sbody(st, i):
            return make_body(st, i)
        st, out = lax.scan(sbody, st, jnp.arange(S))
        return out[-1] if out is not None else jnp.float32(0)

    dt = fetch_timed(lambda: float(jnp.sum(loop(state))), S)
    print(f"  {tag:44s} {dt * 1e6:9.1f} us/step", flush=True)


def main():
    print(f"device={jax.devices()[0].platform}  RESCAL dim=200 B=1000 "
          f"K=200 S={S}")
    cfg = KGEConfig(model_name="RESCAL", hidden_dim=200, gamma=19.9,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True)
    cfg0 = KGEConfig(model_name="RESCAL", hidden_dim=200, gamma=19.9,
                     lr=0.25, batch_size=1000, neg_sample_size=200,
                     neg_adversarial_sampling=True,
                     regularization_coef=0.0)
    model = KEModel(cfg, 14951, 1345)
    model0 = KEModel(cfg0, 14951, 1345)
    state = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randint(0, 14951, 1000), jnp.int32)
    r = jnp.asarray(rng.randint(0, 1345, 1000), jnp.int32)
    t = jnp.asarray(rng.randint(0, 14951, 1000), jnp.int32)
    neg = jnp.asarray(rng.randint(0, 14951, 1000), jnp.int32)
    g_rel = jnp.asarray(rng.randn(1000, 40000).astype(np.float32) * 1e-3)

    def vary(i):
        return (r + i) % 1345, (neg + i) % 14951

    # 1. relation gather, fully read (reduce fuses into the gather read)
    def gather_only(st, i):
        ri, _ = vary(i)
        rows = gather_rows(st.relation, ri, dim=model.relation_dim)
        return st, jnp.sum(rows) * 1e-30

    bench("rel gather + full read", gather_only, state)

    # 2. forward scores + loss (value only, no grad)
    def fwd_only(st, i):
        ri, ni = vary(i)
        b = 1000
        ent_ids = jnp.concatenate([h, t, ni])
        ent_rows = gather_rows(st.entity, ent_ids, dim=model.entity_dim,
                               dtype=jnp.float32)
        rel_rows = gather_rows(st.relation, ri, dim=model.relation_dim,
                               dtype=jnp.float32)
        pos, negs, _ = model._pos_neg_scores(
            (ent_rows[:b], ent_rows[b:2 * b]), rel_rows, ent_rows[2 * b:],
            None, neg_head=False, num_chunks=5, chunk_size=200,
            neg_sample_size=200)
        loss, _ = model.loss_gen.get_total_loss(pos, negs, None)
        return st, loss * 1e-30

    bench("+ forward scores + loss (no reg)", fwd_only, state)

    # 3. forward + backward (loss_and_grads, with reg like the real step)
    def fwd_bwd(st, i):
        ri, ni = vary(i)
        loss, log, grads = model.loss_and_grads(st, h, ri, t, ni, None,
                                                neg_head=False)
        sink = sum(jnp.sum(g) * 1e-30 for g in grads[1:] if g is not None)
        return st, loss * 1e-30 + sink

    bench("+ backward (grads, incl. reg)", fwd_bwd, state)

    # 4. full step, with and without regularization
    def full(st, i):
        ri, ni = vary(i)
        st2, log = model.train_step(st, h, ri, t, ni, None, neg_head=False)
        return st2, log["loss"]

    bench("full train step (reg 2e-6)", full, state)

    def full_noreg(st, i):
        ri, ni = vary(i)
        st2, log = model0.train_step(st, h, ri, t, ni, None, neg_head=False)
        return st2, log["loss"]

    bench("full train step (reg OFF)", full_noreg, state)

    # 5. relation Adagrad write-back alone (dense one-hot arm)
    def upd_only(st, i):
        ri, _ = vary(i)
        rel2 = sparse_adagrad_update(st.relation, ri, g_rel, 0.25)
        st2 = st._replace(relation=rel2)
        return st2, jnp.sum(rel2.state_sum) * 1e-30

    bench("relation Adagrad write-back alone", upd_only, state)


if __name__ == "__main__":
    main()
