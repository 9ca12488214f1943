"""KEModel — the training/eval model, built around one jitted SPMD step.

Replaces the reference's KEModel
(/root/reference/python/dglke/models/general_models.py:183-680).  There is no
graph object: a batch is integer arrays (h, r, t, neg) and the step is

    gather -> [project] -> pos score -> chunked neg score -> loss
           -> jax.grad over the *gathered rows only*
           -> segment-dedup -> row-sparse Adagrad scatter

Gradients are taken w.r.t. the gathered rows (the reference's "trace"),
never the full tables, so the backward pass is O(batch), and the scatter-add
updates are sparse.  Both head-corrupt and tail-corrupt steps are compiled
once each (static `neg_head`), mirroring the reference's alternating
head/tail samplers.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.loss import LossGenerator, regularization
from dglke_tpu.models.score_functions import (
    ScoreFunction,
    TransRScore,
    make_score_function,
)
from dglke_tpu.ops.embedding import (
    EmbeddingState,
    gather_rows,
    init_embedding,
    sparse_adagrad_update,
)


def _rescal_fused_enabled() -> bool:
    """EXPERIMENTAL fused RESCAL relation path (DGLKE_TPU_RESCAL_FUSED=1):
    factored relation gradients + the Pallas outer-product Adagrad kernel
    (ops/pallas/outer_update.py).  Single-device fp32 only — a
    pallas_call is opaque to the SPMD partitioner, like the row kernels
    (ops/embedding.py:set_pallas_rows)."""
    return os.environ.get("DGLKE_TPU_RESCAL_FUSED", "") in ("1", "true")


def _pipeline_rng_mode() -> str:
    """Per-step negative-key schedule of the device pipelines.

    "hybrid" (default): the per-step KEY WORDS are derived by a threefry
    stream (sound split/fold_in) and wrapped as rbg keys, so bulk bit
    generation keeps the TPU's hardware RngBitGenerator.  Deriving the
    per-step keys with rbg's OWN fold_in/split measurably correlates the
    negative streams across steps — a quarter-scale SimplE A/B degraded
    from MRR 0.998 (threefry) to 0.9745 (rbg) at 32k steps with
    everything else identical, and the at-scale 262k capture collapsed
    to 0.497 (tools/diag_simple_path.py; preserved red fragments).
    DGLKE_TPU_PIPELINE_THREEFRY=1 selects pure threefry end to end.
    """
    if os.environ.get("DGLKE_TPU_PIPELINE_THREEFRY"):
        return "threefry"
    return "hybrid"


def _pipeline_step_keys(base_key, call_idx, s: int):
    """[s//2, 2] per-step negative-draw keys (see _pipeline_rng_mode)."""
    # Domain-separate from the epoch-permutation folds: trainer/pipeline
    # epoch shuffles use fold_in(base_key, epoch) over the SAME small-int
    # space, so without the tag call 0's negative key is bit-identical to
    # epoch 0's permutation key (and every call_idx <= n_epochs collides)
    # — the class of stream correlation the SimplE investigation showed
    # measurably degrades long trainings.
    key = jax.random.fold_in(base_key, 0x6E656753)    # 'negS' tag
    key = jax.random.fold_in(key, call_idx)           # threefry: sound
    if _pipeline_rng_mode() == "hybrid":
        try:
            kd = jax.random.bits(key, (s // 2, 2, 4), jnp.uint32)
            return jax.random.wrap_key_data(kd, impl="rbg")
        except Exception:  # backend without rbg support
            pass
    return jax.random.split(key, (s // 2, 2))


def _plan_key(plan):
    """Stable memo identity for a ShardingPlan: axis name + device ids
    (id(plan) can be recycled after a plan is garbage-collected)."""
    if plan is None:
        return None
    return (plan.axis, getattr(plan, "table_sharding", None),
            tuple(d.id for d in plan.mesh.devices.flat))


def _update_relation(rel: EmbeddingState, r, g_r, lr: float,
                     cfg: KGEConfig) -> EmbeddingState:
    """Dispatch the relation-table update: factored ("outer", a, v)
    gradients take the fused Pallas kernel (regularization gradient
    applied in-kernel); dense arrays take the stock sparse Adagrad."""
    if isinstance(g_r, tuple) and g_r[0] == "outer":
        from dglke_tpu.ops.pallas.outer_update import outer_adagrad_update
        interpret = jax.default_backend() != "tpu"
        return outer_adagrad_update(
            rel, r, g_r[1], g_r[2], lr,
            reg_coef=cfg.regularization_coef,
            reg_norm=cfg.regularization_norm, interpret=interpret)
    return sparse_adagrad_update(rel, r, g_r, lr)


class TrainState(NamedTuple):
    entity: EmbeddingState
    relation: EmbeddingState
    projection: Optional[EmbeddingState]  # TransR only
    step: jnp.ndarray                     # int32 scalar


class KEModel:
    """Owns table shapes + the score function; state itself is a pytree so
    it can live sharded on the device mesh and flow through jit."""

    def __init__(self, config: KGEConfig, n_entities: int, n_relations: int):
        config.validate()
        self.config = config
        self.n_entities = n_entities
        self.n_relations = n_relations
        score_fn, entity_dim, relation_dim = make_score_function(
            config.model_name, config.gamma, config.hidden_dim,
            config.double_ent, config.double_rel)
        self.score_fn: ScoreFunction = score_fn
        self.entity_dim = entity_dim
        self.relation_dim = relation_dim
        self.proj_dim = entity_dim * relation_dim  # TransR projection width
        self.is_transr = isinstance(score_fn, TransRScore)
        self.loss_gen = LossGenerator(
            loss_genre=config.loss_genre,
            neg_adversarial_sampling=config.neg_adversarial_sampling,
            adversarial_temperature=config.adversarial_temperature,
            pairwise=config.pairwise,
            margin=config.margin,
        )
        # jitted-callable memo: jax's compilation cache is keyed on the
        # function OBJECT, so handing callers a fresh jit-wrapped closure
        # per make_* call silently recompiles on every use (measured ~7 s
        # per evaluate() on the tunneled v5e — it dwarfed the actual eval)
        self._jit_memo: dict = {}

    def _memo(self, key, build):
        fn = self._jit_memo.get(key)
        if fn is None:
            fn = self._jit_memo[key] = build()
        return fn

    # -- state ---------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        k_e, k_r, k_p = jax.random.split(key, 3)
        emb_init = self.config.emb_init
        edt = (jnp.bfloat16 if self.config.emb_dtype == "bfloat16"
               else jnp.float32)
        entity = init_embedding(k_e, self.n_entities, self.entity_dim,
                                emb_init, dtype=edt)
        relation = init_embedding(k_r, self.n_relations, self.relation_dim,
                                  emb_init, dtype=edt)
        projection = None
        if self.is_transr:
            # reference inits the projection with range 1.0
            # (score_fun.py:173-174: projection_emb.init(1.0))
            projection = init_embedding(
                k_p, self.n_relations, self.entity_dim * self.relation_dim,
                1.0, dtype=edt)
        return TrainState(entity=entity, relation=relation,
                          projection=projection,
                          step=jnp.zeros((), jnp.int32))

    # -- forward -------------------------------------------------------------

    def _pos_neg_scores(self, rows, rel_rows, neg_rows, proj_rows, *,
                        neg_head: bool, num_chunks: int, chunk_size: int,
                        neg_sample_size: int, neg_deg_sample: bool = False):
        """rows = (h_rows, t_rows): gathered entity rows [B, De] each.

        Returns (pos_score [B], neg_score [B, K'], K') where K' accounts for
        neg_deg_sample doubling; masked entries are zeroed like the reference
        (general_models.py:430-434).
        """
        h_rows, t_rows = rows
        sf = self.score_fn
        if self.is_transr:
            h_proj = sf.project(h_rows, proj_rows)
            t_proj = sf.project(t_rows, proj_rows)
            pos = sf.pos_score(h_proj, rel_rows, t_proj)
            k = neg_sample_size
            if neg_deg_sample:
                # Degree-based negatives are model-agnostic in the reference
                # (built in the neg-graph sampler): prepend the chunk's own
                # RAW side entities to the raw negatives before projection;
                # the self-match diagonal is masked below.
                own = (h_rows if neg_head else t_rows).reshape(
                    num_chunks, chunk_size, -1)
                extra = neg_rows.reshape(num_chunks, neg_sample_size, -1)
                neg_rows = jnp.concatenate([own, extra], axis=1).reshape(
                    num_chunks * (chunk_size + neg_sample_size), -1)
                k = chunk_size + neg_sample_size
            # project each neg row against all chunk relations
            neg_proj = sf.neg_project(neg_rows, proj_rows, num_chunks)
            side = t_proj if neg_head else h_proj
            side = side.reshape(num_chunks, chunk_size, self.relation_dim)
            neg = sf.neg_score(side, rel_rows, neg_proj, neg_head=neg_head,
                               num_chunks=num_chunks, chunk_size=chunk_size,
                               neg_sample_size=k)
            if neg_deg_sample:
                eye = jnp.eye(chunk_size, k, dtype=neg.dtype)
                neg = neg * (1.0 - eye)[None, :, :]
            return pos, neg.reshape(-1, k), k

        pos = sf.pos_score(h_rows, rel_rows, t_rows)
        side = t_rows if neg_head else h_rows
        k = neg_sample_size
        if neg_deg_sample:
            # Use the batch's own head/tail nodes as additional negatives;
            # the diagonal (each positive vs itself) is masked to zero.
            own = (h_rows if neg_head else t_rows).reshape(
                num_chunks, chunk_size, -1)
            extra = neg_rows.reshape(num_chunks, neg_sample_size, -1)
            neg_rows = jnp.concatenate([own, extra], axis=1).reshape(
                num_chunks * (chunk_size + neg_sample_size), -1)
            k = chunk_size + neg_sample_size
        neg = sf.neg_score(side, rel_rows, neg_rows, neg_head=neg_head,
                           num_chunks=num_chunks, chunk_size=chunk_size,
                           neg_sample_size=k)
        if neg_deg_sample:
            # mask[c, i, j]: positive i in chunk c against own-node j == i
            eye = jnp.eye(chunk_size, k, dtype=neg.dtype)
            neg = neg * (1.0 - eye)[None, :, :]
        return pos, neg.reshape(-1, k), k

    def loss_and_grads(self, state: TrainState, h, r, t, neg, impts, *,
                       neg_head: bool):
        """Compute loss + gradients w.r.t. the gathered rows."""
        cfg = self.config
        b = h.shape[0]
        # Chunk structure comes from the sampler: the batch splits into C
        # chunks of Bc positives, each sharing K = neg_sample_size negatives
        # (reference create_neg_subgraph, sampler.py:459-512).
        neg_sample_size = cfg.neg_sample_size
        num_chunks = max(1, neg.shape[0] // neg_sample_size)
        chunk_size = b // num_chunks
        neg_sample_size = neg.shape[0] // num_chunks

        if (self.score_fn.name == "RESCAL" and _rescal_fused_enabled()
                and not cfg.neg_deg_sample
                and cfg.compute_dtype != "bfloat16"
                and cfg.emb_dtype != "bfloat16"):
            return self._rescal_loss_and_grads_factored(
                state, h, r, t, neg, impts, neg_head=neg_head,
                num_chunks=num_chunks, chunk_size=chunk_size,
                neg_sample_size=neg_sample_size)

        # ONE entity gather for [h | t | neg]: a third of the row-DMA
        # launches, and the gradient comes back as the single [3B+CK, D]
        # array the sparse Adagrad update consumes directly.
        ent_ids = jnp.concatenate([h, t, neg])
        # bf16-stored tables: gathers upcast to fp32 so gradients and the
        # Adagrad math stay fp32 (write-back rounds to the table dtype)
        ent_rows = gather_rows(state.entity, ent_ids, dim=self.entity_dim,
                               dtype=jnp.float32)
        rel_rows = gather_rows(state.relation, r, dim=self.relation_dim,
                               dtype=jnp.float32)
        proj_rows = (gather_rows(state.projection, r, dim=self.proj_dim,
                                 dtype=jnp.float32)
                     if self.is_transr else None)
        loss, log, grads = self._rows_loss_and_grads(
            ent_rows, rel_rows, proj_rows, impts, b=b,
            num_chunks=num_chunks, chunk_size=chunk_size,
            neg_sample_size=neg_sample_size, neg_head=neg_head)
        return loss, log, (ent_ids,) + grads

    def _rows_loss_and_grads(self, ent_rows, rel_rows, proj_rows, impts, *,
                             b: int, num_chunks: int, chunk_size: int,
                             neg_sample_size: int, neg_head: bool):
        """Loss + gradients w.r.t. already-GATHERED rows (the row-level
        core of loss_and_grads, shared with the host-resident-table mode
        where the gather/scatter happen on the host — see
        ops/host_embedding.py).  Returns (loss, log, (ent_grads [3B+CK,D],
        rel_grads, proj_grads_or_None))."""
        cfg = self.config
        # bfloat16 scoring (optional): gathered rows are cast before the
        # score kernels so matmuls take the fast MXU path; the loss, softmax
        # and gradients accumulate in fp32 (preferred_element_type) and the
        # Adagrad update stays fp32.
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        def loss_fn(ent_rows, rel_rows, proj_rows):
            h_rows, t_rows = ent_rows[:b], ent_rows[b:2 * b]
            neg_rows = ent_rows[2 * b:]
            if cdtype is not None:
                sh, st_, sr, sn = (x.astype(cdtype) for x in
                                   (h_rows, t_rows, rel_rows, neg_rows))
                sp = (proj_rows.astype(cdtype)
                      if proj_rows is not None else None)
            else:
                sh, st_, sr, sn, sp = (h_rows, t_rows, rel_rows, neg_rows,
                                       proj_rows)
            def scores(rows, rel, negr, proj):
                return self._pos_neg_scores(
                    rows, rel, negr, proj,
                    neg_head=neg_head, num_chunks=num_chunks,
                    chunk_size=chunk_size, neg_sample_size=neg_sample_size,
                    neg_deg_sample=cfg.neg_deg_sample)

            if self.score_fn.name == "RotatE":
                # RotatE's backward otherwise saves ~0.5 GB of [C,Bc,K,D/2]
                # residuals (re/im diffs + per-pair modulus) to HBM;
                # recomputing them is cheaper (measured -19%/step on a v5e).
                # Not applied to other models: L1 is neutral, TransR's
                # projection einsums cost more to recompute than to save.
                scores = jax.checkpoint(scores)
            pos, negs, _ = scores((sh, st_), sr, sn, sp)
            pos = pos.astype(jnp.float32)
            negs = negs.astype(jnp.float32)
            loss, log = self.loss_gen.get_total_loss(pos, negs, impts)
            if cfg.regularization_coef > 0.0 and cfg.regularization_norm > 0:
                reg_rows = [ent_rows, rel_rows]
                reg = regularization(cfg.regularization_coef,
                                     cfg.regularization_norm, reg_rows)
                log["regularization"] = reg
                loss = loss + reg
            return loss, log

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2)
                                     if self.is_transr else (0, 1),
                                     has_aux=True)
        (loss, log), grads = grad_fn(ent_rows, rel_rows, proj_rows)
        if not self.is_transr:
            grads = grads + (None,)
        return loss, log, grads

    def _rescal_loss_and_grads_factored(self, state: TrainState, h, r, t,
                                        neg, impts, *, neg_head: bool,
                                        num_chunks: int, chunk_size: int,
                                        neg_sample_size: int):
        """RESCAL loss/grads with the relation gradient kept FACTORED.

        The bilinear score factors through a single per-edge vector:
        tail-corrupt ``tmp = R_bᵀ h_b`` gives ``pos = tmp·t`` and
        ``negs = tmp·n_k``; head-corrupt ``tmp = R_b t_b`` gives
        ``pos = h·tmp`` and ``negs = n·tmp``.  Differentiating w.r.t.
        ``tmp`` instead of the gathered relation rows makes the relation
        gradient exactly ``a_b ⊗ v_b`` (rank 1 per edge) — never
        materializing the [B, Dr·De] array the stock autodiff produces
        (160 MB/step at the benchmark shape).  The factors feed the fused
        Pallas update (ops/pallas/outer_update.py), which also applies
        the norm-p regularization gradient of the relation rows
        in-kernel; only the regularization VALUE is computed here (for
        the loss log, matching general_models.py:572-576).

        Experimental, DGLKE_TPU_RESCAL_FUSED=1 (single-device fp32 only:
        a pallas_call is opaque to the SPMD partitioner, and the kernel
        assumes fp32 tables).
        """
        cfg = self.config
        b = h.shape[0]
        dr = self.score_fn.relation_dim
        de = self.score_fn.entity_dim
        ent_ids = jnp.concatenate([h, t, neg])
        ent_rows = gather_rows(state.entity, ent_ids, dim=self.entity_dim,
                               dtype=jnp.float32)
        rel_rows = gather_rows(state.relation, r, dim=self.relation_dim,
                               dtype=jnp.float32)
        rmat = rel_rows.reshape(b, dr, de)
        h0, t0 = ent_rows[:b], ent_rows[b:2 * b]
        if neg_head:
            tmp0 = jnp.einsum("bre,be->br", rmat, t0,
                              preferred_element_type=jnp.float32,
                              precision="highest")
        else:
            tmp0 = jnp.einsum("bre,br->be", rmat, h0,
                              preferred_element_type=jnp.float32,
                              precision="highest")

        def loss_fn(ent_rows, tmp):
            h_rows, t_rows = ent_rows[:b], ent_rows[b:2 * b]
            neg_rows = ent_rows[2 * b:]
            side = h_rows if neg_head else t_rows
            pos = jnp.sum(side * tmp, axis=-1)
            tc = tmp.reshape(num_chunks, chunk_size, -1)
            nc = neg_rows.reshape(num_chunks, neg_sample_size, -1)
            negs = jnp.einsum("cbd,ckd->cbk", tc, nc,
                              preferred_element_type=jnp.float32,
                              precision="highest")
            loss, log = self.loss_gen.get_total_loss(
                pos, negs.reshape(-1, neg_sample_size), impts)
            if cfg.regularization_coef > 0.0 and cfg.regularization_norm > 0:
                # entity part only: the relation rows' reg gradient is
                # applied in-kernel; its value is added below
                reg = regularization(cfg.regularization_coef,
                                     cfg.regularization_norm, [ent_rows])
                log["regularization"] = reg
                loss = loss + reg
            return loss, log

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, log), (g_ent, g_tmp) = grad_fn(ent_rows, tmp0)
        if neg_head:
            # tmp = R t  =>  dt += Rᵀ g_tmp ; dR = g_tmp ⊗ t
            extra = jnp.einsum("bre,br->be", rmat, g_tmp,
                               preferred_element_type=jnp.float32,
                               precision="highest")
            g_ent = g_ent.at[b:2 * b].add(extra)
            factors = (g_tmp, t0)
        else:
            # tmp = Rᵀ h  =>  dh += R g_tmp ; dR = h ⊗ g_tmp
            extra = jnp.einsum("bre,be->br", rmat, g_tmp,
                               preferred_element_type=jnp.float32,
                               precision="highest")
            g_ent = g_ent.at[:b].add(extra)
            factors = (h0, g_tmp)
        if cfg.regularization_coef > 0.0 and cfg.regularization_norm > 0:
            reg_rel = regularization(cfg.regularization_coef,
                                     cfg.regularization_norm, [rel_rows])
            log["regularization"] = log["regularization"] + reg_rel
            loss = loss + reg_rel
        return loss, log, (ent_ids, g_ent, ("outer",) + factors, None)

    # -- train step ----------------------------------------------------------

    def train_step(self, state: TrainState, h, r, t, neg, impts, *,
                   neg_head: bool):
        """One full step; designed to be jit-compiled (static neg_head)."""
        cfg = self.config
        loss, log, grads = self.loss_and_grads(state, h, r, t, neg, impts,
                                               neg_head=neg_head)
        ent_ids, ent_grads, g_r, g_proj = grads
        entity = sparse_adagrad_update(state.entity, ent_ids, ent_grads,
                                       cfg.lr)
        relation = _update_relation(state.relation, r, g_r, cfg.lr, cfg)
        projection = state.projection
        if self.is_transr:
            projection = sparse_adagrad_update(state.projection, r, g_proj,
                                               cfg.lr)
        new_state = TrainState(entity=entity, relation=relation,
                               projection=projection, step=state.step + 1)
        return new_state, log

    def train_step_async(self, state: TrainState, pending, h, r, t, neg,
                         impts, *, neg_head: bool):
        """Deferred-entity-update step (the reference's --async_update,
        train_pytorch.py:42-60 `async_update` process), deterministic.

        The entity scatter for batch i-1 (``pending``) is applied to the
        same table snapshot this batch's gather reads — the scored rows are
        one step stale, exactly the staleness the reference's racing
        updater process introduces, but with a fixed schedule instead of a
        race.  Relations (and TransR projections) update synchronously, as
        in the reference (they live on the compute device there too).

        Measured on a v5e: within ~1% of the sync step — the donated
        (in-place) table creates a write-after-read hazard XLA will not
        double-buffer 30 MB to break, so gather and scatter stay
        serialized.  Kept for reference-flag parity and for configurations
        where the tradeoff differs (larger dims, undonated tables).

        Returns (new_state, new_pending, log); callers flush the final
        pending with ``flush_async``.  A zero-gradient pending is a no-op
        (delta = -lr*0/std == 0, state_sum += 0), which seeds the chain.
        """
        cfg = self.config
        loss, log, grads = self.loss_and_grads(state, h, r, t, neg, impts,
                                               neg_head=neg_head)
        ent_ids, ent_grads, g_r, g_proj = grads
        entity = sparse_adagrad_update(state.entity, pending[0], pending[1],
                                       cfg.lr)
        relation = _update_relation(state.relation, r, g_r, cfg.lr, cfg)
        projection = state.projection
        if self.is_transr:
            projection = sparse_adagrad_update(state.projection, r, g_proj,
                                               cfg.lr)
        new_state = TrainState(entity=entity, relation=relation,
                               projection=projection, step=state.step + 1)
        return new_state, (ent_ids, ent_grads), log

    def flush_async(self, state: TrainState, pending) -> TrainState:
        entity = sparse_adagrad_update(state.entity, pending[0], pending[1],
                                       self.config.lr)
        return TrainState(entity=entity, relation=state.relation,
                          projection=state.projection, step=state.step)

    def _zero_pending(self, batch_size: int, neg_len: int):
        n = 2 * batch_size + neg_len
        return (jnp.zeros((n,), jnp.int32),
                jnp.zeros((n, self.entity_dim), jnp.float32))

    def make_train_step(self, donate: bool = True):
        """Jit-compiled train step; two specializations (head/tail corrupt).
        Memoized: repeated train() calls must reuse one jit wrapper (jax's
        compile cache keys on the function object)."""
        def build():
            def step(state, h, r, t, neg, impts, neg_head):
                return self.train_step(state, h, r, t, neg, impts,
                                       neg_head=neg_head)

            return jax.jit(step, static_argnames=("neg_head",),
                           donate_argnums=(0,) if donate else ())

        return self._memo(("train_step", donate), build)

    def make_host_rows_step(self, batch_size: int, neg_total: int):
        """Jitted row-level step for HOST-RESIDENT tables (the reference's
        --mix_cpu_gpu / CPU ExternalEmbedding mode, train.py:46-49 +
        tensor_models.py:304-362): the host gathers the batch's rows from
        its numpy tables, the device computes loss + row gradients, and
        the host applies the sparse Adagrad scatter.  The jit is PURE
        (no table-sized state on device), so tables bigger than HBM
        train on one chip at host-link speed.  Memoized."""
        def build():
            cfg = self.config
            b = batch_size
            num_chunks = max(1, neg_total // cfg.neg_sample_size)
            nss = neg_total // num_chunks

            def step(ent_rows, rel_rows, proj_rows, impts, neg_head):
                loss, log, grads = self._rows_loss_and_grads(
                    ent_rows, rel_rows, proj_rows, impts, b=b,
                    num_chunks=num_chunks, chunk_size=b // num_chunks,
                    neg_sample_size=nss, neg_head=neg_head)
                return log, grads

            return jax.jit(step, static_argnames=("neg_head",))

        return self._memo(("host_rows_step", batch_size, neg_total), build)

    def make_train_step_packed(self, batch_size: int, donate: bool = True):
        """Packed-batch variant: ids arrive as ONE int32 array
        [h | r | t | neg] so the host->device path is a single transfer
        (per-array device_put overhead dominates the step otherwise).
        impts, when used, rides as a second fp32 array.  Memoized."""
        def build():
            b = batch_size

            def step(state, packed, impts, neg_head):
                h, r, t = packed[:b], packed[b:2 * b], packed[2 * b:3 * b]
                neg = packed[3 * b:]
                return self.train_step(state, h, r, t, neg, impts,
                                       neg_head=neg_head)

            return jax.jit(step, static_argnames=("neg_head",),
                           donate_argnums=(0,) if donate else ())

        return self._memo(("train_step_packed", batch_size, donate), build)

    def make_train_superstep(self, batch_size: int, steps_per_call: int,
                             donate: bool = True):
        return self._memo(
            ("train_superstep", batch_size, steps_per_call, donate),
            lambda: self._build_train_superstep(batch_size,
                                                steps_per_call, donate))

    def _build_train_superstep(self, batch_size: int,
                               steps_per_call: int,
                               donate: bool = True):
        """Multi-step train kernel: runs `steps_per_call` steps in ONE device
        call via lax.scan, alternating head-/tail-corrupt like the
        reference's bidirectional iterator (even rows head, odd rows tail).

        This amortizes host->device transfer latency and dispatch overhead
        over many steps — on a tunneled single chip each transfer costs
        ~100us+, several times the 60us device step.  Input layout:
        packed [S, 3B + C*K] int32, impts [S, B] fp32 or None.
        """
        assert steps_per_call % 2 == 0, "steps_per_call must be even"
        b = batch_size
        use_async = self.config.async_update

        def one(state, pending, packed, impts, neg_head):
            h, r, t = packed[:b], packed[b:2 * b], packed[2 * b:3 * b]
            neg = packed[3 * b:]
            if use_async:
                return self.train_step_async(state, pending, h, r, t, neg,
                                             impts, neg_head=neg_head)
            st, log = self.train_step(state, h, r, t, neg, impts,
                                      neg_head=neg_head)
            return st, pending, log

        def superstep(state, packed_all, impts_all):
            s = steps_per_call
            pairs = packed_all.reshape(s // 2, 2, -1)
            ipairs = (impts_all.reshape(s // 2, 2, -1)
                      if impts_all is not None else None)
            pending0 = self._zero_pending(b, packed_all.shape[-1] - 3 * b)

            def body(carry, xs):
                st, pend = carry
                pair, ip = xs
                st, pend, log1 = one(st, pend, pair[0],
                                     None if ip is None else ip[0], True)
                st, pend, log2 = one(st, pend, pair[1],
                                     None if ip is None else ip[1], False)
                log = {k: (log1[k] + log2[k]) / 2.0 for k in log1}
                return (st, pend), log

            (state, pending), logs = jax.lax.scan(body, (state, pending0),
                                                  (pairs, ipairs))
            if use_async:
                state = self.flush_async(state, pending)
            return state, {k: jnp.mean(v) for k, v in logs.items()}

        return jax.jit(superstep, donate_argnums=(0,) if donate else ())

    def make_device_pipeline_step(self, n_edges: int, batch_size: int,
                                  neg_total: int, steps_per_call: int,
                                  donate: bool = True, plan=None,
                                  with_impts: bool = False):
        # memoized (jax's compile cache keys on the function object);
        # the plan is keyed by its stable identity (axis + device ids),
        # not id(): a recycled id() of a garbage-collected plan would
        # silently return a step jitted for the dead plan's mesh
        return self._memo(
            ("device_pipeline_step", n_edges, batch_size, neg_total,
             steps_per_call, donate, _plan_key(plan), with_impts,
             _pipeline_rng_mode()),
            lambda: self._build_device_pipeline_step(
                n_edges, batch_size, neg_total, steps_per_call,
                donate=donate, plan=plan, with_impts=with_impts))

    def _build_device_pipeline_step(self, n_edges: int, batch_size: int,
                                  neg_total: int, steps_per_call: int,
                                  donate: bool = True, plan=None,
                                  with_impts: bool = False):
        """Fully device-resident pipeline: the training triples live in HBM
        and each call samples its own batches on device — no host work or
        host->device transfer in the hot loop at all.

        Arguments of the returned fn (built for minimum host round-trips —
        on a tunneled chip every dependent device call costs a full RTT, so
        the ONLY per-call device work is this one fused call):
          state, triples ([3, E] int32, device-resident), cur/nxt ([E]
          int32 epoch permutations, device-resident), pos/epoch/call_idx
          (int32 scalars; tiny argument upload), base_key.
        Batches may STRADDLE an epoch boundary: positions past the end of
        `cur` continue into `nxt` (the next epoch's permutation), so no
        tail edge is ever dropped — the reference sampler's exact
        without-replacement semantics.  When the static flag refresh_next
        is True (the straddling call) `nxt` is first regenerated ON DEVICE
        from fold_in(base_key, epoch + 1); negatives derive from
        fold_in(base_key, call_idx).  Corruption sides alternate per step.
        Returns ((state, nxt), logs); the host swaps cur/nxt when pos
        wraps.
        """
        assert steps_per_call % 2 == 0
        b = batch_size
        s = steps_per_call
        use_async = self.config.async_update

        def call(state, triples, impts_e, cur, nxt, pos, epoch, call_idx,
                 base_key, refresh_next):
            """impts_e: [E] fp32 per-edge importance weights (device-
            resident, like triples) when with_impts; unused (None) else —
            weights gather INSIDE the scanned step, so weighted training
            keeps the zero-host-transfer hot loop (reference carries
            edata['impts'] through its C++ sampler, sampler.py:338-344)."""
            if refresh_next:
                ekey = jax.random.fold_in(base_key, epoch + 1)
                nxt = jax.random.permutation(ekey, n_edges).astype(jnp.int32)
            # One dynamic_slice over [cur | nxt]: straddling reads continue
            # into the next epoch's permutation.  The concat is one
            # bandwidth pass (amortized over s steps); an elementwise
            # two-gather select here measured 45 ms/call on a v5e.
            both = jnp.concatenate([cur, nxt])
            idx = jax.lax.dynamic_slice(both, (pos,), (s * b,))
            idx = idx.reshape(s // 2, 2, b)
            keys = _pipeline_step_keys(base_key, call_idx, s)

            def one(st, pend, row_idx, k, neg_head):
                h = triples[0, row_idx]
                r = triples[1, row_idx]
                t = triples[2, row_idx]
                imp = impts_e[row_idx] if with_impts else None
                neg = jax.random.randint(k, (neg_total,), 0,
                                         self.n_entities, dtype=jnp.int32)
                if plan is not None:
                    # triples/perm are replicated over the mesh; split the
                    # batch (and its chunk-aligned negatives) across the dp
                    # axis so every device scores its own slice against the
                    # sharded tables — no host feed in the multi-chip loop.
                    from jax.sharding import NamedSharding, PartitionSpec
                    dp = NamedSharding(plan.mesh, PartitionSpec(plan.axis))
                    h, r, t, neg = (jax.lax.with_sharding_constraint(x, dp)
                                    for x in (h, r, t, neg))
                    if imp is not None:
                        imp = jax.lax.with_sharding_constraint(imp, dp)
                if use_async:
                    return self.train_step_async(st, pend, h, r, t, neg,
                                                 imp, neg_head=neg_head)
                st, log = self.train_step(st, h, r, t, neg, imp,
                                          neg_head=neg_head)
                return st, pend, log

            def body(carry, xs):
                st, pend = carry
                row_pair, key_pair = xs
                st, pend, log1 = one(st, pend, row_pair[0], key_pair[0],
                                     True)
                st, pend, log2 = one(st, pend, row_pair[1], key_pair[1],
                                     False)
                return (st, pend), {k: (log1[k] + log2[k]) / 2.0
                                    for k in log1}

            pending0 = self._zero_pending(b, neg_total)
            (state, pending), logs = jax.lax.scan(body, (state, pending0),
                                                  (idx, keys))
            if use_async:
                state = self.flush_async(state, pending)
            return (state, nxt), {k: jnp.mean(v) for k, v in logs.items()}

        return jax.jit(call, static_argnames=("refresh_next",),
                       donate_argnums=(0, 4) if donate else ())  # state, nxt

    def make_device_pipeline_step_multihost(
            self, n_edges: int, batch_size: int, neg_total: int,
            steps_per_call: int, plan, nproc: int, local: int,
            key_impl=None, with_impts: bool = False,
            donate: bool = True):
        return self._memo(
            ("device_pipeline_step_mh", n_edges, batch_size, neg_total,
             steps_per_call, _plan_key(plan), nproc, local, key_impl,
             with_impts, donate, _pipeline_rng_mode()),
            lambda: self._build_device_pipeline_step_multihost(
                n_edges, batch_size, neg_total, steps_per_call, plan,
                nproc, local, key_impl=key_impl,
                with_impts=with_impts, donate=donate))

    def _build_device_pipeline_step_multihost(
            self, n_edges: int, batch_size: int, neg_total: int,
            steps_per_call: int, plan, nproc: int, local: int,
            key_impl=None, with_impts: bool = False, donate: bool = True):
        """Multi-host fully device-resident pipeline (the P5 hot loop).

        The reference's parameter-server design trains with no per-step
        host coordination beyond row pull/push (kvclient.py:140-156,
        train_pytorch.py:268-403); the single-host device pipeline above
        keeps even that off the host.  This variant extends the
        zero-per-step-host-transfer property to `jax.process_count() > 1`:

          * edge plane [ndev, 3, E] int32, sharded (dp, None, None) —
            every device of host p holds a COPY of p's edge partition
            (cycle-padded by DevicePipeline to the pod-max length E so
            all hosts share one epoch clock), so batch-row gathers are
            device-LOCAL, never collective;
          * per-HOST epoch permutations cur/nxt [ndev, E], sharded
            (dp, None): all devices of a host derive the identical row
            from fold_in(base_key, epoch * nproc + host), generated on
            device;
          * device d (local rank d % local) takes columns
            [pos + step*b + (d%local)*bl, +bl) of its host's permutation
            — the global batch is host 0's b rows, then host 1's, ...,
            exactly the layout ShardingPlan.put_batch assembles on the
            un-fused path, but composed entirely on device;
          * negatives ride one replicated key: randint([nproc*neg_total])
            dp-constrained, the same chunk-aligned split as the
            single-host multi-device path.

        The per-call host work is the same int32 scalar upload as the
        single-host pipeline; nothing batch-sized ever crosses a host
        link.  base_key arrives as raw key DATA (numpy) because a typed
        process-local key cannot enter a global-mesh jit; it is re-wrapped
        here (impl recorded at pipeline construction).
        """
        assert steps_per_call % 2 == 0
        from jax.sharding import NamedSharding, PartitionSpec
        ndev = plan.mesh.devices.size
        assert ndev == nproc * local, (ndev, nproc, local)
        b = batch_size
        assert b % local == 0, (
            f"batch_size {b} must divide over {local} local devices")
        bl = b // local
        s = steps_per_call
        neg_g = nproc * neg_total
        use_async = self.config.async_update
        dp_rows = NamedSharding(plan.mesh, PartitionSpec(plan.axis, None))
        dp = NamedSharding(plan.mesh, PartitionSpec(plan.axis))
        cst = jax.lax.with_sharding_constraint

        def call(state, plane, impts_e, cur, nxt, pos, epoch, call_idx,
                 key_data, refresh_next):
            base_key = jax.random.wrap_key_data(key_data, impl=key_impl)
            host = jnp.arange(ndev, dtype=jnp.int32) // local
            lr = jnp.arange(ndev, dtype=jnp.int32) % local
            if refresh_next:
                ekeys = jax.vmap(
                    lambda hh: jax.random.fold_in(
                        base_key, (epoch + 1) * nproc + hh))(host)
                nxt = cst(jax.vmap(
                    lambda k: jax.random.permutation(k, n_edges)
                )(ekeys).astype(jnp.int32), dp_rows)
            both = jnp.concatenate([cur, nxt], axis=1)      # [ndev, 2E]
            # per-device permutation columns: straddling positions read
            # into the next epoch's plane, exactly like the single-host
            # pipeline
            cols = (pos
                    + jnp.arange(s, dtype=jnp.int32)[None, :, None] * b
                    + lr[:, None, None] * bl
                    + jnp.arange(bl, dtype=jnp.int32)[None, None, :])
            idx = jnp.take_along_axis(both, cols.reshape(ndev, s * bl),
                                      axis=1)               # local gather
            idx = cst(idx, dp_rows).reshape(ndev, s, bl)
            idx = jnp.moveaxis(idx, 1, 0).reshape(s // 2, 2, ndev, bl)
            keys = _pipeline_step_keys(base_key, call_idx, s)

            def gather_batch(idx_step):  # [ndev, bl] -> global [nproc*b]
                cols3 = []
                for c in range(3):
                    x = jnp.take_along_axis(plane[:, c, :], idx_step,
                                            axis=1)
                    cols3.append(cst(cst(x, dp_rows).reshape(ndev * bl),
                                     dp))
                imp = None
                if with_impts:
                    imp = jnp.take_along_axis(impts_e, idx_step, axis=1)
                    imp = cst(cst(imp, dp_rows).reshape(ndev * bl), dp)
                return cols3[0], cols3[1], cols3[2], imp

            def one(st, pend, idx_step, k, neg_head):
                h, r, t, imp = gather_batch(idx_step)
                neg = jax.random.randint(k, (neg_g,), 0, self.n_entities,
                                         dtype=jnp.int32)
                neg = cst(neg, dp)
                if use_async:
                    return self.train_step_async(st, pend, h, r, t, neg,
                                                 imp, neg_head=neg_head)
                st, log = self.train_step(st, h, r, t, neg, imp,
                                          neg_head=neg_head)
                return st, pend, log

            def body(carry, xs):
                st, pend = carry
                idx_pair, key_pair = xs
                st, pend, log1 = one(st, pend, idx_pair[0], key_pair[0],
                                     True)
                st, pend, log2 = one(st, pend, idx_pair[1], key_pair[1],
                                     False)
                return (st, pend), {k: (log1[k] + log2[k]) / 2.0
                                    for k in log1}

            pending0 = self._zero_pending(nproc * b, neg_g)
            (state, pending), logs = jax.lax.scan(body, (state, pending0),
                                                  (idx, keys))
            if use_async:
                state = self.flush_async(state, pending)
            return (state, nxt), {k: jnp.mean(v) for k, v in logs.items()}

        return jax.jit(call, static_argnames=("refresh_next",),
                       donate_argnums=(0, 4) if donate else ())  # state, nxt

    # -- evaluation ----------------------------------------------------------

    def eval_ranks(self, state: TrainState, h, r, t, filter_ids, filter_mask,
                   *, neg_head: bool, block: Optional[int] = None):
        """Filtered ranks of each (h, r, t) against ALL entities.

        rank_i = 1 + |{e not filtered : score_i(e) >= pos_i}| computed as
        (total count >= pos) - (count over the filtered list >= pos), with the
        true entity itself a member of the filtered list — identical to the
        reference's masked ranking (general_models.py:436-485).

        filter_ids: [B, F] padded entity ids whose triples exist in
        train/valid/test (includes the true head/tail); filter_mask: [B, F]
        nonzero for real entries (uint8 on the wire).  Blocked over the entity axis so the full
        [B, n_entities] score matrix never materializes for broadcast-heavy
        models (TransE_l1 / RotatE).
        """
        b = h.shape[0]
        if block is None:
            block = self._eval_block_size(b)
        pos, side, rel_rows, proj_rows = self._eval_pos_side(
            state, h, r, t, neg_head=neg_head)

        # NOT the table shape: vocab-sharded tables are padded to a multiple
        # of the mesh size (ShardingPlan.put_state); padded rows must never
        # count as ranking candidates.
        n_ent = self.n_entities
        n_blocks = -(-n_ent // block)
        n_rows = state.entity.emb.shape[0]   # may carry padding rows

        def score_block(start):
            if n_rows >= block:
                # The candidate block is an iota slice: fetch it as a
                # true dynamic_slice instead of a gather (XLA lowers a
                # 16k-row gather as scattered row DMA; the slice is one
                # contiguous HBM read).  The tail block's start is
                # clamped so the slice stays in bounds; rows below
                # `start` were scored by earlier blocks and are masked
                # out of both counts, so ranks are unchanged.
                cs = jnp.minimum(start, n_rows - block)
                cand = jax.lax.dynamic_slice_in_dim(
                    state.entity.emb, cs, block)[:, :self.entity_dim]
                gids = cs + jnp.arange(block)
                valid = (gids >= start) & (gids < n_ent)
                local = filter_ids - cs                        # [B, F]
                in_blk = ((filter_ids >= start) & (local < block)
                          & (filter_mask > 0))
            else:
                ids = start + jnp.arange(block)
                ids_c = jnp.minimum(ids, n_ent - 1)
                cand = gather_rows(state.entity, ids_c,
                                   dim=self.entity_dim, sorted_ids=True)
                valid = ids < n_ent
                local = filter_ids - start                     # [B, F]
                in_blk = ((local >= 0) & (local < block)
                          & (filter_mask > 0))
            return self._block_ge_counts(pos, side, rel_rows, proj_rows,
                                         cand, valid, local, in_blk,
                                         neg_head=neg_head)

        starts = jnp.arange(n_blocks) * block
        counts = jax.lax.map(score_block, starts)     # [n_blocks, B]
        return jnp.maximum(jnp.sum(counts, axis=0), 0) + 1

    def _eval_block_size(self, b: int) -> int:
        """Candidate tile width for block-streamed full-entity eval."""
        if self.score_fn.name in ("TransE_l2", "DistMult", "ComplEx",
                                  "RESCAL", "SimplE"):
            # matmul-form models can take big candidate tiles
            return 16384
        # broadcast-form models (L1 / RotatE / TransR) materialize a
        # [B, block, D]-scale intermediate per tile; budget it to ~2^28
        # elements (1 GB fp32) so the flattened group eval
        # (make_eval_superstep, B = G*batch) stays in HBM headroom.  The
        # budget wins over tile efficiency: a tiny floor beats an OOM at
        # large flattened batches.
        elems = max(1, b * max(self.entity_dim, self.relation_dim))
        pow2 = 1 << (max(1, (1 << 28) // elems).bit_length() - 1)
        return int(min(2048, max(32, pow2)))

    def _eval_pos_side(self, state: TrainState, h, r, t, *, neg_head: bool):
        """Shared gather/project preamble of the full-entity eval paths:
        (pos [B], side rows [B, D], rel rows, TransR proj rows or None)."""
        sf = self.score_fn
        # fp32 upcast (like the train path's gathers): with bf16-stored
        # tables the positive score is the RANKING THRESHOLD — computing
        # it in bf16 while the candidate einsums accumulate in f32 would
        # add ~2^-8-relative systematic noise to every comparison
        h_rows = gather_rows(state.entity, h, dim=self.entity_dim,
                             dtype=jnp.float32)
        t_rows = gather_rows(state.entity, t, dim=self.entity_dim,
                             dtype=jnp.float32)
        rel_rows = gather_rows(state.relation, r, dim=self.relation_dim,
                               dtype=jnp.float32)
        proj_rows = (gather_rows(state.projection, r, dim=self.proj_dim,
                                 dtype=jnp.float32)
                     if self.is_transr else None)
        if self.is_transr:
            h_use = sf.project(h_rows, proj_rows)
            t_use = sf.project(t_rows, proj_rows)
        else:
            h_use, t_use = h_rows, t_rows
        pos = sf.pos_score(h_use, rel_rows, t_use)
        side = t_use if neg_head else h_use
        return pos, side, rel_rows, proj_rows

    def _block_ge_counts(self, pos, side, rel_rows, proj_rows, cand,
                         valid_cols, local, in_blk, *, neg_head: bool):
        """GE-count of one candidate block minus its filtered count.

        Shared by eval_ranks and the shard_map variant so their tie
        handling cannot drift.  Filtered candidates are counted by READING
        THE BLOCK'S OWN scores (a [B, F] take_along_axis into s where this
        block covers the id) rather than re-scoring them with a second
        kernel: the comparison against pos is then bit-identical in both
        counts BY CONSTRUCTION, so the subtraction is exact even for ties
        (the chunked kernel forms can differ by an ulp, which flips `>=`
        on exact ties).  Also saves the second gather+score dispatch.

        cand: [block, D] candidate rows; valid_cols: [block] bool columns
        that are real entities; local: [B, F] filter positions relative to
        this block's start; in_blk: [B, F] bool — filter entries this
        block owns.
        """
        sf = self.score_fn
        b = pos.shape[0]
        block = cand.shape[0]
        if self.is_transr:
            cand_p = sf.neg_project(cand, proj_rows, 1)
            s = sf.neg_score(side.reshape(1, b, -1), rel_rows, cand_p,
                             neg_head=neg_head, num_chunks=1,
                             chunk_size=b, neg_sample_size=block)
        else:
            s = sf.neg_score(side, rel_rows, cand, neg_head=neg_head,
                             num_chunks=1, chunk_size=b,
                             neg_sample_size=block)
        s = s.reshape(b, block)
        ge = (s >= pos[:, None]) & valid_cols[None, :]
        fs = jnp.take_along_axis(
            s, jnp.clip(local, 0, block - 1), axis=1)           # [B, F]
        fge = jnp.sum((fs >= pos[:, None]) & in_blk, axis=1)
        return jnp.sum(ge, axis=1) - fge

    def eval_ranks_sampled(self, state: TrainState, h, r, t, neg, neg_keep,
                           *, neg_head: bool, neg_deg_sample: bool = False,
                           n_valid=None):
        """Ranks against K SAMPLED shared negatives (the reference's
        --neg_sample_size_eval protocol): rank_i = 1 + |{j kept :
        score_i(neg_j) >= pos_i}|, where the whole batch shares one set of
        K candidates (one-chunk eval batches, sampler.py:495-501) and
        neg_keep [B, K] zeroes false negatives (edata['bias'] filtering,
        general_models.py:463-471).

        neg_deg_sample reproduces the reference quirk exactly
        (general_models.py:395-434 + forward_test:473-478): the batch's own
        corrupted-side entities are PREPENDED as candidates, the self-match
        diagonal is multiplied by zero (not excluded), and the zeroed score
        still participates in the >= pos comparison.
        """
        # fp32 upcast for the same reason as _eval_pos_side: pos is the
        # ranking threshold and must not carry bf16 compute error
        h_rows = gather_rows(state.entity, h, dim=self.entity_dim,
                             dtype=jnp.float32)
        t_rows = gather_rows(state.entity, t, dim=self.entity_dim,
                             dtype=jnp.float32)
        rel_rows = gather_rows(state.relation, r, dim=self.relation_dim,
                               dtype=jnp.float32)
        proj_rows = (gather_rows(state.projection, r, dim=self.proj_dim,
                                 dtype=jnp.float32)
                     if self.is_transr else None)
        neg_rows = gather_rows(state.entity, neg, dim=self.entity_dim,
                               dtype=jnp.float32)
        return self._rows_eval_ranks_sampled(
            h_rows, t_rows, rel_rows, proj_rows, neg_rows, neg_keep,
            neg_head=neg_head, neg_deg_sample=neg_deg_sample,
            n_valid=n_valid)

    def _rows_eval_ranks_sampled(self, h_rows, t_rows, rel_rows, proj_rows,
                                 neg_rows, neg_keep, *, neg_head: bool,
                                 neg_deg_sample: bool = False,
                                 n_valid=None):
        """Row-level core of eval_ranks_sampled (shared with the
        host-resident-table mode, where the gathers happen on the host —
        host_table.evaluate_host_with_samplers)."""
        sf = self.score_fn
        b = h_rows.shape[0]
        k = neg_rows.shape[0]

        if self.is_transr:
            h_use = sf.project(h_rows, proj_rows)
            t_use = sf.project(t_rows, proj_rows)
        else:
            h_use, t_use = h_rows, t_rows
        pos = sf.pos_score(h_use, rel_rows, t_use)
        side = t_use if neg_head else h_use

        if neg_deg_sample:
            # candidates = [own corrupted-side entities | sampled]; the
            # diagonal (row i vs own node i) is zeroed below
            own = h_rows if neg_head else t_rows
            neg_rows = jnp.concatenate([own, neg_rows], axis=0)
            k = b + k

        if self.is_transr:
            cand = sf.neg_project(neg_rows, proj_rows, 1)
            s = sf.neg_score(side.reshape(1, b, -1), rel_rows, cand,
                             neg_head=neg_head, num_chunks=1,
                             chunk_size=b, neg_sample_size=k)
        else:
            s = sf.neg_score(side, rel_rows, neg_rows, neg_head=neg_head,
                             num_chunks=1, chunk_size=b, neg_sample_size=k)
        s = s.reshape(b, k)
        if neg_deg_sample:
            eye = jnp.eye(b, k, dtype=s.dtype)
            s = s * (1.0 - eye)
            # deg-sampled candidates are never filtered (filter is asserted
            # off).  Own-node columns belonging to PADDED rows (a partial
            # tail batch repeats row 0, sampler padding) are masked out:
            # the reference ranks a short batch against only its nb own
            # entities, not b phantom duplicates.
            nv = b if n_valid is None else n_valid
            own_keep = (jnp.arange(b)[None, :] < nv).astype(neg_keep.dtype)
            keep = jnp.concatenate(
                [jnp.broadcast_to(own_keep, (b, b)), neg_keep], axis=1)
        else:
            keep = neg_keep
        return jnp.sum((s >= pos[:, None]) & (keep > 0), axis=1) + 1

    def make_sampled_eval_superstep(self):
        """Fused sampled-negative eval: rank a GROUP of batches in one
        device call (same dispatch-amortization as make_eval_superstep).
        Inputs: h/r/t [G, B], neg [G, K], neg_keep [G, B, K], n_valid [G]
        (real rows per batch — neg_deg_sample masks padded rows' own-node
        candidate columns)."""

        def step(state, h, r, t, neg, neg_keep, n_valid, neg_head,
                 neg_deg_sample):
            # vmap (not scan) over the group: the G per-batch [B,D]x[D,K]
            # score einsums become ONE batched kernel — no sequential
            # dependency between batches exists, so give XLA the whole
            # group at once
            def one(hh, rr, tt, nn, kk, nv):
                return self.eval_ranks_sampled(
                    state, hh, rr, tt, nn, kk, neg_head=neg_head,
                    neg_deg_sample=neg_deg_sample, n_valid=nv)

            return jax.vmap(one)(h, r, t, neg, neg_keep, n_valid)

        return self._memo(
            "sampled_eval_superstep",
            lambda: jax.jit(step, static_argnames=("neg_head",
                                                   "neg_deg_sample")))

    def candidate_scores(self, state: TrainState, h, r, cand_ids, *,
                         neg_head: bool = False):
        """Scores of each row's candidate list: [B, K]
        (reference predict_score_wikikg, general_models.py:521-531)."""
        sf = self.score_fn
        b = h.shape[0]
        k = cand_ids.shape[1]
        h_rows = gather_rows(state.entity, h, dim=self.entity_dim)
        rel_rows = gather_rows(state.relation, r, dim=self.relation_dim)
        cand = gather_rows(state.entity, cand_ids.reshape(-1),
                           dim=self.entity_dim)
        if self.is_transr:
            # TransR scores live in relation space: project the query
            # rows with their own edge's matrix, and each row's K
            # candidates with that same matrix (per-edge [K, De] x
            # [De, Dr] — the candidate analogue of neg_project's
            # chunk form)
            proj_rows = gather_rows(state.projection, r,
                                    dim=self.proj_dim)
            h_rows = sf.project(h_rows, proj_rows)          # [B, Dr]
            p = proj_rows.reshape(b, self.entity_dim, self.relation_dim)
            cand = jnp.einsum(
                "bkd,bdr->bkr", cand.reshape(b, k, self.entity_dim), p,
                preferred_element_type=jnp.float32, precision="high")
            s = sf.neg_score(h_rows.reshape(b, 1, -1), rel_rows,
                             cand.reshape(b, 1, k, -1), neg_head=neg_head,
                             num_chunks=b, chunk_size=1,
                             neg_sample_size=k)
            return s.reshape(b, k)
        s = sf.neg_score(h_rows, rel_rows, cand, neg_head=neg_head,
                         num_chunks=b, chunk_size=1, neg_sample_size=k)
        return s.reshape(b, k)

    def make_candidate_megastep(self, top: int = 10,
                                with_ranks: bool = True,
                                with_top: bool = True):
        """Returns jitted fn(state, query [M,B,2], cand [M,B,K],
        ans [M,B]) -> (ranks [M,B] if with_ranks, top-`top` candidate
        positions [M,B,top] if with_top) — a whole chunk of candidate-eval
        batches in ONE device call (lax.map over the M axis; same
        transfer/dispatch amortization as make_eval_megastep).

        Valid mode computes the rank ON DEVICE — the reference counts the
        answer itself among the ties (sum(neg >= neg[ans]) + 1, min rank
        2, general_models.py:504) — so only [M,B] ints come back instead
        of a [B,K] fp32 score matrix per batch.  Test mode returns top_k
        positions (its lowest-index-first tie order matches stable
        argsort(-scores), train_pytorch.py:217); `ans` is ignored there.
        """

        def step(state, query, cand, ans):
            def body(xs):
                q, c, a = xs
                scores = self.candidate_scores(state, q[:, 0], q[:, 1],
                                               c, neg_head=False)
                outs = []
                if with_ranks:
                    pos = jnp.take_along_axis(scores, a[:, None], axis=1)
                    outs.append((jnp.sum(scores >= pos, axis=1)
                                 + 1).astype(jnp.int32))
                if with_top:
                    # top_k, not a full argsort: K-proportional work;
                    # candidate lists narrower than `top` degrade to K
                    outs.append(jax.lax.top_k(
                        scores, min(top, c.shape[1]))[1])
                return tuple(outs)

            return jax.lax.map(body, (query, cand, ans))

        return self._memo(("candidate_megastep", top, with_ranks, with_top),
                          lambda: jax.jit(step))

    def make_eval_step(self):
        def step(state, h, r, t, filter_ids, filter_mask, neg_head):
            return self.eval_ranks(state, h, r, t, filter_ids, filter_mask,
                                   neg_head=neg_head)
        return self._memo(
            "eval_step",
            lambda: jax.jit(step, static_argnames=("neg_head",)))

    def make_eval_superstep(self):
        """Fused eval: rank a GROUP of batches in ONE device call.

        Per-batch dispatch dominates filtered eval on high-latency links
        (measured ~350 ms/call over the tunneled test TPU vs ~2 ms of
        device work at batch 1024); grouping G batches per call amortizes
        it G-fold.  Inputs are stacked [G, B] ids and [G, B, F] filter
        lists; returns ranks [G, B].

        The group is FLATTENED into one [G*B] mega-batch rather than
        scanned: eval_ranks streams every candidate block past the batch,
        so a scan of G batches reads the ENTIRE entity table G times per
        call while the flattened batch reads it once (32x less candidate
        HBM traffic at the trainer's G=32) and the score kernel becomes
        one chunky [G*B, D] x [D, block] MXU matmul instead of G skinny
        ones.  Ranking is purely per-row, so the flattening is exact.
        """

        def step(state, h, r, t, filter_ids, filter_mask, neg_head):
            return self._eval_group_ranks(state, h, r, t, filter_ids,
                                          filter_mask, neg_head=neg_head)

        return self._memo(
            "eval_superstep",
            lambda: jax.jit(step, static_argnames=("neg_head",)))

    def _eval_group_ranks(self, state, h, r, t, filter_ids, filter_mask,
                          *, neg_head):
        """Rank one [G, B] group by flattening it into a [G*B] mega-batch
        (see make_eval_superstep for why flatten beats scan here)."""
        g, b = h.shape
        f = filter_ids.shape[-1]
        ranks = self.eval_ranks(
            state, h.reshape(g * b), r.reshape(g * b), t.reshape(g * b),
            filter_ids.reshape(g * b, f), filter_mask.reshape(g * b, f),
            neg_head=neg_head)
        return ranks.reshape(g, b)

    def make_eval_megastep(self):
        """Whole-split eval in ONE device call: lax.map over [M, G, B]
        stacked groups, returning ranks [M, G, B].

        Motivation: over high-latency / low-bandwidth device links (the
        tunneled test TPU; multi-host dispatch generally) the per-call
        h2d transfer of the [G, B(, F)] id + filter arrays dominates eval
        wall time — the device work is ~1 ms/group while the upload costs
        hundreds of ms (tools/tpu_session.log: edges/s identical at
        batch_size_eval 64 and 512, i.e. time scales with bytes, not
        calls).  The trainer packs ALL groups of an eval split into a few
        byte-budgeted chunks (trainer._mega_eval) and runs this megastep
        once per chunk with the packed numpy arrays as jit args (NOT an
        explicit device_put: tools/diag_transfer.py measured 0.4-1.1 s
        fixed latency per device_put over the tunneled link vs 6-13 ms
        for jit-arg upload), so transfer round trips are per-chunk and
        dispatch overhead amortizes over the whole split.  The lax.map
        body is the same flattened group eval, so HBM-resident
        intermediates stay group-sized and rank semantics are identical.
        """

        def step(state, h, r, t, filter_ids, filter_mask, neg_head):
            def body(xs):
                hh, rr, tt, fid, fm = xs
                return self._eval_group_ranks(state, hh, rr, tt, fid, fm,
                                              neg_head=neg_head)

            return jax.lax.map(body, (h, r, t, filter_ids, filter_mask))

        return self._memo(
            "eval_megastep",
            lambda: jax.jit(step, static_argnames=("neg_head",)))

    def make_sharded_eval_megastep(self, plan):
        """Megastep variant of make_sharded_eval_superstep: lax.map over
        [M, G, B] stacked groups with the vocab-sharded (shard_map) group
        body — same transfer/dispatch amortization as make_eval_megastep,
        same batch-proportional collective contract as the sharded
        superstep (one [G*B] psum per group)."""
        group_fn = self._sharded_eval_group_fn(plan)

        def step(state, h, r, t, filter_ids, filter_mask, neg_head):
            def body(xs):
                hh, rr, tt, fid, fm = xs
                return group_fn(state, hh, rr, tt, fid, fm, neg_head)

            return jax.lax.map(body, (h, r, t, filter_ids, filter_mask))

        key = ("sharded_eval_megastep", plan.axis,
               tuple(d.id for d in plan.mesh.devices.flat))
        return self._memo(
            key, lambda: jax.jit(step, static_argnames=("neg_head",)))

    def make_sharded_eval_superstep(self, plan):
        """Vocab-sharded full-entity eval: score candidates WHERE THEIR ROWS
        LIVE and move only counts.

        The auto-SPMD partitioning of eval_ranks replicates every candidate
        block before scoring — a table-scale all-reduce per call (measured
        as f32[block, D] all-reduces in the compiled HLO), i.e. the whole
        entity table crosses the mesh once per eval call.  This variant
        shard_maps the candidate loop over the table axis: each device
        scores its LOCAL contiguous rows (a dynamic-slice, no collective)
        against the replicated batch and contributes per-row GE-counts;
        one [G*B] psum combines them.  Collectives stay batch-proportional
        — the eval-side completion of the KVStore pull contract
        (PARITY.md #24, tests/test_hlo_sharding.py).

        Rank semantics are identical to eval_ranks: filtered candidates
        are counted from the block's own scores, so tie behavior matches
        bit for bit; mesh-padded rows and the tail block's clamped rows
        are masked out of both counts.
        """
        step = self._sharded_eval_group_fn(plan)
        key = ("sharded_eval_superstep", plan.axis,
               tuple(d.id for d in plan.mesh.devices.flat))
        return self._memo(
            key, lambda: jax.jit(step, static_argnames=("neg_head",)))

    def _sharded_eval_group_fn(self, plan):
        """Un-jitted [G, B] group body of the vocab-sharded eval (see
        make_sharded_eval_superstep); shared with the megastep wrapper."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = plan.axis
        n_ent = self.n_entities
        ent_dim = self.entity_dim

        def step(state, h, r, t, filter_ids, filter_mask, neg_head):
            g, bb = h.shape
            n = g * bb
            f = filter_ids.shape[-1]
            h_, r_, t_ = (x.reshape(n) for x in (h, r, t))
            fid = filter_ids.reshape(n, f)
            fm = filter_mask.reshape(n, f)

            # batch-row gathers ride the auto-SPMD path (batch-proportional
            # collectives over the sharded table)
            pos, side, rel_rows, proj_rows = self._eval_pos_side(
                state, h_, r_, t_, neg_head=neg_head)

            rows_per = state.entity.emb.shape[0] // plan.n
            block = min(self._eval_block_size(n), rows_per)
            n_blocks = -(-rows_per // block)

            def count_local(emb_l, pos, side, rel_rows, proj_rows, fid, fm):
                rows = emb_l.shape[0]
                offset = jax.lax.axis_index(axis) * rows

                def score_block(start):
                    # contiguous candidate block: a true dynamic_slice
                    # (one sequential HBM read) instead of a 16k-row
                    # gather; the tail block's clamped start re-covers
                    # rows earlier blocks scored, so those columns are
                    # masked from BOTH counts (lrow >= start)
                    cs = jnp.minimum(start, rows - block)
                    cand = jax.lax.dynamic_slice_in_dim(
                        emb_l, cs, block)[..., :ent_dim]
                    gids_l = cs + jnp.arange(block)
                    valid = ((gids_l >= start)
                             & (offset + gids_l < n_ent))
                    lrow = fid - offset        # filter row on THIS shard
                    local = lrow - cs          # its column in cand
                    in_blk = ((lrow >= start) & (local < block)
                              & (fm > 0))
                    return self._block_ge_counts(
                        pos, side, rel_rows, proj_rows, cand, valid,
                        local, in_blk, neg_head=neg_head)

                starts = jnp.arange(n_blocks) * block
                counts = jnp.sum(jax.lax.map(score_block, starts), axis=0)
                return jax.lax.psum(counts, axis)

            in_specs = [P(axis, None)] + [P()] * 6
            counts = shard_map(
                count_local, mesh=plan.mesh, in_specs=tuple(in_specs),
                out_specs=P(), check_vma=False)(
                    state.entity.emb, pos, side, rel_rows,
                    proj_rows if proj_rows is not None
                    else jnp.zeros((), jnp.float32), fid, fm)
            return (jnp.maximum(counts, 0) + 1).reshape(g, bb)

        return step


def metrics_from_ranks(ranks: np.ndarray) -> Dict[str, float]:
    """MRR / MR / HITS@{1,3,10} averaged, matching general_models.py:473-485."""
    ranks = np.asarray(ranks, dtype=np.float64)
    return {
        "MRR": float(np.mean(1.0 / ranks)),
        "MR": float(np.mean(ranks)),
        "HITS@1": float(np.mean(ranks <= 1)),
        "HITS@3": float(np.mean(ranks <= 3)),
        "HITS@10": float(np.mean(ranks <= 10)),
    }
