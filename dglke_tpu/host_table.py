"""Host-resident embedding tables: train/eval models BIGGER THAN HBM on
one chip (the reference's --mix_cpu_gpu CPU-ExternalEmbedding mode,
train.py:46-49 + tensor_models.py:304-362, which keeps entity tables in
host DRAM and moves only the batch's rows to the accelerator).

TPU-native shape of the same trade:

  * tables live in host numpy (fp32) — capacity is host DRAM
    (hundreds of GB on a TPU VM), not the chip's 16 GB HBM;
  * the per-step device program is PURE and row-sized: the host gathers
    the batch's [3B+CK, D] rows, one jit computes loss + row gradients
    on the MXU (KEModel._rows_loss_and_grads — the SAME kernel the
    HBM-resident path differentiates), and the host applies the sparse
    Adagrad scatter with numpy;
  * the host Adagrad reproduces the dedup-free ordering proof of
    ops/embedding.py exactly (np.add.at accumulates every occurrence's
    state increment BEFORE the std gather, like the reference's
    index_add_ sequence);
  * full-entity eval streams the table through the device in contiguous
    blocks, scoring BOTH corruption directions per uploaded block so the
    table crosses the host link once per eval pass.

Per-step traffic is ~[3B+CK, D] rows each way (~7 MB at the FB15k
shape) — PCIe-bound on a real TPU VM, which is the same envelope as the
reference's CPU-GPU row pulls.  Checkpoints write through the standard
fp32 npy contract (utils/io.py), so host-mode and HBM-mode checkpoints
are interchangeable.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.sampler import EvalSampler, FilterIndex, TrainSampler
from dglke_tpu.models.ke_model import KEModel


# Host eval query-chunking knobs (see evaluate_host_with_samplers):
# bound the per-kernel [Q, block] score matrix without losing the
# one-table-pass property.  Module-level so tests can force tiny chunks.
_Q_CAP_BYTES = 256 << 20
_Q_MIN_CHUNK = 1024


@dataclasses.dataclass
class HostEmbedding:
    """Mirror of ops.embedding.EmbeddingState with numpy storage (duck-
    typed: utils.io.save_model persists it through the same npy path)."""
    emb: np.ndarray         # [num, dim] fp32
    state_sum: np.ndarray   # [num] fp32


@dataclasses.dataclass
class HostState:
    entity: HostEmbedding
    relation: HostEmbedding
    projection: Optional[HostEmbedding]
    step: int = 0
    is_host = True          # trainer.evaluate dispatch marker


def _init_table(rng: np.random.Generator, num: int, dim: int,
                emb_init: float) -> HostEmbedding:
    # float32-native generation, filled in row chunks: rng.uniform
    # would materialize a float64 intermediate — 2x the table (98 GB of
    # transient at 48M x 256), defeating the host-capacity point
    emb = np.empty((num, dim), np.float32)
    step = max(1, (64 << 20) // max(dim * 4, 1))
    for a in range(0, num, step):
        b = min(a + step, num)
        blk = rng.random((b - a, dim), dtype=np.float32)
        emb[a:b] = (blk * (2.0 * emb_init)) - emb_init
    return HostEmbedding(emb, np.zeros((num,), np.float32))


def init_host_state(model: KEModel, seed: int = 0) -> HostState:
    """Uniform(-emb_init, emb_init) init, zero Adagrad state (reference
    tensor_models.py:240-248), drawn with numpy (tables never touch the
    device, so the fused on-device init of ops.embedding does not apply)."""
    rng = np.random.default_rng(seed)
    cfg = model.config
    ent = _init_table(rng, model.n_entities, model.entity_dim,
                      cfg.emb_init)
    rel = _init_table(rng, model.n_relations, model.relation_dim,
                      cfg.emb_init)
    proj = (_init_table(rng, model.n_relations,
                        model.entity_dim * model.relation_dim, 1.0)
            if model.is_transr else None)
    return HostState(ent, rel, proj, 0)


def load_host_state(config: KGEConfig, model: KEModel,
                    path: str) -> HostState:
    """Restore a HostState straight from the npy artifacts WITHOUT a
    device round trip (load_model_state would device_put the table —
    the very thing host mode exists to avoid).  Artifact naming lives in
    one place: utils.io.table_artifact_arrays."""
    from dglke_tpu.utils.io import saved_step, table_artifact_arrays

    def load(name):
        emb, ss = table_artifact_arrays(config, path, name)
        return HostEmbedding(np.ascontiguousarray(emb, dtype=np.float32),
                             np.asarray(ss, np.float32))

    ent = load("entity")
    rel = load("relation")
    proj = load("projection") if model.is_transr else None
    return HostState(ent, rel, proj, saved_step(config, path))


def host_adagrad_update(table: HostEmbedding, ids: np.ndarray,
                        grads: np.ndarray, lr: float) -> None:
    """In-place row-sparse Adagrad, same ordering as the device update
    (ops/embedding.py sparse_adagrad_update): every occurrence's
    mean(grad², axis=1) accumulates into state_sum FIRST (np.add.at is
    an unbuffered accumulate, the numpy analogue of index_add_), the
    per-occurrence std is read after, and the emb scatter-add sums over
    occurrences — identical to a deduplicated segment-sum update."""
    grads = np.asarray(grads, np.float32)
    sq = np.mean(grads * grads, axis=1)
    np.add.at(table.state_sum, ids, sq)
    std = np.sqrt(table.state_sum[ids]) + 1e-10
    np.add.at(table.emb, ids, (-lr) * grads / std[:, None])


def train_host(config: KGEConfig, dataset, model: Optional[KEModel] = None,
               state: Optional[HostState] = None,
               valid_samplers=None, save_fn=None, log=print):
    """Host-table training loop (reference mix_cpu_gpu trainer contract:
    train_pytorch.py:268-403 with CPU-resident ExternalEmbedding).
    Returns (model, state, time_info) like trainer.train."""
    cfg = config
    if model is None:
        model = KEModel(cfg, dataset.n_entities, dataset.n_relations)
    if state is None:
        state = init_host_state(model, cfg.seed)
    sampler = TrainSampler(dataset, cfg.batch_size, cfg.neg_sample_size,
                           seed=cfg.seed)
    neg_total = sampler.num_chunks * sampler.neg_sample_size
    step_fn = model.make_host_rows_step(cfg.batch_size, neg_total)
    b = cfg.batch_size
    it = iter(sampler)

    logs = []
    valid_metrics = None
    start = time.time()
    sample_time = update_time = 0.0
    tic = time.time()
    for step in range(1, cfg.max_step + 1):
        t0 = time.time()
        batch = next(it)
        h, r, t = batch["h"], batch["r"], batch["t"]
        ent_ids = np.concatenate([h, t, batch["neg"]])
        ent_rows = state.entity.emb[ent_ids]
        rel_rows = state.relation.emb[r]
        proj_rows = (state.projection.emb[r] if model.is_transr else None)
        impts = batch.get("impts")
        sample_time += time.time() - t0

        t0 = time.time()
        log_dict, grads = step_fn(ent_rows, rel_rows, proj_rows, impts,
                                  batch["neg_head"])
        g_ent, g_rel, g_proj = grads
        g_ent = np.asarray(g_ent)       # d2h fence + host copy
        g_rel = np.asarray(g_rel)
        host_adagrad_update(state.entity, ent_ids, g_ent, cfg.lr)
        host_adagrad_update(state.relation, r, g_rel, cfg.lr)
        if model.is_transr:
            host_adagrad_update(state.projection, r, np.asarray(g_proj),
                                cfg.lr)
        state.step = state.step + 1
        update_time += time.time() - t0
        logs.append(jax.device_get(log_dict))

        if step % cfg.log_interval == 0:
            for k in logs[0]:
                v = float(np.mean([la[k] for la in logs]))
                log(f"[proc 0][Train]({step}/{cfg.max_step}) "
                    f"average {k}: {v}")
            logs = []
            log(f"[proc 0][Train] {cfg.log_interval} steps take "
                f"{time.time() - tic:.3f} seconds")
            log(f"[proc 0]sample: {sample_time:.3f}, update: "
                f"{update_time:.3f}")
            tic = time.time()
            sample_time = update_time = 0.0
        if (valid_samplers is not None and cfg.valid
                and step % cfg.eval_interval == 0):
            valid_metrics = evaluate_host_with_samplers(
                model, state, valid_samplers, phase="Valid", log=log)
        if save_fn is not None and cfg.save_interval > 0 \
                and step % cfg.save_interval == 0:
            save_fn(state, step)

    total = time.time() - start
    log(f"[proc 0]training takes {total} seconds")
    # same info contract as trainer.train (callers treat the two paths
    # uniformly)
    stats = {"train_time": total}
    if valid_metrics is not None:
        stats["valid_metrics"] = valid_metrics
    return model, state, stats


def _host_pos_side_fn(model: KEModel):
    """Jitted pos/side preamble over HOST-gathered rows (the row-level
    form of KEModel._eval_pos_side)."""
    def build():
        sf = model.score_fn

        def f(h_rows, t_rows, rel_rows, proj_rows, neg_head):
            if model.is_transr:
                h_use = sf.project(h_rows, proj_rows)
                t_use = sf.project(t_rows, proj_rows)
            else:
                h_use, t_use = h_rows, t_rows
            pos = sf.pos_score(h_use, rel_rows, t_use)
            side = t_use if neg_head else h_use
            return pos, side

        return jax.jit(f, static_argnames=("neg_head",))

    return model._memo("host_eval_pos_side", build)


def _host_block_counts_fn(model: KEModel):
    """Jitted GE-count kernel for one uploaded candidate block against
    BOTH corruption directions' query rows (KEModel._block_ge_counts —
    the same tie-exact kernel as the HBM paths)."""
    def build():
        def f(pos, side, rel_rows, proj_rows, cand, valid, local, in_blk,
              neg_head):
            return model._block_ge_counts(pos, side, rel_rows, proj_rows,
                                          cand, valid, local, in_blk,
                                          neg_head=neg_head)

        return jax.jit(f, static_argnames=("neg_head",))

    return model._memo("host_block_counts", build)


def evaluate_host(config: KGEConfig, dataset, model: KEModel,
                  state: HostState, split: str = "test",
                  filter_index: Optional[FilterIndex] = None,
                  log=print, phase: str = "Test") -> Dict[str, float]:
    cfg = config
    if cfg.eval_filter and filter_index is None:
        filter_index = FilterIndex(dataset)
    samplers = [
        EvalSampler(dataset, split, cfg.batch_size_eval, mode,
                    filter_index if cfg.eval_filter else None,
                    eval_percent=cfg.eval_percent, seed=cfg.seed,
                    neg_sample_size=cfg.neg_sample_size_eval,
                    neg_deg_sample=cfg.neg_deg_sample_eval)
        for mode in ("head", "tail")
    ]
    return evaluate_host_with_samplers(model, state, samplers,
                                       phase=phase, log=log)


def evaluate_host_with_samplers(model: KEModel, state: HostState,
                                samplers, phase: str = "Test",
                                log=print) -> Dict[str, float]:
    """Full-entity ranking with the table streamed from HOST memory.

    All query batches of BOTH directions are collected first (their
    pos/side rows are tiny); the entity table then crosses the host link
    ONCE, in contiguous blocks, each block scored against every query
    row of both directions (same _block_ge_counts kernel, so tie
    handling matches the HBM paths bit for bit)."""
    from dglke_tpu.models.ke_model import metrics_from_ranks
    from dglke_tpu.trainer import CandidateEvalSampler

    if any(isinstance(s, CandidateEvalSampler) for s in samplers):
        raise NotImplementedError(
            "host-table mode evaluates with the full-entity protocol; "
            "candidate-list (wikikg90M-style) eval needs the table on "
            "device — drop --mix_cpu_gpu for eval (checkpoints "
            "interchange) or evaluate on a vocab-sharded mesh")
    start = time.time()
    if any(getattr(s, "neg_sample_size", 0) > 0 for s in samplers):
        return _evaluate_host_sampled(model, state, samplers, phase,
                                      log, start)
    pos_side = _host_pos_side_fn(model)
    block_fn = _host_block_counts_fn(model)
    n_ent = model.n_entities
    dirs = []      # one entry per direction: queries + filters + counts
    for sampler in samplers:
        batches = list(sampler)
        if not batches:
            continue
        neg_head = batches[0]["neg_head"]
        h = np.concatenate([ba["h"] for ba in batches])
        r = np.concatenate([ba["r"] for ba in batches])
        t = np.concatenate([ba["t"] for ba in batches])
        nv = np.concatenate([
            np.arange(len(ba["h"])) < ba["n_valid"] for ba in batches])
        if "filter_ids" in batches[0]:
            fmax = max(ba["filter_ids"].shape[1] for ba in batches)
            fid = np.zeros((len(h), fmax), np.int32)
            fm = np.zeros((len(h), fmax), np.uint8)
            o = 0
            for ba in batches:
                n, w = ba["filter_ids"].shape
                fid[o:o + n, :w] = ba["filter_ids"]
                fm[o:o + n, :w] = ba["filter_mask"]
                o += n
        else:
            fid = np.zeros((len(h), 8), np.int32)
            fm = np.zeros((len(h), 8), np.uint8)
        ent_rows = state.entity.emb
        h_rows = jnp.asarray(ent_rows[h])
        t_rows = jnp.asarray(ent_rows[t])
        rel_rows = jnp.asarray(state.relation.emb[r])
        proj_rows = (jnp.asarray(state.projection.emb[r])
                     if model.is_transr else None)
        pos, side = pos_side(h_rows, t_rows, rel_rows, proj_rows, neg_head)
        dirs.append(dict(neg_head=neg_head, pos=pos, side=side,
                         rel=rel_rows, proj=proj_rows, fid=fid, fm=fm,
                         nv=nv, counts=np.zeros((len(h),), np.int64)))
    if not dirs:
        raise ValueError("evaluation saw zero edges (empty split or "
                         "eval_percent too small)")

    block = model._eval_block_size(max(len(d["nv"]) for d in dirs))
    block = min(block, n_ent)
    # Bound the per-kernel [Q, block] score matrix: the query axis holds
    # the WHOLE split (collected above so the table streams through the
    # link exactly once), which at a Freebase-sized test split would put
    # a multi-GB score matrix on a 16 GB chip.  Chunk queries so the
    # matrix stays <=256 MB; per-chunk dispatches are async-queued, so
    # extra chunks cost dispatch latency only, not link round trips.
    q_cap = max(_Q_MIN_CHUNK, _Q_CAP_BYTES // max(block * 4, 1))
    for d in dirs:
        n_q = len(d["nv"])
        if n_q > q_cap:  # pad to a chunk multiple (uniform jit shapes)
            pad = (-n_q) % q_cap
            if pad:
                d["pos"] = jnp.pad(d["pos"], ((0, pad),))
                d["side"] = jnp.pad(d["side"], ((0, pad), (0, 0)))
                d["rel"] = jnp.pad(d["rel"], ((0, pad), (0, 0)))
                if d["proj"] is not None:
                    d["proj"] = jnp.pad(d["proj"], ((0, pad), (0, 0)))
                d["fid"] = np.pad(d["fid"], ((0, pad), (0, 0)))
                d["fm"] = np.pad(d["fm"], ((0, pad), (0, 0)))
                d["counts"] = np.zeros((n_q + pad,), np.int64)
    for start_row in range(0, n_ent, block):
        cs = min(start_row, n_ent - block)
        cand = jnp.asarray(state.entity.emb[cs:cs + block])   # one upload
        gids = cs + np.arange(block)
        valid = jnp.asarray((gids >= start_row) & (gids < n_ent))
        for d in dirs:
            local = d["fid"] - cs
            in_blk = (d["fid"] >= start_row) & (local < block) & (d["fm"] > 0)
            n_pad = len(d["counts"])
            q = n_pad if n_pad <= q_cap else q_cap
            for q0 in range(0, n_pad, q):
                c = block_fn(d["pos"][q0:q0 + q], d["side"][q0:q0 + q],
                             d["rel"][q0:q0 + q],
                             None if d["proj"] is None
                             else d["proj"][q0:q0 + q],
                             cand, valid, jnp.asarray(local[q0:q0 + q]),
                             jnp.asarray(in_blk[q0:q0 + q]), d["neg_head"])
                d["counts"][q0:q0 + q] += np.asarray(c, np.int64)

    all_ranks = np.concatenate(
        [(np.maximum(d["counts"][:len(d["nv"])], 0) + 1)[d["nv"]]
         for d in dirs])
    metrics = metrics_from_ranks(all_ranks)
    for k, v in metrics.items():
        log(f"[0]{phase} average {k}: {v}")
    log(f"[0]{phase} takes {time.time() - start:.3f} seconds")
    return metrics


def _host_sampled_ranks_fn(model: KEModel):
    """Jitted sampled-negative rank kernel over HOST-gathered rows
    (KEModel._rows_eval_ranks_sampled — the reference's
    --neg_sample_size_eval protocol, the one its Freebase-scale recipes
    use; sampler.py:495-501 + general_models.py:463-471)."""
    def build():
        def f(h_rows, t_rows, rel_rows, proj_rows, neg_rows, neg_keep,
              n_valid, neg_head, neg_deg_sample):
            return model._rows_eval_ranks_sampled(
                h_rows, t_rows, rel_rows, proj_rows, neg_rows, neg_keep,
                neg_head=neg_head, neg_deg_sample=neg_deg_sample,
                n_valid=n_valid)

        return jax.jit(f, static_argnames=("neg_head", "neg_deg_sample"))

    return model._memo("host_sampled_ranks", build)


def _evaluate_host_sampled(model: KEModel, state: HostState, samplers,
                           phase: str, log, start) -> Dict[str, float]:
    """Sampled-negative ranking with host tables: per batch, the K
    candidate rows + batch rows are host-gathered and uploaded (a few MB
    — the same envelope as a train step), ranks come back as a [B] int
    array.  Per-batch dispatch is fine here: the host link already
    bounds the step, and K << n_entities is the reason this protocol
    exists."""
    from dglke_tpu.models.ke_model import metrics_from_ranks

    rank_fn = _host_sampled_ranks_fn(model)
    emb = state.entity.emb
    all_ranks = []
    for sampler in samplers:
        for ba in sampler:
            h, r, t = ba["h"], ba["r"], ba["t"]
            neg = ba["neg"]
            keep = ba.get("neg_keep")
            if keep is None:
                keep = np.ones((len(h), len(neg)), np.uint8)
            proj = (state.projection.emb[r] if model.is_transr else None)
            ranks = rank_fn(jnp.asarray(emb[h]), jnp.asarray(emb[t]),
                            jnp.asarray(state.relation.emb[r]),
                            jnp.asarray(proj) if proj is not None else None,
                            jnp.asarray(emb[neg]), jnp.asarray(keep),
                            int(ba["n_valid"]), ba["neg_head"],
                            bool(ba.get("neg_deg_sample", False)))
            all_ranks.append(np.asarray(ranks)[: ba["n_valid"]])
    if not all_ranks:
        raise ValueError("evaluation saw zero edges (empty split or "
                         "eval_percent too small)")
    metrics = metrics_from_ranks(np.concatenate(all_ranks))
    for k, v in metrics.items():
        log(f"[0]{phase} average {k}: {v}")
    log(f"[0]{phase} takes {time.time() - start:.3f} seconds")
    return metrics
