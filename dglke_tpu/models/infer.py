"""Inference engines: topK link prediction and embedding similarity.

Re-implements the reference's ScoreInfer / EmbSimInfer
(/root/reference/python/dglke/models/infer.py:52-343) and InferModel
(general_models.py:65-181) on jnp:

  * ScoreInfer: loads config.json + .npy embeddings, scores (h, r, t)
    lists under 5 exec modes (triplet_wise / all / batch_head / batch_rel /
    batch_tail), optional logsigmoid squashing, topK with divmod index
    decode.  Unlike the reference, TransR is supported (projections applied
    per relation).
  * EmbSimInfer: similarity topK over embedding rows with 5 similarity
    functions (cosine / l2 / l1 / dot / ext_jaccard), pairwise / all /
    broadcast-left modes, blocked to bound memory.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.score_functions import TransRScore, make_score_function

DEFAULT_INFER_BATCHSIZE = 1024


# ---------------------------------------------------------------------------
# Similarity functions (reference tensor_models.py:59-100)


def l2_sim(x, y, pw=False):
    if not pw:
        x, y = x[:, None, :], y[None, :, :]
    return -jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1))


def l1_sim(x, y, pw=False):
    if not pw:
        x, y = x[:, None, :], y[None, :, :]
    return -jnp.sum(jnp.abs(x - y), axis=-1)


def dot_sim(x, y, pw=False):
    if not pw:
        return jnp.einsum("id,jd->ij", x, y,
                          preferred_element_type=jnp.float32, precision="highest")
    return jnp.sum(x * y, axis=-1)


def cosine_sim(x, y, pw=False):
    score = dot_sim(x, y, pw)
    nx = jnp.sqrt(jnp.sum(x * x, axis=-1))
    ny = jnp.sqrt(jnp.sum(y * y, axis=-1))
    if not pw:
        nx, ny = nx[:, None], ny[None, :]
    return score / (nx * ny)


def ext_jaccard_sim(x, y, pw=False):
    score = dot_sim(x, y, pw)
    nx = jnp.sum(x * x, axis=-1)
    ny = jnp.sum(y * y, axis=-1)
    if not pw:
        nx, ny = nx[:, None], ny[None, :]
    return score / (nx + ny - score)


SIM_FUNCS = {
    "cosine": cosine_sim,
    "l2": l2_sim,
    "l1": l1_sim,
    "dot": dot_sim,
    "ext_jaccard": ext_jaccard_sim,
}


# ---------------------------------------------------------------------------
# InferModel: all-pairs / triplet-wise scoring over loaded embeddings


class InferModel:
    """Score arbitrary (head, rel, tail) id combinations against loaded
    .npy embeddings (reference InferModel, general_models.py:65-181)."""

    def __init__(self, config: KGEConfig, batch_size: int = 32):
        self.config = config
        # 'none' score mode uses gamma=0 so raw scores are comparable
        # (reference ScoreInfer.load_model)
        self.score_fn, self.entity_dim, self.relation_dim = \
            make_score_function(config.model_name, config.gamma,
                                config.hidden_dim, config.double_ent,
                                config.double_rel)
        self.is_transr = isinstance(self.score_fn, TransRScore)
        self.batch_size = batch_size
        self.entity_emb: Optional[np.ndarray] = None
        self.relation_emb: Optional[np.ndarray] = None
        self.projection_emb: Optional[np.ndarray] = None

    def load_emb(self, path: str, dataset: str):
        prefix = f"{dataset}_{self.config.model_name}_"
        self.entity_emb = np.load(os.path.join(path, prefix + "entity.npy"))
        self.relation_emb = np.load(
            os.path.join(path, prefix + "relation.npy"))
        proj = os.path.join(path, prefix + "projection.npy")
        if not os.path.exists(proj):
            # reference spelling: no separating underscore
            # (TransRScore.save, score_fun.py:179-180)
            proj = os.path.join(path, prefix + "projection.npy"
                                ).replace("_projection", "projection")
        if self.is_transr:
            self.projection_emb = np.load(proj)

    @property
    def num_entity(self):
        return self.entity_emb.shape[0]

    @property
    def num_rel(self):
        return self.relation_emb.shape[0]

    def score(self, head: np.ndarray, rel: np.ndarray, tail: np.ndarray,
              triplet_wise: bool = False) -> np.ndarray:
        """Returns flattened scores: [H*R*T] (all-pairs) or [B]."""
        h_emb = jnp.asarray(self.entity_emb[head])
        r_emb = jnp.asarray(self.relation_emb[rel])
        t_emb = jnp.asarray(self.entity_emb[tail])
        sf = self.score_fn
        if triplet_wise:
            if self.is_transr:
                # block the per-edge projections: each gathers a
                # [De, Dr] matrix per triple (640 KB/triple at dim 400),
                # so an unblocked 100k-triple request would stage ~64 GB
                # (the non-TransR arm is elementwise and safe unblocked)
                bs = max(1, self.batch_size)
                outs = []
                for i in range(0, h_emb.shape[0], bs):
                    proj = jnp.asarray(self.projection_emb[rel[i:i + bs]])
                    hp = sf.project(h_emb[i:i + bs], proj)
                    tp = sf.project(t_emb[i:i + bs], proj)
                    outs.append(np.asarray(
                        sf.pos_score(hp, r_emb[i:i + bs], tp)))
                return np.concatenate(outs, axis=0)
            return np.asarray(sf.pos_score(h_emb, r_emb, t_emb))

        if self.is_transr:
            # all-pairs with per-relation projection, relations blocked ON
            # DEVICE (one einsum tile per dispatch, not one dispatch per
            # relation).  NOTE: ge_model.BasicGEModel._infer_score has a
            # sibling TransR block (new-API layout); both route through
            # transr_allpairs_score to stay in sync.
            from dglke_tpu.models.score_functions import \
                transr_allpairs_score
            return transr_allpairs_score(
                h_emb, t_emb, self.projection_emb[rel], r_emb, sf.gamma,
                self.entity_dim, self.relation_dim).reshape(-1)

        # block over heads to bound memory (reference blocks at 1024/2048)
        bs = max(1, self.batch_size)
        outs = []
        for i in range(0, h_emb.shape[0], bs):
            s = sf.infer_score(h_emb[i:i + bs], r_emb, t_emb)
            outs.append(np.asarray(s))
        return np.concatenate(outs, axis=0).reshape(-1)


# ---------------------------------------------------------------------------
# ScoreInfer


class ScoreInfer:
    """topK link prediction over a saved checkpoint
    (reference models/infer.py:52-214)."""

    def __init__(self, device, config, model_path: str, sfunc: str = "none"):
        assert sfunc in ("none", "logsigmoid"), \
            "sfunc must be 'none' or 'logsigmoid'"
        if isinstance(config, dict):
            fields = {f.name for f in
                      __import__("dataclasses").fields(KGEConfig)}
            config = KGEConfig(**{k: v for k, v in config.items()
                                  if k in fields})
        self.config = config
        self.model_path = model_path
        self.sfunc = sfunc

    def load_model(self):
        cfg = self.config
        if self.sfunc == "none":
            # gamma=0 => raw translational scores are negative distances
            import dataclasses
            cfg = dataclasses.replace(cfg, gamma=0.0)
        self.model = InferModel(cfg)
        self.model.load_emb(self.model_path, self.config.dataset)

    def _squash(self, score: np.ndarray) -> np.ndarray:
        if self.sfunc == "logsigmoid":
            return np.asarray(jax.nn.log_sigmoid(jnp.asarray(score)))
        return score

    def topK(self, head=None, rel=None, tail=None, exec_mode="all",
             k: int = 10) -> List[Tuple]:
        m = self.model
        head = np.arange(m.num_entity) if head is None else np.asarray(head)
        rel = np.arange(m.num_rel) if rel is None else np.asarray(rel)
        tail = np.arange(m.num_entity) if tail is None else np.asarray(tail)
        nh, nr, nt = len(head), len(rel), len(tail)

        def top(score, idx_decode):
            sidx = np.argsort(-score, kind="stable")[:k]
            return sidx, score[sidx]

        result = []
        if exec_mode == "triplet_wise":
            assert nh == nr == nt, (
                "triplet_wise scoring pairs elementwise: head/rel/tail "
                f"lengths must match (got {nh}/{nr}/{nt})")
            score = self._squash(m.score(head, rel, tail, triplet_wise=True))
            sidx, s = top(score, None)
            result.append((head[sidx], rel[sidx], tail[sidx], s))
        elif exec_mode == "all":
            score = self._squash(m.score(head, rel, tail))
            sidx, s = top(score, None)
            t_i = sidx % nt
            hr = sidx // nt
            r_i = hr % nr
            h_i = hr // nr
            result.append((head[h_i], rel[r_i], tail[t_i], s))
        elif exec_mode == "batch_head":
            for i in range(nh):
                score = self._squash(m.score(head[i:i + 1], rel, tail))
                sidx, s = top(score, None)
                t_i = sidx % nt
                r_i = (sidx // nt) % nr
                result.append((np.full((len(sidx),), head[i]), rel[r_i],
                               tail[t_i], s))
        elif exec_mode == "batch_rel":
            for i in range(nr):
                score = self._squash(m.score(head, rel[i:i + 1], tail))
                sidx, s = top(score, None)
                t_i = sidx % nt
                h_i = (sidx // nt) % nh
                result.append((head[h_i], np.full((len(sidx),), rel[i]),
                               tail[t_i], s))
        elif exec_mode == "batch_tail":
            for i in range(nt):
                score = self._squash(m.score(head, rel, tail[i:i + 1]))
                sidx, s = top(score, None)
                r_i = sidx % nr
                h_i = (sidx // nr) % nh
                result.append((head[h_i], rel[r_i],
                               np.full((len(sidx),), tail[i]), s))
        else:
            raise ValueError(f"unknown execution mode type {exec_mode}")
        return result


# ---------------------------------------------------------------------------
# EmbSimInfer


class EmbSimInfer:
    """topK embedding similarity (reference models/infer.py:216-343)."""

    def __init__(self, device, emb_file: str, sfunc: str = "cosine",
                 batch_size: int = DEFAULT_INFER_BATCHSIZE):
        self.emb_file = emb_file
        self.sfunc = sfunc
        self.sim_func = SIM_FUNCS[sfunc]
        self.batch_size = batch_size

    def load_emb(self):
        self.emb = np.load(self.emb_file)

    def topK(self, head=None, tail=None, bcast=False, pair_ws=False,
             k: int = 10) -> List[Tuple]:
        n = self.emb.shape[0]
        head = np.arange(n) if head is None else np.asarray(head)
        tail = np.arange(n) if tail is None else np.asarray(tail)
        h_emb = jnp.asarray(self.emb[head])
        t_emb = jnp.asarray(self.emb[tail])
        bs = self.batch_size
        result = []

        if pair_ws:
            scores = []
            for i in range(0, len(head), bs):
                scores.append(np.asarray(
                    self.sim_func(h_emb[i:i + bs], t_emb[i:i + bs], pw=True)))
            score = np.concatenate(scores)
            sidx = np.argsort(-score, kind="stable")[:k]
            result.append((head[sidx], tail[sidx], score[sidx]))
            return result

        rows = []
        for i in range(0, len(head), bs):
            cols = []
            for j in range(0, len(tail), bs):
                cols.append(np.asarray(
                    self.sim_func(h_emb[i:i + bs], t_emb[j:j + bs])))
            rows.append(np.concatenate(cols, axis=1))
        score = np.concatenate(rows, axis=0)  # [H, T]

        if not bcast:
            flat = score.reshape(-1)
            sidx = np.argsort(-flat, kind="stable")[:k]
            t_i = sidx % len(tail)
            h_i = sidx // len(tail)
            result.append((head[h_i], tail[t_i], flat[sidx]))
        else:
            for i in range(len(head)):
                sidx = np.argsort(-score[i], kind="stable")[:k]
                result.append((np.full((len(sidx),), head[i]), tail[sidx],
                               score[i][sidx]))
        return result
