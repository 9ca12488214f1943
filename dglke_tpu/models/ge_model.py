"""Object-level graph-embedding model API (the reference's "new model API").

Re-designs /root/reference/python/dglke/models/ke_model.py:56-978
(BasicGEModel / KGEModel / per-model classes / GNNModel) for JAX:

  * ``BasicGEModel.link_predict`` — topK missing-link prediction under 5
    exec modes (triplet_wise / all / batch_head / batch_rel / batch_tail),
    optional logsigmoid squashing, and 3 exclude modes (None / 'mask' /
    'exclude') that consult the attached graph's known edges.
  * ``BasicGEModel.embed_sim`` — similarity topK over entity or relation
    embeddings (cosine / l2 / l1 / dot / ext_jaccard; pairwise / bcast /
    all-pairs).
  * ``KGEModel.load`` — loads ``entity.npy`` / ``relation.npy``
    (+ TransR projection) checkpoints.
  * Per-model classes: TransEModel, TransE_l1Model, TransE_l2Model,
    TransRModel, DistMultModel, ComplExModel, RESCALModel, RotatEModel,
    and GNNModel (externally-trained embeddings scored with
    TransE/DistMult).

TPU-native design notes (vs the reference):
  * The reference attaches a DGLGraph and, per candidate triple, runs a
    Python loop over ``g.edge_ids`` results to test edge existence
    (ke_model.py:274-296, 369-386).  Here the attached graph is a pure
    ``TripleSet`` — sorted composite-key arrays — and existence tests are
    a single vectorized ``searchsorted`` over the whole candidate batch.
  * Scores are computed with the same jnp score kernels the trainer uses
    (blocked all-pairs einsums on the MXU); topK/argsort on host numpy.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dglke_tpu.models.infer import SIM_FUNCS, DEFAULT_INFER_BATCHSIZE
from dglke_tpu.models.score_functions import (
    ComplExScore,
    DistMultScore,
    RESCALScore,
    RotatEScore,
    ScoreFunction,
    TransEScore,
    TransRScore,
)

EMB_INIT_EPS = 2.0


class TripleSet:
    """Membership index over a set of (h, r, t) triples.

    Replaces the reference's attached DGLGraph + ``g.edge_ids`` loops
    (ke_model.py:274-296): two sorted arrays — unique (h, t) composite keys
    and, per (h, t) group, sorted group-local relation keys — give a fully
    vectorized O(log E) ``contains`` for arbitrarily large candidate
    batches.  Composite keys are built in two levels so the arithmetic
    never overflows int64 even at Freebase scale (86M entities)."""

    def __init__(self, head: np.ndarray, rel: np.ndarray, tail: np.ndarray,
                 n_entities: int, n_relations: int):
        head = np.asarray(head, dtype=np.int64)
        rel = np.asarray(rel, dtype=np.int64)
        tail = np.asarray(tail, dtype=np.int64)
        # Key bases derive from the DATA as well as the declared counts:
        # attach_graph may run before embeddings load (num_entity == -1 in
        # BasicGEModel), and a base smaller than the ids would make
        # composite keys collide -> silent false positives in contains().
        # The reference's attach_graph is order-independent (ke_model.py:
        # 67-88); so is this.
        self.n_entities = max(int(n_entities),
                              int(head.max()) + 1 if len(head) else 1,
                              int(tail.max()) + 1 if len(tail) else 1, 1)
        self.n_relations = max(int(n_relations),
                               int(rel.max()) + 1 if len(rel) else 1, 1)
        self.num_edges = len(head)
        self._head, self._rel, self._tail = head, rel, tail

        ht = head * self.n_entities + tail
        # unique (h,t) keys -> dense group ids; then (group, r) keys.
        self._ht_keys, inv = np.unique(ht, return_inverse=True)
        gr = inv.astype(np.int64) * self.n_relations + rel
        self._gr_keys = np.sort(gr)

    def contains(self, head: np.ndarray, rel: np.ndarray,
                 tail: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool[N] for N candidate triples."""
        head = np.asarray(head, dtype=np.int64)
        rel = np.asarray(rel, dtype=np.int64)
        tail = np.asarray(tail, dtype=np.int64)
        if self.num_edges == 0:
            return np.zeros(head.shape, dtype=bool)
        # ids beyond the key bases cannot be members (and would collide)
        in_range = ((head < self.n_entities) & (tail < self.n_entities)
                    & (rel < self.n_relations) & (head >= 0) & (tail >= 0)
                    & (rel >= 0))
        head = np.minimum(head, self.n_entities - 1)
        tail = np.minimum(tail, self.n_entities - 1)
        rel = np.minimum(rel, self.n_relations - 1)
        ht = head * self.n_entities + tail
        pos = np.searchsorted(self._ht_keys, ht)
        pos_c = np.minimum(pos, len(self._ht_keys) - 1)
        ht_hit = (len(self._ht_keys) > 0) & (self._ht_keys[pos_c] == ht)
        gr = pos_c * self.n_relations + rel
        gpos = np.searchsorted(self._gr_keys, gr)
        gpos_c = np.minimum(gpos, len(self._gr_keys) - 1)
        gr_hit = (len(self._gr_keys) > 0) & (self._gr_keys[gpos_c] == gr)
        return ht_hit & gr_hit & in_range

    @property
    def edges(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._head, self._rel, self._tail


def _as_triple_set(g, n_entities: int, n_relations: int) -> TripleSet:
    if isinstance(g, TripleSet):
        return g
    if hasattr(g, "train"):  # KGDataset duck-type
        hs, rs, ts = [], [], []
        for split in (g.train, getattr(g, "valid", None),
                      getattr(g, "test", None)):
            if split is None:
                continue
            hs.append(split[0])
            rs.append(split[1])
            ts.append(split[2])
        return TripleSet(np.concatenate(hs), np.concatenate(rs),
                         np.concatenate(ts), g.n_entities, g.n_relations)
    h, r, t = g  # (head, rel, tail) arrays
    return TripleSet(h, r, t, n_entities, n_relations)


def _np_logsigmoid(x: np.ndarray) -> np.ndarray:
    # NOTE: keep in sync with infer.py ScoreInfer._squash (same math; the
    # two APIs wrap different checkpoint layouts)
    return np.asarray(jax.nn.log_sigmoid(jnp.asarray(x)))


class BasicGEModel:
    """Graph-embedding model over loaded embedding tables
    (reference BasicGEModel, ke_model.py:56-853)."""

    def __init__(self, device=None, model_name: str = "TransE_l2",
                 score_func: Optional[ScoreFunction] = None):
        # `device` kept for API compatibility; JAX owns placement.
        self._g: Optional[TripleSet] = None
        self._model_name = model_name
        self._device = device
        self._score_func = score_func
        self._entity_emb: Optional[np.ndarray] = None
        self._relation_emb: Optional[np.ndarray] = None
        self._projection_emb: Optional[np.ndarray] = None  # TransR only

    # -- attachment / IO ----------------------------------------------------

    def attach_graph(self, g, etid_field="tid", ntid_filed="ntid"):
        """Attach the known-edge set used by link_predict's exclude modes.

        Accepts a KGDataset, a (head, rel, tail) array triple, or a
        prebuilt TripleSet (reference attach_graph, ke_model.py:67-88,
        takes a DGLGraph; no graph object exists in this framework)."""
        self._g = _as_triple_set(g, self.num_entity, self.num_rel)

    def load_emb(self, entity_emb: np.ndarray, relation_emb: np.ndarray):
        self._entity_emb = np.asarray(entity_emb, dtype=np.float32)
        self._relation_emb = np.asarray(relation_emb, dtype=np.float32)

    def load(self, model_path: str):
        raise NotImplementedError

    def save(self, model_path: str):
        raise NotImplementedError(
            'this model class is inference-only; save via dglke_tpu-train')

    def fit(self):
        raise NotImplementedError(
            "this model class is inference-only; train with dglke_tpu.trainer")

    def eval(self):
        raise NotImplementedError(
            "this model class is inference-only; evaluate with dglke_tpu.trainer.evaluate")

    # -- scoring ------------------------------------------------------------

    def _project_transr(self, rel_ids: np.ndarray):
        rel_ids = np.asarray(rel_ids)
        proj = self._projection_emb[rel_ids]
        return proj.reshape(len(rel_ids), self._score_func.entity_dim,
                            self._score_func.relation_dim)

    def _infer_score(self, head: np.ndarray, rel: np.ndarray,
                     tail: np.ndarray, triplet_wise: bool = False,
                     batch_size: int = DEFAULT_INFER_BATCHSIZE) -> np.ndarray:
        """[N] (triplet_wise) or [H, R, T] raw scores
        (reference _infer_score_func, ke_model.py:127-203)."""
        sf = self._score_func
        h_emb = jnp.asarray(self._entity_emb[head])
        r_emb = jnp.asarray(self._relation_emb[rel])
        t_emb = jnp.asarray(self._entity_emb[tail])
        is_transr = isinstance(sf, TransRScore)

        if triplet_wise:
            outs = []
            for i in range(0, len(head), batch_size):
                hb, rb, tb = (h_emb[i:i + batch_size], r_emb[i:i + batch_size],
                              t_emb[i:i + batch_size])
                if is_transr:
                    proj = jnp.asarray(self._project_transr(
                        rel[i:i + batch_size]))
                    hb = jnp.einsum("bd,bdk->bk", hb, proj, precision="highest")
                    tb = jnp.einsum("bd,bdk->bk", tb, proj, precision="highest")
                outs.append(np.asarray(sf.pos_score(hb, rb, tb)))
            return np.concatenate(outs)

        if is_transr:
            # all-pairs with per-relation projection, relations blocked on
            # device (TransR pos_score is gamma - L1, score_functions.py)
            from dglke_tpu.models.score_functions import \
                transr_allpairs_score
            proj = np.asarray(self._project_transr(rel))
            return transr_allpairs_score(
                h_emb, t_emb, proj, r_emb, sf.gamma,
                sf.entity_dim, sf.relation_dim)  # [H, R, T]

        rows = []
        for i in range(0, len(head), batch_size):
            cols = []
            for j in range(0, len(tail), batch_size):
                cols.append(np.asarray(sf.infer_score(
                    h_emb[i:i + batch_size], r_emb, t_emb[j:j + batch_size])))
            rows.append(np.concatenate(cols, axis=2))
        return np.concatenate(rows, axis=0)  # [H, R, T]

    # -- link prediction ----------------------------------------------------

    def _decode(self, idx: np.ndarray, head, rel, tail, exec_mode: str):
        """Map flat candidate indices back to (h, r, t) ids
        (reference's divmod decode, ke_model.py:226-263)."""
        head = np.atleast_1d(np.asarray(head))
        rel = np.atleast_1d(np.asarray(rel))
        tail = np.atleast_1d(np.asarray(tail))
        nh, nr, nt = len(head), len(rel), len(tail)
        if exec_mode == "triplet_wise":
            return head[idx], rel[idx], tail[idx]
        if exec_mode == "all":
            t_i = idx % nt
            hr = idx // nt
            return head[hr // nr], rel[hr % nr], tail[t_i]
        if exec_mode == "batch_head":
            t_i = idx % nt
            return np.broadcast_to(head, idx.shape), rel[idx // nt % nr], \
                tail[t_i]
        if exec_mode == "batch_rel":
            t_i = idx % nt
            return head[idx // nt % nh], np.broadcast_to(rel, idx.shape), \
                tail[t_i]
        if exec_mode == "batch_tail":
            r_i = idx % nr
            return head[idx // nr % nh], rel[r_i], \
                np.broadcast_to(tail, idx.shape)
        raise ValueError(f"unrecognized exec_mode: {exec_mode!r}")

    def _topk_exclude_pos(self, score: np.ndarray, head, rel, tail,
                          topk: int, exec_mode: str,
                          exclude_mode: Optional[str]):
        """topK + positive-edge handling (reference _topk_exclude_pos /
        _exclude_pos, ke_model.py:205-455) — vectorized filtering."""
        n = score.shape[0]
        order = np.argsort(-score, kind="stable")

        if exclude_mode == "exclude":
            # Take topk*4 first; widen to the full candidate list only if
            # too many of them turn out to be existing edges (mirrors the
            # reference's escalation, ke_model.py:403-440).
            for cut in (min(topk * 4, n), n):
                cand = order[:cut]
                h, r, t = self._decode(cand, head, rel, tail, exec_mode)
                known = self._g.contains(h, r, t)
                keep = ~known
                if keep.sum() >= topk or cut == n:
                    sel = np.flatnonzero(keep)[:topk]
                    return (h[sel], r[sel], t[sel], score[cand[sel]], None)
            raise AssertionError  # unreachable

        k = min(topk, n)
        sel = order[:k]
        h, r, t = self._decode(sel, head, rel, tail, exec_mode)
        if exclude_mode == "mask":
            mask = self._g.contains(h, r, t)
            return (h, r, t, score[sel], mask)
        return (h, r, t, score[sel], None)

    def link_predict(self, head=None, rel=None, tail=None,
                     exec_mode: str = "all", sfunc: str = "none",
                     topk: int = 10, exclude_mode: Optional[str] = None,
                     batch_size: int = DEFAULT_INFER_BATCHSIZE) -> List[Tuple]:
        """Predict topK most-relevant triples (reference link_predict,
        ke_model.py:457-641).

        Returns a list of (head_ids, rel_ids, tail_ids, scores, mask) —
        one element for triplet_wise/all, one per batch element for the
        batch_* modes.  ``mask`` is None unless exclude_mode == 'mask'."""
        head = np.arange(self.num_entity) if head is None \
            else np.asarray(head, dtype=np.int64)
        rel = np.arange(self.num_rel) if rel is None \
            else np.asarray(rel, dtype=np.int64)
        tail = np.arange(self.num_entity) if tail is None \
            else np.asarray(tail, dtype=np.int64)
        assert exclude_mode in (None, "mask", "exclude"), \
            f"unknown exclude_mode {exclude_mode}"
        assert self._g is not None or exclude_mode is None, (
            "If exclude_mode is not None, please use attach_graph() to "
            "initialize a graph for edge filtering.")
        squash = _np_logsigmoid if sfunc == "logsigmoid" else (lambda x: x)

        if exec_mode == "triplet_wise":
            assert len(head) == len(rel) == len(tail), (
                "triplet_wise scoring pairs elementwise: head/rel/tail "
                "lengths must match")
            score = squash(self._infer_score(head, rel, tail,
                                             triplet_wise=True,
                                             batch_size=batch_size))
            return [self._topk_exclude_pos(score, head, rel, tail, topk,
                                           exec_mode, exclude_mode)]

        raw = self._infer_score(head, rel, tail, batch_size=batch_size)
        if exec_mode == "all":
            return [self._topk_exclude_pos(squash(raw.reshape(-1)), head,
                                           rel, tail, topk, exec_mode,
                                           exclude_mode)]
        if exec_mode == "batch_head":
            return [self._topk_exclude_pos(squash(raw[i].reshape(-1)),
                                           head[i], rel, tail, topk,
                                           exec_mode, exclude_mode)
                    for i in range(len(head))]
        if exec_mode == "batch_rel":
            return [self._topk_exclude_pos(squash(raw[:, i, :].reshape(-1)),
                                           head, rel[i], tail, topk,
                                           exec_mode, exclude_mode)
                    for i in range(len(rel))]
        if exec_mode == "batch_tail":
            return [self._topk_exclude_pos(squash(raw[:, :, i].reshape(-1)),
                                           head, rel, tail[i], topk,
                                           exec_mode, exclude_mode)
                    for i in range(len(tail))]
        raise ValueError(f"unrecognized exec_mode: {exec_mode!r}")

    # -- embedding similarity -----------------------------------------------

    def embed_sim(self, left=None, right=None, embed_type: str = "entity",
                  sfunc: str = "cosine", bcast: bool = False,
                  pair_ws: bool = False, topk: int = 10,
                  batch_size: int = DEFAULT_INFER_BATCHSIZE) -> List[Tuple]:
        """Similarity topK over embeddings (reference embed_sim,
        ke_model.py:643-829).  Returns [(left_ids, right_ids, scores)]."""
        if embed_type == "entity":
            emb = self._entity_emb
        elif embed_type == "relation":
            emb = self._relation_emb
        else:
            raise ValueError("emb must be 'entity' or 'relation'")
        sim = SIM_FUNCS[sfunc]
        left = np.arange(emb.shape[0]) if left is None \
            else np.asarray(left, dtype=np.int64)
        right = np.arange(emb.shape[0]) if right is None \
            else np.asarray(right, dtype=np.int64)
        l_emb = jnp.asarray(emb[left])
        r_emb = jnp.asarray(emb[right])

        if pair_ws:
            assert len(left) == len(right)
            scores = [np.asarray(sim(l_emb[i:i + batch_size],
                                     r_emb[i:i + batch_size], pw=True))
                      for i in range(0, len(left), batch_size)]
            score = np.concatenate(scores)
            sidx = np.argsort(-score, kind="stable")[:topk]
            return [(left[sidx], right[sidx], score[sidx])]

        rows = []
        for i in range(0, len(left), batch_size):
            cols = [np.asarray(sim(l_emb[i:i + batch_size],
                                   r_emb[j:j + batch_size]))
                    for j in range(0, len(right), batch_size)]
            rows.append(np.concatenate(cols, axis=1))
        score = np.concatenate(rows, axis=0)  # [L, R]

        if not bcast:
            flat = score.reshape(-1)
            sidx = np.argsort(-flat, kind="stable")[:topk]
            return [(left[sidx // len(right)], right[sidx % len(right)],
                     flat[sidx])]
        result = []
        for i in range(len(left)):
            sidx = np.argsort(-score[i], kind="stable")[:topk]
            result.append((np.full((len(sidx),), left[i]), right[sidx],
                           score[i][sidx]))
        return result

    # -- properties ----------------------------------------------------------

    @property
    def model_name(self):
        return self._model_name

    @property
    def entity_embed(self):
        return self._entity_emb

    @property
    def relation_embed(self):
        return self._relation_emb

    @property
    def num_entity(self):
        return -1 if self._entity_emb is None else self._entity_emb.shape[0]

    @property
    def num_rel(self):
        return -1 if self._relation_emb is None \
            else self._relation_emb.shape[0]

    @property
    def graph(self):
        return self._g


def _load_npy(path: str, *names: str) -> np.ndarray:
    """Load the first existing name; fall back to a unique
    ``*_<name>`` glob so checkpoints written by the trainer
    (``{dataset}_{model}_entity.npy``) load directly."""
    import glob
    for name in names:
        f = os.path.join(path, name)
        if os.path.exists(f):
            return np.load(f)
    for name in names:
        hits = sorted(glob.glob(os.path.join(path, f"*_{name}")))
        hits = [h for h in hits if not h.endswith("_state.npy")]
        if len(hits) == 1:
            return np.load(hits[0])
        if len(hits) > 1:
            raise FileNotFoundError(
                f"{name} not found under {path} and fallback glob *_{name} "
                f"is ambiguous: {hits}")
    raise FileNotFoundError(f"none of {names} found under {path}")


class KGEModel(BasicGEModel):
    """KGE model loadable from entity.npy / relation.npy checkpoints
    (reference KGEModel, ke_model.py:855-866)."""

    def load(self, model_path: str):
        self.load_emb(_load_npy(model_path, "entity.npy"),
                      _load_npy(model_path, "relation.npy"))


class TransEModel(KGEModel):
    def __init__(self, device=None, gamma: float = 12.0):
        self._gamma = gamma
        super().__init__(device, "TransE", TransEScore(gamma, 2))


class TransE_l2Model(KGEModel):
    def __init__(self, device=None, gamma: float = 12.0):
        self._gamma = gamma
        super().__init__(device, "TransE_l2", TransEScore(gamma, 2))


class TransE_l1Model(KGEModel):
    def __init__(self, device=None, gamma: float = 12.0):
        self._gamma = gamma
        super().__init__(device, "TransE_l1", TransEScore(gamma, 1))


class TransRModel(KGEModel):
    def __init__(self, device=None, gamma: float = 12.0):
        self._gamma = gamma
        super().__init__(device, "TransR",
                         TransRScore(gamma, entity_dim=-1, relation_dim=-1))

    def load(self, model_path: str):
        super().load(model_path)
        proj = _load_npy(model_path, f"{self.model_name}projection.npy",
                         "projection.npy")
        self._score_func = dataclasses.replace(
            self._score_func,
            entity_dim=self._entity_emb.shape[1],
            relation_dim=self._relation_emb.shape[1])
        self._projection_emb = np.asarray(proj, dtype=np.float32)


class DistMultModel(KGEModel):
    def __init__(self, device=None):
        super().__init__(device, "DistMult", DistMultScore())


class ComplExModel(KGEModel):
    def __init__(self, device=None):
        super().__init__(device, "ComplEx", ComplExScore())


class RESCALModel(KGEModel):
    def __init__(self, device=None):
        super().__init__(device, "RESCAL",
                         RESCALScore(relation_dim=-1, entity_dim=-1))

    def load(self, model_path: str):
        super().load(model_path)
        entity_dim = self._entity_emb.shape[1]
        self._score_func = dataclasses.replace(
            self._score_func, entity_dim=entity_dim,
            relation_dim=self._relation_emb.shape[1] // entity_dim)


class RotatEModel(KGEModel):
    def __init__(self, device=None, gamma: float = 12.0):
        self._gamma = gamma
        super().__init__(device, "RotatE", RotatEScore(gamma, emb_init=1.0))

    def load(self, model_path: str):
        super().load(model_path)
        hidden_dim = self._entity_emb.shape[1] // 2
        self._score_func = dataclasses.replace(
            self._score_func,
            emb_init=(self._gamma + EMB_INIT_EPS) / hidden_dim)


class GNNModel(BasicGEModel):
    """Score externally-trained (e.g. GNN) embeddings with a simple score
    function (reference GNNModel, ke_model.py:957-978)."""

    def __init__(self, device=None, model_name: str = "TransE_l2",
                 gamma: float = 0.0):
        if model_name in ("TransE", "TransE_l2"):
            score_func = TransEScore(gamma, dist_ord=2)
        elif model_name == "TransE_l1":
            score_func = TransEScore(gamma, dist_ord=1)
        elif model_name == "DistMult":
            score_func = DistMultScore()
        else:
            raise ValueError(
                "For general purpose scoring of GNN embeddings only "
                "TransE_l1, TransE_l2 and DistMult are supported, "
                f"got {model_name}")
        super().__init__(device, model_name, score_func)

    def load(self, model_path: str):
        self.load_emb(_load_npy(model_path, "entity.npy"),
                      _load_npy(model_path, "relation.npy"))
