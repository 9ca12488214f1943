"""Score functions for knowledge-graph embedding models, TPU-first.

Implements the seven+1 model families of the reference
(/root/reference/python/dglke/models/pytorch/score_fun.py) as pure-jnp
functions in three forms each, matching the reference contract:

  * ``pos_score(h, r, t) -> [B]``: per-edge positive score.
  * ``neg_score(emb, rel, neg_emb, neg_head, C, Bc, K) -> [C, Bc, K]``:
    chunked negative scoring — each chunk of Bc positives is scored against
    K shared corrupted heads/tails.  This is the MXU-friendly kernel: for the
    bilinear family it is one batched matmul ``[C,Bc,D] x [C,D,K]``; for the
    translational family it uses the |a|^2+|b|^2-2ab expansion so the O(Bc*K*D)
    work also rides the MXU (reference: batched_l2_dist, score_fun.py:26-34).
  * ``infer_score(h, r, t) -> [H, R, T]``: all-pairs broadcast scoring for the
    predict / topK tools (reference ``infer`` methods).

Stateless: hyper-parameters live in frozen dataclasses (hashable, so they can
be closed over or passed as jit static args); all tensor state is passed in.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Distance helpers


def batched_l2_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """||a_i - b_j||_2 for batched a:[...,M,D], b:[...,N,D] -> [...,M,N].

    Uses the matmul expansion (MXU path); clamps at 1e-30 before sqrt exactly
    like the reference to avoid NaN gradients at zero distance.
    """
    a_sq = jnp.sum(a * a, axis=-1)  # [..., M]
    b_sq = jnp.sum(b * b, axis=-1)  # [..., N]
    ab = jnp.einsum("...md,...nd->...mn", a, b, preferred_element_type=jnp.float32, precision="highest")
    sq = a_sq[..., :, None] + b_sq[..., None, :] - 2.0 * ab
    return jnp.sqrt(jnp.clip(sq, min=1e-30))


def batched_l1_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """||a_i - b_j||_1 for batched a:[...,M,D], b:[...,N,D] -> [...,M,N].

    No matmul trick exists for L1; materializes [..., M, N, D] broadcast.
    Callers with large M*N*D should block over N (see eval tiling).
    """
    return jnp.sum(jnp.abs(a[..., :, None, :] - b[..., None, :, :]), axis=-1)


def _norm(x: jnp.ndarray, ord: int, axis: int = -1) -> jnp.ndarray:
    if ord == 1:
        return jnp.sum(jnp.abs(x), axis=axis)
    # +1e-30 before sqrt: d sqrt(0)/dx is NaN and one exactly-zero distance
    # would NaN-poison the whole table via Adagrad.  The additive epsilon
    # reproduces torch.norm's 0 subgradient at 0 exactly (the huge-but-
    # finite 0.5/sqrt(eps) is chain-multiplied by d(x^2)/dx = 0) and costs
    # one add — a clip doubles the backward (mask recompute over the big
    # broadcast; measured 672 vs 332 us on a v5e RotatE core).
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-30)


# ---------------------------------------------------------------------------
# Base class


@dataclasses.dataclass(frozen=True)
class ScoreFunction:
    """Base score function. Subclasses implement pos/neg/infer forms."""

    name: str = dataclasses.field(default="", init=False)

    def pos_score(self, head, rel, tail):
        raise NotImplementedError

    def neg_score(self, emb, rel, neg_emb, *, neg_head: bool,
                  num_chunks: int, chunk_size: int, neg_sample_size: int):
        """Chunked negative scores.

        Parameters
        ----------
        emb : [B, De] — the *positive-side* entity rows (tails if neg_head,
            heads otherwise), B = num_chunks * chunk_size.
        rel : [B, Dr] — relation rows of the positive edges.
        neg_emb : [C*K, De] — corrupted entity rows, K = neg_sample_size.
        """
        raise NotImplementedError

    def infer_score(self, head, rel, tail):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# TransE (l1 / l2)


@dataclasses.dataclass(frozen=True)
class TransEScore(ScoreFunction):
    gamma: float
    dist_ord: int = 2  # 1 or 2

    def __post_init__(self):
        object.__setattr__(self, "name",
                           "TransE_l1" if self.dist_ord == 1 else "TransE_l2")

    def pos_score(self, head, rel, tail):
        return self.gamma - _norm(head + rel - tail, self.dist_ord)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        d = emb.shape[-1]
        if neg_head:
            pos = (emb - rel).reshape(num_chunks, chunk_size, d)
        else:
            pos = (emb + rel).reshape(num_chunks, chunk_size, d)
        neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
        dist = batched_l2_dist if self.dist_ord == 2 else batched_l1_dist
        return self.gamma - dist(pos, neg)

    def infer_score(self, head, rel, tail):
        hr = head[:, None, :] + rel[None, :, :]               # [H, R, D]
        diff = hr[:, :, None, :] - tail[None, None, :, :]     # [H, R, T, D]
        return self.gamma - _norm(diff, self.dist_ord)


# ---------------------------------------------------------------------------
# TransR

@dataclasses.dataclass(frozen=True)
class TransRScore(ScoreFunction):
    """TransR: entities projected into relation space by a per-relation
    [De, Dr] matrix before a gamma - L1 translational score.

    The projection rows are a third embedding table; `project` /
    `neg_project` mirror the reference's prepare / create_neg_prepare
    (score_fun.py:131-168): positives project each node with its own edge's
    relation, negatives project every negative node against *all* chunk
    relations, giving [C, Bc, K] scores from [C, Bc, K, Dr] differences.
    """

    gamma: float
    entity_dim: int
    relation_dim: int

    def __post_init__(self):
        object.__setattr__(self, "name", "TransR")

    def project(self, ent, proj):
        """ent: [B, De], proj: [B, De*Dr] -> [B, Dr].

        f32 inputs: broadcast-multiply + reduce rather than einsum — each
        edge is an M=1 matvec, which the MXU pads to a full tile (x8
        wasted rows) and precision="highest" then multiplies by 6 passes;
        the VPU form is exact f32 and bandwidth-bound on the one
        unavoidable read of the projection rows (reference prepare,
        score_fun.py:131-148).  bf16 inputs (--compute_dtype bfloat16):
        keep the einsum — the MXU multiplies bf16 exactly into an f32
        accumulator in ONE pass, whereas the VPU broadcast would round
        every product to bf16 before summing."""
        p = proj.reshape(-1, self.entity_dim, self.relation_dim)
        if ent.dtype == jnp.bfloat16 or p.dtype == jnp.bfloat16:
            return jnp.einsum("bd,bdr->br", ent, p,
                              preferred_element_type=jnp.float32)
        return jnp.sum(ent[:, :, None] * p, axis=1)

    def neg_project(self, neg_ent, proj, num_chunks):
        """neg_ent: [C*K, De], proj: [B, De*Dr] (per positive edge) ->
        [C, Bc, K, Dr]: every chunk negative projected by every chunk
        relation.

        This is a genuine MXU matmul ([K, De] x [De, Bc*Dr] per chunk) —
        unlike the M=1 per-edge projections, which use the VPU form (see
        project).  precision="high" (bf16x3, ~2^-21 relative error,
        f32-equivalent for scores) instead of "highest" (6-pass):
        measured 499 vs 843 us fwd+bwd at the FB15k TransR shape on a
        v5e (tools/diag_bilinear.py)."""
        p = proj.reshape(num_chunks, -1, self.entity_dim, self.relation_dim)
        n = neg_ent.reshape(num_chunks, 1, -1, self.entity_dim)
        # [C, Bc, K, Dr]
        return jnp.einsum("cxkd,cbdr->cbkr", n, p,
                          preferred_element_type=jnp.float32,
                          precision="high")

    def pos_score(self, head, rel, tail):
        # head/tail already projected to [B, Dr]
        return self.gamma - _norm(head + rel - tail, 1)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        """emb: [C, Bc, Dr] projected positive-side rows; neg_emb:
        [C, Bc, K, Dr] projected negatives (from neg_project)."""
        rel = rel.reshape(num_chunks, chunk_size, self.relation_dim)
        if neg_head:
            pos = (emb - rel)[:, :, None, :]   # tails - rel
            diff = neg_emb - pos
        else:
            # DELIBERATE fix vs the reference: its tail-corrupt TransR
            # create_neg computes |h - r - t'| (score_fun.py:227-233),
            # inconsistent with its own positive score |h + r - t| and
            # with every other translational model; that path is untested
            # upstream.  We keep h + r so neg scores agree with pos
            # scores of the same triple (see also the RESCAL transpose
            # fix below).
            pos = (emb + rel)[:, :, None, :]
            diff = pos - neg_emb
        return self.gamma - jnp.sum(jnp.abs(diff), axis=-1)

    def infer_score(self, head, rel, tail):  # requires projections; see model
        raise NotImplementedError("TransR infer goes through KEModel")


@jax.jit
def _transr_allpairs_tile(h_emb, t_emb, proj_t, r_t, gamma):
    """One relation TILE of the TransR all-pairs score: [Rt, H, T] =
    gamma - L1(h@P_r + r - t@P_r).  Both projections are single einsums
    over the tile; the [Rt, H, T, Dr] difference stays inside one XLA
    reduce-fusion (never materialized)."""
    hp = jnp.einsum("hd,rde->rhe", h_emb, proj_t,
                    preferred_element_type=jnp.float32, precision="highest")
    tp = jnp.einsum("td,rde->rte", t_emb, proj_t,
                    preferred_element_type=jnp.float32, precision="highest")
    diff = hp[:, :, None, :] + r_t[:, None, None, :] - tp[:, None, :, :]
    return gamma - jnp.sum(jnp.abs(diff), axis=-1)


def transr_allpairs_score(h_emb, t_emb, proj, r_emb, gamma,
                          entity_dim: int, relation_dim: int,
                          budget: int = 1 << 25):
    """TransR all-pairs inference scores [H, R, T], relations BLOCKED on
    device: O(R / tile) dispatches instead of one per relation (1,345
    single-relation dispatches cost ~54 s of tunnel RTT alone at 40 ms
    each; reference contract: score_fun.py:138-168 prepare + TransR infer).
    ``budget`` bounds the per-tile [Rt, H, T, Dr] reduce-fusion domain."""
    import numpy as np
    h_emb = jnp.asarray(h_emb)
    t_emb = jnp.asarray(t_emb)
    r_emb = jnp.asarray(r_emb)
    proj = jnp.asarray(proj).reshape(-1, entity_dim, relation_dim)
    hn, tn, rn = h_emb.shape[0], t_emb.shape[0], r_emb.shape[0]
    rt = max(1, min(rn, budget // max(1, hn * tn * relation_dim)))
    out = []
    for j in range(0, rn, rt):
        s = _transr_allpairs_tile(h_emb, t_emb, proj[j:j + rt],
                                  r_emb[j:j + rt], gamma)
        out.append(np.asarray(s).transpose(1, 0, 2))
    return np.concatenate(out, axis=1)  # [H, R, T]


# ---------------------------------------------------------------------------
# DistMult


@dataclasses.dataclass(frozen=True)
class DistMultScore(ScoreFunction):
    def __post_init__(self):
        object.__setattr__(self, "name", "DistMult")

    def pos_score(self, head, rel, tail):
        return jnp.sum(head * rel * tail, axis=-1)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        d = emb.shape[-1]
        tmp = (emb * rel).reshape(num_chunks, chunk_size, d)
        neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
        return jnp.einsum("cbd,ckd->cbk", tmp, neg,
                          preferred_element_type=jnp.float32, precision="highest")

    def infer_score(self, head, rel, tail):
        hr = head[:, None, :] * rel[None, :, :]
        return jnp.einsum("hrd,td->hrt", hr, tail,
                          preferred_element_type=jnp.float32, precision="highest")


# ---------------------------------------------------------------------------
# ComplEx


@dataclasses.dataclass(frozen=True)
class ComplExScore(ScoreFunction):
    def __post_init__(self):
        object.__setattr__(self, "name", "ComplEx")

    @staticmethod
    def _split(x):
        h = x.shape[-1] // 2
        return x[..., :h], x[..., h:]

    def pos_score(self, head, rel, tail):
        re_h, im_h = self._split(head)
        re_t, im_t = self._split(tail)
        re_r, im_r = self._split(rel)
        s = (re_h * re_t * re_r + im_h * im_t * re_r
             + re_h * im_t * im_r - im_h * re_t * im_r)
        return jnp.sum(s, axis=-1)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        d = emb.shape[-1]
        re_e, im_e = self._split(emb)
        re_r, im_r = self._split(rel)
        if neg_head:
            # conj-multiply tail rows by relation (reference head-neg branch)
            real = re_e * re_r + im_e * im_r
            imag = -re_e * im_r + im_e * re_r
        else:
            real = re_e * re_r - im_e * im_r
            imag = re_e * im_r + im_e * re_r
        tmp = jnp.concatenate([real, imag], axis=-1)
        tmp = tmp.reshape(num_chunks, chunk_size, d)
        neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
        return jnp.einsum("cbd,ckd->cbk", tmp, neg,
                          preferred_element_type=jnp.float32, precision="highest")

    def infer_score(self, head, rel, tail):
        re_h, im_h = self._split(head)
        re_t, im_t = self._split(tail)
        re_r, im_r = self._split(rel)
        # [H, R, D/2] rotated heads
        a = re_h[:, None, :] * re_r[None, :, :] - im_h[:, None, :] * im_r[None, :, :]
        b = im_h[:, None, :] * re_r[None, :, :] + re_h[:, None, :] * im_r[None, :, :]
        return (jnp.einsum("hrd,td->hrt", a, re_t,
                           preferred_element_type=jnp.float32, precision="highest")
                + jnp.einsum("hrd,td->hrt", b, im_t,
                             preferred_element_type=jnp.float32, precision="highest"))


# ---------------------------------------------------------------------------
# RESCAL


@dataclasses.dataclass(frozen=True)
class RESCALScore(ScoreFunction):
    """RESCAL bilinear: score = h . (R t), R stored flat [Dr*De] per relation
    and viewed as [Dr, De] (reference score_fun.py:387-394)."""

    relation_dim: int
    entity_dim: int

    def __post_init__(self):
        object.__setattr__(self, "name", "RESCAL")

    def _mat(self, rel):
        return rel.reshape(rel.shape[:-1] + (self.relation_dim, self.entity_dim))

    def pos_score(self, head, rel, tail):
        # Kept as einsum after a same-session full-step A/B
        # (tools/diag_rescal_step.py, v5e): the ISOLATED matvec is 5x
        # faster as a VPU broadcast-reduce (tools/diag_bilinear.py,
        # 195 vs 929 us fwd+bwd), but inside the jitted train step the
        # broadcast form measures 5998 vs 5364 us/step — XLA fuses the
        # dot-general with its surroundings (gather, neg matmul, backward
        # transpose-dots) in a way the explicit broadcast breaks.
        # Precision is also step-level free here (default == highest,
        # 5361 vs 5364 us), so keep exact "highest".
        rt = jnp.einsum("...re,...e->...r", self._mat(rel), tail,
                        preferred_element_type=jnp.float32,
                        precision="highest")
        return jnp.sum(head * rt, axis=-1)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        d = emb.shape[-1]
        rmat = self._mat(rel)
        if neg_head:
            # tmp = R t per edge; score vs neg heads: h' . (R t)
            tmp = jnp.einsum("bre,be->br", rmat, emb,
                             preferred_element_type=jnp.float32,
                             precision="highest")
        else:
            # tmp = h^T R per edge; score vs neg tails: (h^T R) . t'.
            # NOTE deviation: the reference computes (R h) . t' = h^T R^T t'
            # here (score_fun.py:440-449), inconsistent with its own positive
            # edge_func h . (R t) and untested (its unit test only covers
            # chunk-head).  We keep neg/pos algebraically consistent because
            # our filtered eval mixes both forms on the same scores.
            tmp = jnp.einsum("bre,br->be", rmat, emb,
                             preferred_element_type=jnp.float32,
                             precision="highest")
        tmp = tmp.reshape(num_chunks, chunk_size, d)
        neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
        return jnp.einsum("cbd,ckd->cbk", tmp, neg,
                          preferred_element_type=jnp.float32, precision="highest")

    def infer_score(self, head, rel, tail):
        # score[h,r,t] = sum_d head[h,d] * (R[r] @ tail[t])[d]
        rt = jnp.einsum("rde,te->rtd", self._mat(rel), tail,
                        preferred_element_type=jnp.float32, precision="highest")
        return jnp.einsum("hd,rtd->hrt", head, rt,
                          preferred_element_type=jnp.float32, precision="highest")


# ---------------------------------------------------------------------------
# RotatE


@dataclasses.dataclass(frozen=True)
class RotatEScore(ScoreFunction):
    gamma: float
    emb_init: float

    def __post_init__(self):
        object.__setattr__(self, "name", "RotatE")

    @staticmethod
    def _split(x):
        h = x.shape[-1] // 2
        return x[..., :h], x[..., h:]

    def _phase(self, rel):
        return rel / (self.emb_init / math.pi)

    def pos_score(self, head, rel, tail):
        re_h, im_h = self._split(head)
        re_t, im_t = self._split(tail)
        ph = self._phase(rel)
        re_r, im_r = jnp.cos(ph), jnp.sin(ph)
        re_s = re_h * re_r - im_h * im_r - re_t
        im_s = re_h * im_r + im_h * re_r - im_t
        # +eps: NaN-gradient guard at zero modulus (see _norm)
        dist = jnp.sqrt(re_s * re_s + im_s * im_s + 1e-30)
        return self.gamma - jnp.sum(dist, axis=-1)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        # Keep the real/imag planes SEPARATE through the broadcast: a
        # concat + re-split of the [C, Bc, K, D] diff materializes 80M+
        # element copies and measures ~15x slower on a v5e (1.3 ms -> 0.18
        # ms fwd at the FB15k shape).  Only [B, D]-sized tensors are ever
        # concatenated/sliced here.
        h = emb.shape[-1] // 2
        re_e, im_e = self._split(emb)
        ph = self._phase(rel)
        re_r, im_r = jnp.cos(ph), jnp.sin(ph)
        if neg_head:
            real = re_e * re_r + im_e * im_r
            imag = -re_e * im_r + im_e * re_r
        else:
            real = re_e * re_r - im_e * im_r
            imag = re_e * im_r + im_e * re_r
        real = real.reshape(num_chunks, chunk_size, 1, h)
        imag = imag.reshape(num_chunks, chunk_size, 1, h)
        re_n = neg_emb[..., :h].reshape(num_chunks, 1, neg_sample_size, h)
        im_n = neg_emb[..., h:].reshape(num_chunks, 1, neg_sample_size, h)
        re_d = real - re_n                            # [C, Bc, K, D/2]
        im_d = imag - im_n
        dist = jnp.sqrt(re_d * re_d + im_d * im_d + 1e-30)  # +eps: see _norm
        return self.gamma - jnp.sum(dist, axis=-1)

    def infer_score(self, head, rel, tail):
        re_h, im_h = self._split(head)
        re_t, im_t = self._split(tail)
        ph = self._phase(rel)
        re_r, im_r = jnp.cos(ph), jnp.sin(ph)
        re_hr = re_h[:, None, :] * re_r[None, :, :] - im_h[:, None, :] * im_r[None, :, :]
        im_hr = re_h[:, None, :] * im_r[None, :, :] + im_h[:, None, :] * re_r[None, :, :]
        re_s = re_hr[:, :, None, :] - re_t[None, None, :, :]
        im_s = im_hr[:, :, None, :] - im_t[None, None, :, :]
        dist = jnp.sqrt(re_s * re_s + im_s * im_s + 1e-30)  # +eps: see _norm
        return self.gamma - jnp.sum(dist, axis=-1)


# ---------------------------------------------------------------------------
# SimplE


@dataclasses.dataclass(frozen=True)
class SimplEScore(ScoreFunction):
    def __post_init__(self):
        object.__setattr__(self, "name", "SimplE")

    @staticmethod
    def _split(x):
        h = x.shape[-1] // 2
        return x[..., :h], x[..., h:]

    def pos_score(self, head, rel, tail):
        h_i, h_j = self._split(head)
        t_i, t_j = self._split(tail)
        r, r_inv = self._split(rel)
        fwd = h_i * r * t_j
        bwd = t_i * r_inv * h_j
        return jnp.clip(0.5 * jnp.sum(fwd + bwd, axis=-1), -20.0, 20.0)

    def neg_score(self, emb, rel, neg_emb, *, neg_head, num_chunks,
                  chunk_size, neg_sample_size):
        d = emb.shape[-1]
        e_i, e_j = self._split(emb)
        r, r_inv = self._split(rel)
        if neg_head:
            fwd = (r * e_j).reshape(num_chunks, chunk_size, d // 2)
            bwd = (r_inv * e_i).reshape(num_chunks, chunk_size, d // 2)
        else:
            fwd = (e_i * r).reshape(num_chunks, chunk_size, d // 2)
            bwd = (r_inv * e_j).reshape(num_chunks, chunk_size, d // 2)
        neg = neg_emb.reshape(num_chunks, neg_sample_size, d)
        n_i, n_j = self._split(neg)
        if neg_head:
            s = jnp.einsum("cbd,ckd->cbk", fwd, n_i,
                           preferred_element_type=jnp.float32, precision="highest") \
                + jnp.einsum("cbd,ckd->cbk", bwd, n_j,
                             preferred_element_type=jnp.float32, precision="highest")
        else:
            s = jnp.einsum("cbd,ckd->cbk", fwd, n_j,
                           preferred_element_type=jnp.float32, precision="highest") \
                + jnp.einsum("cbd,ckd->cbk", bwd, n_i,
                             preferred_element_type=jnp.float32, precision="highest")
        return jnp.clip(0.5 * s, -20.0, 20.0)

    def infer_score(self, head, rel, tail):
        h_i, h_j = self._split(head)
        t_i, t_j = self._split(tail)
        r, r_inv = self._split(rel)
        fwd = jnp.einsum("hrd,td->hrt", h_i[:, None, :] * r[None, :, :], t_j,
                         preferred_element_type=jnp.float32, precision="highest")
        bwd = jnp.einsum("hrd,td->hrt", h_j[:, None, :] * r_inv[None, :, :], t_i,
                         preferred_element_type=jnp.float32, precision="highest")
        # NOTE: the reference infer path does NOT clamp (score_fun.py:574-581);
        # we match it.
        return 0.5 * (fwd + bwd)


# ---------------------------------------------------------------------------
# Factory


def make_score_function(model_name: str, gamma: float, hidden_dim: int,
                        double_ent: bool = False, double_rel: bool = False):
    """Create the score function plus (entity_dim, relation_dim).

    Mirrors KEModel.__init__ dispatch (general_models.py:248-268): RESCAL's
    relation table stores flattened [Dr, De] matrices; emb_init for RotatE is
    (gamma + eps) / hidden_dim with the *un-doubled* hidden dim.
    """
    entity_dim = 2 * hidden_dim if double_ent else hidden_dim
    relation_dim = 2 * hidden_dim if double_rel else hidden_dim
    emb_init = (gamma + 2.0) / hidden_dim

    if model_name in ("TransE", "TransE_l2"):
        return TransEScore(gamma, 2), entity_dim, relation_dim
    if model_name == "TransE_l1":
        return TransEScore(gamma, 1), entity_dim, relation_dim
    if model_name == "TransR":
        return (TransRScore(gamma, entity_dim, relation_dim),
                entity_dim, relation_dim)
    if model_name == "DistMult":
        return DistMultScore(), entity_dim, relation_dim
    if model_name == "ComplEx":
        return ComplExScore(), entity_dim, relation_dim
    if model_name == "RESCAL":
        return (RESCALScore(relation_dim, entity_dim), entity_dim,
                relation_dim * entity_dim)
    if model_name == "RotatE":
        return RotatEScore(gamma, emb_init), entity_dim, relation_dim
    if model_name == "SimplE":
        return SimplEScore(), entity_dim, relation_dim
    raise ValueError(f"unknown model {model_name}")
