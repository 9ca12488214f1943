"""Host-side samplers + edge partitioners.

TPU-native replacement for the reference's DGL EdgeSampler pipeline
(/root/reference/python/dglke/dataloader/sampler.py).  There are no graph
objects: a training batch is four integer arrays

    h [B], r [B], t [B], neg [C*K]

where the batch splits into C chunks of Bc positives sharing K uniformly
sampled corrupted heads/tails (the reference's chunked negative mode).  The
sampler alternates head- and tail-corrupt batches like
NewBidirectionalOneShotIterator (sampler.py:823-876), shuffles positives per
epoch, and streams forever.

Evaluation uses a sort-based FilterIndex over all (train+valid+test) triples
instead of DGL's ``return_false_neg`` C++ lookup: for each eval triple the
index returns the ids of all true heads/tails, which the device ranking
kernel subtracts from the unfiltered rank (see KEModel.eval_ranks).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Tuple

import numpy as np

from dglke_tpu.data.dataset import KGDataset

# ---------------------------------------------------------------------------
# Edge partitioners (single-machine data parallel; reference sampler.py:32-290)


def random_partition(triples, n_parts: int,
                     rng: Optional[np.random.RandomState] = None
                     ) -> List[np.ndarray]:
    """Shuffle edges, split into n_parts nearly equal index ranges."""
    n = len(triples[0])
    rng = rng or np.random.RandomState(0)
    perm = rng.permutation(n)
    part_size = math.ceil(n / n_parts)
    return [perm[i * part_size:(i + 1) * part_size] for i in range(n_parts)]


def balanced_relation_partition(triples, n_parts: int):
    """Each relation lives entirely in one part; parts greedily balanced by
    edge count (reference BalancedRelationPartition, sampler.py:150-254).

    Returns (edge_parts, rel_parts, cross_part=False).
    """
    h, r, t = triples[0], triples[1], triples[2]
    uniq, counts = np.unique(r, return_counts=True)
    order = np.argsort(-counts)
    part_sizes = np.zeros(n_parts, np.int64)
    rel_parts: List[List[int]] = [[] for _ in range(n_parts)]
    assignment = np.zeros(int(uniq.max()) + 1 if len(uniq) else 1, np.int64)
    for idx in order:
        rel, cnt = uniq[idx], counts[idx]
        p = int(np.argmin(part_sizes))
        part_sizes[p] += cnt
        rel_parts[p].append(int(rel))
        assignment[rel] = p
    edge_part_of = assignment[r]
    edge_parts = [np.nonzero(edge_part_of == p)[0] for p in range(n_parts)]
    rel_parts = [np.asarray(sorted(rp), np.int64) for rp in rel_parts]
    return edge_parts, rel_parts, False


def soft_relation_partition(triples, n_parts: int, threshold: float = 0.05):
    """Relations with more than `threshold` of the per-part edge share are
    split across all parts ("cross" relations); the rest are pinned to one
    part, greedily balancing edge counts
    (reference SoftRelationPartition, sampler.py:32-148).

    Returns (edge_parts, rel_parts, cross_part, cross_rels).
    """
    h, r, t = triples[0], triples[1], triples[2]
    n = len(r)
    uniq, counts = np.unique(r, return_counts=True)
    # reference SoftRelationPartition (sampler.py:84-88):
    # cross iff count > min(threshold * E, E / n_parts)
    big = counts > min(threshold * n, n / n_parts)
    cross_rels = set(int(x) for x in uniq[big])

    part_sizes = np.zeros(n_parts, np.int64)
    rel_parts: List[List[int]] = [[] for _ in range(n_parts)]
    n_rel_max = int(uniq.max()) + 1 if len(uniq) else 1
    assignment = np.full(n_rel_max, -1, np.int64)
    order = np.argsort(-counts)
    for idx in order:
        rel, cnt = int(uniq[idx]), int(counts[idx])
        if rel in cross_rels:
            continue
        p = int(np.argmin(part_sizes))
        part_sizes[p] += cnt
        rel_parts[p].append(rel)
        assignment[rel] = p

    rng = np.random.RandomState(0)
    edge_parts: List[List[np.ndarray]] = [[] for _ in range(n_parts)]
    pinned = assignment[r]
    cross_mask = pinned < 0
    # pinned edges go to their relation's part
    for p in range(n_parts):
        edge_parts[p].append(np.nonzero(pinned == p)[0])
    # cross edges are spread to even out part sizes
    cross_idx = np.nonzero(cross_mask)[0]
    rng.shuffle(cross_idx)
    sizes = np.array([len(e[0]) for e in edge_parts], np.int64)
    target = (n + n_parts - 1) // n_parts
    start = 0
    for p in range(n_parts):
        take = max(0, target - int(sizes[p]))
        take = min(take, len(cross_idx) - start)
        edge_parts[p].append(cross_idx[start:start + take])
        start += take
    # leftovers round-robin
    p = 0
    while start < len(cross_idx):
        edge_parts[p % n_parts].append(cross_idx[start:start + 1])
        start += 1
        p += 1
    edge_parts = [np.concatenate(e) for e in edge_parts]
    # every part also owns the cross relations
    rel_parts = [np.asarray(sorted(rp + list(cross_rels)), np.int64)
                 for rp in rel_parts]
    return edge_parts, rel_parts, len(cross_rels) > 0, sorted(cross_rels)


def partition_for_host(dataset: KGDataset, rank: int, n_parts: int,
                       rel_part: bool = False) -> KGDataset:
    """This host's locality-aware slice of the training edges — the in-situ
    fallback when ``--dist`` runs WITHOUT offline ``dglke_tpu-partition``
    artifacts.  Mirrors the reference's per-rank sampler feed
    (dataloader/sampler.py:346-419 + train.py's TrainDataset): ``rel_part``
    selects soft relation partitioning (each relation pinned to one rank so
    its rows stay hot in that rank's update stream; heavy relations cross),
    otherwise a seeded random split.  Eval splits and id maps stay global —
    eval already strides by rank.

    Every host must call this with the SAME dataset (the partition is
    deterministic; there is no coordination).
    """
    if n_parts <= 1:
        return dataset
    if rel_part:
        edge_parts, _, _, _ = soft_relation_partition(dataset.train, n_parts)
    else:
        edge_parts = random_partition(dataset.train, n_parts)
    idx = np.sort(edge_parts[rank])
    if len(idx) == 0:
        raise ValueError(
            f"host {rank}/{n_parts} received an empty edge partition "
            f"({dataset.n_train} train edges)")
    train = tuple(np.asarray(col)[idx] for col in dataset.train)
    import dataclasses as _dc
    return _dc.replace(dataset, train=train, train_partitioned=True)


# ---------------------------------------------------------------------------
# Training sampler


class TrainSampler:
    """Infinite sampler of chunked-negative batches over one edge partition.

    Equivalent to a (head, tail) pair of DGL EdgeSamplers wrapped in
    NewBidirectionalOneShotIterator: every call to ``next`` returns a batch
    alternating between head-corrupt and tail-corrupt negatives.
    """

    def __init__(self, dataset_or_triples, batch_size: int,
                 neg_sample_size: int, n_entities: Optional[int] = None,
                 edge_index: Optional[np.ndarray] = None, seed: int = 0,
                 shuffle: bool = True):
        if isinstance(dataset_or_triples, KGDataset):
            triples = dataset_or_triples.train
            n_entities = dataset_or_triples.n_entities
        else:
            triples = dataset_or_triples
            assert n_entities is not None
        self.h = np.ascontiguousarray(triples[0], np.int32)
        self.r = np.ascontiguousarray(triples[1], np.int32)
        self.t = np.ascontiguousarray(triples[2], np.int32)
        self.impts = (np.ascontiguousarray(triples[3], np.float32)
                      if len(triples) == 4 else None)
        if edge_index is not None:
            self.h = self.h[edge_index]
            self.r = self.r[edge_index]
            self.t = self.t[edge_index]
            if self.impts is not None:
                self.impts = self.impts[edge_index]
        self.n_edges = len(self.h)
        self.n_entities = n_entities
        self.batch_size = batch_size
        self.neg_sample_size = neg_sample_size
        self.chunk_size = (neg_sample_size if neg_sample_size < batch_size
                           else batch_size)
        self.num_chunks = max(1, batch_size // self.chunk_size)
        assert batch_size % self.chunk_size == 0, \
            "batch_size must be divisible by neg_sample_size"
        self.rng = np.random.RandomState(seed)
        self.shuffle = shuffle
        self._perm = None
        self._pos = 0
        self._neg_head = True  # alternates

    def _refill(self):
        self._perm = (self.rng.permutation(self.n_edges) if self.shuffle
                      else np.arange(self.n_edges))
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        b = self.batch_size
        if self._perm is None or self._pos + b > len(self._perm):
            self._refill()
            # partitions smaller than a batch wrap around
            while len(self._perm) < b:
                self._perm = np.concatenate(
                    [self._perm, self.rng.permutation(self.n_edges)])
        idx = self._perm[self._pos:self._pos + b]
        self._pos += b
        neg = self.rng.randint(
            0, self.n_entities,
            self.num_chunks * self.neg_sample_size).astype(np.int32)
        neg_head = self._neg_head
        self._neg_head = not self._neg_head
        batch = {
            "h": self.h[idx], "r": self.r[idx], "t": self.t[idx],
            "neg": neg, "neg_head": neg_head,
            "impts": self.impts[idx] if self.impts is not None else None,
        }
        return batch


class SuperbatchSampler:
    """Stacks `steps_per_call` consecutive TrainSampler batches into one
    packed [S, 3B + C*K] int32 array (+ [S, B] impts) for the multi-step
    scan kernel.  Row parity encodes corruption side: even rows head-corrupt,
    odd rows tail-corrupt (TrainSampler's alternation).

    Vectorized: draws all S batches' positives and negatives with single
    numpy calls — the host must keep up with a sub-100us device step."""

    def __init__(self, sampler: "TrainSampler", steps_per_call: int):
        assert steps_per_call % 2 == 0
        assert sampler._neg_head, "sampler must start on a head-corrupt batch"
        self.sampler = sampler
        self.s = steps_per_call

    def __iter__(self):
        return self

    def __next__(self):
        sp = self.sampler
        s, b = self.s, sp.batch_size
        need = s * b
        chunks = []
        while need > 0:
            if sp._perm is None or sp._pos >= len(sp._perm):
                sp._refill()
                while len(sp._perm) < b:
                    sp._perm = np.concatenate(
                        [sp._perm, sp.rng.permutation(sp.n_edges)])
            take = min(need, len(sp._perm) - sp._pos)
            chunks.append(sp._perm[sp._pos:sp._pos + take])
            sp._pos += take
            need -= take
        idx = np.concatenate(chunks).reshape(s, b)
        neg = sp.rng.randint(
            0, sp.n_entities,
            (s, sp.num_chunks * sp.neg_sample_size)).astype(np.int32)
        packed = np.concatenate(
            [sp.h[idx], sp.r[idx], sp.t[idx], neg], axis=1).astype(np.int32)
        out = {"packed": packed, "n_steps": s, "impts": None}
        if sp.impts is not None:
            out["impts"] = sp.impts[idx]
        return out


# ---------------------------------------------------------------------------
# Evaluation: filter index + samplers


class FilterIndex:
    """Sorted-key lookup of all true (h,r)->tails and (r,t)->heads over
    train+valid+test — the reference builds this as a DGL graph and asks the
    C++ EdgeSampler for false-negative masks; here it is two sorted numpy
    arrays + searchsorted, O(log N) per query and trivially shardable."""

    def __init__(self, dataset: KGDataset):
        hs, rs, ts = [], [], []
        for split in (dataset.train, dataset.valid, dataset.test):
            if split is None:
                continue
            hs.append(split[0])
            rs.append(split[1])
            ts.append(split[2])
        h = np.concatenate(hs).astype(np.int64)
        r = np.concatenate(rs).astype(np.int64)
        t = np.concatenate(ts).astype(np.int64)
        nr = dataset.n_relations

        # secondary sort by value id so each key's list is itself sorted —
        # membership tests (sampled-negative false-neg masks) then reduce
        # to a searchsorted within the key's range.  Duplicate (key, value)
        # pairs (the same triple in several splits / repeated edges) are
        # dropped: the full-ranking eval SUBTRACTS the filtered count from
        # the total, so a duplicate would be subtracted twice and deflate
        # the rank (the reference's masked-score filtering is idempotent
        # per entity, general_models.py:463-471 — ours must be too).
        def _sorted_unique(keys, vals):
            order = np.lexsort((vals, keys))
            keys, vals = keys[order], vals[order]
            if len(keys):
                fresh = np.empty(len(keys), bool)
                fresh[0] = True
                np.logical_or(keys[1:] != keys[:-1],
                              vals[1:] != vals[:-1], out=fresh[1:])
                keys, vals = keys[fresh], vals[fresh]
            return keys, vals.astype(np.int32)

        self._hr_keys, self._hr_tails = _sorted_unique(h * nr + r, t)
        self._tr_keys, self._tr_heads = _sorted_unique(t * nr + r, h)
        self._nr = nr
        self._ne = dataset.n_entities

    def true_tails(self, h: int, r: int) -> np.ndarray:
        k = h * self._nr + r
        lo = np.searchsorted(self._hr_keys, k, "left")
        hi = np.searchsorted(self._hr_keys, k, "right")
        return self._hr_tails[lo:hi]

    def true_heads(self, r: int, t: int) -> np.ndarray:
        k = t * self._nr + r
        lo = np.searchsorted(self._tr_keys, k, "left")
        hi = np.searchsorted(self._tr_keys, k, "right")
        return self._tr_heads[lo:hi]

    def _bounds(self, mode: str, h, r, t):
        """Vectorized range lookup: (values, lo [B], hi [B]) where
        values[lo[i]:hi[i]] are row i's true heads (mode='head') or tails."""
        if mode == "head":
            keys, values = self._tr_keys, self._tr_heads
            q = np.asarray(t, np.int64) * self._nr + np.asarray(r, np.int64)
        else:
            keys, values = self._hr_keys, self._hr_tails
            q = np.asarray(h, np.int64) * self._nr + np.asarray(r, np.int64)
        lo = np.searchsorted(keys, q, "left")
        hi = np.searchsorted(keys, q, "right")
        return values, lo, hi

    def padded_lists(self, mode: str, h, r, t, pad_width=None):
        """Padded per-row true-entity lists for a whole batch in ONE
        vectorized pass (ids [B, F] int32, mask [B, F] uint8) — replaces
        the per-row python loop the reference's C++ EdgeSampler hid
        (sampler.py:540-551 return_false_neg)."""
        values, lo, hi = self._bounds(mode, h, r, t)
        widths = hi - lo
        f = pad_width or _pad_bucket(max(1, int(widths.max(initial=0))))
        idx = lo[:, None] + np.arange(f)[None, :]
        vals = values[np.minimum(idx, len(values) - 1)]
        keep = np.arange(f)[None, :] < widths[:, None]
        # masks are consumed only via `> 0` comparisons; uint8 quarters
        # the host->device transfer (the eval payload's biggest tensor)
        return (np.where(keep, vals, 0).astype(np.int32),
                keep.astype(np.uint8))

    def false_neg_mask(self, mode: str, h, r, t, neg: np.ndarray):
        """[B, K] uint8 keep-mask over shared negative candidates `neg`:
        0 where (neg_j) forms a TRUE triple with row i (a false negative to
        exclude from ranking), 1 otherwise — consumers compare `> 0`, never
        multiply.  Mirrors the reference EdgeSampler's return_false_neg
        bias (sampler.py:563-591)."""
        values, lo, hi = self._bounds(mode, h, r, t)
        widths = hi - lo
        b, k = len(lo), len(neg)
        # One vectorized pass for all B x K membership queries: each row's
        # true-entity list is value-sorted (FilterIndex construction), so
        # padding rows to the batch max width with an out-of-range sentinel
        # (n_entities) and offsetting row i into its own disjoint integer
        # block [i*stride, (i+1)*stride) yields one GLOBALLY sorted flat
        # array -> a single searchsorted answers every (row, neg) query.
        f = max(1, int(widths.max(initial=0)))
        idx = lo[:, None] + np.arange(f)[None, :]
        vals = values[np.minimum(idx, max(len(values) - 1, 0))].astype(
            np.int64) if len(values) else np.zeros((b, f), np.int64)
        pad = np.arange(f)[None, :] >= widths[:, None]
        vals[pad] = self._ne
        stride = np.int64(self._ne) + 1
        rows = np.arange(b, dtype=np.int64)[:, None] * stride
        flat = (vals + rows).ravel()
        q = (neg.astype(np.int64)[None, :] + rows).ravel()
        pos = np.searchsorted(flat, q)
        member = (pos < flat.size) & (flat[np.minimum(pos, flat.size - 1)]
                                      == q)
        keep = np.ones(b * k, np.uint8)
        keep[member] = 0
        return keep.reshape(b, k)


def _pad_bucket(n: int) -> int:
    """Pad filter-list width to a power-of-two bucket to bound the number of
    distinct jit specializations."""
    return max(8, 1 << (n - 1).bit_length())


class EvalSampler:
    """Batches of eval triples with padded filtered-id lists.

    mode: 'head' corrupts heads, 'tail' corrupts tails (the reference's
    chunk-head / chunk-tail eval samplers). Per-rank striding via
    (rank, ranks).  Yields dicts with h/r/t [B] plus filter_ids/filter_mask
    [B, F] when filtering is on.

    neg_sample_size > 0 and < n_entities selects SAMPLED-negative eval
    (the reference's --neg_sample_size_eval protocol, e.g. wikikg2 K=500):
    each batch additionally carries `neg` [K] — one shared uniform draw for
    the whole batch, matching the reference's one-chunk eval batches
    (create_neg_subgraph, sampler.py:495-501: B < chunk_size => num_chunks=1)
    — plus, when filtering, `neg_keep` [B, K] (the EdgeSampler's
    return_false_neg bias, sampler.py:563-591).  neg_deg_sample adds the
    batch's own corrupted-side entities as extra candidates downstream
    (general_models.py:395-434); it requires filtering OFF, as the
    reference asserts (train.py:105).
    """

    def __init__(self, dataset: KGDataset, split: str, batch_size: int,
                 mode: str, filter_index: Optional[FilterIndex] = None,
                 eval_percent: float = 1.0, rank: int = 0, ranks: int = 1,
                 seed: int = 0, neg_sample_size: int = -1,
                 neg_deg_sample: bool = False):
        triples = getattr(dataset, split)
        assert triples is not None, f"dataset has no {split} split"
        h, r, t = (np.asarray(triples[0], np.int64),
                   np.asarray(triples[1], np.int64),
                   np.asarray(triples[2], np.int64))
        n = len(h)
        idx = np.arange(n)
        if eval_percent < 1.0:
            rng = np.random.RandomState(seed)
            idx = rng.permutation(n)[:max(1, int(n * eval_percent))]
            idx = np.sort(idx)
        idx = idx[rank::ranks]  # per-rank striding (sampler.py:772-775)
        self.h, self.r, self.t = h[idx], r[idx], t[idx]
        self.batch_size = batch_size
        self.mode = mode
        self.filter = filter_index
        self.n = len(self.h)
        self.n_entities = dataset.n_entities
        k = neg_sample_size if neg_sample_size is not None else -1
        self.neg_sample_size = k if 0 < k < self.n_entities else 0
        self.neg_deg_sample = neg_deg_sample
        if neg_deg_sample and filter_index is not None:
            # reference train.py:105: degree-based eval negatives cannot be
            # combined with positive-edge filtering
            raise ValueError("neg_deg_sample_eval requires --no_eval_filter")
        if neg_deg_sample and self.neg_sample_size == 0:
            raise ValueError(
                "neg_deg_sample_eval needs sampled negatives: set "
                "--neg_sample_size_eval < n_entities")
        # distinct per (rank, mode) so head/tail samplers and dist ranks
        # draw independent negatives
        self._rng = np.random.RandomState(
            (seed + 7919 * rank + (0 if mode == "head" else 104729))
            % (2**31 - 1))

    def __len__(self):
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        b = self.batch_size
        for start in range(0, self.n, b):
            h = self.h[start:start + b]
            r = self.r[start:start + b]
            t = self.t[start:start + b]
            nb = len(h)
            if nb < b:  # pad the tail batch by repeating row 0; mask later
                pad = b - nb
                h = np.concatenate([h, np.repeat(h[:1], pad)])
                r = np.concatenate([r, np.repeat(r[:1], pad)])
                t = np.concatenate([t, np.repeat(t[:1], pad)])
            out = {
                "h": h.astype(np.int32), "r": r.astype(np.int32),
                "t": t.astype(np.int32), "n_valid": nb,
                "neg_head": self.mode == "head",
            }
            if self.neg_sample_size > 0:
                neg = self._rng.randint(
                    0, self.n_entities, self.neg_sample_size
                ).astype(np.int32)
                out["neg"] = neg
                out["neg_deg_sample"] = self.neg_deg_sample
                if self.filter is not None:
                    out["neg_keep"] = self.filter.false_neg_mask(
                        self.mode, h, r, t, neg)
            elif self.filter is not None:
                ids, mask = self.filter.padded_lists(self.mode, h, r, t)
                out["filter_ids"] = ids
                out["filter_mask"] = mask
            yield out
