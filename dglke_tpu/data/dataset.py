"""Knowledge-graph dataset loading.

Covers the reference's dataset surface
(/root/reference/python/dglke/dataloader/KGDataset.py):

  * built-in datasets (FB15k, FB15k-237, wn18, wn18rr) in the
    entities.dict/relations.dict + name-triple layout;
  * Freebase layout (count-only headers, integer triples in h-t-r column
    order);
  * user-defined pre-mapped datasets ``udd_{hrt-permutation}``;
  * raw user-defined datasets ``raw_udd_{permutation}`` (string triples; the
    loader builds id maps and writes entities.tsv / relations.tsv);
  * custom delimiters and an optional 4th edge-importance column;
  * ogb datasets (wikikg2 / biokg) behind a gated import.

Missing built-in datasets are auto-downloaded like the reference
(KGDataset.py:197-213, stdlib urllib); on egress-less TPU pods the fetch
fails fast with an error that points at the expected local layout.
A synthetic generator used by tests and the benchmark lives here too.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

Triples = Tuple[np.ndarray, ...]  # (h, r, t) or (h, r, t, impts)


def _parse_hrt_format(fmt: str) -> List[int]:
    """'hrt' -> column positions of [head, rel, tail] in a data row
    (reference _parse_srd_format, KGDataset.py:48-66)."""
    perms = {
        "hrt": [0, 1, 2], "htr": [0, 2, 1], "rht": [1, 0, 2],
        "rth": [2, 0, 1], "thr": [1, 2, 0], "trh": [2, 1, 0],
    }
    if fmt not in perms:
        raise ValueError(f"unknown triple format {fmt!r}")
    return perms[fmt]


@dataclasses.dataclass
class KGDataset:
    name: str
    n_entities: int
    n_relations: int
    train: Triples
    valid: Optional[Triples] = None
    test: Optional[Triples] = None
    entity2id: Optional[Dict[str, int]] = None
    relation2id: Optional[Dict[str, int]] = None
    emap_fname: Optional[str] = None
    rmap_fname: Optional[str] = None
    # candidate-list eval splits (wikikg90M protocol): dicts of the form
    # {"h,r->t": {"hr": [N,2], "t_candidate": [N,K], "t_correct_index": [N]}}
    valid_dict: Optional[dict] = None
    test_dict: Optional[dict] = None
    # True when `train` is one host's partition_for_host slice: a filter
    # built from it would miss other hosts' edges (wrong filtered ranks)
    train_partitioned: bool = False

    @property
    def has_edge_importance(self) -> bool:
        return len(self.train) == 4

    @property
    def n_train(self) -> int:
        return len(self.train[0])


# ---------------------------------------------------------------------------
# File readers


def _read_id_map(path: str, delimiter: str = "\t",
                 id_first: bool = True) -> Dict[str, int]:
    """'id<delim>name' (built-in .dict files) or 'name<delim>id'."""
    out: Dict[str, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a, b = line.split(delimiter)
            if id_first:
                out[b] = int(a)
            else:
                out[a] = int(b)
    return out


def _read_name_triples(path: str, entity2id, relation2id, fmt: List[int],
                       delimiter: str = "\t", skip_first_line: bool = False,
                       has_importance: bool = False) -> Triples:
    heads, rels, tails, impts = [], [], [], []
    with open(path) as f:
        if skip_first_line:
            f.readline()
        for line in f:
            line = line.strip()
            if not line:
                continue
            cols = line.split(delimiter)
            heads.append(entity2id[cols[fmt[0]]])
            rels.append(relation2id[cols[fmt[1]]])
            tails.append(entity2id[cols[fmt[2]]])
            if has_importance:
                impts.append(float(cols[3]))
    out = (np.asarray(heads, np.int64), np.asarray(rels, np.int64),
           np.asarray(tails, np.int64))
    if has_importance:
        e = np.asarray(impts, np.float32)
        assert e.min() > 0.0, 'edge importance weights must be positive'
        return out + (e,)
    return out


def _read_int_triples(path: str, fmt: List[int], delimiter: str = "\t",
                      skip_first_line: bool = False,
                      has_importance: bool = False) -> Triples:
    cols_data: List[List] = [[], [], [], []]
    with open(path) as f:
        if skip_first_line:
            f.readline()
        for line in f:
            line = line.strip()
            if not line:
                continue
            cols = line.split(delimiter)
            try:
                cols_data[0].append(int(cols[fmt[0]]))
                cols_data[1].append(int(cols[fmt[1]]))
                cols_data[2].append(int(cols[fmt[2]]))
            except ValueError:
                raise ValueError(
                    "For a user-defined dataset, node ids and relation ids in "
                    f"the triples must be integers, got {cols!r}")
            if has_importance:
                cols_data[3].append(float(cols[3]))
    out = (np.asarray(cols_data[0], np.int64),
           np.asarray(cols_data[1], np.int64),
           np.asarray(cols_data[2], np.int64))
    if has_importance:
        e = np.asarray(cols_data[3], np.float32)
        assert e.min() > 0.0, 'edge importance weights must be positive'
        return out + (e,)
    return out


def _check_ranges(ds: KGDataset) -> KGDataset:
    for split in (ds.train, ds.valid, ds.test):
        if split is None:
            continue
        h, r, t = split[0], split[1], split[2]
        if len(h) == 0:
            continue
        assert h.max() < ds.n_entities and h.min() >= 0, \
            "Head node ID out of range"
        assert t.max() < ds.n_entities and t.min() >= 0, \
            "Tail node ID out of range"
        assert r.max() < ds.n_relations and r.min() >= 0, \
            "Relation ID out of range"
    return ds


# ---------------------------------------------------------------------------
# Built-in layouts


DATASET_URL = "https://data.dgl.ai/dataset/{}.zip"


def _download_and_extract(url: str, path: str, filename: str) -> None:
    """Fetch + unzip a built-in dataset archive (reference
    KGDataset.py:23-44 _download_and_extract, re-done with stdlib urllib —
    no requests dependency).  An already-downloaded archive is only
    re-fetched if it fails to unzip (same resume-on-corrupt loop)."""
    import urllib.request
    import zipfile

    fn = os.path.join(path, filename)
    for attempt in range(2):
        if os.path.exists(fn):
            try:
                with zipfile.ZipFile(fn) as zf:
                    zf.extractall(path)
                return
            except zipfile.BadZipFile:
                if attempt:
                    raise
                os.remove(fn)
        os.makedirs(path, exist_ok=True)
        tmp = fn + ".part"
        with urllib.request.urlopen(url, timeout=60) as r, \
                open(tmp, "wb") as w:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                w.write(chunk)
        os.replace(tmp, fn)


def load_builtin(data_path: str, name: str) -> KGDataset:
    path = os.path.join(data_path, name)
    if not os.path.exists(path):
        # mirror the reference's auto-download (KGDataset.py:197-213); in a
        # zero-egress environment this fails fast with a clear pointer to
        # the manual layout
        url = DATASET_URL.format(name)
        try:
            _download_and_extract(url, data_path, f"{name}.zip")
        except Exception as e:
            raise FileNotFoundError(
                f"Built-in dataset {name} not found at {path} and the "
                f"download from {url} failed ({type(e).__name__}: {e}). "
                "If this environment has no network egress, place the "
                "standard layout (entities.dict, relations.dict, "
                "train.txt, valid.txt, test.txt) there manually.") from e
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"downloaded archive for {name} did not contain a {path}/ "
            "directory — place the standard layout there manually")
    if name == "Freebase":
        return _load_freebase(path)
    e2i = _read_id_map(os.path.join(path, "entities.dict"))
    r2i = _read_id_map(os.path.join(path, "relations.dict"))
    fmt = [0, 1, 2]
    splits = {}
    for split in ("train", "valid", "test"):
        p = os.path.join(path, f"{split}.txt")
        splits[split] = (_read_name_triples(p, e2i, r2i, fmt)
                         if os.path.exists(p) else None)
    return _check_ranges(KGDataset(
        name=name, n_entities=len(e2i), n_relations=len(r2i),
        train=splits["train"], valid=splits["valid"], test=splits["test"],
        entity2id=e2i, relation2id=r2i,
        emap_fname="entities.dict", rmap_fname="relations.dict"))


def _load_freebase(path: str) -> KGDataset:
    """Freebase-86M layout: entity2id.txt / relation2id.txt carry a count-only
    first line; triples are integer rows in head-tail-rel column order
    (reference KGDatasetFreebase, KGDataset.py:333-400)."""
    with open(os.path.join(path, "entity2id.txt")) as f:
        n_entities = int(f.readline().strip())
    with open(os.path.join(path, "relation2id.txt")) as f:
        n_relations = int(f.readline().strip())
    fmt = [0, 2, 1]  # columns are h, t, r
    splits = {}
    for split in ("train", "valid", "test"):
        p = os.path.join(path, f"{split}.txt")
        splits[split] = (_read_int_triples(p, fmt) if os.path.exists(p)
                         else None)
    return _check_ranges(KGDataset(
        name="Freebase", n_entities=n_entities, n_relations=n_relations,
        train=splits["train"], valid=splits["valid"], test=splits["test"],
        emap_fname="entity2id.txt", rmap_fname="relation2id.txt"))


def _load_ogb(data_path: str, name: str) -> KGDataset:
    try:
        from ogb.linkproppred import LinkPropPredDataset  # noqa
    except ImportError as e:
        raise ImportError(
            f"Dataset {name} requires the `ogb` package, which is not "
            "installed in this environment.") from e
    dataset = LinkPropPredDataset(name=f"ogbl-{name}", root=data_path)
    split_edge = dataset.get_edge_split()
    train, valid, test = split_edge["train"], split_edge["valid"], split_edge["test"]
    g = dataset[0]
    n_entities = int(g["num_nodes"])
    # edge_reltype is [E, 1] in ogb's dict-graph, but np.max handles any
    # rank (the reference's max(...)[0] idiom, KGDataset.py:414, breaks on
    # a 1-D array)
    n_relations = int(np.max(np.asarray(g["edge_reltype"]))) + 1

    def tri(d):
        return (np.asarray(d["head"], np.int64),
                np.asarray(d["relation"], np.int64),
                np.asarray(d["tail"], np.int64))

    return KGDataset(name=name, n_entities=n_entities,
                     n_relations=n_relations, train=tri(train),
                     valid=tri(valid), test=tri(test))


def _load_wiki90m(data_path: str) -> KGDataset:
    """wikikg90M (OGB-LSC) with candidate-list eval splits (reference
    KGDatasetWiki90M, KGDataset.py:471-503): train is an [N,3] hrt array;
    valid/test are 'h,r->t' query dicts with 1001 tail candidates each."""
    try:
        from ogb.lsc import WikiKG90MDataset  # noqa
    except ImportError as e:
        raise ImportError(
            "Dataset wikikg90M requires the `ogb` package (ogb.lsc), "
            "which is not installed in this environment.") from e
    dataset = WikiKG90MDataset(data_path)
    hrt = np.asarray(dataset.train_hrt)
    return KGDataset(
        name="wikikg90M",
        n_entities=int(dataset.num_entities),
        n_relations=int(dataset.num_relations),
        train=(hrt[:, 0].astype(np.int64), hrt[:, 1].astype(np.int64),
               hrt[:, 2].astype(np.int64)),
        valid_dict=dataset.valid_dict,
        test_dict=dataset.test_dict)


# ---------------------------------------------------------------------------
# User-defined datasets


def load_udd(data_path: str, name: str, delimiter: str, files: List[str],
             fmt: str, has_edge_importance: bool = False) -> KGDataset:
    """Pre-mapped integer triples. files = [entity2id, relation2id, train
    [, valid, test]] (reference KGDatasetUDD, KGDataset.py:626-735)."""
    assert len(files) in (3, 5), (
        "udd_{htr} format requires 3 or 5 input files: entity2id, "
        "relation2id, train_file [, valid_file, test_file]")
    positions = _parse_hrt_format(fmt)

    def count_lines(p):
        with open(p) as f:
            return sum(1 for _ in f)

    n_entities = count_lines(os.path.join(data_path, files[0]))
    n_relations = count_lines(os.path.join(data_path, files[1]))
    train = _read_int_triples(os.path.join(data_path, files[2]), positions,
                              delimiter, has_importance=has_edge_importance)
    valid = test = None
    if len(files) == 5:
        valid = _read_int_triples(os.path.join(data_path, files[3]),
                                  positions, delimiter,
                                  has_importance=has_edge_importance)
        test = _read_int_triples(os.path.join(data_path, files[4]),
                                 positions, delimiter,
                                 has_importance=has_edge_importance)
    return _check_ranges(KGDataset(
        name=name, n_entities=n_entities, n_relations=n_relations,
        train=train, valid=valid, test=test,
        emap_fname=files[0], rmap_fname=files[1]))


def load_raw_udd(data_path: str, name: str, delimiter: str,
                 files: List[str], fmt: str,
                 has_edge_importance: bool = False) -> KGDataset:
    """String triples; builds id maps over all provided files in order of
    first appearance and writes entities.tsv / relations.tsv
    (reference KGDatasetUDDRaw, KGDataset.py:505-624)."""
    assert len(files) in (1, 3), (
        "raw_udd_{htr} format requires 1 or 3 input files: train_file "
        "[, valid_file, test_file]")
    positions = _parse_hrt_format(fmt)
    entity2id: Dict[str, int] = {}
    relation2id: Dict[str, int] = {}

    def get_id(m, k):
        if k not in m:
            m[k] = len(m)
        return m[k]

    for fi in files:
        with open(os.path.join(data_path, fi)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                cols = line.split(delimiter)
                get_id(entity2id, cols[positions[0]])
                get_id(relation2id, cols[positions[1]])
                get_id(entity2id, cols[positions[2]])

    with open(os.path.join(data_path, "entities.tsv"), "w") as f:
        f.writelines(f"{v}{delimiter}{k}\n" for k, v in entity2id.items())
    with open(os.path.join(data_path, "relations.tsv"), "w") as f:
        f.writelines(f"{v}{delimiter}{k}\n" for k, v in relation2id.items())

    def read(p):
        return _read_name_triples(os.path.join(data_path, p), entity2id,
                                  relation2id, positions, delimiter,
                                  has_importance=has_edge_importance)

    train = read(files[0])
    valid = read(files[1]) if len(files) == 3 else None
    test = read(files[2]) if len(files) == 3 else None
    return KGDataset(name=name, n_entities=len(entity2id),
                     n_relations=len(relation2id), train=train, valid=valid,
                     test=test, entity2id=entity2id, relation2id=relation2id,
                     emap_fname="entities.tsv", rmap_fname="relations.tsv")


# ---------------------------------------------------------------------------
# Dispatcher (reference get_dataset, KGDataset.py:738-771)


def get_dataset(data_path: str, data_name: str, format_str: str,
                delimiter: str = "\t", files: Optional[List[str]] = None,
                has_edge_importance: bool = False) -> KGDataset:
    if format_str == "built_in":
        if data_name in ("wikikg2", "biokg"):
            return _load_ogb(data_path, data_name)
        if data_name == "wikikg90M":
            return _load_wiki90m(data_path)
        return load_builtin(data_path, data_name)
    if format_str.startswith("raw_udd"):
        return load_raw_udd(data_path, data_name, delimiter, files,
                            format_str[len("raw_udd_"):], has_edge_importance)
    if format_str.startswith("udd"):
        return load_udd(data_path, data_name, delimiter, files,
                        format_str[len("udd_"):], has_edge_importance)
    raise ValueError(f"Unknown format {format_str}")


# ---------------------------------------------------------------------------
# Synthetic data (tests / benchmarks)


def synthetic_dataset(n_entities: int = 1000, n_relations: int = 20,
                      n_train: int = 20000, n_valid: int = 500,
                      n_test: int = 500, seed: int = 0,
                      name: str = "synthetic") -> KGDataset:
    """Random KG with mild structure (each relation biased to an entity
    block) so that embeddings are learnable above chance."""
    rng = np.random.RandomState(seed)

    def sample(n):
        r = rng.randint(0, n_relations, n)
        # heads drawn from a relation-dependent block to induce structure
        block = n_entities // n_relations or 1
        h = (r * block + rng.randint(0, max(1, block * 4), n)) % n_entities
        t = (h + r + 1 + rng.randint(0, 3, n)) % n_entities
        return h.astype(np.int64), r.astype(np.int64), t.astype(np.int64)

    return KGDataset(name=name, n_entities=n_entities,
                     n_relations=n_relations, train=sample(n_train),
                     valid=sample(n_valid), test=sample(n_test))


def planted_ring_big(n_clusters: int, ring_len: int, per: int = 4,
                     n_relations: int = 1, seed: int = 0,
                     n_test: int = 2000) -> KGDataset:
    """Vectorized scale-invariant "cycle" structure for the bilinear
    family: clusters form n_clusters/ring_len independent RINGS of
    ring_len; r_k maps ring position i -> (i+k+1) % ring_len (an
    asymmetric permutation, exactly what ComplEx/SimplE/RESCAL
    represent — planted_dataset("cycle") semantics per ring).  Parallel
    short rings keep the geometry local at any entity count, like
    planted_line_big's line_len."""
    rng = np.random.RandomState(seed)
    assert n_clusters % ring_len == 0 and n_relations < ring_len
    pos = np.arange(n_clusters, dtype=np.int32)
    base = pos - pos % ring_len
    ks, iis, jjs = [], [], []
    for k in range(n_relations):
        ks.append(np.full(n_clusters, k, np.int32))
        iis.append(pos)
        jjs.append(base + (pos % ring_len + k + 1) % ring_len)
    ks, iis, jjs = (np.concatenate(x) for x in (ks, iis, jjs))
    a = np.arange(per, dtype=np.int32)
    shape = (len(ks), per, per)
    h = np.broadcast_to((iis[:, None, None] * per
                         + a[None, :, None]), shape).reshape(-1)
    t = np.broadcast_to((jjs[:, None, None] * per
                         + a[None, None, :]), shape).reshape(-1)
    r = np.broadcast_to(ks[:, None, None], shape).reshape(-1)
    idx = rng.permutation(len(h))
    h, r, t = h[idx].copy(), r[idx].copy(), t[idx].copy()
    n_test = min(n_test, len(h) // 10)
    return KGDataset(name="planted_ring_big",
                     n_entities=n_clusters * per,
                     n_relations=n_relations,
                     train=(h[n_test:], r[n_test:], t[n_test:]),
                     test=(h[:n_test], r[:n_test], t[:n_test]))


def planted_line_big(n_clusters: int, per: int = 4, n_relations: int = 1,
                     seed: int = 0, n_test: int = 2000,
                     line_len: Optional[int] = None) -> KGDataset:
    """Vectorized Freebase-scale variant of planted_dataset("line"):
    r_k maps cluster i -> i+k+1 (complete bipartite between cluster
    pairs, no wraparound), built with numpy broadcasting so tens of
    millions of edges construct in seconds, and a FIXED-size test split
    (full-entity eval at 10M+ entities costs ~seconds per thousand
    edges; a fractional split would be millions).  Train arrays are
    int32 to halve host/HBM footprint at this scale.

    line_len: when set, clusters form n_clusters/line_len INDEPENDENT
    lines of line_len (edges never cross a line boundary; the shared
    relations act identically within every line).  This is the
    SCALE-INVARIANT form: a single line of millions of clusters forces
    TransE to stretch one chain of ~sqrt(C)·gamma extent from tiny-init
    embeddings — measured unlearnable past a few hundred clusters
    (MRR ~0.1 at C=4000) — while parallel short lines keep the geometry
    as local as the calibrated toy gate at ANY entity count.  Default
    (None) keeps the single-line behavior of planted_dataset("line")."""
    rng = np.random.RandomState(seed)
    ll = line_len or n_clusters
    assert n_relations < ll, "need line_len > n_relations"
    pos = np.arange(n_clusters, dtype=np.int32) % ll
    ks, iis, jjs = [], [], []
    for k in range(n_relations):
        c = np.nonzero(pos < ll - (k + 1))[0].astype(np.int32)
        ks.append(np.full(len(c), k, np.int32))
        iis.append(c)
        jjs.append(c + k + 1)
    ks = np.concatenate(ks)
    iis = np.concatenate(iis)
    jjs = np.concatenate(jjs)
    a = np.arange(per, dtype=np.int32)
    shape = (len(ks), per, per)
    h = np.broadcast_to((iis[:, None, None] * per
                         + a[None, :, None]), shape).reshape(-1)
    t = np.broadcast_to((jjs[:, None, None] * per
                         + a[None, None, :]), shape).reshape(-1)
    r = np.broadcast_to(ks[:, None, None], shape).reshape(-1)
    idx = rng.permutation(len(h))
    h, r, t = h[idx].copy(), r[idx].copy(), t[idx].copy()
    n_test = min(n_test, len(h) // 10)
    return KGDataset(name="planted_line_big",
                     n_entities=n_clusters * per,
                     n_relations=n_relations,
                     train=(h[n_test:], r[n_test:], t[n_test:]),
                     test=(h[:n_test], r[:n_test], t[:n_test]))


def planted_dataset(structure: str, n_clusters: int = 10, per: int = 6,
                    n_relations: int = 3, seed: int = 0,
                    test_frac: float = 0.15,
                    self_loops: bool = False) -> KGDataset:
    """Planted-structure KGs each model family provably SOLVES (filtered
    MRR ~1.0) — calibrated quality gates far stronger than the noisy
    `synthetic_dataset` thresholds.  Entities live in `n_clusters`
    clusters of `per`; edges are complete bipartite between cluster
    pairs, so filtered eval removes every other true answer and a model
    that learns the cluster map ranks the held-out edge first.

    structure:
      * "line": r_k maps cluster i -> i+k+1, NO wraparound — representable
        as a constant translation (TransE/TransR) or phase shift (RotatE).
        A cyclic variant would force the translation around the cycle to
        sum to zero, which TransE cannot satisfy.
      * "cliques": r_k connects all ordered pairs inside clusters with
        cluster % n_relations == k — a SYMMETRIC relation, the one kind
        DistMult (h^T diag(r) t, symmetric by construction) represents
        exactly.
      * "cycle": r_k maps cluster i -> (i+k+1) % n_clusters — an
        asymmetric permutation map, natural for the bilinear family
        (ComplEx/SimplE/RESCAL) which represents arbitrary cluster maps.
    """
    hs, rs, ts = [], [], []
    if structure == "line":
        for k in range(n_relations):
            for i in range(n_clusters - (k + 1)):
                for a in range(per):
                    for b in range(per):
                        hs.append(i * per + a)
                        rs.append(k)
                        ts.append((i + k + 1) * per + b)
    elif structure == "cliques":
        # self_loops=True additionally plants every (x, r, x) edge: a
        # SYMMETRIC model otherwise hits a structural MRR ceiling in
        # filtered eval — score(h,r,h) >= score(h,r,t) for clique-aligned
        # embeddings (Cauchy-Schwarz), and with no (h,r,h) train edge the
        # self candidate is unfiltered, tying every query to rank 2
        # (measured: DistMult plateaus at exactly MRR 0.75 at 16k
        # entities).  With the loops planted, the filter removes the self
        # candidate and rank 1 is reachable.
        for i in range(n_clusters):
            k = i % n_relations
            for a in range(per):
                for b in range(per):
                    if a != b or self_loops:
                        hs.append(i * per + a)
                        rs.append(k)
                        ts.append(i * per + b)
    elif structure == "cycle":
        for k in range(n_relations):
            for i in range(n_clusters):
                j = (i + k + 1) % n_clusters
                for a in range(per):
                    for b in range(per):
                        hs.append(i * per + a)
                        rs.append(k)
                        ts.append(j * per + b)
    else:
        raise ValueError(f"unknown planted structure {structure!r}")
    h = np.array(hs, np.int64)
    r = np.array(rs, np.int64)
    t = np.array(ts, np.int64)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(h))
    h, r, t = h[idx], r[idx], t[idx]
    n_test = int(len(h) * test_frac)
    return KGDataset(name=f"planted_{structure}",
                     n_entities=n_clusters * per, n_relations=n_relations,
                     train=(h[n_test:], r[n_test:], t[n_test:]),
                     test=(h[:n_test], r[:n_test], t[:n_test]))
