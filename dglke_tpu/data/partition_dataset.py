"""Loading of partitioned datasets for multi-host training.

Mirrors the reference's PartitionKGDataset / get_partition_dataset
(/root/reference/python/dglke/dataloader/KGDataset.py:146-185, 773-830):
each host loads its `partition_<rank>/` directory written by
`dglke_tpu-partition` — local-id triples, the local->global node map, the
global partition book, and the relation count.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class PartitionDataset:
    rank: int
    n_entities: int          # global entity count
    n_relations: int
    train: Tuple[np.ndarray, np.ndarray, np.ndarray]  # GLOBAL-id triples
    local_to_global: np.ndarray    # [n_local]
    partition_book: np.ndarray     # [n_entities] -> partition id

    @property
    def n_local(self) -> int:
        return len(self.local_to_global)


def load_partition(path: str, rank: int) -> PartitionDataset:
    pdir = os.path.join(path, f"partition_{rank}")
    if not os.path.isdir(pdir):
        pdir = path + str(rank)  # reference writes "<prefix>_<p>" flat
    l2g = np.loadtxt(os.path.join(pdir, "local_to_global.txt"),
                     dtype=np.int64, ndmin=1)
    with open(os.path.join(pdir, "relation_count.txt")) as f:
        n_relations = int(f.readline().strip())
    book = np.loadtxt(os.path.join(pdir, "partition_book.txt"),
                      dtype=np.int64, ndmin=1)
    tri = np.loadtxt(os.path.join(pdir, "train.txt"), dtype=np.int64,
                     ndmin=2)
    if tri.size == 0:
        # np.loadtxt on an empty file yields shape (0, 1); a clear error
        # beats the IndexError on tri[:, 1] — an edgeless partition
        # cannot feed a training host
        raise ValueError(
            f"partition {rank} ({pdir}) has no edges; repartition with a "
            f"smaller -k or a different method")
    h, r, t = tri[:, 0], tri[:, 1], tri[:, 2]
    # translate local ids back to global for the SPMD trainer (tables are
    # globally sharded; there is no per-machine KV namespace to hide)
    return PartitionDataset(rank=rank, n_entities=len(book),
                            n_relations=n_relations,
                            train=(l2g[h], r, l2g[t]),
                            local_to_global=l2g, partition_book=book)
