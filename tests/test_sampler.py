"""Sampler + partitioner + filter-index tests."""

import numpy as np

from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.data.sampler import (
    EvalSampler,
    FilterIndex,
    TrainSampler,
    balanced_relation_partition,
    random_partition,
    soft_relation_partition,
)


def test_train_sampler_shapes_and_alternation():
    ds = synthetic_dataset(100, 4, 1000)
    s = TrainSampler(ds, batch_size=64, neg_sample_size=16, seed=0)
    modes = []
    for _ in range(6):
        b = next(s)
        assert b["h"].shape == (64,) and b["r"].shape == (64,)
        assert b["neg"].shape == (64 // 16 * 16,)  # C*K = 4*16
        assert b["neg"].max() < 100
        modes.append(b["neg_head"])
    assert modes == [True, False, True, False, True, False]


def test_train_sampler_epoch_covers_all_edges():
    ds = synthetic_dataset(50, 2, 256)
    s = TrainSampler(ds, batch_size=64, neg_sample_size=16, seed=0)
    seen = []
    for _ in range(4):  # one epoch
        b = next(s)
        seen.append(np.stack([b["h"], b["r"], b["t"]], 1))
    seen = np.concatenate(seen)
    assert len(seen) == 256
    # every training edge appears exactly once per epoch
    all_edges = np.stack([ds.train[0], ds.train[1], ds.train[2]], 1)
    assert (np.sort(seen.view([("", seen.dtype)] * 3), axis=0)
            == np.sort(all_edges.astype(seen.dtype).view(
                [("", seen.dtype)] * 3), axis=0)).all()


def test_train_sampler_small_partition_wraps():
    ds = synthetic_dataset(50, 2, 40)
    s = TrainSampler(ds, batch_size=64, neg_sample_size=16, seed=0)
    b = next(s)
    assert b["h"].shape == (64,)


def test_random_partition_covers():
    ds = synthetic_dataset(50, 2, 1000)
    parts = random_partition(ds.train, 4)
    assert sum(len(p) for p in parts) == 1000
    assert len(np.unique(np.concatenate(parts))) == 1000


def test_balanced_relation_partition():
    ds = synthetic_dataset(50, 8, 2000)
    edge_parts, rel_parts, cross = balanced_relation_partition(ds.train, 4)
    assert not cross
    assert sum(len(p) for p in edge_parts) == 2000
    # each relation appears in exactly one part
    all_rels = np.concatenate(rel_parts)
    assert len(all_rels) == len(np.unique(all_rels))
    # each part's edges only use that part's relations
    r = ds.train[1]
    for ep, rp in zip(edge_parts, rel_parts):
        assert set(np.unique(r[ep])) <= set(rp.tolist())


def test_soft_relation_partition():
    ds = synthetic_dataset(50, 8, 2000)
    edge_parts, rel_parts, cross, cross_rels = soft_relation_partition(
        ds.train, 4)
    assert sum(len(p) for p in edge_parts) == 2000
    covered = np.unique(np.concatenate(edge_parts))
    assert len(covered) == 2000
    # sizes reasonably balanced
    sizes = [len(p) for p in edge_parts]
    assert max(sizes) - min(sizes) < 2000 // 4


def test_filter_index():
    ds = synthetic_dataset(60, 3, 500, 50, 50)
    fi = FilterIndex(ds)
    h, r, t = ds.train[0][0], ds.train[1][0], ds.train[2][0]
    tails = fi.true_tails(h, r)
    assert t in tails
    heads = fi.true_heads(r, t)
    assert h in heads
    # a (h, r) pair that never occurs -> empty
    assert len(fi.true_tails(59, 2)) == 0 or \
        ((ds.train[0] == 59) & (ds.train[1] == 2)).any() or \
        ((ds.valid[0] == 59) & (ds.valid[1] == 2)).any() or \
        ((ds.test[0] == 59) & (ds.test[1] == 2)).any()


def test_eval_sampler_batches_and_filters():
    ds = synthetic_dataset(60, 3, 500, 50, 50)
    fi = FilterIndex(ds)
    s = EvalSampler(ds, "test", batch_size=16, mode="tail", filter_index=fi)
    total = 0
    for batch in s:
        assert batch["h"].shape == (16,)
        total += batch["n_valid"]
        ids, mask = batch["filter_ids"], batch["filter_mask"]
        assert ids.shape == mask.shape
        # the true tail must be in each row's filter list
        for i in range(batch["n_valid"]):
            row = ids[i][mask[i] > 0]
            assert batch["t"][i] in row
    assert total == 50


def test_eval_sampler_striding():
    ds = synthetic_dataset(60, 3, 500, 50, 50)
    s0 = EvalSampler(ds, "test", 8, "tail", rank=0, ranks=2)
    s1 = EvalSampler(ds, "test", 8, "tail", rank=1, ranks=2)
    assert s0.n + s1.n == 50


def test_eval_percent():
    ds = synthetic_dataset(60, 3, 500, 50, 100)
    s = EvalSampler(ds, "test", 8, "tail", eval_percent=0.25)
    assert s.n == 25
