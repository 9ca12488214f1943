"""Native C++ LDG partitioner vs numpy fallback invariants."""

import numpy as np
import pytest

from dglke_tpu.data import native
from dglke_tpu.data.partition_graph import ldg_partition

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _clustered_graph(seed=0, n_nodes=400, k=4, p_in=0.05, p_out=0.002):
    """Planted-partition graph: LDG should recover most intra-cluster edges."""
    r = np.random.default_rng(seed)
    blocks = np.repeat(np.arange(k), n_nodes // k)
    hs, ts = [], []
    n_edges = 4000
    while len(hs) < n_edges:
        a, b = r.integers(0, n_nodes, 2)
        if a == b:
            continue
        prob = p_in if blocks[a] == blocks[b] else p_out
        if r.random() < prob * 10:
            hs.append(a)
            ts.append(b)
    return np.asarray(hs, np.int64), np.asarray(ts, np.int64), n_nodes


def test_native_ldg_assigns_all_and_balances():
    h, t, n = _clustered_graph()
    assign, cut = native.ldg_partition_native(h, t, n, 4, seed=1)
    assert assign.shape == (n,)
    assert assign.min() >= 0 and assign.max() < 4
    sizes = np.bincount(assign, minlength=4)
    assert sizes.max() <= 1.5 * n / 4          # LDG capacity discount holds
    # reported cut matches the assignment
    assert cut == int(np.sum(assign[h] != assign[t]))


def test_native_ldg_deterministic():
    h, t, n = _clustered_graph(seed=3)
    a1, c1 = native.ldg_partition_native(h, t, n, 4, seed=7)
    a2, c2 = native.ldg_partition_native(h, t, n, 4, seed=7)
    np.testing.assert_array_equal(a1, a2)
    assert c1 == c2


def test_native_ldg_beats_random_cut():
    h, t, n = _clustered_graph(seed=5)
    _, cut = native.ldg_partition_native(h, t, n, 4, seed=2)
    r = np.random.default_rng(0)
    rand_assign = r.integers(0, 4, n)
    rand_cut = int(np.sum(rand_assign[h] != rand_assign[t]))
    assert cut < rand_cut


def test_native_matches_numpy_quality():
    """Same algorithm, different RNG stream: cut quality should be close."""
    h, t, n = _clustered_graph(seed=9)
    _, native_cut = native.ldg_partition_native(h, t, n, 4, seed=0)
    np_assign = ldg_partition(h, t, n, 4, seed=0)
    np_cut = int(np.sum(np_assign[h] != np_assign[t]))
    assert native_cut <= max(1.3 * np_cut, np_cut + 50)


def test_native_partition_rejects_bad_ids():
    import pytest
    from dglke_tpu.data import native
    if not native.available():
        pytest.skip("native library not built")
    import numpy as np
    h = np.array([0, 99], np.int64)   # id 99 out of range for n_nodes=10
    t = np.array([1, 2], np.int64)
    with pytest.raises(ValueError):
        native.ldg_partition_native(h, t, 10, 2, 0)
