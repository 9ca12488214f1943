"""Dataset loader tests (mirrors the reference's test_dataset.py edge
cases: udd/raw_udd parsing, delimiters, field-order permutations,
non-integer errors, id-range asserts)."""

import os

import numpy as np
import pytest

from dglke_tpu.data.dataset import (
    get_dataset,
    load_raw_udd,
    load_udd,
    synthetic_dataset,
)


def write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def udd_dir(tmp_path):
    d = str(tmp_path)
    write(os.path.join(d, "entities.tsv"), [f"{i}\te{i}" for i in range(6)])
    write(os.path.join(d, "relations.tsv"), [f"{i}\tr{i}" for i in range(2)])
    write(os.path.join(d, "train.tsv"),
          ["0\t0\t1", "1\t1\t2", "2\t0\t3", "3\t1\t4", "4\t0\t5"])
    write(os.path.join(d, "valid.tsv"), ["0\t1\t2"])
    write(os.path.join(d, "test.tsv"), ["1\t0\t3"])
    return d


def test_udd_loading(udd_dir):
    ds = get_dataset(udd_dir, "mykg", "udd_hrt", "\t",
                     ["entities.tsv", "relations.tsv", "train.tsv",
                      "valid.tsv", "test.tsv"])
    assert ds.n_entities == 6 and ds.n_relations == 2
    assert len(ds.train[0]) == 5
    np.testing.assert_array_equal(ds.train[0], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(ds.train[1], [0, 1, 0, 1, 0])
    assert ds.valid is not None and ds.test is not None


def test_udd_htr_permutation(tmp_path):
    d = str(tmp_path)
    write(os.path.join(d, "e.tsv"), [f"{i}\te{i}" for i in range(4)])
    write(os.path.join(d, "r.tsv"), ["0\tr0"])
    # columns: head, tail, rel
    write(os.path.join(d, "train.tsv"), ["0\t1\t0", "2\t3\t0"])
    ds = load_udd(d, "kg", "\t", ["e.tsv", "r.tsv", "train.tsv"], "htr")
    np.testing.assert_array_equal(ds.train[0], [0, 2])  # heads
    np.testing.assert_array_equal(ds.train[1], [0, 0])  # rels
    np.testing.assert_array_equal(ds.train[2], [1, 3])  # tails


def test_udd_non_integer_raises(tmp_path):
    d = str(tmp_path)
    write(os.path.join(d, "e.tsv"), ["0\ta", "1\tb"])
    write(os.path.join(d, "r.tsv"), ["0\tr"])
    write(os.path.join(d, "train.tsv"), ["a\tr\tb"])
    with pytest.raises(ValueError):
        load_udd(d, "kg", "\t", ["e.tsv", "r.tsv", "train.tsv"], "hrt")


def test_udd_out_of_range_raises(tmp_path):
    d = str(tmp_path)
    write(os.path.join(d, "e.tsv"), ["0\ta", "1\tb"])
    write(os.path.join(d, "r.tsv"), ["0\tr"])
    write(os.path.join(d, "train.tsv"), ["0\t0\t7"])
    with pytest.raises(AssertionError):
        load_udd(d, "kg", "\t", ["e.tsv", "r.tsv", "train.tsv"], "hrt")


@pytest.mark.parametrize("delim", ["\t", "|", ";", ","])
def test_raw_udd_delimiters(tmp_path, delim):
    d = str(tmp_path)
    rows = [delim.join(x) for x in
            [("a", "likes", "b"), ("b", "likes", "c"), ("c", "knows", "a")]]
    write(os.path.join(d, "train.txt"), rows)
    ds = load_raw_udd(d, "kg", delim, ["train.txt"], "hrt")
    assert ds.n_entities == 3 and ds.n_relations == 2
    # id maps written for downstream tools
    assert os.path.exists(os.path.join(d, "entities.tsv"))
    assert os.path.exists(os.path.join(d, "relations.tsv"))
    # first-appearance ordering
    assert ds.entity2id["a"] == 0 and ds.relation2id["likes"] == 0


def test_raw_udd_three_files(tmp_path):
    d = str(tmp_path)
    write(os.path.join(d, "train.txt"), ["a\tr1\tb", "b\tr1\tc"])
    write(os.path.join(d, "valid.txt"), ["a\tr1\tc"])
    write(os.path.join(d, "test.txt"), ["c\tr1\ta"])
    ds = load_raw_udd(d, "kg", "\t", ["train.txt", "valid.txt", "test.txt"],
                      "hrt")
    assert ds.valid is not None and len(ds.valid[0]) == 1
    assert ds.test is not None


def test_edge_importance_column(tmp_path):
    d = str(tmp_path)
    write(os.path.join(d, "e.tsv"), ["0\ta", "1\tb"])
    write(os.path.join(d, "r.tsv"), ["0\tr"])
    write(os.path.join(d, "train.tsv"), ["0\t0\t1\t2.5", "1\t0\t0\t0.5"])
    ds = load_udd(d, "kg", "\t", ["e.tsv", "r.tsv", "train.tsv"], "hrt",
                  has_edge_importance=True)
    assert ds.has_edge_importance
    np.testing.assert_allclose(ds.train[3], [2.5, 0.5])


def test_builtin_layout(tmp_path):
    d = str(tmp_path / "FB15k")
    os.makedirs(d)
    write(os.path.join(d, "entities.dict"), ["0\t/m/a", "1\t/m/b",
                                             "2\t/m/c"])
    write(os.path.join(d, "relations.dict"), ["0\t/loc"])
    write(os.path.join(d, "train.txt"), ["/m/a\t/loc\t/m/b"])
    write(os.path.join(d, "valid.txt"), ["/m/b\t/loc\t/m/c"])
    write(os.path.join(d, "test.txt"), ["/m/c\t/loc\t/m/a"])
    ds = get_dataset(str(tmp_path), "FB15k", "built_in")
    assert ds.n_entities == 3
    np.testing.assert_array_equal(ds.train[0], [0])


def test_freebase_layout(tmp_path):
    d = str(tmp_path / "Freebase")
    os.makedirs(d)
    write(os.path.join(d, "entity2id.txt"), ["3"])
    write(os.path.join(d, "relation2id.txt"), ["2"])
    # columns h, t, r
    write(os.path.join(d, "train.txt"), ["0\t1\t0", "1\t2\t1"])
    ds = get_dataset(str(tmp_path), "Freebase", "built_in")
    assert ds.n_entities == 3 and ds.n_relations == 2
    np.testing.assert_array_equal(ds.train[1], [0, 1])  # rel from col 2
    np.testing.assert_array_equal(ds.train[2], [1, 2])  # tail from col 1


def test_synthetic():
    ds = synthetic_dataset(100, 4, 500, 50, 50)
    assert ds.train[0].max() < 100 and ds.train[1].max() < 4


def _make_builtin_zip(tmp_path, name="FB15k"):
    """Zip archive matching the reference's hosted layout: {name}/ with
    entities.dict etc at the top level."""
    import zipfile
    src = tmp_path / "src" / name
    os.makedirs(src)
    write(str(src / "entities.dict"), ["0\t/m/a", "1\t/m/b", "2\t/m/c"])
    write(str(src / "relations.dict"), ["0\t/loc"])
    write(str(src / "train.txt"), ["/m/a\t/loc\t/m/b"])
    write(str(src / "valid.txt"), ["/m/b\t/loc\t/m/c"])
    write(str(src / "test.txt"), ["/m/c\t/loc\t/m/a"])
    zpath = tmp_path / f"{name}.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in os.listdir(src):
            zf.write(src / f, arcname=f"{name}/{f}")
    return zpath


def test_builtin_auto_download(tmp_path, monkeypatch):
    """Missing built-in datasets are fetched + unzipped (the reference's
    _download_and_extract, KGDataset.py:23-44), via a stubbed urlopen."""
    import io
    import urllib.request
    zpath = _make_builtin_zip(tmp_path)
    urls = []

    def fake_urlopen(url, timeout=None):
        urls.append(url)
        return io.BytesIO(zpath.read_bytes())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    data_path = tmp_path / "data"
    ds = get_dataset(str(data_path), "FB15k", "built_in")
    assert ds.n_entities == 3
    assert urls == ["https://data.dgl.ai/dataset/FB15k.zip"]
    # second load: already on disk, no new fetch
    ds = get_dataset(str(data_path), "FB15k", "built_in")
    assert len(urls) == 1


def test_builtin_corrupt_archive_refetched(tmp_path, monkeypatch):
    import io
    import urllib.request
    zpath = _make_builtin_zip(tmp_path)
    data_path = tmp_path / "data"
    os.makedirs(data_path)
    (data_path / "FB15k.zip").write_bytes(b"not a zip")
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda url, timeout=None: io.BytesIO(zpath.read_bytes()))
    ds = get_dataset(str(data_path), "FB15k", "built_in")
    assert ds.n_entities == 3


def test_builtin_offline_clear_error(tmp_path, monkeypatch):
    import urllib.request

    def no_net(url, timeout=None):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    with pytest.raises(FileNotFoundError, match="no network egress"):
        get_dataset(str(tmp_path / "data"), "FB15k", "built_in")


def test_planted_line_big_matches_loop_generator():
    """The vectorized Freebase-scale generator builds the SAME edge set
    as planted_dataset('line') (so its MRR gates stay comparable), with
    int32 arrays and a fixed-size test split."""
    from dglke_tpu.data.dataset import planted_dataset, planted_line_big

    big = planted_line_big(n_clusters=10, per=6, n_relations=3, n_test=50)
    loop = planted_dataset("line", n_clusters=10, per=6, n_relations=3)

    def canon(ds):
        out = set()
        for part in (ds.train, ds.test):
            if part is None:
                continue
            out |= set(zip(part[0].tolist(), part[1].tolist(),
                           part[2].tolist()))
        return out

    assert canon(big) == canon(loop)
    assert big.train[0].dtype == np.int32
    assert len(big.test[0]) == 50
    assert big.n_entities == 60 and big.n_relations == 3


def test_planted_ring_big_matches_cycle_generator():
    """One full-size ring reproduces planted_dataset('cycle') exactly;
    split rings stay within ring boundaries."""
    from dglke_tpu.data.dataset import planted_dataset, planted_ring_big

    big = planted_ring_big(n_clusters=8, ring_len=8, per=6, n_relations=3,
                           n_test=40)
    loop = planted_dataset("cycle", n_clusters=8, per=6, n_relations=3)

    def canon(ds):
        out = set()
        for part in (ds.train, ds.test):
            if part is None:
                continue
            out |= set(zip(part[0].tolist(), part[1].tolist(),
                           part[2].tolist()))
        return out

    assert canon(big) == canon(loop)

    rings = planted_ring_big(n_clusters=20, ring_len=5, per=2,
                             n_relations=2, n_test=0)
    h, r, t = rings.train
    # no edge crosses a ring boundary (clusters of 5, entities of 10)
    assert ((h // 10) == (t // 10)).all()
