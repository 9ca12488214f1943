"""CLI integration smoke tests (mirrors tests/scripts/task_kg_test.sh in the
reference): train -> eval -> predict -> emb_sim end to end over a fake
raw_udd dataset fixture, exercising the checkpoint artifacts on disk."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fake_udd"))
    rng = np.random.RandomState(0)
    ents = [f"e{i}" for i in range(40)]
    rels = [f"r{i}" for i in range(4)]
    rows = []
    for _ in range(600):
        h = rng.randint(40)
        r = rng.randint(4)
        t = (h + r + 1) % 40
        rows.append(f"{ents[h]}\t{rels[r]}\t{ents[t]}")
    with open(os.path.join(d, "train.txt"), "w") as f:
        f.write("\n".join(rows[:500]) + "\n")
    with open(os.path.join(d, "valid.txt"), "w") as f:
        f.write("\n".join(rows[500:550]) + "\n")
    with open(os.path.join(d, "test.txt"), "w") as f:
        f.write("\n".join(rows[550:]) + "\n")
    return d


@pytest.fixture(scope="module")
def trained_ckpt(fake_data, tmp_path_factory):
    from dglke_tpu.cli.train import main as train_main
    save_root = str(tmp_path_factory.mktemp("ckpts"))
    rc = train_main([
        "--model_name", "TransE_l2", "--dataset", "fakekg",
        "--data_path", fake_data, "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "--batch_size", "64", "--neg_sample_size", "16",
        "--hidden_dim", "16", "--gamma", "5.0", "--lr", "0.3",
        "--max_step", "200", "--log_interval", "100",
        "--batch_size_eval", "8", "-adv", "--test",
        "--save_path", save_root,
    ])
    assert rc == 0
    ckpt = os.path.join(save_root, "TransE_l2_fakekg_0")
    assert os.path.exists(os.path.join(ckpt, "config.json"))
    assert os.path.exists(
        os.path.join(ckpt, "fakekg_TransE_l2_entity.npy"))
    return ckpt


def test_train_cli(trained_ckpt):
    pass  # fixture does the work


def test_train_eval_cli_mix_cpu_gpu(fake_data, tmp_path, capsys):
    """--mix_cpu_gpu trains with host-resident tables through the full
    CLI, writes the standard npy artifact, and dglke_tpu-eval adopts the
    host path from the saved config (host_table.py)."""
    from dglke_tpu.cli.eval import main as eval_main
    from dglke_tpu.cli.train import main as train_main

    save_root = str(tmp_path / "ckpts")
    rc = train_main([
        "--model_name", "TransE_l2", "--dataset", "fakekg",
        "--data_path", fake_data, "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "--batch_size", "64", "--neg_sample_size", "16",
        "--hidden_dim", "16", "--gamma", "5.0", "--lr", "0.3",
        "--max_step", "200", "--log_interval", "100",
        "--batch_size_eval", "8", "-adv", "--test", "--mix_cpu_gpu",
        "--save_path", save_root,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Test average MRR" in out
    ckpt = os.path.join(save_root, "TransE_l2_fakekg_0")
    assert os.path.exists(
        os.path.join(ckpt, "fakekg_TransE_l2_entity.npy"))
    rc = eval_main([
        "--dataset", "fakekg", "--data_path", fake_data,
        "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "--model_path", ckpt,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # the saved config carries mix_cpu_gpu=true; eval must actually take
    # the host-table branch (not just happen to print metrics via the
    # device path)
    assert "host-resident tables" in out, out
    assert "Test average MRR" in out
    # --no_mix_cpu_gpu overrides the saved config: same checkpoint
    # evaluates on device tables (the documented HBM interchange)
    rc = eval_main([
        "--dataset", "fakekg", "--data_path", fake_data,
        "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "--model_path", ckpt, "--no_mix_cpu_gpu",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "host-resident tables" not in out, out
    assert "Test average MRR" in out


def test_eval_cli(fake_data, trained_ckpt, capsys):
    from dglke_tpu.cli.eval import main as eval_main
    rc = eval_main([
        "--dataset", "fakekg", "--data_path", fake_data,
        "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "--model_path", trained_ckpt,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Test average MRR" in out


def test_eval_cli_vocab_sharding_engages_on_dense_ckpt(
        fake_data, trained_ckpt, capsys):
    """--table_sharding vocab on a dense .npy checkpoint must shard the
    restored table over the mesh (previously the flag was silently
    ignored and eval ran replicated) and reproduce identical metrics."""
    from dglke_tpu.cli.eval import main as eval_main
    args = [
        "--dataset", "fakekg", "--data_path", fake_data,
        "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "--model_path", trained_ckpt,
    ]
    assert eval_main(args) == 0
    rep = capsys.readouterr().out
    assert eval_main(args + ["--table_sharding", "vocab"]) == 0
    voc = capsys.readouterr().out

    def metric(out, name):
        line = [ln for ln in out.splitlines() if f"average {name}" in ln]
        return float(line[0].split(":")[1])

    for name in ("MRR", "MR", "HITS@10"):
        assert metric(rep, name) == pytest.approx(metric(voc, name),
                                                  abs=1e-9)


def test_predict_cli(fake_data, trained_ckpt, tmp_path):
    from dglke_tpu.cli.predict import main as predict_main
    head_f = str(tmp_path / "head.list")
    rel_f = str(tmp_path / "rel.list")
    with open(head_f, "w") as f:
        f.write("1\n2\n3\n")
    with open(rel_f, "w") as f:
        f.write("0\n1\n")
    out_f = str(tmp_path / "result.tsv")
    rc = predict_main([
        "--model_path", trained_ckpt, "--format", "h_r_*",
        "--data_files", head_f, rel_f, "--topK", "5",
        "--output", out_f,
    ])
    assert rc == 0
    lines = open(out_f).read().strip().split("\n")
    assert lines[0] == "head\trel\ttail\tscore"
    assert len(lines) == 6


def test_predict_cli_raw_ids(fake_data, trained_ckpt, tmp_path):
    from dglke_tpu.cli.predict import main as predict_main
    head_f = str(tmp_path / "head.list")
    with open(head_f, "w") as f:
        f.write("e1\ne2\n")
    out_f = str(tmp_path / "result_raw.tsv")
    rc = predict_main([
        "--model_path", trained_ckpt, "--format", "h_*_*",
        "--data_files", head_f, "--raw_data",
        "--entity_mfile", os.path.join(fake_data, "entities.tsv"),
        "--rel_mfile", os.path.join(fake_data, "relations.tsv"),
        "--topK", "5", "--output", out_f,
    ])
    assert rc == 0
    lines = open(out_f).read().strip().split("\n")
    assert len(lines) == 6
    assert lines[1].split("\t")[0].startswith("e")  # raw names back


def test_emb_sim_cli(fake_data, trained_ckpt, tmp_path):
    from dglke_tpu.cli.emb_sim import main as emb_sim_main
    emb_file = os.path.join(trained_ckpt, "fakekg_TransE_l2_entity.npy")
    left_f = str(tmp_path / "left.list")
    with open(left_f, "w") as f:
        f.write("0\n1\n")
    out_f = str(tmp_path / "sim.tsv")
    rc = emb_sim_main([
        "--emb_file", emb_file, "--format", "l_*",
        "--data_files", left_f, "--topK", "4", "--output", out_f,
        "--exec_mode", "batch_left",
    ])
    assert rc == 0
    lines = open(out_f).read().strip().split("\n")
    assert len(lines) == 1 + 2 * 4


def test_partition_cli(fake_data, tmp_path):
    from dglke_tpu.cli.partition import main as partition_main
    rc = partition_main([
        "--data_path", fake_data, "--dataset", "fakekg",
        "--format", "raw_udd_hrt",
        "--data_files", "train.txt", "valid.txt", "test.txt",
        "-k", "2",
    ])
    assert rc == 0
    pdir = os.path.join(fake_data, "fakekg", "partition_0")
    assert os.path.exists(os.path.join(pdir, "train.txt"))
    assert os.path.exists(os.path.join(pdir, "local_to_global.txt"))
    assert os.path.exists(os.path.join(pdir, "partition_book.txt"))
    assert os.path.exists(os.path.join(pdir, "relation_count.txt"))

    # partition artifacts round-trip through the loader with global ids
    from dglke_tpu.data.partition_dataset import load_partition
    p0 = load_partition(os.path.join(fake_data, "fakekg"), 0)
    p1 = load_partition(os.path.join(fake_data, "fakekg"), 1)
    assert p0.n_entities == 40 and p0.n_relations == 4
    assert len(p0.train[0]) + len(p1.train[0]) == 500
    assert p0.train[0].max() < 40


def test_convert_cli(tmp_path):
    from dglke_tpu.cli.convert import main as convert_main
    d = str(tmp_path)
    with open(os.path.join(d, "train.txt"), "w") as f:
        f.write("a\tlikes\tb\nb\tknows\tc\n")
    rc = convert_main(["--data_path", d, "--data_files", "train.txt"])
    assert rc == 0
    out = open(os.path.join(d, "train_id.tsv")).read().strip().split("\n")
    assert out[0] == "0\t0\t1"


@pytest.fixture(scope="module")
def fake_udd_pipe(tmp_path_factory):
    """udd_hrt layout with '|' delimiter (reference task_kg_test.sh:96-104
    exercises udd + non-tab delimiters as full CLI pipelines)."""
    d = str(tmp_path_factory.mktemp("fake_udd_pipe"))
    rng = np.random.RandomState(1)
    with open(os.path.join(d, "e.tsv"), "w") as f:
        f.write("".join(f"e{i}|{i}\n" for i in range(30)))
    with open(os.path.join(d, "r.tsv"), "w") as f:
        f.write("".join(f"r{i}|{i}\n" for i in range(3)))
    def triples(n):
        return "".join(
            f"{rng.randint(30)}|{rng.randint(3)}|{rng.randint(30)}\n"
            for _ in range(n))
    for name, n in (("train.tsv", 300), ("valid.tsv", 30), ("test.tsv", 30)):
        with open(os.path.join(d, name), "w") as f:
            f.write(triples(n))
    return d


def test_udd_delimiter_train_eval_cli(fake_udd_pipe, tmp_path, capsys):
    from dglke_tpu.cli.train import main as train_main
    from dglke_tpu.cli.eval import main as eval_main
    save_root = str(tmp_path / "ckpts")
    common = [
        "--dataset", "uddkg", "--data_path", fake_udd_pipe,
        "--format", "udd_hrt", "--delimiter", "|",
        "--data_files", "e.tsv", "r.tsv", "train.tsv", "valid.tsv",
        "test.tsv",
    ]
    rc = train_main([
        "--model_name", "DistMult", "--batch_size", "32",
        "--neg_sample_size", "8", "--hidden_dim", "8", "--gamma", "10.0",
        "--lr", "0.2", "--max_step", "50", "--log_interval", "50",
        "--batch_size_eval", "8", "--save_path", save_root,
    ] + common)
    assert rc == 0
    ckpt = os.path.join(save_root, "DistMult_uddkg_0")
    rc = eval_main(["--model_path", ckpt] + common)
    assert rc == 0
    assert "Test average MRR" in capsys.readouterr().out


@pytest.mark.parametrize("mode", ["batch_head", "batch_rel", "batch_tail",
                                  "triplet_wise"])
def test_predict_cli_exec_modes(fake_data, trained_ckpt, tmp_path, mode):
    from dglke_tpu.cli.predict import main as predict_main
    head_f = str(tmp_path / "h.list")
    rel_f = str(tmp_path / "r.list")
    tail_f = str(tmp_path / "t.list")
    for p, ids in ((head_f, "1\n2\n"), (rel_f, "0\n1\n"),
                   (tail_f, "3\n4\n")):
        with open(p, "w") as f:
            f.write(ids)
    out_f = str(tmp_path / f"result_{mode}.tsv")
    rc = predict_main([
        "--model_path", trained_ckpt, "--format", "h_r_t",
        "--data_files", head_f, rel_f, tail_f,
        "--exec_mode", mode, "--topK", "2", "--output", out_f,
    ])
    assert rc == 0
    lines = open(out_f).read().strip().split("\n")
    assert lines[0] == "head\trel\ttail\tscore"
    assert len(lines) > 1


@pytest.mark.parametrize("sfunc", ["l2", "l1", "dot", "ext_jaccard"])
def test_emb_sim_cli_sim_funcs(trained_ckpt, tmp_path, sfunc):
    from dglke_tpu.cli.emb_sim import main as emb_sim_main
    emb_file = os.path.join(trained_ckpt, "fakekg_TransE_l2_entity.npy")
    left_f = str(tmp_path / "l.list")
    with open(left_f, "w") as f:
        f.write("0\n1\n")
    out_f = str(tmp_path / f"sim_{sfunc}.tsv")
    rc = emb_sim_main([
        "--emb_file", emb_file, "--format", "l_*", "--data_files", left_f,
        "--sim_func", sfunc, "--topK", "3", "--output", out_f,
        "--exec_mode", "batch_left",
    ])
    assert rc == 0
    assert len(open(out_f).read().strip().split("\n")) == 1 + 2 * 3


@pytest.mark.parametrize("fmt,files", [
    ("h_r_t", ("head", "rel", "tail")),
    ("h_*_t", ("head", "tail")),
    ("*_r_t", ("rel", "tail")),
    ("*_r_*", ("rel",)),
    ("*_*_t", ("tail",)),
])
def test_predict_cli_all_formats(trained_ckpt, tmp_path, fmt, files):
    """Remaining reference input formats (infer_score.py:27-77); h_r_* and
    h_*_* covered above."""
    from dglke_tpu.cli.predict import main as predict_main
    lists = {"head": "1\n2\n", "rel": "0\n1\n", "tail": "4\n5\n6\n"}
    paths = []
    for name in files:
        p = str(tmp_path / f"{name}.list")
        with open(p, "w") as f:
            f.write(lists[name])
        paths.append(p)
    out_f = str(tmp_path / "out.tsv")
    rc = predict_main([
        "--model_path", trained_ckpt, "--format", fmt,
        "--data_files", *paths, "--topK", "5", "--output", out_f,
    ])
    assert rc == 0
    lines = open(out_f).read().strip().split("\n")
    assert lines[0] == "head\trel\ttail\tscore"
    assert len(lines) == 6


@pytest.mark.parametrize("fmt,files,n_out", [
    ("l_r", ("left", "right"), 4),
    ("*_r", ("right",), 4),
    ("*", (), 4),
])
def test_emb_sim_cli_all_formats(trained_ckpt, tmp_path, fmt, files, n_out):
    """Remaining reference emb_sim formats (infer_emb_sim.py); l_* covered
    above."""
    from dglke_tpu.cli.emb_sim import main as emb_sim_main
    emb_file = os.path.join(trained_ckpt, "fakekg_TransE_l2_entity.npy")
    lists = {"left": "0\n1\n", "right": "3\n4\n5\n"}
    paths = []
    for name in files:
        p = str(tmp_path / f"{name}.list")
        with open(p, "w") as f:
            f.write(lists[name])
        paths.append(p)
    out_f = str(tmp_path / "sim.tsv")
    args = ["--emb_file", emb_file, "--format", fmt,
            "--topK", str(n_out), "--output", out_f]
    if paths:
        args += ["--data_files", *paths]
    rc = emb_sim_main(args)
    assert rc == 0
    lines = open(out_f).read().strip().split("\n")
    assert len(lines) >= 1 + n_out
