"""dist_train launcher unit tests: ip_config parsing, command construction,
and failure propagation with fail-fast termination (ssh replaced by a stub
via monkeypatched Popen)."""

import subprocess
import sys

from dglke_tpu.cli import dist_train


def test_read_ip_config(tmp_path):
    p = tmp_path / "ip_config.txt"
    p.write_text("10.0.0.1 30050 8\n10.0.0.2\n\n10.0.0.3 40000\n")
    hosts = dist_train.read_ip_config(str(p))
    assert hosts == [("10.0.0.1", 30050), ("10.0.0.2", 2379),
                     ("10.0.0.3", 40000)]


def test_construct_cmd():
    class A:
        path = "/work"
        num_hosts = 3
        train_args = ["--model_name", "TransE_l2", "--dataset", "FB15k"]
    cmd = dist_train.construct_cmd(A(), 2, "10.0.0.1:30050")
    assert "JAX_COORDINATOR_ADDRESS=10.0.0.1:30050" in cmd
    assert "JAX_NUM_PROCESSES=3" in cmd
    assert "JAX_PROCESS_ID=2" in cmd
    assert "--dist" in cmd and "--model_name TransE_l2" in cmd


def test_failure_propagates_and_terminates(tmp_path, monkeypatch):
    p = tmp_path / "ip_config.txt"
    p.write_text("h0\nh1\n")
    calls = []

    real_popen = subprocess.Popen

    def fake_popen(cmd, *a, **kw):
        # rank order: first launch sleeps forever, second fails fast
        rank = len(calls)
        calls.append(cmd)
        if rank == 0:
            return real_popen([sys.executable, "-c",
                               "import time; time.sleep(60)"])
        return real_popen([sys.executable, "-c", "raise SystemExit(3)"])

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    rc = dist_train.main(["--path", "/work", "--ip_config", str(p),
                          "--", "--dataset", "FB15k"])
    assert rc == 3
    assert len(calls) == 2  # both ranks launched; survivor was terminated


def test_forwarding_without_separator(tmp_path, monkeypatch):
    """Flags forward with or without '--', quoted for the remote shell."""
    p = tmp_path / "ip_config.txt"
    p.write_text("h0\n")
    cmds = []
    real_popen = subprocess.Popen

    def fake_popen(cmd, *a, **kw):
        cmds.append(cmd)
        return real_popen([sys.executable, "-c", "pass"])

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    rc = dist_train.main(["--path", "/w w", "--ip_config", str(p),
                          "--model_name", "TransE_l2",
                          "--delimiter", "\t"])
    assert rc == 0
    remote = cmds[0][-1]
    assert "--model_name TransE_l2" in remote
    assert "'/w w'" in remote            # path with space is quoted
    assert "'\t'" in remote              # tab delimiter survives quoting
    assert " -- " not in remote          # no stray separator forwarded

    cmds.clear()
    rc = dist_train.main(["--path", "/w", "--ip_config", str(p), "--",
                          "--dataset", "FB15k"])
    assert rc == 0
    assert "-- --dataset" not in cmds[0][-1]
    assert "--dataset FB15k" in cmds[0][-1]


def test_empty_partition_clear_error(tmp_path):
    from dglke_tpu.data.partition_dataset import load_partition
    import numpy as np
    pdir = tmp_path / "partition_0"
    pdir.mkdir()
    (pdir / "train.txt").write_text("")
    np.savetxt(pdir / "local_to_global.txt", np.arange(3), fmt="%d")
    (pdir / "relation_count.txt").write_text("2\n")
    np.savetxt(pdir / "partition_book.txt", np.zeros(3), fmt="%d")
    import pytest
    import warnings
    with pytest.raises(ValueError, match="no edges"), \
            warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)  # loadtxt empty-file
        load_partition(str(tmp_path), 0)
