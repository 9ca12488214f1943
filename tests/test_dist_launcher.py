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
