"""True multi-process SPMD training: 2 processes x 2 virtual CPU devices,
entity table vocab-sharded over the 4-device global mesh, each process
feeding its own edge partition — the framework's parameter-server
replacement (SURVEY §2c P5) exercised end to end over real Gloo
collectives."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank,
                           cluster_detection_method="deactivate")
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import numpy as np
from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset, KGDataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import train
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.utils.io import save_model

full = synthetic_dataset(n_entities=201, n_relations=5, n_train=2000,
                         n_test=64, seed=3)
h, r, t = full.train
part = slice(rank, None, 2)               # this host's edge partition
ds = KGDataset(name="synthetic", n_entities=201, n_relations=5,
               train=(h[part], r[part], t[part]), test=full.test)

cfg = KGEConfig(model_name="TransE_l2", hidden_dim=16, gamma=6.0, lr=0.25,
                batch_size=64, neg_sample_size=16, max_step=30,
                log_interval=10, dataset="synthetic", seed=11)
plan = ShardingPlan(make_mesh(4), table_sharding="vocab")
model = KEModel(cfg, ds.n_entities, ds.n_relations)
lines = []
model, state, _ = train(cfg, ds, model=model, plan=plan,
                        log=lambda *a: lines.append(" ".join(map(str, a))))
assert int(state.step) == 30
# the --dist hot loop must run the fused device-resident pipeline
# (per-step host-fed dispatch would reintroduce the per-call latency
# the single-chip design eliminated); trainer logs ride rank 0 only
if rank == 0:
    assert any("device-resident pipeline" in ln for ln in lines), lines[:5]

# multi-host eval over the vocab-sharded table: batches are host-identical
# (unstrided — _global_eval), parallelism comes from the table axis inside
# make_sharded_eval_superstep, and every rank computes the same global
# metrics locally.  evaluate() without plan= must refuse (the strided
# batches would enter the global mesh inconsistently).
from dglke_tpu.trainer import evaluate
try:
    evaluate(cfg, ds, model, state, "test", log=lambda *a: None)
    raise AssertionError("evaluate without plan= should refuse on a "
                         "sharded table")
except ValueError as e:
    assert "requires plan=" in str(e), e
metrics = evaluate(cfg, ds, model, state, "test", log=lambda *a: None,
                   plan=plan)
assert 0.0 < metrics["MRR"] <= 1.0, metrics
print(f"rank {rank} MRR {metrics['MRR']:.6f}")

# collective sharded checkpoint (the Freebase-scale save): every process
# writes its own shards, then restores into the same sharded layout
from dglke_tpu.utils.io import load_sharded, save_sharded
save_sharded(state, outdir)
template = plan.put_state(model.init_state(jax.random.PRNGKey(cfg.seed)))
restored = load_sharded(template, outdir)
for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
    # multi-process arrays are not fully addressable: compare the shards
    # THIS process owns
    for sg, sw in zip(got.addressable_shards, want.addressable_shards):
        np.testing.assert_array_equal(np.asarray(sg.data),
                                      np.asarray(sw.data))
print(f"rank {rank} sharded ckpt OK")

# replicate + save on rank 0 (the CLI's dist save path)
from jax.sharding import NamedSharding, PartitionSpec
rep = NamedSharding(plan.mesh, PartitionSpec())
state = jax.jit(lambda s: s,
                out_shardings=jax.tree.map(lambda _: rep, state))(state)
if rank == 0:
    save_model(cfg, model, state, save_path=outdir)
    emb = np.asarray(jax.device_get(state.entity.emb))
    assert np.isfinite(emb).all()
print(f"rank {rank} OK")
"""


# CLI-level worker: phase "train" runs `dglke_tpu-train --dist --rel_part
# --sharded_ckpt --table_sharding vocab` (per-host soft-relation edge
# partition computed IN SITU, no offline partition artifacts); phase "eval"
# runs `dglke_tpu-eval --dist` on the saved sharded checkpoint — the
# reference's multi-proc standalone test (eval.py:107-229).
_CLI_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
rank, port, root, phase = sys.argv[1:5]
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = rank

common = ["--model_name", "TransE_l2", "--dataset", "fakekg",
          "--data_path", os.path.join(root, "data"),
          "--format", "raw_udd_hrt",
          "--data_files", "train.txt", "valid.txt", "test.txt",
          "--hidden_dim", "8", "--gamma", "5.0",
          "--batch_size_eval", "8"]
if phase == "train":
    from dglke_tpu.cli.train import main
    rc = main(common + ["--batch_size", "32", "--neg_sample_size", "8",
                        "--lr", "0.3", "--max_step", "20",
                        "--log_interval", "10", "--dist", "--rel_part",
                        "--sharded_ckpt", "--table_sharding", "vocab",
                        "--save_path", os.path.join(root, "ckpts")])
else:
    from dglke_tpu.cli.eval import main
    rc = main(common + ["--model_path",
                        os.path.join(root, "ckpts", "TransE_l2_fakekg_0"),
                        "--dist", "--table_sharding", "vocab"])
assert rc == 0
print(f"rank {rank} {phase} OK")
"""


# Quality gate for the fused multi-host pipeline: a planted-structure KG
# (provably representable by TransE) partitioned across 2 hosts must still
# reach the calibrated single-process MRR gate — the fused device-resident
# --dist path has to LEARN equivalently, not merely run.
_QUALITY_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank,
                           cluster_detection_method="deactivate")
import numpy as np
from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import KGDataset, planted_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.trainer import evaluate, train

full = planted_dataset("line", n_clusters=10)
h, r, t = full.train
part = slice(rank, None, 2)
ds = KGDataset(name="planted", n_entities=full.n_entities,
               n_relations=full.n_relations,
               train=(h[part], r[part], t[part]), test=full.test)
# log_interval fences the dispatch queue every 200 steps: XLA:CPU's
# collective rendezvous wedges when ~1000 collective-bearing calls are
# queued with no host sync (TPU hardware queues don't have this issue)
cfg = KGEConfig(model_name="TransE_l2", hidden_dim=32, gamma=4.0, lr=0.25,
                batch_size=128, neg_sample_size=32, max_step=2000,
                log_interval=200, batch_size_eval=16,
                neg_adversarial_sampling=True, regularization_coef=1e-9,
                dataset="planted", seed=7)
plan = ShardingPlan(make_mesh(4), table_sharding="vocab")
model = KEModel(cfg, ds.n_entities, ds.n_relations)
lines = []
model, state, _ = train(cfg, ds, model=model, plan=plan,
                        log=lambda *a: lines.append(" ".join(map(str, a))))
if rank == 0:
    assert any("device-resident pipeline" in ln for ln in lines), lines[:5]
# filtered eval needs the FULL dataset's filter (identical on every rank
# under _global_eval)
metrics = evaluate(cfg, full, model, state, "test", log=lambda *a: None,
                   plan=plan)
assert metrics["MRR"] >= 0.85, metrics
print(f"rank {rank} quality OK MRR {metrics['MRR']:.4f}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(script_path, tmp_path, extra_args):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script_path), str(rank), str(port),
             str(tmp_path)] + extra_args,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo)
        for rank in (0, 1)
    ]
    return [p.communicate(timeout=540)[0].decode() for p in procs], procs


def test_dist_cli_train_then_eval(tmp_path):
    """Two-process CLI round trip: train --dist (in-situ soft relation
    partition via --rel_part, vocab-sharded tables, collective orbax save)
    then the standalone eval CLI with --dist on that checkpoint; both ranks
    must print identical global metrics."""
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    data.mkdir()
    rows = [f"e{rng.randint(80)}\tr{rng.randint(4)}\te{rng.randint(80)}"
            for _ in range(900)]
    (data / "train.txt").write_text("\n".join(rows[:800]) + "\n")
    (data / "valid.txt").write_text("\n".join(rows[800:850]) + "\n")
    (data / "test.txt").write_text("\n".join(rows[850:]) + "\n")

    worker = tmp_path / "cli_worker.py"
    worker.write_text(_CLI_WORKER)

    outs, procs = _run_pair(worker, tmp_path, ["train"])
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"train rank {rank} failed:\n{out}"
        assert f"rank {rank} train OK" in out, out
    # the CLI --dist hot loop runs the fused device-resident pipeline
    assert "device-resident pipeline" in outs[0], outs[0]
    # each host trained on its own soft-relation partition of the 800 edges
    import re
    sizes = [int(re.search(r"\|Train\|: (\d+)", o).group(1)) for o in outs]
    assert sum(sizes) == 800 and min(sizes) > 0, sizes
    assert (tmp_path / "ckpts" / "TransE_l2_fakekg_0"
            / "sharded_state").is_dir()

    outs, procs = _run_pair(worker, tmp_path, ["eval"])
    mrrs = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"eval rank {rank} failed:\n{out}"
        assert f"rank {rank} eval OK" in out, out
        mrrs += re.findall(r"Test average MRR: (\d+\.\d+)", out)
    # both ranks computed (and agree on) the global aggregated MRR
    assert len(mrrs) == 2 and mrrs[0] == mrrs[1], mrrs
    assert 0.0 < float(mrrs[0]) <= 1.0


def test_two_process_fused_pipeline_quality(tmp_path):
    """The fused multi-host device pipeline must reach the calibrated
    planted-structure quality gate (MRR >= 0.85) with each host feeding
    its own edge partition — quality parity with the single-process path,
    not just mechanical execution."""
    worker = tmp_path / "quality_worker.py"
    worker.write_text(_QUALITY_WORKER)
    outs, procs = _run_pair(worker, tmp_path, [])
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} quality OK" in out, out
    import re
    mrrs = sorted(re.findall(r"MRR (\d+\.\d+)", outs[0] + outs[1]))
    assert len(mrrs) == 2 and mrrs[0] == mrrs[1], mrrs


def test_two_process_vocab_sharded_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # sys.path[0] of the worker is /tmp (the script dir), so the package
    # must come from PYTHONPATH — don't rely on an editable install.
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} OK" in out, out
        assert f"rank {rank} sharded ckpt OK" in out, out
    # both ranks logged the SAME global MRR (cross-process aggregation)
    import re
    mrrs = sorted(re.findall(r"MRR (\d+\.\d+)", outs[0] + outs[1]))
    assert len(mrrs) == 2 and mrrs[0] == mrrs[1], mrrs

    # rank 0 persisted the UNPADDED table (201 rows, not 204)
    emb = np.load(tmp_path / "synthetic_TransE_l2_entity.npy")
    assert emb.shape == (201, 16)
    assert np.isfinite(emb).all()
