"""Multi-process coverage for the two NON-full-entity eval protocols —
sampled-negative eval (--neg_sample_size_eval) and candidate-list eval
(wikikg90M) — under BOTH dist table layouts:

  * replicated tables: per-rank strides + allgathered partial sums
    (reference EvalSampler striding, sampler.py:772-775 +
    train_pytorch.py:208-234);
  * vocab-sharded tables (_global_eval): host-IDENTICAL batches, global
    metrics computed on every rank.

The invariant under _global_eval was previously enforced by convention
only (VERDICT r3 weak #4); these tests enforce it by METRIC EQUALITY
with the single-process run:

  * vocab-sharded sampled eval uses the same seed => identical negative
    draws => metrics must EXACTLY equal single-process;
  * candidate eval has no negative RNG at all => exact equality in both
    layouts (strided recombination is the same float64 partial sums);
  * strided sampled eval draws rank-local negatives (per-(rank, mode)
    RNG, data/sampler.py:467-469) — same protocol, different sample —
    so it must agree across ranks exactly and with single-process
    within sampling noise.
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.data.sampler import FilterIndex
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import CandidateEvalSampler, evaluate, \
    evaluate_candidates

N_ENT, N_REL = 200, 7  # 200 % 4 == 0: same table padding on the 4-mesh
SEED = 11
K_EVAL = 32


def _dataset():
    return synthetic_dataset(n_entities=N_ENT, n_relations=N_REL,
                             n_train=1500, n_test=96, seed=3)


def _cfg():
    return KGEConfig(model_name="TransE_l2", hidden_dim=16, gamma=6.0,
                     batch_size_eval=16, neg_sample_size_eval=K_EVAL,
                     dataset="synthetic", seed=SEED)


def _candidates(ds):
    rng = np.random.RandomState(41)
    nq, k = 80, 50
    hr = np.stack([rng.randint(0, N_ENT, nq),
                   rng.randint(0, N_REL, nq)], axis=1)
    cand = rng.randint(0, N_ENT, (nq, k))
    ans = rng.randint(0, k, nq)
    return {"h,r->t": {"hr": hr, "t_candidate": cand,
                       "t_correct_index": ans}}


_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank,
                           cluster_detection_method="deactivate")
sys.path.insert(0, os.environ["DGLKE_REPO"])
from tests.test_dist_eval_modes import N_ENT, N_REL, SEED, _candidates, \
    _cfg, _dataset
from dglke_tpu.data.sampler import FilterIndex
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.trainer import CandidateEvalSampler, evaluate, \
    evaluate_candidates

ds = _dataset()
cfg = _cfg()
model = KEModel(cfg, ds.n_entities, ds.n_relations)
base_state = model.init_state(jax.random.PRNGKey(SEED))
fi = FilterIndex(ds)
out = {}

# --- vocab-sharded (_global_eval): identical batches on every rank ------
plan = ShardingPlan(make_mesh(4), table_sharding="vocab")
state = plan.put_state(base_state)
out["sampled_vocab"] = evaluate(cfg, ds, model, state, "test",
                                filter_index=fi, log=lambda *a: None,
                                plan=plan)
sampler = CandidateEvalSampler(_candidates(ds), cfg.batch_size_eval,
                               rank=0, ranks=1)  # unstrided: _global_eval
out["cand_vocab"] = evaluate_candidates(model, state, sampler,
                                        mode="Valid", log=lambda *a: None,
                                        plan=plan)

# --- replicated tables: per-rank strides + allgathered partial sums -----
out["sampled_strided"] = evaluate(cfg, ds, model, base_state, "test",
                                  filter_index=fi, log=lambda *a: None,
                                  plan=None)
sampler = CandidateEvalSampler(_candidates(ds), cfg.batch_size_eval,
                               rank=rank, ranks=2)
out["cand_strided"] = evaluate_candidates(model, base_state, sampler,
                                          mode="Valid",
                                          log=lambda *a: None, plan=None)
out = {k: {kk: float(vv) for kk, vv in v.items()} for k, v in out.items()}
print("RESULT" + str(rank) + json.dumps(out))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def single_process_metrics():
    ds = _dataset()
    cfg = _cfg()
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    state = model.init_state(jax.random.PRNGKey(SEED))
    fi = FilterIndex(ds)
    sampled = evaluate(cfg, ds, model, state, "test", filter_index=fi,
                       log=lambda *a: None)
    sampler = CandidateEvalSampler(_candidates(ds), cfg.batch_size_eval)
    cand = evaluate_candidates(model, state, sampler, mode="Valid",
                               log=lambda *a: None)
    return sampled, cand


@pytest.fixture(scope="module")
def dist_metrics(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("distev")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["DGLKE_REPO"] = repo
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(rank),
                          str(port)],
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, env=env, cwd=repo)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    results = {}
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        m = re.search(rf"RESULT{rank}(\{{.*\}})", out)
        assert m, out
        results[rank] = json.loads(m.group(1))
    return results


def test_sampled_eval_vocab_sharded_matches_single_process(
        single_process_metrics, dist_metrics):
    """_global_eval + same seed => identical negative draws => the
    2-process vocab-sharded sampled eval must reproduce the
    single-process metrics exactly, on both ranks."""
    sampled, _ = single_process_metrics
    for rank in (0, 1):
        got = dist_metrics[rank]["sampled_vocab"]
        for k, v in sampled.items():
            assert abs(got[k] - v) < 1e-9, (rank, k, got, sampled)


def test_candidate_eval_vocab_sharded_matches_single_process(
        single_process_metrics, dist_metrics):
    _, cand = single_process_metrics
    for rank in (0, 1):
        got = dist_metrics[rank]["cand_vocab"]
        for k, v in cand.items():
            assert abs(got[k] - v) < 1e-9, (rank, k, got, cand)


def test_candidate_eval_strided_matches_single_process(
        single_process_metrics, dist_metrics):
    """Candidate lists are fixed per query (no negative RNG), so the
    strided 2-process run recombines to the exact single-process
    metrics (float64 partial sums)."""
    _, cand = single_process_metrics
    for rank in (0, 1):
        got = dist_metrics[rank]["cand_strided"]
        for k, v in cand.items():
            assert abs(got[k] - v) < 1e-9, (rank, k, got, cand)


def test_sampled_eval_strided_agrees_across_ranks(single_process_metrics,
                                                  dist_metrics):
    """Strided sampled eval draws rank-local negatives, so it equals the
    single-process run in PROTOCOL, not bitwise: both ranks must report
    the identical allgathered metrics, within sampling distance of the
    single-process numbers."""
    sampled, _ = single_process_metrics
    a, b = (dist_metrics[r]["sampled_strided"] for r in (0, 1))
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12, (k, a, b)
    # 192 ranked edges over K=32 candidates: MRR sampling noise is well
    # under 0.15 for the same untrained state
    assert abs(a["MRR"] - sampled["MRR"]) < 0.15, (a, sampled)
