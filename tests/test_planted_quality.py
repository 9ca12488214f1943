"""Calibrated per-model quality gates on planted-structure KGs.

Each of the 8 model families trains on a structure it provably
represents (data/dataset.py planted_dataset) and must reach filtered
MRR >= 0.85 — random-guess MRR on 60 entities is ~0.07, and the round-2
review showed the old >0.2 thresholds would pass a 10x-too-slow learner.
Calibration runs (CPU, seed 7): TransE_l2 0.946, TransE_l1 0.983,
TransR 0.993, RotatE 1.000, DistMult 0.978, ComplEx 1.000, SimplE
1.000, RESCAL 1.000 — so 0.85 leaves seed margin while a silent 2x
learning regression in any family fails.

Structure-to-family map (see planted_dataset docstring):
  line    -> translation family (TransE_l1/l2, TransR, RotatE)
  cliques -> DistMult (symmetric-only by construction)
  cycle   -> bilinear family (ComplEx, SimplE, RESCAL)
"""

import numpy as np
import pytest

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import planted_dataset
from dglke_tpu.trainer import evaluate, train

MRR_GATE = 0.85

BASE = dict(hidden_dim=32, gamma=6.0, lr=0.25, batch_size=128,
            neg_sample_size=32, max_step=1500, batch_size_eval=16,
            log_interval=10**9, neg_adversarial_sampling=True,
            regularization_coef=1e-9, seed=7, dataset="synthetic")

# (model_name, structure, config overrides) — calibrated 2026-08-20
CASES = [
    ("TransE_l2", "line", dict(gamma=4.0, max_step=2000)),
    ("TransE_l1", "line", dict(gamma=8.0)),
    ("TransR", "line", dict(hidden_dim=16, lr=0.15)),
    ("RotatE", "line", dict(double_ent=True, lr=0.1)),
    ("DistMult", "cliques", dict(neg_adversarial_sampling=False,
                                 regularization_coef=2e-6, lr=0.15)),
    ("ComplEx", "cycle", dict(neg_adversarial_sampling=False,
                              regularization_coef=2e-6, lr=0.15)),
    ("SimplE", "cycle", dict(neg_adversarial_sampling=False,
                             regularization_coef=2e-6, lr=0.15)),
    ("RESCAL", "cycle", dict(hidden_dim=16, lr=0.1,
                             neg_adversarial_sampling=False)),
]

_DS_CACHE = {}


def _planted(structure):
    if structure not in _DS_CACHE:
        n_clusters = 8 if structure == "cycle" else 10
        _DS_CACHE[structure] = planted_dataset(structure,
                                               n_clusters=n_clusters)
    return _DS_CACHE[structure]


@pytest.mark.parametrize("model_name,structure,overrides",
                         CASES, ids=[c[0] for c in CASES])
def test_planted_structure_solved(model_name, structure, overrides):
    ds = _planted(structure)
    cfg = KGEConfig(**{**BASE, "model_name": model_name, **overrides})
    model, state, _ = train(cfg, ds, log=lambda *a: None)
    m = evaluate(cfg, ds, model, state, "test", log=lambda *a: None)
    assert m["MRR"] >= MRR_GATE, (model_name, structure, m)
    assert m["HITS@10"] >= 0.99, (model_name, structure, m)


def test_planted_structures_are_solvable_not_trivial():
    """Sanity on the gate itself: an UNTRAINED model must score near
    random on the planted test split (the structure is in the labels,
    not leaked through the filter)."""
    import jax
    from dglke_tpu.models.ke_model import KEModel
    ds = _planted("line")
    cfg = KGEConfig(**{**BASE, "model_name": "TransE_l2"})
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    state = model.init_state(jax.random.PRNGKey(123))
    m = evaluate(cfg, ds, model, state, "test", log=lambda *a: None)
    assert m["MRR"] < 0.35, m
