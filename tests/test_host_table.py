"""Host-resident-table mode (--mix_cpu_gpu): tables in host numpy,
row-sized pure device steps, host-side sparse Adagrad, block-streamed
full-entity eval (reference train.py:46-49 CPU-ExternalEmbedding mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.data.sampler import FilterIndex
from dglke_tpu.host_table import (HostEmbedding, host_adagrad_update,
                                  init_host_state, load_host_state)
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import evaluate, train


def host_config(**kw):
    base = dict(
        model_name="TransE_l2", hidden_dim=32, gamma=6.0, lr=0.25,
        batch_size=256, neg_sample_size=64, max_step=300,
        batch_size_eval=16, log_interval=100, neg_adversarial_sampling=True,
        regularization_coef=1e-9, seed=7, dataset="synthetic",
        mix_cpu_gpu=True,
    )
    base.update(kw)
    return KGEConfig(**base)


@pytest.fixture(scope="module")
def tiny_ds():
    return synthetic_dataset(n_entities=200, n_relations=5, n_train=4000,
                             n_valid=100, n_test=100, seed=3)


def test_host_adagrad_matches_device_update():
    """The numpy Adagrad reproduces ops.embedding.sparse_adagrad_update
    exactly, INCLUDING duplicate-id batches (the dedup-free ordering
    proof holds on both sides)."""
    from dglke_tpu.ops.embedding import EmbeddingState, \
        sparse_adagrad_update

    rng = np.random.default_rng(0)
    n, d, batch = 50, 16, 120
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ss = rng.uniform(0.1, 2.0, (n,)).astype(np.float32)
    ids = rng.integers(0, n, (batch,)).astype(np.int32)   # many dups
    grads = rng.normal(size=(batch, d)).astype(np.float32)

    host = HostEmbedding(emb.copy(), ss.copy())
    host_adagrad_update(host, ids, grads, lr=0.3)

    dev = sparse_adagrad_update(
        EmbeddingState(emb=jnp.asarray(emb), state_sum=jnp.asarray(ss)),
        jnp.asarray(ids), jnp.asarray(grads), 0.3)
    np.testing.assert_allclose(host.state_sum, np.asarray(dev.state_sum),
                               rtol=1e-6)
    np.testing.assert_allclose(host.emb, np.asarray(dev.emb), rtol=1e-5,
                               atol=1e-6)


def test_host_mode_learns_and_checkpoint_interchanges(tiny_ds, tmp_path):
    """train() routes --mix_cpu_gpu to the host loop, the model learns,
    and the npy checkpoint is interchangeable with the HBM path (loaded
    on device it evaluates to the same metrics)."""
    from dglke_tpu.utils.io import load_model_state, save_model

    cfg = host_config()
    model, state, info = train(cfg, tiny_ds, log=lambda *a: None)
    assert getattr(state, "is_host", False)
    assert state.step == cfg.max_step
    m_host = evaluate(cfg, tiny_ds, model, state, "test",
                      log=lambda *a: None)
    assert m_host["MRR"] > 0.20, m_host

    path = save_model(cfg, model, state, save_path=str(tmp_path / "ck"))
    dev_state = load_model_state(cfg, model, path)
    m_dev = evaluate(cfg, tiny_ds, model, dev_state, "test",
                     log=lambda *a: None)
    assert abs(m_dev["MRR"] - m_host["MRR"]) < 1e-6, (m_dev, m_host)

    resumed = load_host_state(cfg, model, path)
    assert resumed.step == cfg.max_step
    np.testing.assert_array_equal(resumed.entity.emb, state.entity.emb)
    np.testing.assert_allclose(resumed.entity.state_sum,
                               state.entity.state_sum, rtol=1e-6)


def test_host_mode_transr_projection_table(tiny_ds):
    """TransR exercises the third (projection) host table end to end."""
    cfg = host_config(model_name="TransR", hidden_dim=16, max_step=200,
                      lr=0.15)
    model, state, _ = train(cfg, tiny_ds, log=lambda *a: None)
    assert state.projection is not None
    m = evaluate(cfg, tiny_ds, model, state, "test", log=lambda *a: None)
    assert m["MRR"] > 0.10, m


def test_host_eval_matches_device_eval_exactly(tiny_ds):
    """Block-streamed host eval and the HBM eval_ranks path agree on
    every metric for the SAME table values (the GE-count kernel is
    shared, so tie handling matches bit for bit)."""
    cfg = host_config(max_step=80)
    model, state, _ = train(cfg, tiny_ds, log=lambda *a: None)
    m_host = evaluate(cfg, tiny_ds, model, state, "test",
                      log=lambda *a: None)

    from dglke_tpu.ops.embedding import EmbeddingState
    from dglke_tpu.models.ke_model import TrainState
    dev_state = TrainState(
        entity=EmbeddingState(emb=jnp.asarray(state.entity.emb),
                              state_sum=jnp.asarray(state.entity.state_sum)),
        relation=EmbeddingState(emb=jnp.asarray(state.relation.emb),
                                state_sum=jnp.asarray(
                                    state.relation.state_sum)),
        projection=None, step=jnp.asarray(state.step, jnp.int32))
    m_dev = evaluate(cfg, tiny_ds, model, dev_state, "test",
                     log=lambda *a: None)
    for k in m_host:
        assert abs(m_host[k] - m_dev[k]) < 1e-9, (k, m_host, m_dev)


def test_host_sampled_eval_matches_device(tiny_ds):
    """--neg_sample_size_eval with host tables (the reference's
    Freebase-scale eval protocol) matches the device sampled eval
    exactly: EvalSampler draws the same candidates (same seed), and the
    rank kernel is the shared _rows_eval_ranks_sampled core."""
    cfg = host_config(max_step=80, neg_sample_size_eval=50,
                      no_eval_filter=True)
    model, state, _ = train(cfg, tiny_ds, log=lambda *a: None)
    m_host = evaluate(cfg, tiny_ds, model, state, "test",
                      log=lambda *a: None)

    from dglke_tpu.models.ke_model import TrainState
    from dglke_tpu.ops.embedding import EmbeddingState
    dev_state = TrainState(
        entity=EmbeddingState(emb=jnp.asarray(state.entity.emb),
                              state_sum=jnp.asarray(state.entity.state_sum)),
        relation=EmbeddingState(emb=jnp.asarray(state.relation.emb),
                                state_sum=jnp.asarray(
                                    state.relation.state_sum)),
        projection=None, step=jnp.asarray(state.step, jnp.int32))
    m_dev = evaluate(cfg, tiny_ds, model, dev_state, "test",
                     log=lambda *a: None)
    for k in m_host:
        assert abs(m_host[k] - m_dev[k]) < 1e-9, (k, m_host, m_dev)


def test_host_eval_query_chunking_metric_equal(tiny_ds, monkeypatch):
    """The bounded [Q, block] query chunking (the guard against a
    Freebase-sized split materializing a multi-GB score matrix) changes
    NOTHING about the metrics: forcing tiny chunks (so the split spans
    many padded chunks) reproduces the unchunked host eval exactly."""
    import dglke_tpu.host_table as ht

    cfg = host_config(max_step=80)
    model, state, _ = train(cfg, tiny_ds, log=lambda *a: None)
    m_ref = evaluate(cfg, tiny_ds, model, state, "test",
                     log=lambda *a: None)
    monkeypatch.setattr(ht, "_Q_CAP_BYTES", 1)
    monkeypatch.setattr(ht, "_Q_MIN_CHUNK", 7)  # non-divisor: pads too
    m_chunked = evaluate(cfg, tiny_ds, model, state, "test",
                         log=lambda *a: None)
    for k in m_ref:
        assert abs(m_ref[k] - m_chunked[k]) < 1e-9, (k, m_ref, m_chunked)


def test_host_mode_rejects_plan(tiny_ds):
    from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh

    cfg = host_config(max_step=10)
    plan = ShardingPlan(make_mesh(len(jax.devices())))
    with pytest.raises(ValueError, match="mix_cpu_gpu"):
        train(cfg, tiny_ds, plan=plan, log=lambda *a: None)
