"""Sampled-negative evaluation (the reference's --neg_sample_size_eval
protocol, e.g. wikikg2's K=500 unfiltered eval: examples/wikikg2/multi_gpu.sh
and dataloader/sampler.py:514-597 EvalSampler(neg_sample_size=...))."""

import numpy as np
import pytest

import jax

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.data.sampler import EvalSampler, FilterIndex
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import evaluate


def _model(n_ent=60, n_rel=3, name="DistMult", dim=8):
    cfg = KGEConfig(model_name=name, hidden_dim=dim, gamma=4.0)
    model = KEModel(cfg, n_ent, n_rel)
    state = model.init_state(jax.random.PRNGKey(2))
    return cfg, model, state


# ---------------------------------------------------------------------------
# sampler level


def test_sampler_emits_shared_negatives():
    ds = synthetic_dataset(60, 3, 500, 50, 50)
    fi = FilterIndex(ds)
    s = EvalSampler(ds, "test", 16, "tail", filter_index=fi,
                    neg_sample_size=24)
    batches = list(s)
    assert len(batches) > 0
    for b in batches:
        assert b["neg"].shape == (24,)
        assert b["neg"].max() < 60
        assert b["neg_keep"].shape == (16, 24)
        assert "filter_ids" not in b  # full-entity filter path not taken
    # distinct draws per batch (one shared set PER batch, as in the
    # reference's per-subgraph uniform draw)
    assert not np.array_equal(batches[0]["neg"], batches[1]["neg"])


def test_sampler_k_ge_n_entities_falls_back_to_full():
    ds = synthetic_dataset(60, 3, 500, 50, 50)
    s = EvalSampler(ds, "test", 16, "tail", neg_sample_size=60)
    b = next(iter(s))
    assert "neg" not in b  # K >= n_entities => full-entity ranking


def test_false_neg_mask_bruteforce():
    ds = synthetic_dataset(40, 3, 300, 30, 30)
    fi = FilterIndex(ds)
    h, r, t = (np.asarray(ds.test[0][:8]), np.asarray(ds.test[1][:8]),
               np.asarray(ds.test[2][:8]))
    rng = np.random.RandomState(0)
    neg = rng.randint(0, 40, 32).astype(np.int32)
    keep = fi.false_neg_mask("tail", h, r, t, neg)
    # brute force: keep[i, j] == 0 iff (h_i, r_i, neg_j) is a true triple
    all_triples = set()
    for split in (ds.train, ds.valid, ds.test):
        for hh, rr, tt in zip(*split):
            all_triples.add((int(hh), int(rr), int(tt)))
    for i in range(8):
        for j in range(32):
            is_true = (int(h[i]), int(r[i]), int(neg[j])) in all_triples
            assert keep[i, j] == (0.0 if is_true else 1.0)
    # head side
    keep_h = fi.false_neg_mask("head", h, r, t, neg)
    for i in range(8):
        for j in range(32):
            is_true = (int(neg[j]), int(r[i]), int(t[i])) in all_triples
            assert keep_h[i, j] == (0.0 if is_true else 1.0)


def test_padded_lists_match_per_row_queries():
    """The vectorized batched filter-list build equals the per-row
    true_heads/true_tails queries it replaced."""
    ds = synthetic_dataset(50, 4, 400, 40, 40)
    fi = FilterIndex(ds)
    h, r, t = (np.asarray(ds.test[0]), np.asarray(ds.test[1]),
               np.asarray(ds.test[2]))
    ids, mask = fi.padded_lists("tail", h, r, t)
    for i in range(len(h)):
        want = np.sort(fi.true_tails(h[i], r[i]))
        got = np.sort(ids[i][mask[i] > 0])
        assert np.array_equal(got, want)
    ids, mask = fi.padded_lists("head", h, r, t)
    for i in range(len(h)):
        want = np.sort(fi.true_heads(r[i], t[i]))
        got = np.sort(ids[i][mask[i] > 0])
        assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# kernel level


def test_sampled_ranks_numpy_crosscheck():
    """rank = 1 + |{j kept : s(neg_j) >= pos}| against brute-force numpy
    DistMult scores, both corruption directions."""
    cfg, model, state = _model()
    rng = np.random.RandomState(1)
    b, k = 12, 20
    h = rng.randint(0, 60, b).astype(np.int32)
    r = rng.randint(0, 3, b).astype(np.int32)
    t = rng.randint(0, 60, b).astype(np.int32)
    neg = rng.randint(0, 60, k).astype(np.int32)
    keep = (rng.rand(b, k) > 0.3).astype(np.float32)
    ent = np.asarray(state.entity.emb, np.float64)
    rel = np.asarray(state.relation.emb, np.float64)
    for neg_head in (False, True):
        ranks = np.asarray(model.eval_ranks_sampled(
            state, h, r, t, neg, keep, neg_head=neg_head))
        pos = (ent[h] * rel[r] * ent[t]).sum(1)
        side = ent[t] if neg_head else ent[h]
        s = (side[:, None, :] * rel[r][:, None, :]
             * ent[neg][None, :, :]).sum(-1)
        lo = 1 + (((s >= pos[:, None] + 1e-5) & (keep > 0)).sum(1))
        hi = 1 + (((s >= pos[:, None] - 1e-5) & (keep > 0)).sum(1))
        assert (lo <= ranks).all() and (ranks <= hi).all()


def test_sampled_full_candidate_set_matches_full_ranking():
    """K = n_entities sampled eval (with the filter's keep-mask) must equal
    the production full-entity filtered ranking — the cross-check VERDICT
    r1 asked for."""
    cfg, model, state = _model(n_ent=50, n_rel=4)
    ds = synthetic_dataset(50, 4, 400, 40, 40)
    fi = FilterIndex(ds)
    h = np.asarray(ds.test[0][:16], np.int32)
    r = np.asarray(ds.test[1][:16], np.int32)
    t = np.asarray(ds.test[2][:16], np.int32)
    for mode, neg_head in (("tail", False), ("head", True)):
        neg = np.arange(50, dtype=np.int32)
        keep = fi.false_neg_mask(mode, h, r, t, neg)
        sampled = np.asarray(model.eval_ranks_sampled(
            state, h, r, t, neg, keep, neg_head=neg_head))
        ids, mask = fi.padded_lists(mode, h, r, t)
        full = np.asarray(model.eval_ranks(
            state, h, r, t, ids, mask, neg_head=neg_head))
        assert np.array_equal(sampled, full)


def test_neg_deg_sample_prepends_own_entities():
    """neg_deg_sample_eval reproduces the reference quirk: the batch's own
    corrupted-side entities are candidates, the self-match diagonal is
    ZEROED (not removed) and the zeroed score still joins the >= pos
    comparison (general_models.py:395-434 + 473-478)."""
    cfg, model, state = _model()
    rng = np.random.RandomState(3)
    b, k = 10, 16
    h = rng.randint(0, 60, b).astype(np.int32)
    r = rng.randint(0, 3, b).astype(np.int32)
    t = rng.randint(0, 60, b).astype(np.int32)
    neg = rng.randint(0, 60, k).astype(np.int32)
    keep = np.ones((b, k), np.float32)
    ent = np.asarray(state.entity.emb, np.float64)
    rel = np.asarray(state.relation.emb, np.float64)
    for neg_head in (False, True):
        ranks = np.asarray(model.eval_ranks_sampled(
            state, h, r, t, neg, keep, neg_head=neg_head,
            neg_deg_sample=True))
        pos = (ent[h] * rel[r] * ent[t]).sum(1)
        own = h if neg_head else t
        cand = np.concatenate([own, neg])
        side = ent[t] if neg_head else ent[h]
        s = (side[:, None, :] * rel[r][:, None, :]
             * ent[cand][None, :, :]).sum(-1)
        s[np.arange(b), np.arange(b)] = 0.0  # zeroed, still compared
        lo = 1 + (s >= pos[:, None] + 1e-5).sum(1)
        hi = 1 + (s >= pos[:, None] - 1e-5).sum(1)
        assert (lo <= ranks).all() and (ranks <= hi).all()


# ---------------------------------------------------------------------------
# end to end


def test_evaluate_sampled_end_to_end():
    ds = synthetic_dataset(80, 3, 600, 40, 40)
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=8, gamma=4.0,
                    batch_size_eval=16, neg_sample_size_eval=32)
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    state = model.init_state(jax.random.PRNGKey(0))
    logs = []
    m = evaluate(cfg, ds, model, state, split="test", log=logs.append)
    assert 0 < m["MRR"] <= 1.0
    assert 1.0 <= m["MR"] <= 33.0  # rank bounded by K+1 candidates
    assert any("MRR" in l for l in logs)


def test_evaluate_sampled_unfiltered_end_to_end():
    """wikikg2 protocol: --neg_sample_size_eval K --no_eval_filter."""
    ds = synthetic_dataset(80, 3, 600, 40, 40)
    cfg = KGEConfig(model_name="DistMult", hidden_dim=8,
                    batch_size_eval=16, neg_sample_size_eval=32,
                    no_eval_filter=True)
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    state = model.init_state(jax.random.PRNGKey(0))
    m = evaluate(cfg, ds, model, state, split="test", log=lambda *a: None)
    assert 1.0 <= m["MR"] <= 33.0


def test_evaluate_neg_deg_sample_end_to_end():
    ds = synthetic_dataset(80, 3, 600, 40, 40)
    cfg = KGEConfig(model_name="DistMult", hidden_dim=8,
                    batch_size_eval=16, neg_sample_size_eval=32,
                    no_eval_filter=True, neg_deg_sample_eval=True)
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    state = model.init_state(jax.random.PRNGKey(0))
    m = evaluate(cfg, ds, model, state, split="test", log=lambda *a: None)
    # candidates = 16 own + 32 sampled => rank <= 49
    assert 1.0 <= m["MR"] <= 49.0


def test_config_rejects_deg_sample_with_filter():
    with pytest.raises(ValueError):
        KGEConfig(model_name="DistMult", hidden_dim=8,
                  neg_deg_sample_eval=True, neg_sample_size_eval=32).validate()
    with pytest.raises(ValueError):
        KGEConfig(model_name="DistMult", hidden_dim=8,
                  neg_deg_sample_eval=True, no_eval_filter=True).validate()


def test_eval_batch_size_rounded_to_neg_multiple():
    cfg = KGEConfig(model_name="DistMult", hidden_dim=8,
                    batch_size_eval=100, neg_sample_size_eval=16)
    cfg = cfg.with_compatible_batch_size()
    assert cfg.batch_size_eval % 16 == 0


def test_neg_deg_sample_partial_batch_no_phantom_candidates():
    """A partial tail batch (padded by repeating row 0) must NOT add its
    padded rows' own entities as candidates: metrics over a split of 10
    edges at batch 16 (one short batch) must equal the same eval at
    batch 10 (no padding)."""
    ds = synthetic_dataset(80, 3, 600, 10, 10)
    base = dict(model_name="DistMult", hidden_dim=8,
                neg_sample_size_eval=32, no_eval_filter=True,
                neg_deg_sample_eval=True)
    model = KEModel(KGEConfig(batch_size_eval=16, **base),
                    ds.n_entities, ds.n_relations)
    state = model.init_state(jax.random.PRNGKey(0))
    m_pad = evaluate(KGEConfig(batch_size_eval=16, **base), ds, model,
                     state, split="test", log=lambda *a: None)
    m_exact = evaluate(KGEConfig(batch_size_eval=10, **base), ds, model,
                       state, split="test", log=lambda *a: None)
    assert m_pad == m_exact, (m_pad, m_exact)


def test_valid_samplers_use_sampled_protocol(tmp_path):
    """--valid with --neg_sample_size_eval must run the SAMPLED protocol in
    training-time validation (cli/train.py valid sampler construction), not
    silently fall back to full ranking: with K=4 candidates on 80 entities,
    MR must be bounded by K+1."""
    import re
    from dglke_tpu.cli.train import main as train_main
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.RandomState(0)
    for name, n in (("train.txt", 400), ("valid.txt", 40), ("test.txt", 4)):
        rows = rng.randint(0, 60, (n, 3))
        rows[:, 1] %= 3
        with open(d / name, "w") as f:
            for a, b, c in rows:
                f.write(f"e{a}\tr{b}\te{c}\n")
    out = []
    import contextlib, io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_main([
            "--model_name", "DistMult", "--dataset", "fk",
            "--data_path", str(d), "--format", "raw_udd_hrt",
            "--data_files", "train.txt", "valid.txt", "test.txt",
            "--batch_size", "16", "--neg_sample_size", "8",
            "--hidden_dim", "8", "--gamma", "5.0", "--lr", "0.1",
            "--max_step", "40", "--eval_interval", "20", "--valid",
            "--batch_size_eval", "8", "--neg_sample_size_eval", "4",
            "--no_eval_filter",
            "--save_path", str(tmp_path / "ck"), "--no_save_emb"])
    mrs = [float(m.group(1)) for m in
           re.finditer(r"Valid average MR: ([0-9.]+)", buf.getvalue())]
    assert mrs, buf.getvalue()
    assert all(mr <= 5.0 for mr in mrs), mrs  # K+1 bound, not ~40 (full)
