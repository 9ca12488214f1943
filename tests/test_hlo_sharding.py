"""Compiled-HLO regression test for the vocab-sharded claim (PARITY.md):
the entity table is NEVER all-gathered — every collective on the train
hot path moves only batch-proportional data.  This is the SPMD equivalent
of the reference's KVStore pull/push contract (kvserver.py:41-51: only the
batch's rows ever cross the network), enforced against the partitioner's
actual output so a future sharding regression fails CI."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import synthetic_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
from dglke_tpu.trainer import DevicePipeline

N_ENT = 5000  # >> any batch-derived collective; padded table rows = 5000
BATCH = 64
NEG = 16

# an HLO instruction like:  %all-gather.1 = s32[64]{0} all-gather(...)
_COLLECTIVE = re.compile(
    r"=\s+\(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
    r"(all-gather|all-reduce|collective-permute|all-to-all|reduce-scatter)"
    r"[.\s(]")


def _collective_shapes(hlo: str):
    out = []
    for m in _COLLECTIVE.finditer(hlo):
        dims = [int(d) for d in m.group(2).split(",") if d]
        out.append((m.group(3), m.group(1), dims))
    return out


@pytest.fixture(scope="module")
def vocab_sharded_hlo():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=32, gamma=6.0,
                    lr=0.1, batch_size=BATCH, neg_sample_size=NEG,
                    steps_per_call=4)
    ds = synthetic_dataset(n_entities=N_ENT, n_relations=11, n_train=2000)
    plan = ShardingPlan(make_mesh(8), table_sharding="vocab")
    model = KEModel(cfg, N_ENT, 11)
    state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
    pipe = DevicePipeline(model, ds, BATCH, cfg.num_chunks * NEG, 4,
                          seed=0, plan=plan)
    fn = model.make_device_pipeline_step(ds.n_train, BATCH,
                                         cfg.num_chunks * NEG, 4,
                                         donate=False, plan=plan)
    lowered = fn.lower(state, pipe.triples, pipe.impts, pipe.cur, pipe.nxt,
                       jnp.int32(0), jnp.int32(0), jnp.int32(0),
                       jax.random.PRNGKey(0), refresh_next=False)
    return lowered.compile().as_text()


def test_no_full_table_allgather(vocab_sharded_hlo):
    shapes = _collective_shapes(vocab_sharded_hlo)
    assert shapes, "no collectives found — sharding silently dropped?"
    # the largest legitimate collective is batch-derived: the fused
    # [h|t|neg] row block is s*b-proportional (hundreds of rows x 32
    # dims), never table-proportional (N_ENT x 32 elements).  Budget on
    # TOTAL elements so a table gather reshaped to a small leading dim
    # (f32[8, N_ENT/8, 32]) cannot slip through.
    for kind, dtype, dims in shapes:
        assert np.prod(dims or [1]) < (N_ENT // 2) * 32, (
            f"{kind} of shape {dtype}{dims} moves table-scale data — "
            "the vocab-sharded table is being gathered")


def test_sharded_gather_uses_collectives(vocab_sharded_hlo):
    """The sharded row movement exists (the partitioner did not silently
    replicate the table instead): embedding rows (f32[..,32]) cross
    devices via collective-permute / all-to-all / all-reduce."""
    shapes = _collective_shapes(vocab_sharded_hlo)
    row_moves = [s for s in shapes
                 if s[1] == "f32" and len(s[2]) == 2 and s[2][1] == 32]
    assert row_moves, (
        "no f32 row-block collectives found — gather/scatter no longer "
        "routes through the sharded table")


def test_entity_table_parameter_stays_sharded(vocab_sharded_hlo):
    """The entry computation's entity-table parameter keeps its [5000, 32]
    global shape with a [8,1] device tiling (sharding={devices=[8,1]...}),
    i.e. 625 rows per device."""
    m = re.search(r"parameter\(\d+\)[^\n]*f32\[5000,32\][^\n]*",
                  vocab_sharded_hlo)
    n = re.search(r"f32\[625,32\]", vocab_sharded_hlo)
    assert m is not None or n is not None, (
        "entity table not found in sharded form in the compiled HLO")


@pytest.fixture(scope="module")
def sharded_eval_setup():
    """Vocab-sharded (mesh-padded, 5001 % 8 != 0) eval fixtures: replicated
    state, sharded state, a batch with filter lists, and both eval fns."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from dglke_tpu.data.sampler import FilterIndex
    n_ent = 5001
    ds = synthetic_dataset(n_ent, 7, 4000, 100, 100, seed=2)
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=32, gamma=6.0,
                    batch_size_eval=16)
    model = KEModel(cfg, n_ent, 7)
    state_rep = model.init_state(jax.random.PRNGKey(0))
    plan = ShardingPlan(make_mesh(8), table_sharding="vocab")
    state_sh = plan.put_state(state_rep)
    fi = FilterIndex(ds)
    h = np.asarray(ds.test[0][:32], np.int32).reshape(2, 16)
    r = np.asarray(ds.test[1][:32], np.int32).reshape(2, 16)
    t = np.asarray(ds.test[2][:32], np.int32).reshape(2, 16)
    ids, mask = fi.padded_lists("tail", h.reshape(-1), r.reshape(-1),
                                t.reshape(-1))
    f = ids.shape[1]
    fid = ids.reshape(2, 16, f)
    fm = mask.reshape(2, 16, f)
    return model, plan, state_rep, state_sh, (h, r, t, fid, fm)


def test_sharded_eval_matches_replicated_exactly(sharded_eval_setup):
    """The shard_map eval (candidates scored where their rows live) must be
    rank-for-rank identical to the replicated path, both corruption modes,
    over a mesh-padded vocab."""
    model, plan, state_rep, state_sh, batch = sharded_eval_setup
    h, r, t, fid, fm = batch
    ref_fn = model.make_eval_superstep()
    sh_fn = model.make_sharded_eval_superstep(plan)
    for neg_head in (False, True):
        a = np.asarray(ref_fn(state_rep, h, r, t, fid, fm, neg_head))
        b = np.asarray(sh_fn(state_sh, h, r, t, fid, fm, neg_head))
        assert np.array_equal(a, b)


def test_sharded_eval_collectives_are_batch_proportional(sharded_eval_setup):
    """The sharded eval's compiled HLO moves only batch-proportional data:
    the auto-SPMD path all-reduces every candidate block (table-scale,
    f32[block, D]); the shard_map path must only exchange batch row-blocks
    and the [G*B] count psum."""
    model, plan, state_sh, = (sharded_eval_setup[0], sharded_eval_setup[1],
                              sharded_eval_setup[3])
    h, r, t, fid, fm = sharded_eval_setup[4]
    sh_fn = model.make_sharded_eval_superstep(plan)
    lowered = sh_fn.lower(
        state_sh,
        jax.ShapeDtypeStruct(h.shape, np.int32),
        jax.ShapeDtypeStruct(r.shape, np.int32),
        jax.ShapeDtypeStruct(t.shape, np.int32),
        jax.ShapeDtypeStruct(fid.shape, np.int32),
        jax.ShapeDtypeStruct(fm.shape, np.float32), True)
    shapes = _collective_shapes(lowered.compile().as_text())
    assert shapes, "no collectives at all — sharding silently dropped?"
    n = h.size  # 32 flattened eval rows
    # TOTAL-element budget (not just the leading dim): the widest legitimate
    # exchange is a batch row-block [~n, D] or a filter plane [~n, F]; a
    # table-scale all-gather smuggled in with a small leading dim (e.g.
    # f32[8, n_ent/8, D]) must fail this
    budget = 4 * n * max(model.config.hidden_dim, fid.shape[-1])
    for kind, dtype, dims in shapes:
        assert np.prod(dims or [1]) <= budget, (
            f"{kind} of shape {dtype}{dims} moves more than "
            "batch-proportional data in the sharded eval")


def test_sharded_eval_megastep_matches_and_stays_batch_proportional(
        sharded_eval_setup):
    """The SHIPPED vocab-sharded eval path is the megastep (lax.map over
    groups, trainer.evaluate_with_samplers): its ranks must match the
    superstep exactly, and wrapping the shard_map body in lax.map must not
    reintroduce table-scale collectives into the compiled HLO."""
    model, plan, state_rep, state_sh, batch = sharded_eval_setup
    h, r, t, fid, fm = batch
    m = 2  # two stacked chunks of the same [2, 16] group
    hs, rs, ts = (np.stack([x] * m) for x in (h, r, t))
    fids, fms = np.stack([fid] * m), np.stack([fm] * m)
    mega_fn = model.make_sharded_eval_megastep(plan)
    ref_fn = model.make_eval_superstep()
    for neg_head in (False, True):
        want = np.asarray(ref_fn(state_rep, h, r, t, fid, fm, neg_head))
        got = np.asarray(mega_fn(state_sh, hs, rs, ts, fids, fms, neg_head))
        assert np.array_equal(got[0], want) and np.array_equal(got[1], want)
    lowered = mega_fn.lower(
        state_sh,
        jax.ShapeDtypeStruct(hs.shape, np.int32),
        jax.ShapeDtypeStruct(rs.shape, np.int32),
        jax.ShapeDtypeStruct(ts.shape, np.int32),
        jax.ShapeDtypeStruct(fids.shape, np.int32),
        jax.ShapeDtypeStruct(fms.shape, np.uint8), True)
    shapes = _collective_shapes(lowered.compile().as_text())
    assert shapes, "no collectives at all — sharding silently dropped?"
    n = h.size
    # total-element budget, same rationale as the superstep test above;
    # the megastep stacks m chunks, so scale the budget by m
    budget = 4 * m * n * max(model.config.hidden_dim, fid.shape[-1])
    for kind, dtype, dims in shapes:
        assert np.prod(dims or [1]) <= budget, (
            f"{kind} of shape {dtype}{dims} moves more than "
            "batch-proportional data in the sharded eval megastep")


_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
          "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
          "pred": 1}


def _collective_total_bytes(hlo: str) -> int:
    return sum(int(np.prod(dims or [1])) * _BYTES.get(dtype, 4)
               for _, dtype, dims in _collective_shapes(hlo))


N_EDGES_MH = 2000


@pytest.fixture(scope="module")
def multihost_pipe_hlo():
    """Compiled HLO of the FUSED MULTI-HOST device pipeline
    (make_device_pipeline_step_multihost), lowered single-process on the
    8-device mesh as nproc=4 x local=2 — the program is identical to what
    4 real hosts would run; only the array-construction path differs.
    Returns (hlo at per-host batch B, hlo at per-host batch 2B)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    def lower(batch):
        cfg = KGEConfig(model_name="TransE_l2", hidden_dim=32, gamma=6.0,
                        lr=0.1, batch_size=batch, neg_sample_size=NEG,
                        steps_per_call=4)
        ds = synthetic_dataset(n_entities=N_ENT, n_relations=11,
                               n_train=N_EDGES_MH)
        plan = ShardingPlan(make_mesh(8), table_sharding="vocab")
        model = KEModel(cfg, N_ENT, 11)
        state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
        fn = model.make_device_pipeline_step_multihost(
            N_EDGES_MH, batch, cfg.num_chunks * NEG, 4, plan,
            nproc=4, local=2, key_impl=None, donate=False)
        sh_plane = NamedSharding(plan.mesh, P("dp", None, None))
        sh_rows = NamedSharding(plan.mesh, P("dp", None))
        trip = np.stack(ds.train[:3]).astype(np.int32)
        plane = jax.device_put(
            np.ascontiguousarray(
                np.broadcast_to(trip[None], (8, 3, N_EDGES_MH))), sh_plane)
        perm = jax.device_put(
            np.tile(np.arange(N_EDGES_MH, dtype=np.int32)[None], (8, 1)),
            sh_rows)
        kd = np.asarray(jax.random.key_data(jax.random.key(0)))
        return fn.lower(state, plane, None, perm, perm, jnp.int32(0),
                        jnp.int32(0), jnp.int32(0), kd,
                        refresh_next=False).compile().as_text()

    return lower(BATCH), lower(2 * BATCH)


def test_multihost_pipe_no_table_or_edge_plane_gather(multihost_pipe_hlo):
    """The fused --dist hot loop keeps both contracts: the vocab-sharded
    TABLE is never gathered, and the per-host EDGE PLANE gathers stay
    device-local (an edge-plane collective would carry >= n_edges
    elements)."""
    hlo, _ = multihost_pipe_hlo
    shapes = _collective_shapes(hlo)
    assert shapes, "no collectives found — sharding silently dropped?"
    for kind, dtype, dims in shapes:
        n = np.prod(dims or [1])
        assert n < (N_ENT // 2) * 32, (
            f"{kind} of shape {dtype}{dims} moves table-scale data")
        if dtype in ("s32", "u32"):
            assert n < N_EDGES_MH, (
                f"{kind} of shape {dtype}{dims} moves edge-plane-scale "
                "ids — batch-row gathers are no longer device-local")


def test_multihost_pipe_collectives_batch_proportional(multihost_pipe_hlo):
    """Doubling the per-host batch ~doubles the fused program's
    collective bytes (and never more) — the multi-host pipeline keeps the
    comm-volume contract of tools/comm_volume.py."""
    hlo1, hlo2 = multihost_pipe_hlo
    b1, b2 = _collective_total_bytes(hlo1), _collective_total_bytes(hlo2)
    assert b1 > 0
    assert 1.2 * b1 <= b2 <= 2.4 * b1, (b1, b2)


def test_sampled_eval_collectives_are_candidate_proportional():
    """--neg_sample_size_eval over a vocab-sharded table: the K candidate
    rows (not the table) cross the mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    n_ent, b, k, g = 5000, 16, 64, 4
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=32, gamma=6.0)
    plan = ShardingPlan(make_mesh(8), table_sharding="vocab")
    model = KEModel(cfg, n_ent, 11)
    state = plan.put_state(model.init_state(jax.random.PRNGKey(0)))
    fn = model.make_sampled_eval_superstep()
    i = lambda *s: jax.ShapeDtypeStruct(s, np.int32)  # noqa: E731
    f = lambda *s: jax.ShapeDtypeStruct(s, np.float32)  # noqa: E731
    txt = fn.lower(state, i(g, b), i(g, b), i(g, b), i(g, k), f(g, b, k),
                   i(g), True, False).compile().as_text()
    shapes = _collective_shapes(txt)
    assert shapes
    for kind, dtype, dims in shapes:
        assert np.prod(dims or [1]) <= 4 * g * max(b, k) * 32, (
            f"{kind} of shape {dtype}{dims} moves more than "
            "candidate-proportional data in sampled eval")
