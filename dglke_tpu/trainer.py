"""Training / evaluation driver.

Replaces the reference's trainer layer (train_pytorch.py:110-265).  Instead
of per-process hogwild workers, there is ONE process: the jitted SPMD step
runs on all local devices (batch axis sharded over the mesh), and a
background prefetch thread keeps the device queue fed — the TPU equivalent
of the reference's worker threads + async_update pipeline.

The log format mirrors the reference ("[proc 0][Train] average loss: ..."
every log_interval, plus per-phase timers) so existing tooling can parse it.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dglke_tpu.config import KGEConfig
from dglke_tpu.data.dataset import KGDataset
from dglke_tpu.data.sampler import EvalSampler, FilterIndex, TrainSampler
from dglke_tpu.models.ke_model import KEModel, TrainState, metrics_from_ranks
from dglke_tpu.parallel.mesh import ShardingPlan


class Prefetcher:
    """Background thread that pulls host batches and stages them on device,
    double-buffered so host sampling overlaps device compute.

    On the CPU backend (tests / virtual multi-device), staging happens on the
    consumer thread instead: concurrent device_put from a second thread can
    starve XLA:CPU's collective rendezvous on small hosts.
    """

    def __init__(self, it: Iterable, device_put, depth: int = 2,
                 stage_in_worker: Optional[bool] = None):
        self._it = iter(it)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._put = device_put
        self._stop = False
        if stage_in_worker is None:
            stage_in_worker = jax.default_backend() != "cpu"
        self._stage_in_worker = stage_in_worker
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    _END = object()  # end-of-stream sentinel: a finite feeder must not
    # leave the consumer blocked forever in q.get()

    def _worker(self):
        try:
            for batch in self._it:
                staged = self._put(batch) if self._stage_in_worker else batch
                while not self._stop:
                    try:
                        self._q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
            self._q.put(self._END)
        except Exception as e:  # surface errors to the consumer
            self._q.put(e)

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item if self._stage_in_worker else self._put(item)

    def close(self):
        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)


def _put_batch(plan: Optional[ShardingPlan]):
    """Single-device: pack all id arrays into ONE int32 transfer (per-array
    device_put overhead would otherwise dominate the sub-100us step).
    Multi-device: per-array dp-sharded puts so segment boundaries align with
    device shards."""

    def put(batch):
        out = dict(batch)
        if plan is None:
            if "packed" in batch:  # superbatch: already stacked
                packed = batch["packed"]
            else:
                packed = np.concatenate(
                    [batch["h"], batch["r"], batch["t"],
                     batch["neg"]]).astype(np.int32)
            out["packed"] = jax.device_put(packed)
            if batch.get("impts") is not None:
                out["impts"] = jax.device_put(batch["impts"])
        else:
            arrs = {k: v for k, v in batch.items()
                    if isinstance(v, np.ndarray)}
            out.update(plan.put_batch(arrs))
        return out

    return put


def train(config: KGEConfig, dataset: KGDataset,
          model: Optional[KEModel] = None,
          state: Optional[TrainState] = None,
          plan: Optional[ShardingPlan] = None,
          valid_samplers: Optional[list] = None,
          profile_dir: Optional[str] = None,
          save_fn=None,
          log=print) -> tuple:
    """Run the training loop; returns (model, state, time_info).

    profile_dir: when set, captures a jax.profiler device trace of a few
    steady-state steps (viewable in XProf/TensorBoard) — the TPU analogue of
    the reference's MXNET_PROFILER hook (train_mxnet.py:31-34)."""
    cfg = config
    model = model or KEModel(cfg, dataset.n_entities, dataset.n_relations)
    if cfg.mix_cpu_gpu:
        # host-resident tables (reference --mix_cpu_gpu, train.py:46-49):
        # capacity = host DRAM, device program is pure and row-sized
        from dglke_tpu.host_table import train_host
        if plan is not None:
            raise ValueError("--mix_cpu_gpu keeps tables on the host; it "
                             "is incompatible with a device ShardingPlan "
                             "(drop one of the two)")
        return train_host(cfg, dataset, model=model, state=state,
                          valid_samplers=valid_samplers, save_fn=save_fn,
                          log=log)
    if state is None:
        state = model.init_state(jax.random.PRNGKey(cfg.seed))
        if plan is not None:
            state = plan.put_state(state)

    # Multi-host SPMD: batch_size is PER HOST (reference dist semantics —
    # each machine's trainer feeds its own batch, kvclient.py:140-156); the
    # global SPMD batch is batch_size * nproc, assembled by plan.put_batch
    # from each process's local sample over its own edge partition.
    if plan is not None and jax.process_count() > 1:
        if jax.process_index() != 0:
            log = lambda *a, **k: None  # noqa: E731 — rank-0 logging

    # The host-side sampler is only needed on the host-fed paths: the
    # device pipeline samples on device, and at Freebase scale the
    # sampler's contiguous int32 copies are ~4 GB of host memory the
    # pipeline never reads — so build it lazily.
    neg_total = cfg.num_chunks * cfg.neg_sample_size

    def make_sampler():
        return TrainSampler(dataset, cfg.batch_size, cfg.neg_sample_size,
                            seed=cfg.seed + jax.process_index())

    packed_mode = plan is None
    # Multi-device (single- OR multi-host): keep the loop fully
    # device-resident — the sharded tables stay put and batches are
    # sampled on device, split over the dp axis inside the jitted call.
    # A host feed would cap a multi-chip mesh at transfer latency; under
    # --dist it would reintroduce the per-step host dispatch the
    # reference's parameter-server design also avoids
    # (kvclient.py:140-156).  The gate (and the fused call size below)
    # must be HOST-INVARIANT: partitions differ per host, so agree on the
    # pod-min partition size.
    n_train_gate = dataset.n_train
    if plan is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        n_train_gate = int(np.min(np.asarray(
            multihost_utils.process_allgather(
                np.asarray(dataset.n_train, np.int64)))))
    # The device-resident pipeline is the fastest path on ONE chip too
    # (bench.py measures it ~20% above the host-fed packed superstep on
    # v5e), so it no longer requires a ShardingPlan; the only hard
    # requirements are a dataset big enough to scan over and, when
    # multi-process, a plan to assemble the global batch.
    device_pipe_mode = (n_train_gate >= 2 * cfg.batch_size
                        and (plan is not None
                             or jax.process_count() == 1)
                        and not os.environ.get("DGLKE_TPU_FORCE_PACKED"))
    # In scanned modes, fuse steps_per_call steps into one device call;
    # align the fusion with logging/eval cadence.
    s = cfg.steps_per_call if (packed_mode or device_pipe_mode) else 1
    if device_pipe_mode:
        while s > 2 and s * cfg.batch_size > n_train_gate:
            s -= 2
    if s > 1:
        for interval in (cfg.log_interval,
                         cfg.eval_interval if cfg.valid else None,
                         cfg.save_interval if cfg.save_interval > 0
                         else None,
                         cfg.max_step):
            if interval:
                while s > 2 and interval % s != 0:
                    s -= 2
        if cfg.max_step % s != 0 or (s & 1):
            s = 2 if cfg.max_step % 2 == 0 else 1
        for nm, interval in (("log_interval", cfg.log_interval),
                             ("eval_interval",
                              cfg.eval_interval if cfg.valid else None),
                             ("save_interval",
                              cfg.save_interval if cfg.save_interval > 0
                              else None)):
            if interval and s > 1 and interval % s != 0:
                log(f"[proc 0]NOTE: {nm}={interval} is not a multiple of "
                    f"the fused call size {s}; it fires at the first "
                    f"step past each multiple of {interval}")
    if cfg.async_update and s == 1:
        log("[proc 0]NOTE: --async_update has no effect at fused call "
            "size 1 (the one-step-deferred update only exists inside the "
            "scanned superstep); training runs fully synchronous")
    pipe = None
    if device_pipe_mode and s > 1:
        pipe = DevicePipeline(model, dataset, cfg.batch_size,
                              neg_total, s, seed=cfg.seed, plan=plan)
        log(f"[proc 0]device-resident pipeline: {s} steps/call, "
            f"{jax.process_count()} process(es) x "
            f"{jax.local_device_count()} device(s)")
        feeder = step_fn = prefetch = None
    elif packed_mode and s > 1:
        sampler = make_sampler()
        feeder = None
        try:
            from dglke_tpu.data import native
            if native.available():
                feeder = native.NativeSuperbatchSampler(
                    sampler.h, sampler.r, sampler.t, sampler.n_entities,
                    cfg.batch_size, neg_total, s,
                    seed=cfg.seed, impts=sampler.impts)
        except Exception:
            feeder = None
        if feeder is None:
            from dglke_tpu.data.sampler import SuperbatchSampler
            feeder = SuperbatchSampler(sampler, s)
        step_fn = model.make_train_superstep(cfg.batch_size, s)
    elif packed_mode:
        feeder = make_sampler()
        step_fn = model.make_train_step_packed(cfg.batch_size)
    else:
        feeder = make_sampler()
        step_fn = model.make_train_step()
    if pipe is None:
        prefetch = Prefetcher(feeder, _put_batch(plan))

    def crossed(step, prev, interval):
        # True when [prev, step] crossed a multiple of interval — exact for
        # any interval even when the fused call size s does not divide it
        return interval and (step // interval) > (prev // interval)

    logs: list = []
    start = time.time()
    sample_time = update_time = 0.0
    valid_metrics = None
    tic = time.time()
    step = 0
    profiling = False

    def stop_profiler():
        # Force completion by fetching a scalar to the host: on the
        # tunneled TPU block_until_ready is unreliable (see bench.py),
        # and stopping the trace mid-flight truncates it.
        jax.device_get(state.entity.emb[0, 0])
        jax.profiler.stop_trace()
        log("[proc 0]profiler trace written")

    def flush_logs(step):
        # one flush shared by both branches: the log format is parsed by
        # downstream tooling, so pipe-mode and host-fed logging must not
        # drift
        nonlocal logs, tic
        host_logs = jax.device_get(logs)
        for k in host_logs[0]:
            v = float(np.mean([l[k] for l in host_logs]))
            log(f"[proc 0][Train]({step}/{cfg.max_step}) "
                f"average {k}: {v}")
        logs = []
        log(f"[proc 0][Train] {cfg.log_interval} steps take "
            f"{time.time() - tic:.3f} seconds")
        tic = time.time()

    while step < cfg.max_step:
        if profile_dir is not None and not profiling and step >= 2 * s:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        if pipe is not None:
            t0 = time.time()
            state, log_dict = pipe.run_call(state)
            prev = step
            step += s
            update_time += time.time() - t0
            logs.append(log_dict)
            if crossed(step, prev, cfg.log_interval):
                flush_logs(step)
            if profiling and step >= 4 * s:
                stop_profiler()
                profiling = False
                profile_dir = None
            if (cfg.valid and valid_samplers is not None
                    and crossed(step, prev, cfg.eval_interval)):
                valid_metrics = evaluate_with_samplers(
                    model, state, valid_samplers, phase="Valid", log=log,
                    plan=plan)
            if (save_fn is not None and cfg.save_interval > 0
                    and crossed(step, prev, cfg.save_interval)):
                save_fn(state, step)
            continue

        t0 = time.time()
        batch = next(prefetch)
        sample_time += time.time() - t0

        t0 = time.time()
        prev = step
        if packed_mode and s > 1:
            state, log_dict = step_fn(state, batch["packed"],
                                      batch.get("impts"))
            step += batch["n_steps"]
        elif packed_mode:
            state, log_dict = step_fn(state, batch["packed"],
                                      batch.get("impts"),
                                      batch["neg_head"])
            step += 1
        else:
            state, log_dict = step_fn(state, batch["h"], batch["r"],
                                      batch["t"], batch["neg"],
                                      batch.get("impts"), batch["neg_head"])
            step += 1
        update_time += time.time() - t0
        logs.append(log_dict)

        if crossed(step, prev, cfg.log_interval):
            flush_logs(step)
            log(f"[proc 0]sample: {sample_time:.3f}, "
                f"update: {update_time:.3f}")
            sample_time = update_time = 0.0

        if profiling and step >= 4 * s:
            stop_profiler()
            profiling = False
            profile_dir = None

        if (save_fn is not None and cfg.save_interval > 0
                and crossed(step, prev, cfg.save_interval)):
            save_fn(state, step)

        if (cfg.valid and valid_samplers is not None
                and crossed(step, prev, cfg.eval_interval)):
            valid_metrics = evaluate_with_samplers(
                model, state, valid_samplers, phase="Valid", log=log,
                plan=plan)
    if profiling:
        stop_profiler()
    total = time.time() - start
    log(f"[proc 0]training takes {total} seconds")
    if pipe is None:
        prefetch.close()
    stats = {"train_time": total}
    if valid_metrics is not None:
        stats["valid_metrics"] = valid_metrics
    return model, state, stats


def evaluate(config: KGEConfig, dataset: KGDataset, model: KEModel,
             state: TrainState, split: str = "test",
             filter_index: Optional[FilterIndex] = None,
             log=print, phase: str = "Test",
             plan=None) -> Dict[str, float]:
    """Filtered (or raw) ranking evaluation over both corrupt modes,
    mirroring the reference protocol: every eval triple is ranked under
    head-corruption AND tail-corruption; metrics average over both
    (train_pytorch.py:199-253)."""
    cfg = config
    if getattr(state, "is_host", False):
        from dglke_tpu.host_table import evaluate_host
        return evaluate_host(cfg, dataset, model, state, split,
                             filter_index=filter_index, log=log,
                             phase=phase)
    if cfg.eval_filter and filter_index is None:
        if getattr(dataset, "train_partitioned", False):
            raise ValueError(
                "filtered eval on a partition_for_host dataset: the filter "
                "would cover only this host's train slice (deflated, "
                "host-divergent ranks) — build FilterIndex from the "
                "UNPARTITIONED dataset and pass it as filter_index")
        filter_index = FilterIndex(dataset)
    # Multi-host striding: with REPLICATED tables each process ranks its
    # own stride of the eval edges (reference EvalSampler rank striding,
    # sampler.py:772-775) and metrics combine via allgathered partial
    # sums.  With a VOCAB-SHARDED table the batches enter a global-mesh
    # jit as replicated inputs, so they MUST be identical on every
    # process (per-rank strides would psum counts of DIFFERENT edges
    # together — silently wrong metrics); parallelism instead comes from
    # the table axis inside make_sharded_eval_superstep, and every rank
    # computes the full global metrics locally.  The dataset and
    # filter_index must therefore be host-identical under vocab sharding
    # (pass the UNPARTITIONED dataset's filter).
    if _global_eval(plan):
        rank, ranks = 0, 1
    else:
        rank, ranks = jax.process_index(), jax.process_count()
    samplers = [
        EvalSampler(dataset, split, cfg.batch_size_eval, mode,
                    filter_index if cfg.eval_filter else None,
                    eval_percent=cfg.eval_percent,
                    rank=rank, ranks=ranks,
                    seed=cfg.seed,
                    neg_sample_size=cfg.neg_sample_size_eval,
                    neg_deg_sample=cfg.neg_deg_sample_eval)
        for mode in ("head", "tail")
    ]
    return evaluate_with_samplers(model, state, samplers, phase=phase,
                                  log=log, plan=plan)


def _global_eval(plan) -> bool:
    """True when eval batches must be host-identical and metrics are
    computed globally on every rank (vocab-sharded table + multi-process:
    the batch rides the global mesh as a replicated input)."""
    return (plan is not None and plan.table_sharding == "vocab"
            and jax.process_count() > 1)


def combine_rank_metrics(ranks: np.ndarray, plan, empty_msg: str
                         ) -> Dict[str, float]:
    """MRR/MR/HITS@{1,3,10} from this process's rank array.

    Replicated-table multi-host: each rank evaluated its own stride, so
    fixed-size partial sums combine over all processes (the reference
    funnels per-proc logs through an mp.Queue, train.py:357-369; here it
    is one allgather).  Under _global_eval (or single-process) the local
    ranks already ARE the global ranks, so the local reduction is the
    global aggregation.  An empty stride still joins the collective with
    zero partial sums; all-empty raises `empty_msg`."""
    r = np.asarray(ranks, np.float64)
    if jax.process_count() > 1 and not _global_eval(plan):
        from jax.experimental import multihost_utils
        local = np.array([r.size, r.sum(), (1.0 / r).sum(),
                          (r <= 1).sum(), (r <= 3).sum(),
                          (r <= 10).sum()], np.float64)
        # allgather the raw float64 BITS as uint32: process_allgather
        # rides jax's default 32-bit mode, which would silently round
        # the partial sums (and large counts) to float32
        gathered = np.asarray(multihost_utils.process_allgather(
            local.view(np.uint32)))
        tot = gathered.reshape(-1, local.size * 2).view(np.float64).sum(0)
        if tot[0] == 0:
            raise ValueError(empty_msg)
        return {"MRR": tot[2] / tot[0], "MR": tot[1] / tot[0],
                "HITS@1": tot[3] / tot[0], "HITS@3": tot[4] / tot[0],
                "HITS@10": tot[5] / tot[0]}
    if r.size == 0:
        raise ValueError(empty_msg)
    return metrics_from_ranks(r)


class DevicePipeline:
    """Fully device-resident training feed: triples + epoch permutation live
    in HBM; each call samples on device (see make_device_pipeline_step).
    The host only tracks an integer offset and refreshes the permutation
    (computed ON DEVICE) between epochs.

    Multi-host (`jax.process_count() > 1`): each host contributes its OWN
    edge partition into a [ndev, 3, E_max] plane (every device of host p
    holds a copy of p's partition, cycle-padded to the pod-max length so
    all hosts share one epoch clock), and the scanned step assembles the
    global batch on device — the --dist hot loop keeps the same
    zero-per-step-host-transfer property as single-host (see
    make_device_pipeline_step_multihost; reference contract:
    kvclient.py:140-156, no per-step host coordination)."""

    def __init__(self, model: KEModel, dataset, batch_size: int,
                 neg_total: int, steps_per_call: int, seed: int = 0,
                 plan=None):
        h, r, t = dataset.train[0], dataset.train[1], dataset.train[2]
        triples = np.stack([h, r, t]).astype(np.int32)
        # edge-importance weights live in HBM next to the triples and are
        # gathered inside the scanned step — weighted training keeps the
        # zero-host-transfer hot loop
        impts = (np.asarray(dataset.train[3], np.float32)
                 if getattr(dataset, "has_edge_importance", False)
                 and len(dataset.train) > 3 else None)
        self._fence = ([] if (jax.default_backend() == "cpu"
                              and jax.process_count() > 1) else None)
        self._multihost = plan is not None and jax.process_count() > 1
        if self._multihost:
            self._init_multihost(model, triples, impts, batch_size,
                                 neg_total, steps_per_call, seed, plan)
            return
        if plan is not None:
            # replicate the edge list over the mesh; batches are split onto
            # the dp axis inside the jitted call (with_sharding_constraint)
            from jax.sharding import NamedSharding, PartitionSpec
            self._rep = NamedSharding(plan.mesh, PartitionSpec())
            self.triples = jax.device_put(triples, self._rep)
            self.impts = (jax.device_put(impts, self._rep)
                          if impts is not None else None)
        else:
            self._rep = None
            self.triples = jax.device_put(triples)
            self.impts = (jax.device_put(impts)
                          if impts is not None else None)
        self.n_edges = len(h)
        self.b = batch_size
        self.s = steps_per_call
        assert self.n_edges >= self.s * self.b, (
            "device pipeline needs n_edges >= steps_per_call * batch_size; "
            "lower steps_per_call for tiny datasets")
        self.step_fn = model.make_device_pipeline_step(
            self.n_edges, batch_size, neg_total, steps_per_call, plan=plan,
            with_impts=self.impts is not None)
        # The base key is ALWAYS threefry: per-step negative keys derive
        # from it with sound split/fold_in, and the draws themselves ride
        # the hardware RngBitGenerator via the hybrid schedule
        # (ke_model._pipeline_rng_mode — deriving per-step keys with
        # rbg's own fold_in correlated the negative streams and degraded
        # SimplE at scale; see the preserved red fragments).
        key = jax.random.PRNGKey(seed)
        if self._rep is not None:
            self.base_key = jax.device_put(key, self._rep)
        else:
            self.base_key = jax.device_put(key)
        # Two epoch permutations (current + next): batches may straddle the
        # epoch boundary, so no tail edge is dropped (exact
        # without-replacement epochs).  cur = epoch 0's shuffle, generated
        # on device; nxt starts as a placeholder — the first straddling
        # call regenerates it before any straddled index reads it.
        gen = jax.jit(
            lambda k, e: jax.random.permutation(
                jax.random.fold_in(k, e), self.n_edges).astype(np.int32),
            static_argnums=(1,),
            out_shardings=self._rep if self._rep is not None else None)
        self.cur = gen(self.base_key, 0)
        self.nxt = gen(self.base_key, 1)  # distinct buffer: nxt is donated
        self.pos = 0
        self.epoch = 0
        self.call_idx = 0

    def _init_multihost(self, model, triples, impts, batch_size,
                        neg_total, steps_per_call, seed, plan):
        """Build the [ndev, 3, E_max] per-host edge plane + per-host epoch
        permutations (see class docstring).  Collective: every process
        must construct the pipeline (allgather of partition sizes +
        make_array_from_process_local_data)."""
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec

        nproc = jax.process_count()
        local = jax.local_device_count()
        ndev = plan.mesh.devices.size
        sizes = np.asarray(multihost_utils.process_allgather(
            np.asarray(triples.shape[1], np.int64)))
        n_edges = int(sizes.max())
        if triples.shape[1] < n_edges:
            # cycle-pad shorter partitions to the pod max: every host
            # shares one epoch length (the pos/epoch scalars are global),
            # at the cost of re-sampling a few edges on underfull hosts —
            # partition_for_host strides differ by <=1 edge, and LDG
            # partitions are balance-constrained, so the repetition is
            # negligible in practice
            reps = -(-n_edges // triples.shape[1])
            triples = np.tile(triples, (1, reps))[:, :n_edges]
            if impts is not None:
                impts = np.tile(impts, reps)[:n_edges]
        sh_plane = NamedSharding(plan.mesh,
                                 PartitionSpec(plan.axis, None, None))
        sh_rows = NamedSharding(plan.mesh, PartitionSpec(plan.axis, None))
        local_plane = np.ascontiguousarray(
            np.broadcast_to(triples[None], (local, 3, n_edges)))
        self.triples = jax.make_array_from_process_local_data(
            sh_plane, local_plane, (ndev, 3, n_edges))
        if impts is not None:
            li = np.ascontiguousarray(
                np.broadcast_to(impts[None], (local, n_edges)))
            self.impts = jax.make_array_from_process_local_data(
                sh_rows, li, (ndev, n_edges))
        else:
            self.impts = None
        self._rep = None
        self.n_edges = n_edges
        self.b = batch_size
        self.s = steps_per_call
        assert n_edges >= self.s * self.b, (
            "device pipeline needs every host's (padded) partition >= "
            "steps_per_call * batch_size; lower steps_per_call")
        # threefry base key (sound derivations; per-step draw keys follow
        # ke_model._pipeline_rng_mode — same rationale as single-host)
        key = jax.random.key(seed)
        impl = None
        # raw key DATA: a typed process-local key cannot enter a
        # global-mesh jit; the step fn re-wraps it (same impl)
        self.base_key = np.asarray(jax.random.key_data(key))
        self.step_fn = model.make_device_pipeline_step_multihost(
            n_edges, batch_size, neg_total, steps_per_call, plan,
            nproc, local, key_impl=impl, with_impts=self.impts is not None)

        def _gen(kd, e):
            base = jax.random.wrap_key_data(kd, impl=impl)
            host = jnp.arange(ndev, dtype=jnp.int32) // local
            keys = jax.vmap(
                lambda hh: jax.random.fold_in(base, e * nproc + hh))(host)
            return jax.vmap(
                lambda k: jax.random.permutation(k, n_edges)
            )(keys).astype(jnp.int32)

        # same per-host key schedule as the in-call refresh
        # (epoch * nproc + host), so epoch 1+ regeneration is consistent
        gen = jax.jit(_gen, static_argnums=(1,), out_shardings=sh_rows)
        self.cur = gen(self.base_key, 0)
        self.nxt = gen(self.base_key, 1)
        self.pos = 0
        self.epoch = 0
        self.call_idx = 0

    # XLA:CPU's cross-process collective rendezvous DEADLOCKS when too
    # many collective-bearing executions are queued without a host sync
    # (measured: ~100 in-flight calls wedge a 2-process Gloo run; 10 are
    # fine) — each in-flight execution pins a thread at a rendezvous and
    # the peer's matching execution is stuck behind its own queue.  Cap
    # the dispatch depth on the CPU backend only; TPU hardware queues
    # don't have this failure mode and deep pipelining is where the
    # throughput comes from.
    _CPU_FENCE_DEPTH = 8

    def _maybe_fence(self, logs):
        if self._fence is None:
            return
        self._fence.append(logs)
        if len(self._fence) > self._CPU_FENCE_DEPTH:
            jax.block_until_ready(self._fence.pop(0))

    def run_call(self, state):
        # >= : at an exact boundary nothing straddles, but nxt must still be
        # regenerated before the rotation below swaps it in as cur
        refresh = self.pos + self.s * self.b >= self.n_edges
        (state, self.nxt), logs = self.step_fn(
            state, self.triples, self.impts, self.cur, self.nxt,
            np.int32(self.pos), np.int32(self.epoch),
            np.int32(self.call_idx), self.base_key,
            refresh_next=refresh)
        self._maybe_fence(logs)
        self.pos += self.s * self.b
        if self.pos >= self.n_edges:
            # the straddling call regenerated nxt (epoch+1); rotate it in
            self.pos -= self.n_edges
            self.epoch += 1
            self.cur, self.nxt = self.nxt, self.cur
        self.call_idx += 1
        return state, logs


class CandidateEvalSampler:
    """Batches of (query [B,2], answer-index [B], candidates [B,K]) for
    candidate-list evaluation (reference WikiEvalSampler, sampler.py:599-648;
    wikikg90M's 'h,r->t' task with 1001 candidates)."""

    def __init__(self, edges: dict, batch_size: int,
                 rank: int = 0, ranks: int = 1):
        d = edges["h,r->t"]
        sl = slice(rank, None, ranks)  # per-rank striding (dist eval:
        # each process writes its own test_{rank}.pkl stride, reference
        # train_pytorch.py:208-234)
        self.hr = np.asarray(d["hr"], np.int32)[sl]
        self.ans = (np.asarray(d["t_correct_index"], np.int32)[sl]
                    if "t_correct_index" in d else None)
        self.cand = np.asarray(d["t_candidate"], np.int32)[sl]
        self.batch_size = batch_size



def evaluate_candidates(model: KEModel, state: TrainState,
                        sampler: CandidateEvalSampler, mode: str = "Valid",
                        save_path: Optional[str] = None, rank: int = 0,
                        log=print, plan=None,
                        slice_ranks: int = 1) -> Optional[Dict[str, float]]:
    """Candidate-list eval: Valid mode computes MRR/MR/Hits@k from the true
    answer's rank among its candidates; Test mode writes test_{rank}.pkl with
    top-10 predictions (reference train_pytorch.py:208-234).

    Under _global_eval(plan) the caller must feed an UNSTRIDED sampler
    (identical batches on every process — see evaluate); metrics then come
    out globally on every rank, and Test mode slices `rank::slice_ranks`
    from the global predictions at write time so the per-rank pkl artifact
    layout matches the reference's strided protocol."""
    import pickle

    # Whole-chunk dispatch: the sampler's (hr, ans, cand) arrays are
    # chunked by candidate-payload byte budget and each chunk runs as ONE
    # [M, B, ...] megastep call; Valid-mode ranks are computed on device
    # (the reference's self-counting tie rank, general_models.py:504), so
    # no [B, K] fp32 score matrix ever crosses the link.
    if mode == "Valid" and sampler.ans is None:
        raise ValueError(
            "Valid-mode candidate eval needs answer indices "
            "(t_correct_index missing from the candidate split)")
    eval_fn = model.make_candidate_megastep(
        with_ranks=(mode == "Valid"), with_top=(mode != "Valid"))
    b = sampler.batch_size
    n = len(sampler.hr)
    n_cand = sampler.cand.shape[1]
    rows_cap = max(b, _MEGA_BUDGET // (int(n_cand) * 4) // b * b)
    all_ranks, all_top10, all_ans = [], [], []
    for beg in range(0, n, rows_cap):
        hr = sampler.hr[beg:beg + rows_cap]
        cand = sampler.cand[beg:beg + rows_cap]
        ans = (sampler.ans[beg:beg + rows_cap]
               if sampler.ans is not None else None)
        nn = len(hr)
        # pad the tail to a whole batch — and, when the split spans
        # several chunks, all the way to rows_cap so every chunk shares
        # ONE jit (m, b, k) shape; trimmed after the fetch via [:nn]
        pad = (rows_cap - nn) if n > rows_cap else (-nn % b)
        if pad:
            hr = np.concatenate([hr, np.repeat(hr[:1], pad, axis=0)])
            cand = np.concatenate([cand, np.repeat(cand[:1], pad, axis=0)])
            if ans is not None:
                ans = np.concatenate([ans, np.repeat(ans[:1], pad)])
        m = len(hr) // b
        a = (ans if ans is not None
             else np.zeros(m * b, np.int32)).reshape(m, b)
        out = eval_fn(state, hr.reshape(m, b, 2),
                      cand.reshape(m, b, n_cand), a)
        if mode == "Valid":
            all_ranks.append(np.asarray(out[0]).reshape(-1)[:nn])
        else:
            all_top10.append(np.asarray(out[-1]).reshape(m * b, -1)[:nn])
            if sampler.ans is not None:
                all_ans.append(sampler.ans[beg:beg + rows_cap])
    if mode == "Valid":
        r = (np.concatenate(all_ranks) if all_ranks
             else np.zeros((0,), np.float64))
        metrics = combine_rank_metrics(
            r, plan, "candidate evaluation saw zero queries on every rank")
        for k, v in metrics.items():
            log(f"[{rank}]{mode} average {k}: {v}")
        return metrics
    sl = slice(rank, None, slice_ranks) if slice_ranks > 1 else slice(None)
    # an empty per-rank stride (more ranks than queries, or a tiny
    # custom split) writes an empty pkl instead of crashing the rank
    # mid-collective on np.concatenate([])
    top10 = (np.concatenate(all_top10) if all_top10
             else np.zeros((0, 10), np.int64))
    out = {"h,r->t": {"t_pred_top10": top10[sl]}}
    if all_ans:
        out["h,r->t"]["t_correct_index"] = np.concatenate(all_ans)[sl]
    if save_path:
        with open(os.path.join(save_path, f"test_{rank}.pkl"), "wb") as f:
            pickle.dump(out, f)
    return None


_MEGA_BUDGET = 512 << 20  # packed filter-array bytes per eval device call


def _mega_eval(mega_fn, state, batches, G):
    """Rank all full-entity eval `batches` in a few packed device calls.

    Batches (dicts from EvalSampler) are bucketed by their pow2-padded
    filter width F, each bucket is chunked to ~_MEGA_BUDGET packed bytes,
    and each chunk runs as ONE [M, G, B(, F)] megastep call — so h2d
    transfers and dispatches are per-chunk instead of per-G-group.  The
    jit specializes on (M, F): both are fixed for a given split + batch
    size, so a training run's periodic evals compile once.  Unfiltered
    eval builds its empty filter arrays on device (jnp.zeros — no
    upload).  Returns per-batch rank arrays trimmed to n_valid, in the
    original batch order (ranking is per-row, so regrouping is exact).
    """
    B = len(batches[0]["h"])
    neg_head = batches[0]["neg_head"]
    filtered = "filter_ids" in batches[0]
    widths = np.array([b["filter_ids"].shape[1] if filtered else 8
                       for b in batches])
    out = [None] * len(batches)
    for f in np.unique(widths):
        idxs = np.nonzero(widths == f)[0]
        per_batch = int(B) * int(f) * 5  # int32 ids + uint8 mask
        cap = max(G, _MEGA_BUDGET // per_batch // G * G)
        for c0 in range(0, len(idxs), cap):
            chunk = idxs[c0:c0 + cap]
            if len(idxs) > cap:
                # bucket spans several chunks: pad the tail up to the cap
                # so every chunk shares ONE (M, G, F) jit shape — the
                # padding is amortized over many full chunks, and a
                # second compile costs minutes on the tunneled TPU
                g, m = G, cap // G
            else:
                # single-chunk bucket: shrink the group width onto a pow2
                # ladder instead of padding up to G.  Padding a small
                # split to a full [1, G] call repeats real batches up to
                # Gx — the r4 12M-entity eval (8 groups/direction padded
                # to 32) burned 4x its compute on duplicates, and a
                # 1-batch valid split burned 32x.  The ladder bounds both
                # the waste (<2x) and the shape count (<= 6 per F).
                g = min(G, 1 << max(0, len(chunk) - 1).bit_length())
                m = -(-len(chunk) // g)
            sel = np.concatenate(
                [chunk, np.repeat(chunk[:1], m * g - len(chunk))])
            hs = np.stack([batches[i]["h"] for i in sel]).reshape(m, g, B)
            rs = np.stack([batches[i]["r"] for i in sel]).reshape(m, g, B)
            ts = np.stack([batches[i]["t"] for i in sel]).reshape(m, g, B)
            if filtered:
                fid = np.stack([batches[i]["filter_ids"] for i in sel]
                               ).reshape(m, g, B, f)
                fm = np.stack([batches[i]["filter_mask"] for i in sel]
                              ).reshape(m, g, B, f)
            else:
                fid = jnp.zeros((m, g, B, 8), jnp.int32)
                fm = jnp.zeros((m, g, B, 8), jnp.uint8)
            ranks = np.asarray(
                mega_fn(state, hs, rs, ts, fid, fm, neg_head)
            ).reshape(m * g, B)
            for j, i in enumerate(chunk):
                out[i] = ranks[j][: batches[i]["n_valid"]]
    return out


def evaluate_with_samplers(model: KEModel, state: TrainState, samplers,
                           phase: str = "Test", log=print,
                           plan=None) -> Dict[str, float]:
    if any(isinstance(s, CandidateEvalSampler) for s in samplers):
        # candidate-list protocol (wikikg90M): one sampler, Valid-mode
        # metrics from the answer's rank among its candidates
        (sampler,) = samplers
        return evaluate_candidates(model, state, sampler, mode="Valid",
                                   log=log, plan=plan)
    # Full-entity eval: ALL of a split's batches are packed into a few
    # byte-budgeted mega-calls (_mega_eval + make_eval_megastep): each
    # call uploads its whole chunk once and lax.maps over the G-batch
    # groups on device, so h2d transfer count and dispatch count are
    # per-CHUNK, not per-group (per-group uploads measured ~0.75 ms/edge
    # over the tunneled test TPU — time scaled with bytes uploaded, not
    # with device work).  Sampled-negative eval keeps the bounded async
    # window below.
    G = 32
    WINDOW = 8
    if plan is not None and plan.table_sharding == "vocab":
        # vocab-sharded tables: score candidates where their rows live
        # (shard_map) so eval collectives stay batch-proportional
        mega_fn = model.make_sharded_eval_megastep(plan)
    else:
        if jax.process_count() > 1 and plan is None:
            sh = getattr(state.entity.emb, "sharding", None)
            if sh is not None and not sh.is_fully_replicated:
                raise ValueError(
                    "multi-process eval over a sharded entity table "
                    "requires plan= (the batches would enter the global "
                    "mesh inconsistently and silently corrupt metrics); "
                    "pass the ShardingPlan used for training")
        mega_fn = model.make_eval_megastep()
    sampled_eval_fn = None
    ones_keep: dict = {}  # cached constant all-ones keep masks (unfiltered
    # sampled eval would otherwise allocate + upload ~33 MB per call)
    pending = []   # (device ranks [G, B], group) in dispatch order
    all_ranks = []
    start = time.time()

    def drain(keep: int):
        while len(pending) > keep:
            dev_ranks, group = pending.pop(0)
            ranks = np.asarray(dev_ranks)
            for i, g in enumerate(group):
                all_ranks.append(ranks[i][: g["n_valid"]])

    def flush_sampled(group):
        # sampled-negative protocol (--neg_sample_size_eval): rank
        # against the batch's K shared candidates only
        nonlocal sampled_eval_fn
        nb = len(group)
        if nb == 0:
            return
        pad = group + [group[0]] * (G - nb)   # pad group to G: one compile
        b = len(pad[0]["h"])
        hs = np.stack([g["h"] for g in pad])
        rs = np.stack([g["r"] for g in pad])
        ts = np.stack([g["t"] for g in pad])
        k = pad[0]["neg"].shape[0]
        ns = np.stack([g["neg"] for g in pad])
        if "neg_keep" in pad[0]:
            keep = np.stack([g["neg_keep"] for g in pad])
        else:
            keep = ones_keep.get((G, b, k))
            if keep is None:
                # device-resident constant: uploaded once, reused by
                # every unfiltered call
                keep = ones_keep[(G, b, k)] = jnp.ones((G, b, k), jnp.uint8)
        nv = np.asarray([g["n_valid"] for g in pad], np.int32)
        if sampled_eval_fn is None:
            sampled_eval_fn = model.make_sampled_eval_superstep()
        pending.append((sampled_eval_fn(
            state, hs, rs, ts, ns, keep, nv, pad[0]["neg_head"],
            pad[0].get("neg_deg_sample", False)), group))

    def _batch_bytes(b):
        if "filter_ids" in b:
            return b["filter_ids"].nbytes + b["filter_mask"].nbytes
        return 3 * b["h"].nbytes

    for sampler in samplers:
        it = iter(sampler)
        first = next(it, None)
        if first is None:
            continue
        if "neg" in first:
            group = [first]
            for batch in it:
                if len(group) == G:
                    flush_sampled(group)
                    drain(WINDOW)
                    group = []
                group.append(batch)
            flush_sampled(group)
        else:
            # stream in bounded slabs (~2x _MEGA_BUDGET of host-resident
            # filter bytes): _mega_eval packs within each slab, so a
            # Freebase-scale split never holds all its batch dicts at once
            slab, slab_bytes = [first], _batch_bytes(first)
            for batch in it:
                if slab_bytes >= 2 * _MEGA_BUDGET:
                    all_ranks.extend(_mega_eval(mega_fn, state, slab, G))
                    slab, slab_bytes = [], 0
                slab.append(batch)
                slab_bytes += _batch_bytes(batch)
            all_ranks.extend(_mega_eval(mega_fn, state, slab, G))
    drain(0)
    ranks = (np.concatenate(all_ranks) if all_ranks
             else np.zeros((0,), np.int64))
    metrics = combine_rank_metrics(
        ranks, plan, "evaluation saw zero edges on every rank (eval split "
        "smaller than process count, or eval_percent too small)")
    for k, v in metrics.items():
        log(f"[0]{phase} average {k}: {v}")
    log(f"[0]{phase} takes {time.time() - start:.3f} seconds")
    return metrics
