"""`dglke_tpu-train` — training CLI (reference: dglke_train, train.py)."""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

from dglke_tpu.cli.args import add_common_args, add_train_args, \
    config_from_args, warn_inert_flags
from dglke_tpu.data.dataset import get_dataset
from dglke_tpu.data.sampler import FilterIndex, partition_for_host
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import evaluate, train
from dglke_tpu.utils.io import save_model


def prepare_save_path(cfg, multihost: bool = False):
    os.makedirs(cfg.save_path, exist_ok=True)
    folder = f"{cfg.model_name}_{cfg.dataset}_"
    n = len([x for x in os.listdir(cfg.save_path) if x.startswith(folder)])
    if multihost:
        # every process must agree on the numbered directory (the sharded
        # orbax save is collective); rank 0 decides, everyone adopts
        import numpy as _np
        from jax.experimental import multihost_utils
        n = int(multihost_utils.broadcast_one_to_all(_np.int32(n)))
    path = os.path.join(cfg.save_path, folder + str(n))
    os.makedirs(path, exist_ok=True)
    return dataclasses.replace(cfg, save_path=path)


def main(argv=None):
    parser = argparse.ArgumentParser("dglke_tpu-train")
    add_common_args(parser)
    add_train_args(parser)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    warn_inert_flags(args)

    if args.dist and cfg.mix_cpu_gpu:
        # refuse BEFORE hours of training: host-table replicas have no
        # ShardingPlan, so the multi-process end-of-run save (which
        # gathers the sharded tables via plan.mesh) cannot work
        raise SystemExit(
            "--mix_cpu_gpu is a single-host mode (tables live in one "
            "host's DRAM); combine --dist with HBM tables "
            "(--table_sharding vocab shards big tables over the pod)")
    if args.dist:
        import jax
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
            cluster_detection_method="deactivate")
    cfg = prepare_save_path(cfg, multihost=args.dist)

    init_start = time.time()
    full_dataset = None   # unpartitioned dataset, kept for the eval filter
    if args.dist and args.partition_path is not None:
        # per-host edge partition (dglke_tpu-partition artifacts); the
        # entity table stays globally sharded over the pod mesh
        import jax
        from dglke_tpu.data.partition_dataset import load_partition
        part = load_partition(args.partition_path, jax.process_index())
        from dglke_tpu.data.dataset import KGDataset
        dataset = KGDataset(name=cfg.dataset,
                            n_entities=part.n_entities,
                            n_relations=part.n_relations,
                            train=part.train,
                            # this host's edge slice only: if eval splits are
                            # ever attached here, the partitioned-filter guard
                            # in trainer.evaluate() must refuse to build a
                            # deflated FilterIndex from it
                            train_partitioned=True)
    else:
        dataset = get_dataset(cfg.data_path, cfg.dataset, cfg.format,
                              cfg.delimiter, cfg.data_files,
                              cfg.has_edge_importance)
        if args.dist:
            import jax
            maybe = os.path.join(cfg.data_path, cfg.dataset, "partition_0")
            if os.path.isdir(maybe):
                print(f"NOTE: offline partition artifacts exist at "
                      f"{os.path.dirname(maybe)} but --partition_path was "
                      f"not given; partitioning the edge list in situ "
                      f"instead")
            if jax.process_count() > 1:
                # the eval filter must cover the FULL train split (the
                # reference builds it over the whole graph, train.py:331);
                # keep the unpartitioned dataset for FilterIndex below —
                # partition_for_host replaces train with this host's slice
                full_dataset = dataset
                dataset = partition_for_host(
                    dataset, jax.process_index(), jax.process_count(),
                    rel_part=cfg.rel_part)
    print(f"|Train|: {dataset.n_train}")

    import jax
    n_dev = len(jax.devices())
    plan = None
    if n_dev > 1 and not cfg.mix_cpu_gpu:
        from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
        plan = ShardingPlan(make_mesh(n_dev),
                            table_sharding=args.table_sharding)
        print(f"Using {n_dev}-device mesh "
              f"(tables: {args.table_sharding})")

    model = KEModel(cfg, dataset.n_entities, dataset.n_relations)
    state = None
    if args.init_from and cfg.mix_cpu_gpu:
        # host-table resume: straight from npy, no device round trip
        from dglke_tpu.host_table import load_host_state
        state = load_host_state(cfg, model, args.init_from)
        print(f"Resumed from {args.init_from} at step {state.step}")
    elif args.init_from:
        from dglke_tpu.utils.io import has_sharded, load_model_state, \
            load_sharded
        if has_sharded(args.init_from):
            # sharded (orbax) checkpoint: restore directly into the fresh
            # state's layout — the full table never exists on one host
            template = model.init_state(jax.random.PRNGKey(cfg.seed))
            if plan is not None:
                template = plan.put_state(template)
            state = load_sharded(template, args.init_from)
        else:
            state = load_model_state(cfg, model, args.init_from)
            if plan is not None:
                state = plan.put_state(state)
        print(f"Resumed from {args.init_from} at step "
              f"{int(state.step)}")
    print(f"Init takes {time.time() - init_start:.3f} seconds")

    candidate_mode = dataset.valid_dict is not None or \
        dataset.test_dict is not None
    if cfg.mix_cpu_gpu and (
            (args.valid and dataset.valid_dict is not None)
            or (cfg.test and dataset.test_dict is not None)):
        # fail BEFORE step 1, not at the first eval interval (or worse,
        # after the full run): candidate-list (wikikg90M-style) eval
        # needs the table on device, which host mode exists to avoid
        raise SystemExit(
            "--mix_cpu_gpu cannot evaluate candidate-list datasets "
            "(wikikg90M-style valid_dict/test_dict): drop --valid/--test "
            "here and evaluate the checkpoint without --mix_cpu_gpu "
            "(artifacts interchange), or on a vocab-sharded mesh")
    # Build the eval filter only when something will evaluate: the
    # lexsort over the full train split is O(E log E) host work
    # (~minutes + GBs at Freebase scale) a pure training run never
    # reads.  Never build it from a per-host partition slice — a
    # deflated filter silently understates ranks (full_dataset carries
    # the unpartitioned graph when eval splits exist).
    needs_eval = args.valid or cfg.test
    filter_source = full_dataset or dataset
    filter_index = (FilterIndex(filter_source)
                    if cfg.eval_filter and not candidate_mode
                    and needs_eval
                    and not getattr(filter_source, "train_partitioned",
                                    False)
                    else None)
    # eval striding: per-rank strides + allgathered partial sums with
    # replicated tables; IDENTICAL batches on every process with a
    # vocab-sharded table (trainer._global_eval — the batch enters the
    # global mesh as a replicated input, so per-rank strides would mix
    # different edges' counts in the psum)
    from dglke_tpu.trainer import _global_eval
    if _global_eval(plan):
        eval_rank, eval_ranks_n = 0, 1
    else:
        eval_rank, eval_ranks_n = jax.process_index(), jax.process_count()
    valid_samplers = None
    if args.valid and dataset.valid_dict is not None:
        from dglke_tpu.trainer import CandidateEvalSampler
        valid_samplers = [CandidateEvalSampler(dataset.valid_dict,
                                               cfg.batch_size_eval,
                                               rank=eval_rank,
                                               ranks=eval_ranks_n)]
    elif args.valid and dataset.valid is not None:
        from dglke_tpu.data.sampler import EvalSampler
        valid_samplers = [
            EvalSampler(dataset, "valid", cfg.batch_size_eval, mode,
                        filter_index, eval_percent=cfg.eval_percent,
                        rank=eval_rank,
                        ranks=eval_ranks_n, seed=cfg.seed,
                        neg_sample_size=cfg.neg_sample_size_eval,
                        neg_deg_sample=cfg.neg_deg_sample_eval)
            for mode in ("head", "tail")
        ]
    cfg = dataclasses.replace(cfg, valid=args.valid)

    # Layout metadata for sharded (orbax) checkpoints: their global shapes
    # depend on how training sharded the tables (vocab sharding mesh-pads
    # the entity rows), so the effective layout is recorded in config.json
    # and eval/resume restore deterministically — no layout probing.
    ckpt_meta = {
        "ckpt_table_sharding": plan.table_sharding if plan is not None
        else "replicated",
        "ckpt_mesh_size": plan.n if plan is not None else 1,
    }

    save_fn = None
    if cfg.save_interval > 0 and not cfg.no_save_emb:
        if jax.process_count() > 1 and not args.sharded_ckpt:
            raise SystemExit(
                "--save_interval under --dist requires --sharded_ckpt "
                "(replicating the table to one host per interval is not "
                "feasible at multi-host scale)")

        def save_fn(st, step):
            # periodic fault-tolerance checkpoint, overwritten in place;
            # resume with --init_from <save_path>
            if args.sharded_ckpt:
                from dglke_tpu.utils.io import save_sharded
                save_sharded(st, cfg.save_path)
                if jax.process_index() == 0:
                    cfg.save(cfg.save_path, dataset.emap_fname,
                             dataset.rmap_fname, **ckpt_meta)
            else:
                save_model(cfg, model, st, emap_file=dataset.emap_fname,
                           rmap_file=dataset.rmap_fname)
            if jax.process_index() == 0:
                print(f"[proc 0]checkpoint at step {step} "
                      f"-> {cfg.save_path}")

    model, state, info = train(cfg, dataset, model=model, state=state,
                               plan=plan, valid_samplers=valid_samplers,
                               profile_dir=args.profile, save_fn=save_fn)

    if not cfg.no_save_emb:
        if args.sharded_ckpt:
            # each host writes its own table shards (orbax OCDBT); the full
            # table is never replicated anywhere — the only feasible save
            # at Freebase scale.  config.json still written for tooling.
            from dglke_tpu.utils.io import save_sharded
            save_sharded(state, cfg.save_path)
            if jax.process_index() == 0:
                cfg.save(cfg.save_path, dataset.emap_fname,
                         dataset.rmap_fname, **ckpt_meta)
        elif jax.process_count() > 1:
            # Gather the sharded tables so rank 0 can persist them (the
            # reference's machine-0 100-slice pull, train_pytorch.py:282-335,
            # collapses into one replicating jit).
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(plan.mesh, PartitionSpec())
            state = jax.jit(
                lambda s: s,
                out_shardings=jax.tree.map(lambda _: rep, state))(state)
            if jax.process_index() == 0:
                save_model(cfg, model, state, emap_file=dataset.emap_fname,
                           rmap_file=dataset.rmap_fname)
        else:
            save_model(cfg, model, state, emap_file=dataset.emap_fname,
                       rmap_file=dataset.rmap_fname)

    if cfg.test:
        if dataset.test_dict is not None:
            # wikikg90M protocol: write test_{rank}.pkl top-10 predictions
            # (reference train_pytorch.py:208-234)
            from dglke_tpu.trainer import CandidateEvalSampler, \
                evaluate_candidates
            sampler = CandidateEvalSampler(dataset.test_dict,
                                           cfg.batch_size_eval,
                                           rank=eval_rank,
                                           ranks=eval_ranks_n)
            # under _global_eval the sampler is unstrided (identical
            # batches everywhere); each rank slices its stride from the
            # global predictions at pkl-write time
            evaluate_candidates(
                model, state, sampler, mode="Test",
                save_path=cfg.save_path, rank=jax.process_index(),
                plan=plan,
                slice_ranks=(jax.process_count() if _global_eval(plan)
                             else 1))
        elif dataset.test is not None:
            evaluate(cfg, dataset, model, state, "test",
                     filter_index=filter_index, plan=plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
