"""`dglke_tpu-eval` — standalone evaluation of a saved checkpoint
(reference: dglke_eval, eval.py)."""

from __future__ import annotations

import argparse
import dataclasses
import os

from dglke_tpu.cli.args import add_common_args, config_from_args, \
    warn_inert_flags
from dglke_tpu.data.dataset import get_dataset
from dglke_tpu.models.ke_model import KEModel
from dglke_tpu.trainer import evaluate
from dglke_tpu.utils.io import load_model_state


def main(argv=None):
    parser = argparse.ArgumentParser("dglke_tpu-eval")
    add_common_args(parser)
    parser.add_argument("--model_path", type=str, default="ckpts",
                        help="directory containing the saved checkpoint")
    parser.add_argument("--gpu", type=int, default=[-1], nargs="+")
    parser.add_argument("--mix_cpu_gpu", action="store_true")
    parser.add_argument("--no_mix_cpu_gpu", action="store_true",
                        help="force device (HBM) tables even when the "
                             "checkpoint was trained with --mix_cpu_gpu "
                             "(the table must fit in HBM)")
    parser.add_argument("--dist", action="store_true",
                        help="multi-host eval: initialize jax.distributed "
                             "from JAX_COORDINATOR_ADDRESS / "
                             "JAX_NUM_PROCESSES / JAX_PROCESS_ID; each "
                             "process ranks a stride of the eval split and "
                             "metrics are allgathered (the reference forks "
                             "num_proc test workers + an mp.Queue, "
                             "eval.py:107-229)")
    parser.add_argument("--table_sharding", default="replicated",
                        choices=["replicated", "vocab"])
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    warn_inert_flags(args)

    if args.dist:
        import jax
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
            cluster_detection_method="deactivate")

    # adopt model hyper-parameters from the checkpoint's config.json when
    # present so eval flags can stay minimal
    conf = os.path.join(args.model_path, "config.json")
    if os.path.exists(conf):
        from dglke_tpu.config import KGEConfig
        saved = KGEConfig.load(conf)
        cfg = dataclasses.replace(
            cfg, model_name=saved.model_name, hidden_dim=saved.hidden_dim,
            gamma=saved.gamma, double_ent=saved.double_ent,
            double_rel=saved.double_rel, dataset=saved.dataset,
            # storage dtype decides the sharded-ckpt template dtype (a
            # bf16-stored table cannot restore into an fp32 template)
            emb_dtype=saved.emb_dtype,
            # a checkpoint trained with host-resident tables may be
            # bigger than HBM: adopt the host path from the saved config
            # (--no_mix_cpu_gpu forces the device path; --mix_cpu_gpu
            # forces the host path on a device-trained checkpoint)
            mix_cpu_gpu=(cfg.mix_cpu_gpu or saved.mix_cpu_gpu)
            and not args.no_mix_cpu_gpu)

    dataset = get_dataset(cfg.data_path, cfg.dataset, cfg.format,
                          cfg.delimiter, cfg.data_files,
                          cfg.has_edge_importance)
    candidate_mode = dataset.test_dict is not None
    if candidate_mode and cfg.mix_cpu_gpu:
        # refuse BEFORE loading a maybe-bigger-than-HBM table:
        # candidate-list eval needs the table on device
        raise SystemExit(
            "--mix_cpu_gpu cannot evaluate candidate-list datasets "
            "(wikikg90M-style test_dict): pass --no_mix_cpu_gpu if the "
            "table fits in HBM, or evaluate on a vocab-sharded mesh")
    model = KEModel(cfg, dataset.n_entities, dataset.n_relations)
    import jax
    n_dev = len(jax.devices())
    plan = None
    if cfg.mix_cpu_gpu:
        # the checkpoint was trained with host-resident tables; evaluate
        # the same way (the table may not fit in HBM)
        from dglke_tpu.host_table import load_host_state
        print("Evaluating with host-resident tables (mix_cpu_gpu)")
        state = load_host_state(cfg, model, args.model_path)
        evaluate(cfg, dataset, model, state, "test")
        return 0

    def vocab_plan():
        nonlocal plan
        from dglke_tpu.parallel.mesh import ShardingPlan, make_mesh
        plan = ShardingPlan(make_mesh(n_dev), table_sharding="vocab")
        return plan

    want_vocab = args.table_sharding == "vocab" and n_dev > 1
    if args.table_sharding == "vocab" and n_dev == 1:
        print("NOTE: --table_sharding vocab has no effect on one device")
    from dglke_tpu.utils.io import has_sharded
    if has_sharded(args.model_path):
        # Sharded (orbax) checkpoint from --sharded_ckpt.  Its global
        # shapes are fixed by the layout recorded at SAVE time
        # (cli/train.py writes ckpt_table_sharding / ckpt_mesh_size into
        # config.json): vocab-sharded training pads the entity rows to a
        # multiple of the training mesh.  Reproduce that exact padded
        # shape in the restore template — deterministic, no
        # exception-driven layout probing.  Checkpoints predating the
        # metadata restore as replicated (the pre-metadata default).
        import json as _json
        import jax.numpy as jnp
        from dglke_tpu.utils.io import load_sharded
        meta = {}
        if os.path.exists(conf):
            with open(conf) as f:
                meta = _json.load(f)
        saved_vocab = meta.get("ckpt_table_sharding") == "vocab"
        saved_mesh = int(meta.get("ckpt_mesh_size", 1))
        template = model.init_state(jax.random.PRNGKey(cfg.seed))
        pad = ((-dataset.n_entities) % saved_mesh) if saved_vocab else 0
        if pad:
            ent = template.entity
            ent = ent._replace(
                emb=jnp.pad(ent.emb, ((0, pad), (0, 0))),
                state_sum=jnp.pad(ent.state_sum, ((0, pad),)))
            template = template._replace(entity=ent)
        saved_rows = template.entity.emb.shape[0]
        if want_vocab and saved_rows % n_dev == 0:
            # the eval mesh divides the saved (padded) rows: restore
            # straight into the vocab-sharded eval layout (put_state on
            # the already-padded template adds no further padding)
            state = load_sharded(vocab_plan().put_state(template),
                                 args.model_path)
        else:
            state = load_sharded(template, args.model_path)
            if want_vocab:
                # indivisible saved rows: restore replicated, then
                # re-shard (put_state pads further as needed)
                state = vocab_plan().put_state(state)
    else:
        state = load_model_state(cfg, model, args.model_path)
        if want_vocab:
            # mirror cli/train.py: shard the dense artifact over the mesh
            # so the sharded-eval path actually engages
            state = vocab_plan().put_state(state)
    if candidate_mode:
        # wikikg90M-style protocol (same routing as cli/train.py --test):
        # with answer indices, report Valid-mode metrics; without, write
        # the reference's test_{rank}.pkl top-10 predictions
        from dglke_tpu.trainer import CandidateEvalSampler, \
            _global_eval, evaluate_candidates
        if _global_eval(plan):
            eval_rank, eval_ranks_n = 0, 1
        else:
            eval_rank, eval_ranks_n = (jax.process_index(),
                                       jax.process_count())
        sampler = CandidateEvalSampler(dataset.test_dict,
                                       cfg.batch_size_eval,
                                       rank=eval_rank, ranks=eval_ranks_n)
        evaluate_candidates(
            model, state, sampler,
            mode="Valid" if sampler.ans is not None else "Test",
            save_path=args.model_path, rank=jax.process_index(),
            plan=plan,
            slice_ranks=(jax.process_count() if _global_eval(plan)
                         else 1))
        return 0
    evaluate(cfg, dataset, model, state, "test", plan=plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
