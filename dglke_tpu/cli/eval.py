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
            double_rel=saved.double_rel, dataset=saved.dataset)

    dataset = get_dataset(cfg.data_path, cfg.dataset, cfg.format,
                          cfg.delimiter, cfg.data_files,
                          cfg.has_edge_importance)
    model = KEModel(cfg, dataset.n_entities, dataset.n_relations)
    import jax
    n_dev = len(jax.devices())
    plan = None

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
        # sharded (orbax) checkpoint from --sharded_ckpt: the saved shapes
        # depend on how training sharded the tables (vocab sharding mesh-
        # pads the entity rows) — try the replicated layout first, then
        # the vocab-sharded one.
        from dglke_tpu.utils.io import load_sharded
        template = model.init_state(jax.random.PRNGKey(cfg.seed))
        if want_vocab:
            state = load_sharded(vocab_plan().put_state(template),
                                 args.model_path)
        else:
            try:
                state = load_sharded(template, args.model_path)
            except Exception as e:  # noqa: BLE001 — layout probe, see below
                # A checkpoint written from vocab-sharded training stores
                # mesh-PADDED entity rows, and orbax's layout-mismatch
                # error class/wording varies across versions — so retry
                # the one other layout we could have written rather than
                # pattern-match the message.  A real restore error
                # (corrupt ckpt, dtype mismatch) fails BOTH attempts and
                # the original error surfaces as itself.
                if n_dev <= 1:
                    raise
                try:
                    state = load_sharded(vocab_plan().put_state(template),
                                         args.model_path)
                except Exception:
                    plan = None
                    raise e
    else:
        state = load_model_state(cfg, model, args.model_path)
        if want_vocab:
            # mirror cli/train.py: shard the dense artifact over the mesh
            # so the sharded-eval path actually engages
            state = vocab_plan().put_state(state)
    evaluate(cfg, dataset, model, state, "test", plan=plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
