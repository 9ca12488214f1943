"""Shared CLI argument surface -> KGEConfig.

Mirrors the reference's CommonArgParser (utils.py:199-297) plus the
train-specific flags (train.py:40-60), so scripts written against dglke's
CLI work with `dglke_tpu` by renaming the executable.  GPU/process flags are
accepted for compatibility; on TPU they map to mesh settings.
"""

from __future__ import annotations

import argparse

from dglke_tpu.config import KGEConfig, LOSS_GENRES, MODEL_NAMES


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model_name", default="TransE",
                   choices=list(MODEL_NAMES))
    p.add_argument("--data_path", type=str, default="data")
    p.add_argument("--dataset", type=str, default="FB15k")
    p.add_argument("--format", type=str, default="built_in")
    p.add_argument("--data_files", type=str, default=None, nargs="+")
    p.add_argument("--delimiter", type=str, default="\t")
    p.add_argument("--save_path", type=str, default="ckpts")
    p.add_argument("--no_save_emb", action="store_true")
    p.add_argument("--max_step", type=int, default=80000)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--batch_size_eval", type=int, default=8)
    p.add_argument("--neg_sample_size", type=int, default=256)
    p.add_argument("--neg_deg_sample", action="store_true")
    p.add_argument("--neg_deg_sample_eval", action="store_true")
    p.add_argument("--neg_sample_size_eval", type=int, default=-1)
    p.add_argument("--eval_percent", type=float, default=1.0)
    p.add_argument("--no_eval_filter", action="store_true")
    p.add_argument("-log", "--log_interval", type=int, default=1000)
    p.add_argument("--eval_interval", type=int, default=10000)
    p.add_argument("--test", action="store_true")
    p.add_argument("--num_proc", type=int, default=1)
    p.add_argument("--num_thread", type=int, default=1)
    p.add_argument("--force_sync_interval", type=int, default=-1)
    p.add_argument("--hidden_dim", type=int, default=400)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("-g", "--gamma", type=float, default=12.0)
    p.add_argument("-de", "--double_ent", action="store_true")
    p.add_argument("-dr", "--double_rel", action="store_true")
    p.add_argument("-adv", "--neg_adversarial_sampling", action="store_true")
    p.add_argument("-a", "--adversarial_temperature", default=1.0,
                   type=float)
    p.add_argument("-rc", "--regularization_coef", type=float, default=2e-6)
    p.add_argument("-rn", "--regularization_norm", type=int, default=3)
    p.add_argument("-pw", "--pairwise", action="store_true")
    p.add_argument("--loss_genre", default="Logsigmoid",
                   choices=list(LOSS_GENRES))
    p.add_argument("-m", "--margin", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--has_edge_importance", action="store_true")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="score/matmul compute precision")
    p.add_argument("--emb_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="embedding table storage dtype (bfloat16 halves "
                        "the tables' HBM footprint — a capacity knob, "
                        "~5%% slower per step; optimizer stays fp32)")


def add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--gpu", type=int, default=[-1], nargs="+",
                   help="accepted for compatibility; devices come from "
                        "jax.devices()")
    p.add_argument("--mix_cpu_gpu", action="store_true",
                   help="keep embedding tables in HOST memory and move "
                        "only each batch's rows to the device (trains "
                        "tables bigger than HBM on one chip; reference "
                        "train.py:46-49)")
    p.add_argument("--valid", action="store_true")
    p.add_argument("--rel_part", action="store_true")
    p.add_argument("--async_update", action="store_true",
                   help="defer entity updates one step so the previous "
                        "batch's scatter overlaps this batch's gather "
                        "(deterministic version of the reference's async "
                        "updater process; rows scored one step stale)")
    p.add_argument("--table_sharding", default="replicated",
                   choices=["replicated", "vocab"],
                   help="how embedding tables are laid out over the mesh")
    p.add_argument("--dist", action="store_true",
                   help="multi-host SPMD: initialize jax.distributed from "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID and feed this host's edge partition")
    p.add_argument("--partition_path", type=str, default=None,
                   help="directory containing partition_<rank>/ artifacts "
                        "from dglke_tpu-partition; when omitted, --dist "
                        "partitions the edge list in situ per host "
                        "(seeded random, or soft relation partitioning "
                        "with --rel_part)")
    p.add_argument("--init_from", type=str, default=None,
                   help="resume training from a saved checkpoint directory "
                        "(tables + Adagrad state + step; the reference "
                        "cannot resume — train_pytorch.py:101-102)")
    p.add_argument("--save_interval", type=int, default=-1,
                   help="checkpoint every N steps during training "
                        "(fault tolerance for long runs; -1 = only at the "
                        "end). Works with --sharded_ckpt.")
    p.add_argument("--sharded_ckpt", action="store_true",
                   help="save a sharded (orbax) checkpoint instead of the "
                        "replicated npy artifacts: each host writes its own "
                        "table shards — required at Freebase scale where "
                        "the full table cannot fit one host. --init_from "
                        "auto-detects it.")
    p.add_argument("--profile", type=str, default=None,
                   help="capture a jax.profiler trace of steady-state steps "
                        "into this directory")


def config_from_args(args: argparse.Namespace) -> KGEConfig:
    fields = {f.name for f in
              __import__("dataclasses").fields(KGEConfig)}
    d = {k: v for k, v in vars(args).items() if k in fields}
    cfg = KGEConfig(**d)
    return cfg.with_compatible_batch_size().validate()


def warn_inert_flags(args: argparse.Namespace, log=print) -> None:
    """One startup line per accepted-but-inert compatibility flag, so a
    user never gets a silently different protocol.  (The reference's
    process/GPU knobs map onto the single SPMD program here: data
    parallelism comes from the device mesh, not worker processes.)"""
    if getattr(args, "num_proc", 1) > 1:
        log("NOTE: --num_proc is a compatibility no-op — data parallelism "
            "comes from the device mesh (all local devices are always "
            "used); use --dist for multi-host")
    if getattr(args, "force_sync_interval", -1) > 0:
        log("NOTE: --force_sync_interval is a compatibility no-op — the "
            "SPMD step is synchronous by construction")
    if getattr(args, "mix_cpu_gpu", False):
        log("NOTE: --mix_cpu_gpu keeps tables in host memory (capacity = "
            "host DRAM, throughput bounded by the host link); drop it "
            "if the tables fit in HBM")
    if getattr(args, "num_thread", 1) > 1:
        log("NOTE: --num_thread is a compatibility no-op — host sampling "
            "is vectorized numpy / native C++")
    if getattr(args, "rel_part", False) and not getattr(args, "dist",
                                                        False):
        log("NOTE: --rel_part only takes effect with --dist (it selects "
            "soft relation partitioning of the edge list across hosts); "
            "single-host training uses one global sampler")
