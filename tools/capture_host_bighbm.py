"""BIGGER-THAN-HBM single-chip training record via --mix_cpu_gpu
(host_table.py): a 48M-entity x 256-dim fp32 table (49 GiB — 3x the
v5e's 16 GB HBM) trains on ONE chip with the table in host DRAM.

Capability anchor: the reference trains Freebase-86M on one machine
with CPU-resident tables (train.py:46-49; benchmarks.rst:191-195).
This capture demonstrates the same capability class on TPU: the
49 GiB table cannot exist in HBM, the pure row-sized device step
computes on the MXU, and the host applies the exact sparse Adagrad.
Throughput here is bounded by the TUNNELED link's d2h leg (~20 MB/s
for the 3 MB/step gradient return); a real TPU VM's PCIe moves the
same rows in ~2 ms.  Quality-at-scale for host mode is covered by the
CPU equivalence tests (identical update + identical eval kernels as
the HBM path, tests/test_host_table.py) — a multi-epoch quality run at
this scale over the tunnel would take days and adds nothing those
proofs don't.

Run under tools/tpu_hunt.sh; writes tools/session_r5_host_bighbm.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = 12_000_000   # x4 entities/cluster = 48M entities
DIM = 256
STEPS = 512


def main():
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dglke_tpu.config import KGEConfig
    from dglke_tpu.data.dataset import planted_line_big
    from dglke_tpu.host_table import init_host_state
    from dglke_tpu.models.ke_model import KEModel
    from dglke_tpu.trainer import train

    t0 = time.time()
    ds = planted_line_big(n_clusters=N_CLUSTERS, per=4, n_relations=3,
                          line_len=10, n_test=2000)
    build_s = time.time() - t0
    cfg = KGEConfig(model_name="TransE_l2", hidden_dim=DIM, gamma=4.0,
                    lr=0.25, batch_size=1000, neg_sample_size=200,
                    neg_adversarial_sampling=True,
                    regularization_coef=1e-9, max_step=STEPS,
                    log_interval=128, dataset="planted48m", seed=0,
                    mix_cpu_gpu=True)
    model = KEModel(cfg, ds.n_entities, ds.n_relations)
    t0 = time.time()
    state = init_host_state(model, cfg.seed)
    init_s = time.time() - t0
    table_gib = state.entity.emb.nbytes / 2**30

    losses = []

    def log(msg, *a):
        print(msg, *a, flush=True)
        s = str(msg)
        if "average loss" in s:
            losses.append(float(s.rsplit(" ", 1)[-1]))

    t0 = time.time()
    model, state, info = train(cfg, ds, model=model, state=state, log=log)
    train_s = time.time() - t0
    rec = {
        "metric": "host_table_bigger_than_hbm_train",
        "n_entities": ds.n_entities, "n_train": ds.n_train,
        "hidden_dim": DIM, "table_gib": round(table_gib, 1),
        "hbm_gib": 16, "table_vs_hbm": round(table_gib / 16, 1),
        "steps": STEPS,
        "value": round(STEPS * cfg.batch_size / train_s, 1),
        "unit": "triples/s (tunneled-link-bound; see docstring)",
        "train_s": round(train_s, 1),
        "dataset_build_s": round(build_s, 1),
        "table_init_s": round(init_s, 1),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_decreased": bool(losses and losses[-1] < losses[0]),
        "backend": jax.default_backend(),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "session_r5_host_bighbm.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
