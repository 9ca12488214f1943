#!/bin/bash
# Freebase-86M recipes (reference /root/reference/examples/freebase/multi_gpu.sh:
# 8xV100, MRR 0.736 in 4767 s for TransE_l2).  Here: one SPMD program with the
# entity table vocab-sharded over the mesh (the parameter-server equivalent).
set -e

# TransE_l2  (ref 8-GPU: MRR 0.736, 4767 s; total steps 8x320k x batch 1000)
dglke_tpu-train --model_name TransE_l2 --dataset Freebase --batch_size 1000 \
  --neg_sample_size 200 --hidden_dim 400 --gamma 10 --lr 0.1 --regularization_coef 1e-9 \
  --batch_size_eval 1000 --test -adv --max_step 2560000 --neg_sample_size_eval 1000 \
  --log_interval 1000 --table_sharding vocab --no_save_emb

# DistMult  (ref 8-GPU: MRR 0.833)
dglke_tpu-train --model_name DistMult --dataset Freebase --batch_size 1024 \
  --neg_sample_size 256 --hidden_dim 400 --gamma 143.0 --lr 0.08 --batch_size_eval 1000 \
  --test -adv --max_step 2400000 --neg_sample_size_eval 1000 --log_interval 1000 \
  --table_sharding vocab --no_save_emb

# ComplEx  (ref 8-GPU: MRR 0.834)
dglke_tpu-train --model_name ComplEx --dataset Freebase --batch_size 1024 \
  --neg_sample_size 256 --hidden_dim 400 --gamma 143 --lr 0.1 \
  --regularization_coef 2e-06 --batch_size_eval 1000 --test -adv --max_step 2880000 \
  --neg_sample_size_eval 1000 --log_interval 1000 --table_sharding vocab --no_save_emb

# Multi-host: partition edges, then launch the same program on every host.
# dglke_tpu-partition --dataset Freebase --data_path ./data -k 4
# dglke_tpu-dist_train --path ~/run --ip_config ip_config.txt \
#   --model_name TransE_l2 --dataset Freebase ... --table_sharding vocab
