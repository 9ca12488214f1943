#!/bin/bash
# wn18 training recipes (reference /root/reference/examples/wn18/multi_gpu.sh).
set -e

# TransE_l1  (ref: MRR 0.764)
dglke_tpu-train --model_name TransE_l1 --dataset wn18 --batch_size 2048 --log_interval 1000 \
  --neg_sample_size 128 --regularization_coef 2e-07 --hidden_dim 512 --gamma 12.0 \
  --lr 0.007 --batch_size_eval 16 --test -adv --max_step 32000

# TransE_l2  (ref: MRR 0.560)
dglke_tpu-train --model_name TransE_l2 --dataset wn18 --batch_size 1024 --log_interval 1000 \
  --neg_sample_size 256 --regularization_coef 1e-07 --hidden_dim 512 --gamma 6.0 \
  --lr 0.1 --batch_size_eval 16 --test -adv --max_step 32000

# DistMult  (ref: MRR 0.813)
dglke_tpu-train --model_name DistMult --dataset wn18 --batch_size 2048 --log_interval 1000 \
  --neg_sample_size 128 --regularization_coef 1e-06 --hidden_dim 512 --gamma 20.0 \
  --lr 0.14 --batch_size_eval 16 --test -adv --max_step 20000

# ComplEx  (ref: MRR 0.932)
dglke_tpu-train --model_name ComplEx --dataset wn18 --batch_size 1024 --log_interval 1000 \
  --neg_sample_size 1024 --regularization_coef 1e-05 --hidden_dim 512 --gamma 200.0 \
  --lr 0.1 --batch_size_eval 16 --test -adv --max_step 20000

# RESCAL  (ref: MRR 0.848)
dglke_tpu-train --model_name RESCAL --dataset wn18 --batch_size 1024 --log_interval 1000 \
  --neg_sample_size 256 --hidden_dim 250 --gamma 24.0 --lr 0.03 --batch_size_eval 16 \
  --test -adv --max_step 20000

# TransR  (ref: MRR 0.609)
dglke_tpu-train --model_name TransR --dataset wn18 --batch_size 1024 --log_interval 1000 \
  --neg_sample_size 256 --hidden_dim 250 --gamma 16.0 --lr 0.1 --batch_size_eval 16 \
  --test -adv --max_step 30000

# RotatE  (ref: MRR 0.944)
dglke_tpu-train --model_name RotatE --dataset wn18 --batch_size 2048 --log_interval 1000 \
  --neg_sample_size 64 --regularization_coef 2e-07 --hidden_dim 256 --gamma 9.0 \
  --lr 0.0025 -de --batch_size_eval 16 --neg_deg_sample --test -adv --max_step 24000

# Weighted wn18 (edge-importance column; reference
# examples/wn18_weighted/README.md) — 4th numeric column per triple scales
# that edge's loss term.
dglke_tpu-train --model_name TransE_l1 --dataset wn18-weight --format raw_udd_hrt \
  --data_files train_weight.txt valid_weight.txt test_weight.txt \
  --data_path ./data/wn18_weighted/ --batch_size 2048 --log_interval 1000 \
  --neg_sample_size 128 --regularization_coef 2e-07 --hidden_dim 512 --gamma 12.0 \
  --lr 0.007 --batch_size_eval 16 --test -adv --max_step 32000 --has_edge_importance
