#!/bin/bash
# ogbl-biokg recipes — the reference's published 8-GPU hyperparameters
# (/root/reference/examples/biokg/multi_gpu.sh), one SPMD program per run.
# Requires the `ogb` package for the dataset loader.
# Reference results (8xV100): TransE_l2 MRR 0.583 / 220 s.
set -e

# TransE_l2 (ref: MRR 0.583)
dglke_tpu-train --model_name TransE_l2 --dataset biokg --batch_size 512 --log_interval 100 \
  --neg_sample_size 128 --regularization_coef 1e-9 --hidden_dim 2000 --gamma 20 -adv -a 1.0 \
  --lr 0.25 --max_step 60000 --no_eval_filter --test --batch_size_eval 32 \
  --neg_sample_size_eval 500

# DistMult
dglke_tpu-train --model_name DistMult --dataset biokg --batch_size 512 --log_interval 1000 \
  --neg_sample_size 128 --hidden_dim 2000 --gamma 500 -adv -a 1.0 \
  --lr 0.1 --max_step 60000 --no_eval_filter --test --batch_size_eval 32 \
  --neg_sample_size_eval 500
