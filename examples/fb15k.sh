#!/bin/bash
# FB15k training recipes — the reference's published 1-GPU hyperparameters
# (/root/reference/examples/fb15k/multi_gpu.sh), one SPMD program per run.
# On a multi-chip host the same command data-parallelizes over all local
# devices; no --num_proc/--gpu plumbing exists (or is needed).
set -e

# TransE_l1  (ref: MRR 0.672, 201 s on 1xV100)
dglke_tpu-train --model_name TransE_l1 --dataset FB15k --batch_size 1000 --log_interval 1000 \
  --neg_sample_size 200 --regularization_coef 1e-07 --hidden_dim 400 --gamma 16.0 \
  --lr 0.01 --batch_size_eval 16 --test -adv --max_step 24000

# TransE_l2  (ref: MRR 0.649, 167 s) — the headline parity config
dglke_tpu-train --model_name TransE_l2 --dataset FB15k --batch_size 1000 --log_interval 1000 \
  --neg_sample_size 200 --regularization_coef 1e-9 --hidden_dim 400 --gamma 19.9 \
  --lr 0.25 --batch_size_eval 16 --test -adv --max_step 24000

# DistMult  (ref: MRR 0.696, 150 s)
dglke_tpu-train --model_name DistMult --dataset FB15k --batch_size 1000 --log_interval 1000 \
  --neg_sample_size 200 --hidden_dim 400 --gamma 143.0 --lr 0.08 --batch_size_eval 16 \
  --test -adv --max_step 24000

# ComplEx  (ref: MRR 0.757, 171 s)
dglke_tpu-train --model_name ComplEx --dataset FB15k --batch_size 1000 --log_interval 1000 \
  --neg_sample_size 200 --hidden_dim 400 --gamma 143.0 --lr 0.1 --regularization_coef 2e-06 \
  --batch_size_eval 16 --test -adv --max_step 24000

# RESCAL  (ref: MRR 0.661, 1252 s)
dglke_tpu-train --model_name RESCAL --dataset FB15k --batch_size 1000 --log_interval 1000 \
  --neg_sample_size 200 --hidden_dim 500 --gamma 24.0 --lr 0.03 --batch_size_eval 16 \
  --test -adv --max_step 24000

# TransR  (ref: MRR 0.670, 530 s)
dglke_tpu-train --model_name TransR --dataset FB15k --batch_size 1000 --log_interval 1000 \
  --neg_sample_size 200 --regularization_coef 5e-8 --hidden_dim 200 --gamma 8.0 \
  --lr 0.015 --batch_size_eval 16 --test -adv --max_step 24000

# RotatE  (ref: MRR 0.726, 1405 s)
dglke_tpu-train --model_name RotatE --dataset FB15k --batch_size 2048 --log_interval 1000 \
  --neg_sample_size 256 --regularization_coef 1e-07 --hidden_dim 200 --gamma 12.0 \
  --lr 0.009 --batch_size_eval 16 --test -adv -de --max_step 20000 --neg_deg_sample

# Evaluate any saved checkpoint
dglke_tpu-eval --model_name TransE_l2 --dataset FB15k --hidden_dim 400 --gamma 19.9 \
  --batch_size_eval 16 --model_path ckpts/TransE_l2_FB15k_0/
