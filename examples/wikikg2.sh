#!/bin/bash
# ogbl-wikikg2 recipes — the reference's published 8-GPU hyperparameters
# (/root/reference/examples/wikikg2/multi_gpu.sh), one SPMD program per run.
# Requires the `ogb` package for the dataset loader. 2.5M entities: use
# --table_sharding vocab on small-HBM chips or multi-chip meshes.
# Reference results (8xV100): TransE_l2 MRR 0.424 / 64 s, DistMult 0.362,
# RotatE 0.446, ComplEx 0.403.
set -e

# TransE_l2 (ref: MRR 0.424)
dglke_tpu-train --model_name TransE_l2 --dataset wikikg2 --batch_size 512 --log_interval 100 \
  --neg_sample_size 128 --regularization_coef 1e-9 --hidden_dim 500 --gamma 30 -adv -a 1.0 \
  --lr 0.25 --max_step 20000 --no_eval_filter --test --batch_size_eval 32 \
  --neg_sample_size_eval 500

# DistMult (ref: MRR 0.362)
dglke_tpu-train --model_name DistMult --dataset wikikg2 --batch_size 512 --log_interval 100 \
  --neg_sample_size 128 --hidden_dim 500 --gamma 500 -adv -a 1.0 \
  --lr 0.25 --max_step 20000 --no_eval_filter --test --batch_size_eval 32 \
  --neg_sample_size_eval 500 -rc 0.000002

# RotatE (ref: MRR 0.446)
dglke_tpu-train --model_name RotatE --dataset wikikg2 --batch_size 512 --log_interval 100 \
  --neg_sample_size 128 --hidden_dim 250 --gamma 5 -adv -a 1.0 \
  --lr 0.01 --max_step 64000 --no_eval_filter --test --batch_size_eval 32 \
  --neg_sample_size_eval 500 -de

# ComplEx (ref: MRR 0.403)
dglke_tpu-train --model_name ComplEx --dataset wikikg2 --batch_size 512 --log_interval 1000 \
  --neg_sample_size 128 --hidden_dim 250 --gamma 143 -adv -a 1.0 \
  --lr 0.1 --max_step 80000 --no_eval_filter --test --batch_size_eval 32 \
  --neg_sample_size_eval 500 -de -dr
