#!/bin/bash
# Weighted-edge WN18 recipe (reference /root/reference/examples/wn18_weighted/
# README.md): each training edge carries a 4th importance column that weights
# its loss contribution (--has_edge_importance).
# Data: wn18_weighted.tgz (train/valid/test_weight.txt, raw string triples +
# importance) extracted under ./data/wn18_weighted/.
#
# Weighted edges ride the SAME fast paths as unweighted training: the
# device-resident pipeline gathers the [E] importance plane in HBM inside
# the scanned step (multi-device mesh), and the native C++ superbatch
# producer emits the sampled edge indices so the host feed carries an
# [S, B] impts plane (single device).  No slow-path fallback.
set -e

dglke_tpu-train --model_name TransE_l1 --dataset wn18-weight \
  --format raw_udd_hrt \
  --data_files train_weight.txt valid_weight.txt test_weight.txt \
  --data_path ./data/wn18_weighted/ --batch_size 2048 --log_interval 1000 \
  --neg_sample_size 128 --regularization_coef 2e-07 --hidden_dim 512 \
  --gamma 12.0 --lr 0.007 --batch_size_eval 16 --test -adv \
  --max_step 32000 --has_edge_importance
