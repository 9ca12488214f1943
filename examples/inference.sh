#!/bin/bash
# Inference recipes (reference /root/reference/examples/wn18/infer_score.sh,
# infer_emb_sim.sh): link-prediction topK and embedding-similarity topK over
# a trained wn18 checkpoint.
set -e
CKPT=ckpts/TransE_l2_wn18_0

# score explicit (head, rel, tail) triples, logsigmoid scores
dglke_tpu-predict --model_path $CKPT --format 'h_r_t' \
  --data_files head.list rel.list tail.list --score_func logsigmoid \
  --topK 5 --output result.tsv

# all (head x rel x tail) combinations, raw ids translated via id maps
dglke_tpu-predict --model_path $CKPT --format 'h_r_*' \
  --data_files raw_head.list raw_rel.list --raw_data --topK 10 \
  --exec_mode all --output result.tsv

# batched per-head topK tails
dglke_tpu-predict --model_path $CKPT --format 'h_r_*' \
  --data_files head.list rel.list --topK 5 --exec_mode batch_head \
  --output result.tsv

# embedding cosine similarity, left list vs all entities
dglke_tpu-emb_sim --emb_file $CKPT/wn18_TransE_l2_entity.npy \
  --format 'l_*' --data_files head.list --sim_func cosine --topK 10 \
  --exec_mode batch_left --output sim.tsv
