#!/bin/bash
# One fb12m capture attempt: train ONE segment of the 12M-entity record
# (resumes from tools/fb12m_ckpt); when the step target is reached, run
# the filtered-eval + resume-check steps and merge the round artifact.
# Exits 0 only when the whole record is captured; exits 5 while more
# segments remain, so a supervisor loop keeps hunting windows:
#   while ! bash tools/tpu_hunt.sh 3000 bash tools/fb12m_chain.sh; do
#     sleep 45; done
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export FB12M_SEGMENT=${FB12M_SEGMENT:-2097152}

# pick up any quality family whose fragment is missing (e.g. a config
# was recalibrated and its failed fragment deleted) before spending the
# window on a training segment
for M in TransE_l2 TransE_l1 DistMult ComplEx SimplE RotatE TransR RESCAL; do
  if ! [ -s "tools/session_r4_quality_$M.json" ]; then
    timeout -k 10 580 python tools/capture_r4.py "quality_$M" \
      >> tools/tpu_session.log 2>&1
  fi
done

# one-time EARLY eval on the existing checkpoint: caches the 12M-entity
# eval compile (minutes over the tunnel) and records MRR-so-far; the
# final post-target eval overwrites it
if [ -d tools/fb12m_ckpt ] && ! [ -s tools/session_r4_fb12m_eval.json ]; then
  timeout -k 10 1200 python tools/capture_r4.py fb12m_eval \
    >> tools/tpu_session.log 2>&1
fi

python tools/capture_r4.py fb12m_train || exit $?
python tools/capture_r4.py merge
if python - <<'EOF'
import json, sys
try:
    d = json.load(open("tools/session_r4_fb12m_train.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if d.get("done") else 1)
EOF
then
  python tools/capture_r4.py fb12m_eval || exit $?
  python tools/capture_r4.py fb12m_resume || exit $?
  python tools/capture_r4.py merge
  exit 0
fi
exit 5
