#!/usr/bin/env bash
# Full ER-NeRF avatar training recipe on TPU — the reference's 2-stage
# schedule (reference: ernerf/scripts/train_obama.sh):
#   1. head stage, 100k iters
#   2. +25k iters with lips fine-tune and LPIPS patch loss
#   3. (optional) torso stage with the head frozen
# Data dir: transforms.json + gt_imgs/ + aud.npy + au.csv (+ ori_imgs/*.lms
# for lips finetune, parsing/ masks, torso_imgs/ for the torso stage) —
# produced by `python -m mere_fusion_tpu.tools.nerf_data` tasks 1-9.
set -euo pipefail
DATA=${1:-data/obama}
WS=${2:-trial_obama}

python -m mere_fusion_tpu.train.ernerf_cli "$DATA" \
    --workspace "$WS" --iters 100000

cp -r "$WS" "${WS}_head"

# resumes from step 100000 in the same workspace; --iters is the TOTAL
# step target (reference: second stage trains 100000 -> 125000)
python -m mere_fusion_tpu.train.ernerf_cli "$DATA" \
    --workspace "$WS" --iters 125000 \
    --finetune_lips --lips_size 64 --patch_size 32

# torso stage (uncomment once torso_imgs/ exist):
# python -m mere_fusion_tpu.train.ernerf_cli "$DATA" \
#     --workspace "${WS}_torso" --iters 200000 \
#     --torso --head_ckpt "${WS}_head"
