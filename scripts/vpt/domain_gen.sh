#!/usr/bin/env bash
# Domain generalization: ImageNet-trained prompts on ImageNet-V2/Sketch/A/R
# (reference scripts/vpt/mudpt_eval.sh:24-36)
source "$(dirname "$0")/../common.sh"
TRAINER=VPT
CFG=${CFG:-VPT/vit_b16_c2_ep5_batch4.yaml}
EPOCH=${EPOCH:-5}
for dataset in imagenetv2 imagenet_sketch imagenet_a imagenet_r; do
  for seed in ${SEEDS:-1 2 3}; do
    run_eval "${TRAINER}" "${dataset}" "${CFG}" "${seed}" \
      "${OUT_ROOT}/imagenet/${TRAINER}/$(basename ${CFG} .yaml)_16shots/seed_${seed}" "${EPOCH}" \
      "${OUT_ROOT}/domain_gen/${dataset}/${TRAINER}/seed_${seed}"
  done
done
