#!/usr/bin/env bash
# Cross-dataset transfer: ImageNet-trained prompts evaluated elsewhere
# (reference scripts/mpt/xd_test1.sh)
source "$(dirname "$0")/../common.sh"
TRAINER=MPT
CFG=${CFG:-MPT/vit_b16_c2_ep5_batch4.yaml}
EPOCH=${EPOCH:-5}
DATASETS=${DATASETS:-"caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  for seed in ${SEEDS:-1 2 3}; do
    run_eval "${TRAINER}" "${dataset}" "${CFG}" "${seed}" \
      "${OUT_ROOT}/imagenet/${TRAINER}/$(basename ${CFG} .yaml)_16shots/seed_${seed}" "${EPOCH}" \
      "${OUT_ROOT}/xd_test/${dataset}/${TRAINER}/seed_${seed}"
  done
done
