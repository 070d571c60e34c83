#!/usr/bin/env bash
# Base-to-new: evaluate base-trained checkpoints on the new class half
# (reference scripts/mpt/test_base2new.sh:40-44)
source "$(dirname "$0")/../common.sh"
TRAINER=MPT
CFG=${CFG:-MPT/vit_b16_c2_ep5_batch4.yaml}
EPOCH=${EPOCH:-5}
DATASETS=${DATASETS:-"imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  for seed in ${SEEDS:-1 2 3}; do
    run_eval "${TRAINER}" "${dataset}" "${CFG}" "${seed}" \
      "${OUT_ROOT}/base2new/train_base/${dataset}/${TRAINER}/seed_${seed}" "${EPOCH}" \
      "${OUT_ROOT}/base2new/test_new/${dataset}/${TRAINER}/seed_${seed}" \
      DATASET.SUBSAMPLE_CLASSES new
  done
done
