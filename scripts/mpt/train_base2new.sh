#!/usr/bin/env bash
# Base-to-new: train on the base class half, 16 shots
# (reference scripts/mpt/train_base2new.sh:25-44)
source "$(dirname "$0")/../common.sh"
TRAINER=MPT
CFG=${CFG:-MPT/vit_b16_c2_ep5_batch4.yaml}
DATASETS=${DATASETS:-"imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  for seed in ${SEEDS:-1 2 3}; do
    run_train "${TRAINER}" "${dataset}" "${CFG}" 16 "${seed}" \
      "${OUT_ROOT}/base2new/train_base/${dataset}/${TRAINER}/seed_${seed}" \
      DATASET.SUBSAMPLE_CLASSES base
  done
done
