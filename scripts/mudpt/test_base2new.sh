#!/usr/bin/env bash
# Base-to-new: evaluate base-trained checkpoints on the new class half
# (reference scripts/mudpt/test_base2new.sh:40-44)
source "$(dirname "$0")/../common.sh"
TRAINER=MuDPT
CFG=${CFG:-MuDPT/vit_b16_bz4_ep10_nctx2_depth9.yaml}
EPOCH=${EPOCH:-10}
DATASETS=${DATASETS:-"imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  for seed in ${SEEDS:-1 2 3}; do
    run_eval "${TRAINER}" "${dataset}" "${CFG}" "${seed}" \
      "${OUT_ROOT}/base2new/train_base/${dataset}/${TRAINER}/seed_${seed}" "${EPOCH}" \
      "${OUT_ROOT}/base2new/test_new/${dataset}/${TRAINER}/seed_${seed}" \
      DATASET.SUBSAMPLE_CLASSES new
  done
done
