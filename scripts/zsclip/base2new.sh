#!/usr/bin/env bash
# Zero-shot upper bounds for the base/new halves
source "$(dirname "$0")/../common.sh"
TRAINER=${TRAINER:-ZeroshotCLIP}
CFG=${CFG:-vit_b16.yaml}
DATASETS=${DATASETS:-"imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  for sub in base new; do
    run_eval "${TRAINER}" "${dataset}" "${CFG}" 1 "" "" \
      "${OUT_ROOT}/zsclip_${sub}/${dataset}/${TRAINER}" DATASET.SUBSAMPLE_CLASSES ${sub}
  done
done
