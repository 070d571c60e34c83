#!/usr/bin/env bash
# Zero-shot CLIP eval across datasets (reference scripts/zsclip/run_zsclip.sh,
# whose run_zsclip.py entry point was missing; train.py --eval_only covers it)
source "$(dirname "$0")/../common.sh"
TRAINER=${TRAINER:-ZeroshotCLIP}   # or ZeroshotCLIP2 for prompt ensembling
CFG=${CFG:-vit_b16.yaml}
DATASETS=${DATASETS:-"imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  run_eval "${TRAINER}" "${dataset}" "${CFG}" 1 "" "" \
    "${OUT_ROOT}/zsclip/${dataset}/${TRAINER}" TEST.EVALUATOR Microf1Classification
done
