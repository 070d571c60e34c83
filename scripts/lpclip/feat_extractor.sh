#!/usr/bin/env bash
# Extract frozen CLIP features for all splits (reference lpclip/feat_extractor.sh)
DATA=${DATA:-"$HOME/data"}
OUT=${OUT:-clip_feat}
CFG=${CFG:-configs/trainers/vit_b16.yaml}
DATASETS=${DATASETS:-"caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101 imagenet"}
for dataset in ${DATASETS}; do
  for split in train val test; do
    python lpclip/feat_extractor.py \
      --root "${DATA}" --output_dir "${OUT}" --split "${split}" \
      --config_file "${CFG}" \
      --dataset_config_file "configs/datasets/${dataset}.yaml" \
      ${BACKBONE_PATH:+--backbone_path "${BACKBONE_PATH}"}
  done
done
