#!/usr/bin/env bash
# Few-shot classification sweep: 11 datasets x shots {16,8,4,2,1} x seeds {1,2,3}
# (protocol of reference scripts/vpt/run_b16_cls.sh:22-43)
source "$(dirname "$0")/../common.sh"
TRAINER=VPT
CFG=${CFG:-VPT/vit_b16_c2_ep5_batch4.yaml}
DATASETS=${DATASETS:-"imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101"}
for dataset in ${DATASETS}; do
  for shots in ${SHOTS:-16 8 4 2 1}; do
    for seed in ${SEEDS:-1 2 3}; do
      run_train "${TRAINER}" "${dataset}" "${CFG}" "${shots}" "${seed}" \
        "${OUT_ROOT}/${dataset}/${TRAINER}/$(basename ${CFG} .yaml)_${shots}shots/seed_${seed}"
    done
  done
done
