#!/usr/bin/env bash
# Linear probe sweep over cached features (reference lpclip/linear_probe.sh)
FEAT=${FEAT:-clip_feat}
DATASETS=${DATASETS:-"Caltech101 OxfordPets StanfordCars OxfordFlowers Food101 FGVCAircraft SUN397 DescribableTextures EuroSAT UCF101 ImageNet"}
for dataset in ${DATASETS}; do
  python lpclip/linear_probe.py \
    --trainval_dataset "${dataset}" --test_dataset "${dataset}" \
    --feature_dir "${FEAT}"
done
