#!/usr/bin/env bash
# Shared launch helpers for the sweep scripts (equivalent of the reference's
# per-method SLURM scripts, reference scripts/mudpt/run_b16_cls.sh:22-43 —
# with the same skip-if-output-exists idempotency, minus the SLURM coupling;
# prefix commands with `sbatch`/`srun` via $LAUNCHER if desired).

DATA=${DATA:-"$HOME/data"}
OUT_ROOT=${OUT_ROOT:-"output"}
LAUNCHER=${LAUNCHER:-}
BACKBONE_PATH=${BACKBONE_PATH:-}

run_train() {
  # run_train <trainer> <dataset> <cfg-file> <shots> <seed> <outdir> [extra opts...]
  local trainer=$1 dataset=$2 cfg=$3 shots=$4 seed=$5 outdir=$6; shift 6
  if [ -d "${outdir}" ]; then
    echo "Skip existing ${outdir}"
    return 0
  fi
  ${LAUNCHER} python train.py \
    --dataset_root "${DATA}" \
    --output_dir "${outdir}" \
    --seed "${seed}" \
    --trainer "${trainer}" \
    --trainer_config "configs/trainers/${cfg}" \
    --dataset_config "configs/datasets/${dataset}.yaml" \
    ${BACKBONE_PATH:+--backbone_path "${BACKBONE_PATH}"} \
    DATASET.NUM_SHOTS "${shots}" "$@"
}

run_eval() {
  # run_eval <trainer> <dataset> <cfg-file> <seed> <model-dir> <epoch> <outdir> [opts...]
  local trainer=$1 dataset=$2 cfg=$3 seed=$4 modeldir=$5 epoch=$6 outdir=$7; shift 7
  ${LAUNCHER} python train.py \
    --dataset_root "${DATA}" \
    --output_dir "${outdir}" \
    --seed "${seed}" \
    --trainer "${trainer}" \
    --trainer_config "configs/trainers/${cfg}" \
    --dataset_config "configs/datasets/${dataset}.yaml" \
    ${BACKBONE_PATH:+--backbone_path "${BACKBONE_PATH}"} \
    --eval_only \
    ${modeldir:+--model_dir "${modeldir}"} \
    ${epoch:+--load_epoch "${epoch}"} "$@"
}
