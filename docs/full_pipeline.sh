#!/usr/bin/env bash
# Full 3-stage pipeline + inference, end to end.
#
# As written this uses the built-in structured synthetic data (no datasets
# needed) — exactly the commands used for the on-chip convergence evidence in
# BASELINE.md. For real data, replace `--dataset synthetic --synthetic-n ...`
# with `--dataset coco -i <imgdir>` (stage 1) / `--dataset bold -i <bold_roi>`
# (stages 2/3) after running the ETL chain in `python -m fmri_tpu.data.prepare`.
set -euo pipefail

OUT=${1:-runs}
PRESET=${PRESET:-res64}       # e.g. PRESET=res100 for the paper geometry
EPOCHS1=${EPOCHS1:-60} EPOCHS2=${EPOCHS2:-20} EPOCHS3=${EPOCHS3:-10}
COMMON=(--preset "$PRESET" --dataset synthetic --synthetic-n 512 --batch-size 64)

# ---- Stage I: image-to-image Dual-VAE/GAN (or --family wae) ----
python -m fmri_tpu.train.run --family vgan --stage 1 "${COMMON[@]}" \
    --epochs "$EPOCHS1" -o "$OUT"
S1=$(ls -dt "$OUT"/vgan_stage1/*/checkpoints | head -1)

# ---- Stage II: cognitive encoder with teacher distillation ----
python -m fmri_tpu.train.run --family vgan --stage 2 "${COMMON[@]}" \
    --epochs "$EPOCHS2" --prev-ckpt "$S1" -o "$OUT"
S2=$(ls -dt "$OUT"/vgan_stage2/*/checkpoints | head -1)

# ---- Stage III: decoder fine-tune, cognitive encoder frozen ----
python -m fmri_tpu.train.run --family vgan --stage 3 "${COMMON[@]}" \
    --epochs "$EPOCHS3" --prev-ckpt "$S2" -o "$OUT"
S3=$(ls -dt "$OUT"/vgan_stage3/*/checkpoints | head -1)

# ---- Inference: metrics + n-way identification + reconstructions ----
python -m fmri_tpu.eval.inference --family vgan --stage 3 "${COMMON[@]}" \
    --ckpt "$S3" --save-images -o "$OUT/inference"

cat "$OUT/inference/summary.json"
