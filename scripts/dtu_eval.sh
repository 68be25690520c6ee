#!/usr/bin/env bash
# Canonical DTU evaluation (reference scripts/dtu_eval.sh hyperparameters:
# interval_scale 1.06, 5 views, 192 depths, 1152x1536, consistency fusion
# disp 0.1 / 2-consistent).
set -euo pipefail
TESTPATH=${1:?usage: dtu_eval.sh TESTPATH CKPT [OUTDIR]}
CKPT=${2:?}
OUTDIR=${3:-outputs/dtu}

python -m cds_mvsnet_tpu.cli.test_cli \
  --dataset dtu --testpath "$TESTPATH" --testlist lists/dtu/test.txt \
  --resume "$CKPT" --outdir "$OUTDIR" \
  --interval_scale 1.06 --num_view 5 --numdepth 192 \
  --max_h 1152 --max_w 1536 \
  --filter_method normal --conf 0.0,0.0,0.0 --thres_view 2 --thres_disp 0.1
