#!/bin/bash
# Package the framework + an experiment directory for deployment
# (parity surface: reference scripts/create_tars.sh).
# Usage: sh scripts/create_tars.sh [-n exp_name] [-d dataset] [-o out_dir]
set -e
OUT=release
while getopts "n:d:o:" opt; do
  case $opt in
    n) NAME=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    o) OUT=$OPTARG ;;
  esac
done
mkdir -p "$OUT"
STAMP=$(date +%Y%m%d)
tar --exclude='__pycache__' --exclude='.git' --exclude='exp' --exclude='data' \
    -czf "$OUT/pointcept_keypointdetection_tpu_code_$STAMP.tar.gz" \
    pointcept_keypointdetection_tpu tools configs scripts README.md
echo "code -> $OUT/pointcept_keypointdetection_tpu_code_$STAMP.tar.gz"
if [ -n "$NAME" ] && [ -n "$DATASET" ] && [ -d "exp/$DATASET/$NAME" ]; then
  tar -czf "$OUT/exp_${DATASET}_${NAME}_$STAMP.tar.gz" "exp/$DATASET/$NAME/model" "exp/$DATASET/$NAME/config.py"
  echo "exp  -> $OUT/exp_${DATASET}_${NAME}_$STAMP.tar.gz"
fi
