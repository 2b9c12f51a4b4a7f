#!/bin/sh
# Testing launcher — parity surface of the reference `scripts/test.sh`:
#   sh scripts/test.sh -d <dataset> -n <exp-name> [-w model_best] [-c config]
# Points the tester at exp/<dataset>/<name>'s saved config + checkpoint.

cd "$(dirname "$(dirname "$0")")" || exit
ROOT_DIR=$(pwd)
PYTHON=python

TEST_CODE=test.py

DATASET=scannet
CONFIG="None"
EXP_NAME=debug
WEIGHT=model_best
NUM_MACHINE=1

while getopts "p:d:c:n:w:g:m:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    g) : ;;   # kept for interface parity; chips auto-detected
    m) NUM_MACHINE=$OPTARG ;;
    \?) echo "Invalid option: -$OPTARG" ;;
  esac
done

echo "Experiment name: $EXP_NAME"
echo "Python interpreter dir: $PYTHON"
echo "Dataset: $DATASET"

EXP_DIR=exp/${DATASET}/${EXP_NAME}
MODEL_DIR=${EXP_DIR}/model

if [ "${CONFIG}" = "None" ]
then
    CONFIG_DIR=${EXP_DIR}/config.py
else
    CONFIG_DIR=configs/${DATASET}/${CONFIG}.py
fi

echo "Loading config in:" "$CONFIG_DIR"
export PYTHONPATH=./
echo "Running code in: $EXP_DIR"

echo " =========> RUN TASK <========="
ulimit -n 65536 2>/dev/null
$PYTHON -u tools/$TEST_CODE \
  --config-file "$CONFIG_DIR" \
  --options save_path="$EXP_DIR" weight="${MODEL_DIR}"/"${WEIGHT}".ckpt
