#!/bin/sh
# Training launcher — parity surface of the reference `scripts/train.sh:19-118`:
#   sh scripts/train.sh -g <chips> -d <dataset> -c <config> -n <exp-name> [-r true] [-w weight]
# Creates exp/<dataset>/<name>/{model,code}, snapshots the code tree, wires
# resume to the exp dir's config/model_last, and derives the jax.distributed
# coordinator from SLURM when present (replacing the NCCL master derivation).

cd "$(dirname "$(dirname "$0")")" || exit
ROOT_DIR=$(pwd)
PYTHON=python

TRAIN_CODE=train.py

DATASET=scannet
CONFIG="None"
EXP_NAME=debug
WEIGHT="None"
RESUME=false
NUM_PROC=1
NUM_MACHINE=1

while getopts "p:d:c:n:w:g:m:r:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    r) RESUME=$OPTARG ;;
    g) NUM_PROC=$OPTARG ;;   # -g kept for interface parity: processes (hosts), chips auto-detected per host
    m) NUM_MACHINE=$OPTARG ;;
    \?) echo "Invalid option: -$OPTARG" ;;
  esac
done

echo "Experiment name: $EXP_NAME"
echo "Python interpreter dir: $PYTHON"
echo "Dataset: $DATASET"
echo "Config: $CONFIG"
echo "Process Num: $NUM_PROC"
echo "Machine Num: $NUM_MACHINE"

COORD_ARGS=""
if [ -n "$SLURM_NODELIST" ]; then
  MASTER_HOSTNAME=$(scontrol show hostname "$SLURM_NODELIST" | head -n 1)
  MASTER_ADDR=$(getent hosts "$MASTER_HOSTNAME" | awk '{ print $1 }')
  MASTER_PORT=$((10000 + 0x$(echo -n "${DATASET}/${EXP_NAME}" | md5sum | cut -c 1-4 | awk '{print $1}') % 20000))
  COORD_ARGS="--num-processes $NUM_MACHINE --process-id ${SLURM_NODEID:-0} --coordinator $MASTER_ADDR:$MASTER_PORT"
  echo "Coordinator: $MASTER_ADDR:$MASTER_PORT"
fi

EXP_DIR=exp/${DATASET}/${EXP_NAME}
MODEL_DIR=${EXP_DIR}/model
CODE_DIR=${EXP_DIR}/code
CONFIG_DIR=configs/${DATASET}/${CONFIG}.py

echo " =========> CREATE EXP DIR <========="
echo "Experiment dir: $ROOT_DIR/$EXP_DIR"
if [ "${RESUME}" = true ] && [ -d "$EXP_DIR" ]
then
  CONFIG_DIR=${EXP_DIR}/config.py
  WEIGHT=$MODEL_DIR/model_last.ckpt
else
  RESUME=false
  mkdir -p "$MODEL_DIR" "$CODE_DIR"
  cp -r scripts tools pointcept_keypointdetection_tpu "$CODE_DIR"
fi

echo "Loading config in:" "$CONFIG_DIR"
export PYTHONPATH=./$CODE_DIR
echo "Running code in: $CODE_DIR"

echo " =========> RUN TASK <========="
ulimit -n 65536 2>/dev/null
if [ "${WEIGHT}" = "None" ]
then
    $PYTHON "$CODE_DIR"/tools/$TRAIN_CODE \
    --config-file "$CONFIG_DIR" \
    $COORD_ARGS \
    --options save_path="$EXP_DIR"
else
    $PYTHON "$CODE_DIR"/tools/$TRAIN_CODE \
    --config-file "$CONFIG_DIR" \
    $COORD_ARGS \
    --options save_path="$EXP_DIR" resume="$RESUME" weight="$WEIGHT"
fi
