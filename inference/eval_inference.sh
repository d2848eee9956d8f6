#!/bin/bash
# On-device batch evaluation driver (reference inference/eval_inference.sh):
# run the native deeplabSegment CLI over every dataset image to produce
# predicted mask PNGs; score them offline against GT with
# tools/evaluation/onboard_segment_eval.py.
set -euo pipefail

if [[ "$#" -lt 5 ]]; then
    echo "Usage: $0 <model_file> <image_path> <dataset_file> <num_classes> <output_path> [input_shape HxW] [model_type]"
    exit 1
fi

MODEL_FILE=$1
IMAGE_PATH=$2
DATASET_FILE=$3
NUM_CLASSES=$4
OUTPUT_PATH=$5
INPUT_SHAPE=${6:-512x512}
MODEL_TYPE=${7:-mobilenetv2_lite}

BIN="$(dirname "$0")/build/deeplabSegment"
IMAGE_NUM=$(wc -l < "$DATASET_FILE")

mkdir -p "$OUTPUT_PATH"

i=0
while IFS= read -r IMAGE_ID; do
    [[ -z "$IMAGE_ID" ]] && continue
    "$BIN" --model_path "$MODEL_FILE" --model_type "$MODEL_TYPE" \
        --image "$IMAGE_PATH/$IMAGE_ID.jpg" \
        --classes "$NUM_CLASSES" --input_shape "$INPUT_SHAPE" \
        --keep_shape --output "$OUTPUT_PATH/$IMAGE_ID.png" > /dev/null
    i=$((i+1))
    percent=$((i*100/IMAGE_NUM))
    printf "inference process: %d/%d %d%% \r" "$i" "$IMAGE_NUM" "$percent"
done < "$DATASET_FILE"
printf "\nDone\n"
