#!/bin/bash
# EAGLE-2 baseline sweep (reference exp_eagle.sh)
MODEL=${MODEL:-llava-hf/llava-v1.6-vicuna-7b-hf}
SPEC=${SPEC:-eagle-draft-ckpt}
DATA_ROOT=${DATA_ROOT:-data}; OUT=${OUT:-answers}; TEMP=${TEMP:-0.0}
for BENCH in sqa mme coco_caption textvqa vizwiz gqa mmvet seed_bench; do
  python -m vispec_tpu.evaluation.gen_answer \
    --bench $BENCH --model "$MODEL" --spec-model "$SPEC" --method eagle \
    --total-token 30 --depth 3 --top-k 8 --temperature $TEMP \
    --data-root "$DATA_ROOT" \
    --answer-file "$OUT/$(basename $MODEL)/$BENCH/T$TEMP/ea.jsonl"
done
