#!/bin/bash
# Medusa baseline sweep (reference exp_medusa.sh)
MODEL=${MODEL:-llava-hf/llava-v1.6-vicuna-7b-hf}
SPEC=${SPEC:-medusa-heads-ckpt}
DATA_ROOT=${DATA_ROOT:-data}; OUT=${OUT:-answers}; TEMP=${TEMP:-0.0}
for BENCH in sqa mme coco_caption textvqa vizwiz gqa mmvet seed_bench; do
  python -m vispec_tpu.evaluation.gen_answer \
    --bench $BENCH --model "$MODEL" --spec-model "$SPEC" --method medusa \
    --total-token 30 --temperature $TEMP --data-root "$DATA_ROOT" \
    --answer-file "$OUT/$(basename $MODEL)/$BENCH/T$TEMP/medusa.jsonl"
done
