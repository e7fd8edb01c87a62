#!/bin/bash
# Plain AR baseline sweep (reference baseline.sh)
MODEL=${MODEL:-llava-hf/llava-v1.6-vicuna-7b-hf}
DATA_ROOT=${DATA_ROOT:-data}; OUT=${OUT:-answers}; TEMP=${TEMP:-0.0}
for BENCH in sqa mme coco_caption textvqa vizwiz gqa mmvet seed_bench; do
  python -m vispec_tpu.evaluation.gen_answer \
    --bench $BENCH --model "$MODEL" --baseline --temperature $TEMP \
    --data-root "$DATA_ROOT" \
    --answer-file "$OUT/$(basename $MODEL)/$BENCH/T$TEMP/baseline.jsonl"
done
