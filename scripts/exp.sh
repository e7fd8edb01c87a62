#!/bin/bash
# ViSpec evaluation sweep — reference exp.sh with canonical hyperparameters
# (depth=3 top_k=8 total_token=30 num_q=2, reference exp.sh:10-14).
MODEL=${MODEL:-llava-hf/llava-v1.6-vicuna-7b-hf}
SPEC=${SPEC:-JLKang/ViSpec-llava-v1.6-vicuna-7b}
DATA_ROOT=${DATA_ROOT:-data}
OUT=${OUT:-answers}
TEMP=${TEMP:-0.0}
# QUANT=--quantize-draft enables the int8 draft serving mode
# (greedy output unchanged; ~8% faster rounds, ~1% tau cost)
QUANT=${QUANT:-}
for BENCH in sqa mme coco_caption textvqa vizwiz gqa mmvet seed_bench; do
  python -m vispec_tpu.evaluation.gen_answer \
    --bench $BENCH --model "$MODEL" --spec-model "$SPEC" \
    --method vispec --total-token 30 --depth 3 --top-k 8 --num-q 2 \
    --temperature $TEMP --data-root "$DATA_ROOT" $QUANT \
    --answer-file "$OUT/$(basename $MODEL)/$BENCH/T$TEMP/2q.jsonl"
done
