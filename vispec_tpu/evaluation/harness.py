"""Generic evaluation harness: timed speculative / baseline generation + JSONL.

Distills the common skeleton of the reference's 15 `gen_spec_answer_*.py` and
14 `gen_baseline_answer_*.py` scripts (SURVEY.md §2.3; richest example
gen_spec_answer_sqa.py): dataset iteration -> 3 warmup generations -> per-
question timed `specgenerate(log=True, return_acceptance_len=True,
return_decode_time=True)` -> JSONL records with
turns/idxs/new_tokens/wall_time/acceptance_length/decode_time -> answer-file
dedup (`reorg_answer_file`, :328-339).

Benchmarks plug in as (question iterator, prompt builder) pairs — see
evaluation/benchmarks.py.  Scale-out is process-level (the reference used ray
sharding over GPU groups, :89-122): run N independent processes with
--question-begin/--question-end splits; no collectives needed.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, List, Optional

import numpy as np


@dataclass
class Question:
    question_id: Any
    prompt_inputs: Dict[str, Any]  # kwargs for SpecModel.specgenerate
    category: str = ""


def run_eval(
    model,
    questions: Iterable[Question],
    answer_file: str,
    *,
    baseline: bool = False,
    temperature: float = 0.0,
    max_new_tokens: int = 512,
    num_warmup: int = 3,
    decode_fn: Optional[Callable[[np.ndarray], str]] = None,
    model_id: str = "vispec-tpu",
    seed_base: int = 0,
) -> List[dict]:
    """Generate answers for all questions; returns the records written.

    ``model`` is a spec.spec_model.SpecModel.  ``decode_fn`` turns generated
    token ids into text (tokenizer.decode); identity repr if None.
    """
    questions = list(questions)
    os.makedirs(os.path.dirname(os.path.abspath(answer_file)), exist_ok=True)

    generate = model.ar_generate if baseline else model.specgenerate

    # warmup: compile all bucket shapes (gen_spec_answer_sqa.py:203-248)
    for q in questions[:num_warmup]:
        generate(
            temperature=temperature, max_new_tokens=max_new_tokens,
            **q.prompt_inputs,
        )

    records = []
    with open(answer_file, "a") as fout:
        for i, q in enumerate(questions):
            t0 = time.perf_counter()
            res = generate(
                temperature=temperature, max_new_tokens=max_new_tokens,
                seed=seed_base + i, **q.prompt_inputs,
            )
            wall = time.perf_counter() - t0
            prompt_len = len(q.prompt_inputs["input_ids"])
            out_ids = np.asarray(res.sequences)[prompt_len:]
            text = decode_fn(out_ids) if decode_fn else repr(out_ids.tolist())
            rec = {
                "question_id": q.question_id,
                "model_id": model_id,
                "category": q.category,
                "turns": [text],
                "idxs": [int(res.rounds)],
                "new_tokens": [int(res.new_tokens)],
                "wall_time": [wall],
                "acceptance_length": res.acceptance_lengths,
                "decode_time": res.decode_time,
                "tstamp": time.time(),
            }
            records.append(rec)
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
    reorg_answer_file(answer_file)
    return records


def reorg_answer_file(answer_file: str) -> None:
    """De-duplicate by question_id keeping the last answer, sort
    (gen_spec_answer_sqa.py:328-339)."""
    answers = {}
    with open(answer_file) as fin:
        for line in fin:
            if line.strip():
                rec = json.loads(line)
                answers[str(rec["question_id"])] = line
    with open(answer_file, "w") as fout:
        for qid in sorted(answers):
            fout.write(answers[qid])
