"""Accuracy evaluation driver (reference examples/example_eval_acc.py:13-52).

Runs HotpotQA or HellaSwag through the engine and prints the metric suite
(EM / penalized-F1 / Jaccard / embedding similarity).

Usage:
    python examples/example_eval_acc.py <ckpt_dir> \
        --dataset hellaswag --data-path /path/to/hellaswag_val.jsonl \
        [--data-batch 100] [--max-gen-len 64]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

from lite_llama_tpu.eval import DATASETS, InferenceHarness, run_eval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--dataset", choices=sorted(DATASETS), default="hellaswag")
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--data-batch", type=int, default=None)
    ap.add_argument("--max-gen-len", type=int, default=64)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--top-p", type=float, default=0.9)
    args = ap.parse_args()

    dataset = DATASETS[args.dataset](args.data_path, data_batch=args.data_batch)
    harness = InferenceHarness(
        temperature=args.temperature,
        top_p=args.top_p,
        max_seq_len=args.max_seq_len,
        max_gen_len=args.max_gen_len,
        checkpoint_dir=args.checkpoint,
    )
    scores = run_eval(dataset, harness)
    print({k: round(v, 4) for k, v in scores.items()})


if __name__ == "__main__":
    main()
