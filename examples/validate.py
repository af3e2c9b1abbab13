"""One-command quantization-quality validation (BASELINE.md:40-42 gate).

Runs the quantized-config perplexity table against the bf16 baseline on the
SAME forward path generation uses (chunked prefill through the paged pool —
lite_llama_tpu/eval/perplexity.py) and checks each config against the
committed tolerances (docs/validation.md). The reference's analogue is the
manual side-by-side checkpoint runs
(/root/reference/tests/models/test_qwen2.py:112,195) and the accuracy
evaluator (/root/reference/examples/evaluator/eval.py:14-96).

Real-checkpoint mode (the day weights exist on the box):
    python examples/validate.py --checkpoint /path/to/Llama-3.2-3B \
        --data /path/to/eval.txt [--configs bf16,int8,fp8,int4,int8_kv,int4_int8kv]

``--data`` is plain text (tokenized with the checkpoint's tokenizer) or a
``.jsonl`` with a "text" field per line.

Dry-fixture mode (no checkpoint needed — proves the pipeline end to end;
run in CI via tests/test_eval.py):
    python examples/validate.py --dry-fixture

Dry-fixture builds a tiny random-init HF Llama in process, converts it
through the REAL converter (utils/weights.convert_hf_state_dict), scores a
random-token corpus under every config, and applies the same gates. Random
weights make perplexity ~vocab_size — the point is the wiring and the
relative deltas, which are exactly what the gates measure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# Committed tolerances (docs/validation.md): max relative NLL increase vs
# the bf16 baseline. NLL (log-domain) rather than raw perplexity so the
# gate is scale-free: Δnll = ln(ppl_q / ppl_bf16).
TOLERANCES = {
    "int8": 0.01,        # W8A8 weight-only
    "fp8": 0.01,         # fp8(e4m3) weight-only
    "int4": 0.05,        # W4A8 packed, g=128 grouped scales + sigma-FFN
    "int8_kv": 0.02,     # bf16 weights + int8 KV pool
    "int4_int8kv": 0.06, # headline combo
}


def _configs(names, cfg_dtype=jnp.bfloat16):
    from lite_llama_tpu.quant.qtensor import quantize_decoder_params

    def make(name):
        if name == "bf16":
            return lambda p: p, False
        if name == "int8":
            return (lambda p: quantize_decoder_params(p, jnp.int8), False)
        if name == "fp8":
            return (
                lambda p: quantize_decoder_params(p, jnp.float8_e4m3fn),
                False,
            )
        if name == "int4":
            return (
                lambda p: quantize_decoder_params(
                    p, jnp.int4, group_size=128, sigma_ffn=True
                ),
                False,
            )
        if name == "int8_kv":
            return (lambda p: p), True
        if name == "int4_int8kv":
            return (
                lambda p: quantize_decoder_params(
                    p, jnp.int4, group_size=128, sigma_ffn=True
                ),
                True,
            )
        raise ValueError(name)

    return {n: make(n) for n in names}


def run_table(cfg, params, seqs, names, chunk=256, batch_size=4,
              page_size=16):
    """Perplexity per config + gate verdicts vs bf16. Returns (rows, ok)."""
    from lite_llama_tpu.eval.perplexity import corpus_perplexity

    rows = {}
    base_nll = None
    ok = True
    for name in names:
        quantize, kv_q = _configs([name])[name]
        qp = quantize(params)
        r = corpus_perplexity(
            cfg, qp, seqs, kv_quant=kv_q, chunk=chunk,
            batch_size=batch_size, page_size=page_size,
        )
        row = {"perplexity": round(r["perplexity"], 4),
               "nll": round(r["nll"], 6), "tokens": r["tokens"]}
        if name == "bf16":
            base_nll = r["nll"]
        elif base_nll is not None:
            d = r["nll"] - base_nll
            tol = TOLERANCES.get(name)
            row["delta_nll_vs_bf16"] = round(d, 6)
            if tol is not None:
                row["tolerance"] = tol
                row["pass"] = bool(d <= tol)
                ok &= row["pass"]
        rows[name] = row
        print(f"[validate] {name}: {row}", file=sys.stderr, flush=True)
    return rows, ok


def _dry_fixture_model():
    """Tiny random-init HF Llama -> REAL converter -> engine tree."""
    import torch
    import transformers

    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.utils.weights import convert_hf_state_dict

    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg)
    cfg = LlamaConfig.from_dict(
        hf_cfg.to_dict(), dtype=jnp.float32, max_seq_len=512
    )
    params = convert_hf_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 256, size=n).tolist() for n in (150, 90, 64)]
    return cfg, params, seqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data", default=None, help="text / jsonl corpus")
    ap.add_argument("--configs",
                    default="bf16,int8,fp8,int4,int8_kv,int4_int8kv")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-seqs", type=int, default=64)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--dry-fixture", action="store_true",
                    help="tiny in-process model, no checkpoint needed")
    args = ap.parse_args()
    names = [n.strip() for n in args.configs.split(",") if n.strip()]

    if args.dry_fixture:
        # Wiring proof on a tiny model: run on CPU regardless of attached
        # accelerators (sitecustomize pins the TPU plugin before env vars
        # can say otherwise; tiny-shape remote compiles on a tunneled chip
        # take longer than the whole CPU run). Override with
        # VALIDATE_PLATFORM=tpu if the chip run is wanted.
        jax.config.update(
            "jax_platforms", os.environ.get("VALIDATE_PLATFORM", "cpu")
        )
        cfg, params, seqs = _dry_fixture_model()
        rows, ok = run_table(cfg, params, seqs, names, chunk=64,
                             batch_size=2)
    else:
        assert args.checkpoint and args.data, (
            "--checkpoint and --data are required without --dry-fixture"
        )
        from transformers import AutoTokenizer

        from lite_llama_tpu.config import load_config
        from lite_llama_tpu.utils.weights import (
            is_converted_checkpoint, load_converted, load_hf_checkpoint,
        )

        cfg = load_config(args.checkpoint, dtype=jnp.bfloat16,
                          max_seq_len=args.max_seq_len)
        if is_converted_checkpoint(args.checkpoint):
            params = load_converted(args.checkpoint, dtype=jnp.bfloat16)
        else:
            params = load_hf_checkpoint(args.checkpoint, cfg)
        tok = AutoTokenizer.from_pretrained(args.checkpoint)
        texts = []
        with open(args.data) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if args.data.endswith(".jsonl"):
                    line = json.loads(line).get("text", "")
                texts.append(line)
                if len(texts) >= args.max_seqs:
                    break
        seqs = [
            tok(t, add_special_tokens=False)["input_ids"][: args.max_seq_len]
            for t in texts
        ]
        rows, ok = run_table(cfg, params, seqs, names, chunk=args.chunk,
                             batch_size=args.batch_size)

    print(json.dumps({"configs": rows, "all_pass": ok}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
