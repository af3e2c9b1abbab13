"""Offline weight converter CLI: HF checkpoint -> fused engine checkpoint.

Capability parity with the reference's ``apply_weight_convert.py``:311-338
(model-type autodetect from config.json, per-arch key mapping + fusion, save
converted weights + copy tokenizer/config metadata). Output loads ~instantly
via ``InferenceEngine.build`` (engine.safetensors is the pre-fused tree).

Usage:
    python -m lite_llama_tpu.convert <hf_checkpoint_dir> <out_dir> [--dtype bf16]
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp

from .config import load_config
from .utils.logger import get_logger
from .utils.weights import (
    convert_hf_llava_state_dict,
    convert_hf_state_dict,
    load_hf_safetensors,
    save_converted,
)

logger = get_logger()

_DTYPES = {"bf16": jnp.bfloat16, "fp16": jnp.float16, "fp32": jnp.float32}


def convert_checkpoint(src: str, dst: str, dtype=jnp.bfloat16) -> None:
    cfg = load_config(src, dtype=dtype)
    logger.info(f"model_type={cfg.model_type}, loading safetensors from {src}")
    t0 = time.perf_counter()
    sd = load_hf_safetensors(src)
    logger.info(f"loaded {len(sd)} tensors in {time.perf_counter() - t0:.1f}s")
    if cfg.model_type == "llava":
        params = convert_hf_llava_state_dict(sd, cfg)
    else:
        prefix = "model." if any(k.startswith("model.") for k in sd) else ""
        params = convert_hf_state_dict(sd, cfg, prefix=prefix)
    save_converted(params, cfg, dst, src_dir=src)
    logger.info(f"wrote fused engine checkpoint to {dst}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lite_llama_tpu.convert")
    p.add_argument("src", help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("dst", help="output dir for the fused engine checkpoint")
    p.add_argument("--dtype", choices=_DTYPES, default="bf16")
    args = p.parse_args(argv)
    convert_checkpoint(args.src, args.dst, _DTYPES[args.dtype])


if __name__ == "__main__":
    main()
