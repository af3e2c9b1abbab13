"""lite_llama_tpu — a TPU-native LLM inference engine.

Brand-new JAX/XLA/Pallas/pjit framework with the full capability set of the
reference single-GPU Triton engine (harleyszhang/lite_llama; see SURVEY.md),
redesigned TPU-first: paged KV cache as jitted state pytrees, Pallas attention
kernels, mesh-sharded weights, continuous batching, and INT8/FP8 quantization.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    BaseConfig,
    LlamaConfig,
    LlavaConfig,
    Qwen2Config,
    Qwen3Config,
    load_config,
)
