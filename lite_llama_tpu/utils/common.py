"""Device/memory/model introspection helpers.

Capability parity with /root/reference/lite_llama/utils/common.py:
``detect_device`` (:19), ``get_gpu_memory`` (:40), ``count_tokens`` (:76),
``get_model_type`` (:84). TPU delta: device discovery goes through
``jax.devices()`` / ``device.memory_stats()`` instead of shelling out to
nvidia-smi/rocm-smi.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

_MODEL_TYPES = ("llava", "qwen3", "qwen2", "llama")


def detect_device() -> str:
    """Returns the active JAX backend: 'tpu', 'gpu', or 'cpu'."""
    import jax

    return jax.default_backend()


def device_info() -> List[Dict]:
    """Per-device kind + memory stats (bytes), when the backend reports them."""
    import jax

    out = []
    for d in jax.devices():
        info: Dict = {"id": d.id, "kind": d.device_kind, "platform": d.platform}
        try:
            stats = d.memory_stats() or {}
            info["bytes_in_use"] = stats.get("bytes_in_use")
            info["bytes_limit"] = stats.get("bytes_limit")
        except Exception:
            pass
        out.append(info)
    return out


def get_device_memory(device_index: int = 0) -> Optional[Dict[str, float]]:
    """(used_gb, total_gb) of one accelerator, or None if unreported."""
    infos = device_info()
    if device_index >= len(infos):
        return None
    info = infos[device_index]
    if not info.get("bytes_limit"):
        return None
    gb = 1024.0**3
    return {
        "used_gb": (info.get("bytes_in_use") or 0) / gb,
        "total_gb": info["bytes_limit"] / gb,
    }


def count_tokens(texts: List[str], tokenizer) -> int:
    """Total tokens across texts (reference common.py:76-82)."""
    return sum(
        len(tokenizer(t, add_special_tokens=False)["input_ids"]) for t in texts
    )


def get_model_type(model_path: Optional[str]) -> str:
    """Sniff the architecture family from a checkpoint path, falling back to
    config.json's model_type (reference common.py:84-96)."""
    if not model_path:
        return "llama"
    lowered = os.path.basename(os.path.normpath(model_path)).lower()
    for t in _MODEL_TYPES:
        if t in lowered:
            return t
    cfg_path = os.path.join(model_path, "config.json")
    if os.path.exists(cfg_path):
        import json

        try:
            with open(cfg_path) as f:
                mt = json.load(f).get("model_type", "")
            for t in _MODEL_TYPES:
                if t in mt.lower():
                    return t
        except Exception:
            pass
    for t in _MODEL_TYPES:
        if t in model_path.lower():
            return t
    return "llama"
