"""Model configuration dataclasses.

Capability parity with the reference's config system
(/root/reference/lite_llama/models/model_config.py:44-276): HF ``config.json``
ingestion with field-alias maps, derived fields in ``__post_init__``, and a
model_type -> config-class registry (reference executor_struct.py:7-12).

TPU-native deltas: every config also carries the static engine-shape knobs the
jitted step functions specialize on (page size, max pages), and dtypes are
jax dtypes (bf16 default rather than fp16 — bf16 is the TPU-native 16-bit type).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Type

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Base


@dataclass
class BaseConfig:
    """Common decoder-transformer fields, named in HF style."""

    model_type: str = "llama"
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    head_dim: Optional[int] = None
    vocab_size: int = 128256
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    hidden_act: str = "silu"
    bos_token_id: Optional[int] = None
    eos_token_id: Any = None  # int or list[int]
    pad_token_id: Optional[int] = None

    # Engine-shape knobs (static under jit)
    max_seq_len: int = 2048
    dtype: Any = jnp.bfloat16

    # Field aliases seen in HF configs -> our field names.
    _ALIASES = {
        "n_layers": "num_hidden_layers",
        "n_heads": "num_attention_heads",
        "n_kv_heads": "num_key_value_heads",
        "max_seq_length": "max_seq_len",
    }

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads

    # -- derived ----------------------------------------------------------
    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def eos_token_ids(self):
        e = self.eos_token_id
        if e is None:
            return []
        return list(e) if isinstance(e, (list, tuple)) else [e]

    # -- construction -----------------------------------------------------
    @classmethod
    def from_dict(cls, d: Dict[str, Any], **overrides) -> "BaseConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs: Dict[str, Any] = {}
        for k, v in d.items():
            k = cls._ALIASES.get(k, k)
            if k in names and not k.startswith("_"):
                kwargs[k] = v
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path: str, **overrides) -> "BaseConfig":
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            return cls.from_dict(json.load(f), **overrides)


# ---------------------------------------------------------------------------
# Architectures


@dataclass
class LlamaConfig(BaseConfig):
    model_type: str = "llama"


@dataclass
class Qwen2Config(BaseConfig):
    """Qwen2/2.5: q/k/v projection biases (reference qwen2.py:95-106)."""

    model_type: str = "qwen2"
    attention_bias: bool = True
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False


@dataclass
class Qwen3Config(BaseConfig):
    """Qwen3: per-head q/k RMSNorm before RoPE, no attention bias, and
    head_dim decoupled from hidden_size (reference qwen3.py:77-121,
    model_config.py:183)."""

    model_type: str = "qwen3"
    attention_bias: bool = False
    qk_norm: bool = True
    rope_theta: float = 1000000.0


@dataclass
class VisionConfig:
    """CLIP vision tower shape (reference model_config.py:222-234)."""

    hidden_size: int = 1024
    image_size: int = 336
    patch_size: int = 14
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    num_channels: int = 3
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclass
class LlavaConfig(BaseConfig):
    """LLaVA-1.5 = CLIP tower + projector + Llama LM
    (reference model_config.py:236-276, llava.py:33-148)."""

    model_type: str = "llava"
    vision_config: Optional[VisionConfig] = None
    text_config: Optional[LlamaConfig] = None
    image_token_index: int = 32000
    projector_hidden_act: str = "gelu"
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"

    def __post_init__(self):
        if isinstance(self.vision_config, dict):
            self.vision_config = VisionConfig.from_dict(self.vision_config)
        if self.vision_config is None:
            self.vision_config = VisionConfig()
        if isinstance(self.text_config, dict):
            self.text_config = LlamaConfig.from_dict(self.text_config)
        if self.text_config is None:
            self.text_config = LlamaConfig()
        # Mirror the text config into the flat fields so the LM stack can be
        # driven by this config directly.
        t = self.text_config
        for f in (
            "hidden_size",
            "intermediate_size",
            "num_hidden_layers",
            "num_attention_heads",
            "num_key_value_heads",
            "head_dim",
            "vocab_size",
            "rms_norm_eps",
            "rope_theta",
            "rope_scaling",
            "tie_word_embeddings",
        ):
            setattr(self, f, getattr(t, f))
        super().__post_init__()
        t.max_seq_len = self.max_seq_len
        t.dtype = self.dtype

    @property
    def num_image_patches(self) -> int:
        return self.vision_config.num_patches


# ---------------------------------------------------------------------------
# Registry (reference executor_struct.py:7-12)

CONFIG_CLASS_MAP: Dict[str, Type[BaseConfig]] = {
    "llama": LlamaConfig,
    "qwen2": Qwen2Config,
    "qwen3": Qwen3Config,
    "llava": LlavaConfig,
}


def load_config(path_or_dict, **overrides) -> BaseConfig:
    """Load a config from an HF checkpoint dir / config.json / dict,
    dispatching on ``model_type``."""
    if isinstance(path_or_dict, dict):
        d = path_or_dict
    else:
        p = path_or_dict
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            d = json.load(f)
    cls = CONFIG_CLASS_MAP.get(d.get("model_type", "llama"), LlamaConfig)
    return cls.from_dict(d, **overrides)
