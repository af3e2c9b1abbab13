"""Sharding policy: mesh axes + PartitionSpecs for params, cache, activations.

The reference has no parallelism at all (SURVEY.md §2.6 — single GPU, no
collectives); this module provides the TPU-native scaling design from
BASELINE.json's north star:

- 2-D mesh ``('dp', 'tp')``: ``tp`` rides ICI (tensor-parallel weights + KV
  heads), ``dp`` is request-level data parallel across hosts/DCN.
- Weights shard on the *head* axis (wq/wkv) and the *ffn* axis (gate_up/down),
  so decode attention is fully local per chip: each chip owns Hkv/tp KV heads
  and the matching slice of the paged pools — no cross-chip traffic in the
  token-generation inner loop, collectives only around o_proj/down
  (reduce-scatter/all-reduce inserted by XLA from the constraints below).
- The embedding / lm_head shard on the vocab axis; the final logits gather is
  one all-gather of [B, V/tp].

Requires tp | num_key_value_heads, tp | num_attention_heads, tp | ffn.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


@dataclass(frozen=True)
class ShardingPolicy:
    """Computes NamedShardings for the engine's trees; ``mesh=None`` means
    single-device (every spec degenerates to replicated)."""

    mesh: Optional[Mesh] = None

    def _ns(self, *spec):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(*spec))

    # -- parameter tree ---------------------------------------------------
    def param_specs(self, cfg, params: dict) -> dict:
        """Spec tree matching the decoder parameter tree
        (models/decoder.py:init_decoder_params layout)."""
        if self.mesh is None:
            return jax.tree_util.tree_map(lambda _: None, params)
        layer_specs = {
            "attn_norm": self._ns(None, None),
            "wq": self._ns(None, None, "tp", None),  # [L, H, Nq, D]
            "wkv": self._ns(None, None, None, "tp", None),  # [L, H, 2, Nkv, D]
            "o_proj": self._ns(None, "tp", None, None),  # [L, Nq, D, H]
            "mlp_norm": self._ns(None, None),
            "gate_up_proj": self._ns(None, None, None, "tp"),  # [L, H, 2, I]
            "down_proj": self._ns(None, "tp", None),  # [L, I, H]
            "q_bias": self._ns(None, "tp", None),  # [L, Nq, D]
            "kv_bias": self._ns(None, None, "tp", None),  # [L, 2, Nkv, D]
            "q_norm": self._ns(None, None),
            "k_norm": self._ns(None, None),
        }
        specs = {
            "embed": self._ns("tp", None),  # [V, H] vocab-sharded
            "layers": {
                k: layer_specs[k] for k in params["layers"]
            },
            "final_norm": self._ns(None),
        }
        if "lm_head" in params:
            specs["lm_head"] = self._ns(None, "tp")  # [H, V]
        return specs

    # -- KV cache ---------------------------------------------------------
    def _cache_leaf_sharding(self, leaf):
        """kv pages [L, 2, T, Hkv*D] (head-major channels, so a contiguous
        last-axis shard is a group of heads) / scales [L, T, 2, Hkv]: KV
        heads over tp so decode attention is chip-local; all bookkeeping
        arrays replicated. Dispatch by rank."""
        if leaf.ndim == 4:
            # pages [L, 2, T, Hkv*D] and scales [L, T, 2, Hkv]: both shard
            # kv-heads on the LAST axis.
            return self._ns(None, None, None, "tp")
        return self._ns(*([None] * leaf.ndim))

    # -- activation constraints (used inside the forward) -----------------
    def heads(self, x):
        """Constrain a [..., heads, D] activation to head-sharded."""
        if self.mesh is None:
            return x
        spec = [None] * (x.ndim - 2) + ["tp", None]
        return jax.lax.with_sharding_constraint(x, self._ns(*spec))

    def hidden(self, x):
        """Constrain a [..., H] activation to fully replicated (post
        all-reduce of o_proj/down partial sums)."""
        if self.mesh is None:
            return x
        spec = [None] * x.ndim
        return jax.lax.with_sharding_constraint(x, self._ns(*spec))

    def ffn(self, x):
        """Constrain a [..., 2, I] gate/up activation to ffn-sharded."""
        if self.mesh is None:
            return x
        spec = [None] * (x.ndim - 1) + ["tp"]
        return jax.lax.with_sharding_constraint(x, self._ns(*spec))

    def shard_params(self, cfg, params: dict) -> dict:
        if self.mesh is None:
            return params
        specs = self.param_specs(cfg, params)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if s is not None else x,
            params,
            specs,
        )

    def shard_cache(self, cache):
        if self.mesh is None:
            return cache
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, self._cache_leaf_sharding(leaf)),
            cache,
        )
