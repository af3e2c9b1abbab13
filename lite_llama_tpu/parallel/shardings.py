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


def _is_qtensor(x) -> bool:
    from ..quant.qtensor import QTensor

    return isinstance(x, QTensor)


def make_mesh(tp: int = 1, dp: int = 1, cp: int = 1, devices=None) -> Mesh:
    """('dp', 'cp', 'tp') device mesh. ``cp`` (context/sequence parallel)
    shards the paged KV pool's token rows so long-context decode attention
    reads 1/cp of the KV bytes per chip (parallel/context_parallel.py);
    meshes built without cp keep the historical 2-axis ('dp', 'tp') shape
    so existing specs/tests are unchanged."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * cp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if cp == 1:
        arr = np.asarray(devices[:n]).reshape(dp, tp)
        return Mesh(arr, ("dp", "tp"))
    arr = np.asarray(devices[:n]).reshape(dp, cp, tp)
    return Mesh(arr, ("dp", "cp", "tp"))


@dataclass(frozen=True)
class ShardingPolicy:
    """Computes NamedShardings for the engine's trees; ``mesh=None`` means
    single-device (every spec degenerates to replicated).

    ``manual_dp=True`` marks a policy used INSIDE the engine's manual-dp
    shard_map region: activation ``with_sharding_constraint``s become no-ops
    there (JAX rejects NamedSharding constraints on values varying over a
    manual axis; tp placement still propagates from the parameter
    shardings)."""

    mesh: Optional[Mesh] = None
    manual_dp: bool = False
    # Route packed-int4 matmuls through the Pallas W4A8 kernel under tp>1
    # (manual-tp shard_map, quant/qtensor.qeinsum). Off = XLA W4A16
    # dual-dot everywhere (the measured A/B).
    tp_kernel: bool = True

    @property
    def tp(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape.get("tp", 1)

    @property
    def dp(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape.get("dp", 1)

    @property
    def cp(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape.get("cp", 1)

    def _ns(self, *spec):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(*spec))

    # -- parameter tree ---------------------------------------------------
    def param_specs(self, cfg, params: dict) -> dict:
        """Spec tree matching the decoder parameter tree
        (models/decoder.py:init_decoder_params layout, optionally fused by
        fuse_qkv_params). QTensor leaves map to ``(q_spec, scale_spec)``
        tuples — the quantized storage keeps contraction dims flattened to C
        and output dims to O ([*stack, C, O], quant/qtensor.py), so the tp
        shard rides whichever flat axis carries the heads/ffn dim."""
        if self.mesh is None:
            return jax.tree_util.tree_map(
                lambda _: None, params,
                is_leaf=lambda x: not isinstance(x, dict),
            )
        if "lm" in params and "layers" not in params:
            # Multimodal (LLaVA) tree: decoder specs for the LM; the vision
            # tower + projector REPLICATE across the mesh (a ~0.3B CLIP is
            # small next to the LM, and the image path runs once per request
            # — head-sharding it buys nothing in the decode loop).
            rep = jax.tree_util.tree_map(lambda _: self._ns(), {
                k: v for k, v in params.items() if k != "lm"
            })
            rep["lm"] = self.param_specs(cfg, params["lm"])
            return rep
        layer_specs = {
            "attn_norm": self._ns(None, None),
            "wq": self._ns(None, None, "tp", None),  # [L, H, Nq, D]
            "wkv": self._ns(None, None, None, "tp", None),  # [L, H, 2, Nkv, D]
            # wqkv [L, H, Ntot, D] — shard-periodic head order
            # (fuse_qkv_params), so a contiguous tp shard = one (q, k, v)
            # head group.
            "wqkv": self._ns(None, None, "tp", None),
            "o_proj": self._ns(None, "tp", None, None),  # [L, Nq, D, H]
            "mlp_norm": self._ns(None, None),
            "gate_up_proj": self._ns(None, None, None, "tp"),  # [L, 2, H, I]
            "down_proj": self._ns(None, "tp", None),  # [L, I, H]
            "q_bias": self._ns(None, "tp", None),  # [L, Nq, D]
            "kv_bias": self._ns(None, None, "tp", None),  # [L, 2, Nkv, D]
            "qkv_bias": self._ns(None, "tp", None),  # [L, Ntot, D]
            "q_norm": self._ns(None, None),
            "k_norm": self._ns(None, None),
        }
        # Quantized ([*stack, C, O]-stored) variants: (q_spec, scale_spec).
        qtensor_specs = {
            "wq": (self._ns(None, None, "tp"), self._ns(None, "tp")),
            "wqkv": (self._ns(None, None, "tp"), self._ns(None, "tp")),
            "o_proj": (self._ns(None, "tp", None), self._ns(None, None)),
            # gate_up stored [L, 2, H, I] (stack (L, 2)): shard I.
            "gate_up_proj": (
                self._ns(None, None, None, "tp"),
                self._ns(None, None, "tp"),
            ),
            "down_proj": (self._ns(None, "tp", None), self._ns(None, None)),
        }
        unfusable_quantized = {"wkv"}  # contiguous O shard crosses K|V

        def pick(name, leaf):
            if _is_qtensor(leaf):
                if self.tp > 1 and (leaf.sigma_out or leaf.sigma_in) and (
                    leaf.sigma_groups != self.tp
                ):
                    raise ValueError(
                        f"σ-shuffled quantized '{name}' was laid out for "
                        f"sigma_groups={leaf.sigma_groups} but the mesh has "
                        f"tp={self.tp}: one tp shard must be exactly one σ "
                        "block. Quantize with sigma_tp=<mesh tp> "
                        "(quant/qtensor.quantize_decoder_params) or with "
                        "sigma_ffn=False."
                    )
                if self.tp > 1 and leaf.riffle_groups:
                    # 'out'-sharded byte axes need one riffle block per tp
                    # shard; 'contract' weights keep the output axis whole,
                    # so they need the single whole-axis block.
                    want = (
                        self.tp
                        if name in ("wq", "wqkv", "gate_up_proj")
                        else 1
                    )
                    if leaf.riffle_groups != want:
                        raise ValueError(
                            f"riffle-packed quantized '{name}' was laid "
                            f"out for riffle_groups={leaf.riffle_groups} "
                            f"but the tp={self.tp} mesh needs {want}. "
                            "Quantize with riffle_tp=<mesh tp> "
                            "(quant/qtensor.quantize_decoder_params) or "
                            "with riffle=False."
                        )
                if name == "gate_up_proj" and leaf.q.ndim == 3:
                    # σ-FFN flat layout [L, C, O]: O-sharded spec — with
                    # sigma_groups == tp each contiguous shard is one σ
                    # block (quantize_decoder_params sigma_tp).
                    return (self._ns(None, None, "tp"), self._ns(None, "tp"))
                if name in unfusable_quantized:
                    if self.tp > 1:
                        raise ValueError(
                            f"quantized '{name}' cannot be tensor-parallel "
                            "sharded (a contiguous shard of its flat output "
                            "axis crosses the K|V boundary) — fuse QKV first "
                            "(models/decoder.py fuse_qkv_params)"
                        )
                    # tp=1 (dp-only mesh): replicate — no head shard exists.
                    return (
                        self._ns(None, None, None),
                        self._ns(None, None),
                    )
                return qtensor_specs[name]
            return layer_specs[name]

        specs = {
            "embed": self._ns("tp", None),  # [V, H] vocab-sharded
            "layers": {
                k: pick(k, v) for k, v in params["layers"].items()
            },
            "final_norm": self._ns(None),
        }
        if "lm_head" in params:
            if _is_qtensor(params["lm_head"]):
                lm = params["lm_head"]
                if self.tp > 1 and lm.riffle_groups and (
                    lm.riffle_groups != self.tp
                ):
                    raise ValueError(
                        "riffle-packed lm_head was laid out for "
                        f"riffle_groups={lm.riffle_groups} but its vocab "
                        f"axis shards over tp={self.tp}: quantize with "
                        "riffle_tp=<mesh tp>."
                    )
                specs["lm_head"] = (self._ns(None, "tp"), self._ns("tp"))
            else:
                specs["lm_head"] = self._ns(None, "tp")  # [H, V]
        return specs

    # -- KV cache ---------------------------------------------------------
    def _cache_leaf_sharding(self, leaf, is_scales: bool = False):
        """kv pages [L, 2, T, Hkv*D]: token rows over dp (each dp group owns
        its requests' pages by construction — executor/kv_cache.py
        PagedKVCache docstring) AND over cp (context parallelism: each cp
        shard owns 1/cp of the page rows; decode attention reads only the
        owned rows through cp_paged_flash_decode and LSE-combines over ICI),
        head channels over tp so decode attention is chip-local. Merged
        scale planes [L, T, SCALE_LANES] shard dp/cp on the token axis but
        REPLICATE their lane axis: only Hkv lanes per half are valid, so a
        tp slice of the 128 padded lanes would not line up with the pages'
        head shard — instead each tp shard reads the full slab and the
        attention kernels shift their scale selectors by the shard's
        head_offset (parallel/tp_attention.py). Bookkeeping arrays
        (page_table [M, ppr], seq_lens/free_stack/free_top [·]) shard their
        request/page axis over dp only (they are read on every shard)."""
        row = ("dp", "cp") if self.cp > 1 else "dp"
        if is_scales:  # [L, T, SCALE_LANES]
            return self._ns(None, row, None)
        if leaf.ndim == 4:
            return self._ns(None, None, row, "tp")
        if leaf.ndim == 2:
            return self._ns("dp", None)
        if leaf.ndim == 0:  # scalar free_top (single-group cache)
            return self._ns()
        return self._ns("dp")

    def dp_cache_specs(self, cache):
        """PartitionSpec pytree for the cache mentioning ONLY the dp axis —
        the in/out specs for the engine's manual-dp shard_map (tp stays
        auto)."""
        from jax.sharding import PartitionSpec as PS

        def rule(leaf):
            if leaf.ndim == 4:
                return PS(None, None, "dp", None)
            if leaf.ndim == 2:
                return PS("dp", None)
            if leaf.ndim == 0:
                return PS()
            return PS("dp")

        return jax.tree_util.tree_map(rule, cache)

    # -- activation constraints (used inside the forward) -----------------
    def heads(self, x):
        """Constrain a [..., heads, D] activation to head-sharded."""
        if self.mesh is None or self.manual_dp:
            return x
        spec = [None] * (x.ndim - 2) + ["tp", None]
        return jax.lax.with_sharding_constraint(x, self._ns(*spec))

    def hidden(self, x):
        """Constrain a [..., H] activation to fully replicated (post
        all-reduce of o_proj/down partial sums)."""
        if self.mesh is None or self.manual_dp:
            return x
        spec = [None] * x.ndim
        return jax.lax.with_sharding_constraint(x, self._ns(*spec))

    def ffn(self, x):
        """Constrain a [..., 2, I] gate/up activation to ffn-sharded."""
        if self.mesh is None or self.manual_dp:
            return x
        spec = [None] * (x.ndim - 1) + ["tp"]
        return jax.lax.with_sharding_constraint(x, self._ns(*spec))

    def shard_params(self, cfg, params: dict) -> dict:
        if self.mesh is None:
            return params
        specs = self.param_specs(cfg, params)

        def apply(node, spec):
            if isinstance(node, dict):
                return {k: apply(v, spec[k]) for k, v in node.items()}
            if _is_qtensor(node):
                import dataclasses as _dc

                q_spec, s_spec = spec
                if node.grouped and s_spec is not None:
                    # C-grouped scales carry an extra nG axis before O
                    # ([*stack, nG, O]); the spec tables are written for
                    # the ungrouped rank. When the weight's CONTRACTION
                    # axis is tp-sharded (o_proj/down_proj), the groups
                    # follow it — shard nG so each tp shard holds exactly
                    # its rows' scales (what the manual-tp W4A8 kernel
                    # wrapper reads locally, ops/qmatmul.py); otherwise
                    # replicate the group axis.
                    p = tuple(s_spec.spec)
                    qp = tuple(q_spec.spec)
                    contract_tp = (
                        len(qp) >= 2
                        and qp[-2] == "tp"
                        and node.scale.shape[-2] % max(self.tp, 1) == 0
                    )
                    s_spec = NamedSharding(
                        s_spec.mesh,
                        P(*p[:-1], "tp" if contract_tp else None, p[-1]),
                    )
                return _dc.replace(
                    node,
                    q=jax.device_put(node.q, q_spec),
                    scale=jax.device_put(node.scale, s_spec),
                )
            return jax.device_put(node, spec) if spec is not None else node

        return apply(params, specs)

    def shard_cache(self, cache):
        if self.mesh is None:
            return cache
        scales = cache.kv_pages.scales  # identity-test the one special leaf
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(
                leaf,
                self._cache_leaf_sharding(leaf, is_scales=leaf is scales),
            ),
            cache,
        )
