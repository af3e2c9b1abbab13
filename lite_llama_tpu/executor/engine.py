"""InferenceEngine: the executor facade.

Capability parity with the reference's ``ModelExecutor``
(/root/reference/lite_llama/executor/model_executor.py:25-369): builds
config + weights, sizes and owns the KV pool, allocates KV for prefill and
decode, and dispatches the forward. The disabled CUDA-graph runner
(cuda_graph.py:14-181) is subsumed by ``jax.jit``: each (batch, bucket-length)
specialization is a captured executable, replayed with donated buffers.

TPU-native design:
- prefill and decode are separately jitted closures over the (static) config;
  the KV cache pytree is donated so pools update in place in HBM.
- decode runs in *chunks*: ``lax.scan`` over N steps fully on device
  (alloc -> forward -> sample -> eos bookkeeping), so the host syncs once per
  chunk instead of once per token — the TPU equivalent of CUDA-graph replay,
  but it also absorbs sampling and the allocator.
- a host-side capacity guard refuses admission when the page pool could be
  exhausted (the in-jit allocator is masked arithmetic and cannot raise).
- prompt lengths are bucketed (powers of two) to bound recompiles.
"""

from __future__ import annotations

import dataclasses
import threading
import math
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BaseConfig, load_config
from ..models.decoder import AttnContext, decoder_decode, decoder_prefill
from ..generation.sampling import SamplingParams, log_softmax_gather, sample
from .kv_cache import (
    PagedKVCache,
    alloc_decode,
    alloc_prefill,
    cdiv,
    create_kv_cache,
    free_requests,
    kv_cache_bytes,
)


def next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def bucket_width(n: int) -> int:
    """Smallest {pow2, 1.5*pow2} bucket >= n. Finer than pure pow2 so the
    canonical bs=12 batch runs at width 12, not 16 (pow2 padding cost a
    measured ~12% of decode throughput at the north-star config), while the
    compiled-shape count stays O(log n)."""
    p = next_pow2(n)
    if n <= 2:
        return n
    threeq = 3 * p // 4  # 1.5 * (p/2)
    return threeq if n <= threeq else p


@dataclasses.dataclass
class DecodeSession:
    """Device-resident decode state for a FIXED batch membership.

    Serving used to re-upload the layout, token, done, stop and sampling
    arrays on every scheduler iteration (~10 host->device transfers per
    chunk — which dominated serve throughput on tunneled devices, 5x below
    the batch loop). A session uploads them ONCE; between membership
    changes every decode chunk runs with zero uploads (the RNG key split
    and the traced step-limit scalar ride inside the jit call). The
    scheduler rebuilds the session only when a request joins or finishes
    (executor/scheduler.py)."""

    slots: tuple
    pos: np.ndarray  # caller order -> layout row
    req_ids: jax.Array
    tok: jax.Array
    done: jax.Array
    stop: jax.Array
    samp: "SamplingParams"
    mode: str


@dataclasses.dataclass
class _PrefillBundle:
    """A dispatched-but-uncollected prefill (engine.prefill_async).

    ``packed`` holds the host-bound (tok | bitcast logprobs) download;
    ``tok_dev`` is the raw on-device first-token array in LAYOUT row order
    — the serving scheduler feeds it straight into update_session_rows so
    admitted rows start decoding without any host round trip."""

    packed: jax.Array
    tok_dev: jax.Array
    pos: np.ndarray  # caller order -> layout row
    lens: np.ndarray
    last: Optional[jax.Array] = None


@dataclasses.dataclass
class EngineStats:
    prefill_tokens: int = 0
    decode_tokens: int = 0
    chunks: int = 0
    prefix_hits: int = 0
    prefix_tokens_reused: int = 0


class PrefixCache:
    """Host-side shared-prompt-prefix registry for ONE dp group.

    Beyond-reference serving capability (the reference's prompt-cache kernel
    is dead code, context_flashattention_nopad.py:140). Entries are whole
    page-aligned prompt prefixes: key = chained sha256 over page-sized token
    blocks, value = the group-LOCAL page ids holding that prefix's KV plus a
    refcount. The device side stays simple — alloc_prefill splices shared
    pages into the table, free_requests keeps them, push_pages evicts — all
    sharing policy lives here on the host.
    """

    def __init__(self):
        self.entries = {}  # key -> [n_pages, list(local_page_ids), refs, lru]
        self._tick = 0

    @staticmethod
    def chain_keys(tokens, page_size):
        """Chained per-page digests: h_k covers the first k*page_size
        tokens. O(len) total; a stored key equals h_k iff the stored entry's
        k pages hold exactly those tokens."""
        import hashlib

        keys = []
        h = hashlib.sha256()
        full = len(tokens) // page_size
        for k in range(full):
            blk = tokens[k * page_size : (k + 1) * page_size]
            h.update(np.asarray(blk, np.int32).tobytes())
            keys.append(h.digest())
        return keys  # keys[k-1] covers k pages

    def lookup(self, keys):
        """Longest stored prefix among the chain keys; returns
        (key, n_pages, page_ids) or None. Does NOT take a reference."""
        for k in range(len(keys), 0, -1):
            e = self.entries.get(keys[k - 1])
            if e is not None:
                return keys[k - 1], e[0], e[1]
        return None

    def acquire(self, key):
        self._tick += 1
        e = self.entries[key]
        e[2] += 1
        e[3] = self._tick

    def release(self, key):
        self.entries[key][2] -= 1

    def register(self, key, page_ids):
        if key in self.entries:
            return False
        self._tick += 1
        self.entries[key] = [len(page_ids), list(page_ids), 0, self._tick]
        return True

    def evictable(self):
        """(key, n_pages) pairs with refcount 0, LRU first."""
        return sorted(
            ((k, e[0]) for k, e in self.entries.items() if e[2] == 0),
            key=lambda it: self.entries[it[0]][3],
        )

    def pop(self, key):
        e = self.entries.pop(key)
        return e[1]


class InferenceEngine:
    """Owns params + paged KV cache + jitted step functions for one model."""

    def __init__(
        self,
        config: BaseConfig,
        params: dict,
        *,
        page_size: int = 16,
        max_reqs: int = 64,
        num_pages: Optional[int] = None,
        hbm_util: float = 0.9,
        decode_chunk: int = 32,
        prefill_chunk: int = 2048,
        kv_quant=False,  # False | True/'int8' | 'fp8' (scale-free e4m3)
        fuse_qkv: Optional[bool] = None,  # None = auto (fuse when tp > 1)
        prefix_cache: bool = False,
        forward_prefill=None,
        forward_decode=None,
        mesh=None,
        seed: int = 0,
        tp_quant_kernel: bool = True,
    ):
        from ..models.decoder import fuse_qkv_params
        from ..parallel.shardings import ShardingPolicy

        self.config = config
        self.shard = ShardingPolicy(mesh=mesh, tp_kernel=tp_quant_kernel)
        self.dp = self.shard.dp
        # Catch dtype mismatches at the door: a bf16-config engine fed
        # fp32 weights (e.g. dequantize_tree(..., jnp.float32) against a
        # bf16 config) otherwise surfaces as an inscrutable lax.scan
        # carry-dtype error deep inside the first prefill trace.
        tree = params.get("lm", params)
        emb = tree.get("embed") if isinstance(tree, dict) else None
        if emb is not None and hasattr(emb, "dtype"):
            if emb.dtype != jnp.dtype(config.dtype):
                raise ValueError(
                    f"params dtype {emb.dtype} != config.dtype "
                    f"{jnp.dtype(config.dtype).name}: cast the weights or "
                    "the config (activations follow config.dtype; mixing "
                    "breaks the decoder scan's carry dtype)"
                )
        if fuse_qkv is None:
            # Measured on v5e (A/B at the north-star config): for BF16
            # weights fusing Q+KV is ~1% SLOWER single-chip (the post-dot
            # split slices cost more fusion opportunity than the saved
            # weight-pass issue), but for PACKED INT4 weights each pallas
            # launch carries ~3.3 us fixed cost, so one fused launch beats
            # two (5.32 -> 5.24 ms/step at the int4+int8KV bs=12 config —
            # round-4 anatomy); under tensor parallelism one dot also means
            # one clean sharded matmul + collective pattern.
            from ..quant.qtensor import QTensor as _QT

            wq = params.get("layers", params.get("lm", {}).get(
                "layers", {})).get("wq")
            fuse_qkv = self.shard.tp > 1 or (
                isinstance(wq, _QT) and wq.packed
            )
        if fuse_qkv:
            # One [H, (Nq+2*Nkv)*D] matmul per layer instead of separate
            # q / kv dots (shard-periodic head order; models/decoder.py).
            if "layers" in params:
                params = fuse_qkv_params(params, self.shard.tp)
            elif "lm" in params and "layers" in params.get("lm", {}):
                params = {**params,
                          "lm": fuse_qkv_params(params["lm"], self.shard.tp)}
        self.params = self.shard.shard_params(config, params)
        params = self.params
        self.page_size = page_size
        assert max_reqs % self.dp == 0, (max_reqs, self.dp)
        self.max_reqs = max_reqs
        self.M_local = max_reqs // self.dp
        self.decode_chunk = decode_chunk
        self.prefill_chunk = prefill_chunk
        self._fwd_prefill = forward_prefill or decoder_prefill
        self._fwd_decode = forward_decode or decoder_decode
        if self.shard.cp > 1 and (self.dp > 1 or self.shard.tp > 1):
            raise ValueError(
                "context parallelism (cp mesh axis) currently composes with"
                " neither dp nor tp inside the engine: the pool's row shard"
                " would cross the manual-dp region / the cp shard_map is"
                " opaque to the tp head shard — build the mesh with"
                " cp alone (make_mesh(cp=N))"
            )
        if num_pages is None:
            num_pages = self._auto_num_pages(hbm_util)
        # Equal per-group pools (dp) and equal per-shard page counts (cp —
        # the cp kernel requires num_pages % cp == 0).
        num_pages -= num_pages % (self.dp * self.shard.cp)
        self.num_pages = num_pages
        self.kv_quant = kv_quant
        # The policy handed to the forwards: inside the manual-dp shard_map
        # activation constraints must be disabled (parallel/shardings.py).
        self._mshard = (
            dataclasses.replace(self.shard, manual_dp=True)
            if self.dp > 1 else self.shard
        )
        self.cache = self.shard.shard_cache(
            create_kv_cache(
                config.num_hidden_layers,
                config.num_key_value_heads,
                config.head_dim,
                num_pages=num_pages,
                page_size=page_size,
                max_reqs=max_reqs,
                max_seq_len=config.max_seq_len,
                dtype=config.dtype,
                quantized=kv_quant,
                groups=self.dp,
            )
        )
        self._key = jax.random.PRNGKey(seed)
        self._slots_by_group = [
            list(range(g * self.M_local, (g + 1) * self.M_local))
            for g in range(self.dp)
        ]
        self._pages_by_group = [num_pages // self.dp] * self.dp
        self._group_pages_total = num_pages // self.dp
        self.stats = EngineStats()
        from jax.sharding import PartitionSpec as PS

        cs = (
            self.shard.dp_cache_specs(self.cache) if self.dp > 1 else None
        )
        self._prefill_jits = {}
        self._prefill_sample_jits = {}
        self._chunk_jits = {}
        # Long-prompt (chunked) prefill path; also serves prefix-cache hits
        # (per-request start offsets).
        self._alloc_jit = jax.jit(
            self._dp_wrap(
                alloc_prefill,
                in_specs=(cs, PS("dp"), PS("dp"), PS("dp", None), PS("dp")),
                out_specs=cs,
            ),
            donate_argnums=(0,),
        )
        self._prefill_chunk_jits = {}  # static hist_bound -> jitted step
        self._free_jit = jax.jit(
            self._dp_wrap(
                free_requests,
                in_specs=(cs, PS("dp"), PS("dp")),
                out_specs=cs,
            ),
            donate_argnums=(0,),
        )
        from .kv_cache import push_pages

        self._evict_jit = jax.jit(
            self._dp_wrap(
                push_pages,
                in_specs=(cs, PS("dp"), PS("dp")),
                out_specs=cs,
            ),
            donate_argnums=(0,),
        )
        self.prefix = (
            [PrefixCache() for _ in range(self.dp)] if prefix_cache else None
        )
        self._slot_prefix = {}  # slot -> (group, key, n_pages, local_rows)
        self._slot_prompt = {}  # slot -> prompt token list (for registration)
        self._slot_filled = set()  # slots that actually ran prefill — only
        # these may DONATE pages on release (a rolled-back admission or a
        # prefill exception must not register never-allocated page ids)
        self.pad_id = config.pad_token_id if config.pad_token_id is not None else 0
        eos = config.eos_token_ids
        self._eos_array = jnp.asarray(eos if eos else [-1], jnp.int32)
        self._replicate_jit = None  # lazy; only built multi-process
        self._update_rows_jit = None  # lazy; serving session-row splice
        self._spec_jits = {}  # (B, K) -> speculative verify step
        # Host-side slot/page/prefix accounting is guarded by one RLock so
        # concurrent submitters (an async serving front end's threads) can
        # admit/release safely (VERDICT r3 next #8; the accounting itself
        # is pure-python and was documented as not thread-safe).
        self._admission_lock = threading.RLock()

    # -- data-parallel plumbing ------------------------------------------
    def _fetch(self, x) -> np.ndarray:
        """np.asarray for jit outputs that also works MULTI-PROCESS: a
        dp-over-DCN array spans non-addressable devices, so direct
        np.asarray raises. Replicate it through a tiny jit (XLA inserts the
        cross-host all-gather) and read the now-process-local copy. Every
        process gets the FULL value — the multi-host contract is SPMD host
        replication: all processes issue identical engine calls and see
        identical results (parallel/distributed.py). Single-process arrays
        take the plain np.asarray path untouched."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if self._replicate_jit is None:
                from jax.sharding import NamedSharding, PartitionSpec as PS

                self._replicate_jit = jax.jit(
                    lambda a: a,
                    out_shardings=NamedSharding(self.shard.mesh, PS()),
                )
            rep = self._replicate_jit(x)
            return np.asarray(rep.addressable_shards[0].data)
        return np.asarray(x)

    def _dp_wrap(self, fn, in_specs, out_specs):
        """shard_map the step function over the manual 'dp' axis (tp stays
        auto — GSPMD places the tensor-parallel collectives from the param
        shardings). Each dp shard runs the UNCHANGED single-group code on
        its local cache slice and its contiguous block of batch rows —
        request->group locality is guaranteed by the host-side layout
        (_group_layout), so no cross-dp communication exists in the step."""
        if self.dp == 1:
            return fn
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, which the vma checker rejects — with it on, any Pallas
        # op (attention, the W4A8 matmul) inside the dp region fails to
        # trace. Safety loss is bounded: the in/out specs still partition
        # everything explicitly.
        return jax.shard_map(
            fn, mesh=self.shard.mesh, in_specs=in_specs,
            out_specs=out_specs, axis_names={"dp"}, check_vma=False,
        )

    def _dp_key(self, key):
        """Per-shard RNG inside manual-dp regions."""
        if self.dp > 1:
            return jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return key

    def _group_layout(self, slots, min_width: int = 1):
        """Lay a batch of engine slots out as [dp, W] row blocks (flattened
        to dp*W): rows [g*W, (g+1)*W) belong to dp group g, carrying LOCAL
        slot ids; unused rows get the sentinel M_local (reads clamp, writes
        drop). Returns (pos, req_local, W) where pos[i] is input row i's
        layout position; W is bucket_width-padded ({pow2, 1.5*pow2}). With
        dp=1 this degenerates to plain batch bucketing. ``min_width`` floors
        W — a serving scheduler pins it so every admission reuses ONE
        compiled prefill width instead of one per pow2 batch size (each
        fresh mode is a ~50 s remote compile on a tunneled device)."""
        groups = [[] for _ in range(self.dp)]
        for i, s in enumerate(slots):
            groups[s // self.M_local].append(i)
        W = max(
            1, min(min_width, self.M_local),
            bucket_width(max(len(g) for g in groups)),
        )
        pos = np.zeros((len(slots),), np.int64)
        req_local = np.full((self.dp * W,), self.M_local, np.int32)
        for g, idxs in enumerate(groups):
            for j, i in enumerate(idxs):
                p = g * W + j
                pos[i] = p
                req_local[p] = slots[i] % self.M_local
        return pos, req_local, W

    # -- host capacity accounting (per dp group) --------------------------
    @property
    def _free_slots(self):
        return [s for g in self._slots_by_group for s in g]

    @property
    def _host_free_pages(self):
        return sum(self._pages_by_group)

    def _evict_for(self, g: int, need: int, protect=None) -> None:
        """Evict LRU zero-ref prefix entries from group g until ``need``
        pages are free (or nothing evictable remains). ``protect`` shields a
        key about to be acquired — eviction must never free the entry whose
        pages the caller is splicing in."""
        if self.prefix is None:
            return
        for key, n_pages in self.prefix[g].evictable():
            if self._pages_by_group[g] >= need:
                return
            if key == protect:
                continue
            pages = self.prefix[g].pop(key)
            arr = np.asarray(pages, np.int32)
            self.cache = self._evict_for_group_jit(g, arr)
            self._pages_by_group[g] += len(pages)

    def _evict_for_group_jit(self, g: int, pages: np.ndarray):
        """Push pages (group-local ids) of group g back on the device-side
        stack. Builds the [dp*W] layout: only group g's rows are valid."""
        W = int(pages.shape[0])
        full = np.zeros((self.dp * W,), np.int32)
        valid = np.zeros((self.dp * W,), bool)
        full[g * W : (g + 1) * W] = pages
        valid[g * W : (g + 1) * W] = True
        return self._evict_jit(self.cache, jnp.asarray(full), jnp.asarray(valid))

    def admit_feasible(self, total_len: int) -> bool:
        """Could a request of ``total_len`` tokens EVER be admitted (with an
        idle engine)? False means waiting is pointless — schedulers must
        reject instead of retrying forever (the batch path raises; a polling
        scheduler that only retries try_admit would busy-loop)."""
        return (
            0 < total_len <= self.config.max_seq_len
            and cdiv(total_len, self.page_size) <= self._group_pages_total
        )

    def try_admit(self, total_len: int, prompt_tokens=None):
        """Atomically place one request: pick the dp group with the longest
        cached-prefix hit (when prefix caching is on and the prompt is
        given), breaking ties by most free pages; reserve pages beyond the
        shared prefix and return the slot, or None. A hit takes a reference
        on the prefix entry and records the splice info for prefill."""
        with self._admission_lock:
            return self._try_admit_locked(total_len, prompt_tokens)

    def _try_admit_locked(self, total_len: int, prompt_tokens=None):
        total_pages = cdiv(total_len, self.page_size)
        hits = [None] * self.dp
        if self.prefix is not None and prompt_tokens is not None:
            keys = PrefixCache.chain_keys(prompt_tokens, self.page_size)
            # Never reuse the whole prompt: the last prompt token must be
            # recomputed so its logits exist for sampling the first output.
            max_use = (len(prompt_tokens) - 1) // self.page_size
            for g in range(self.dp):
                h = self.prefix[g].lookup(keys)
                if h is not None:
                    k_use = min(h[1], max_use)
                    if k_use > 0:
                        hits[g] = (h[0], k_use, h[2][:k_use])
        best, best_rank = None, None
        for g in range(self.dp):
            if not self._slots_by_group[g]:
                continue
            k = hits[g][1] if hits[g] else 0
            need = total_pages - k
            # Rank on HYPOTHETICAL capacity (free + evictable, excluding the
            # hit entry itself); actual eviction happens only in the group
            # that wins, so losing groups keep their cached prefixes.
            protect = hits[g][0] if hits[g] else None
            evictable = (
                sum(
                    n for key, n in self.prefix[g].evictable()
                    if key != protect
                )
                if self.prefix is not None else 0
            )
            if self._pages_by_group[g] + evictable < need:
                continue
            rank = (k, self._pages_by_group[g])
            if best is None or rank > best_rank:
                best, best_rank = g, rank
        if best is None:
            return None
        hit = hits[best]
        k = hit[1] if hit else 0
        need = total_pages - k
        if self._pages_by_group[best] < need:
            self._evict_for(best, need, protect=hit[0] if hit else None)
        if self._pages_by_group[best] < need:
            return None  # defensive: ranking guarantees capacity, but a
            # shortfall here must fail closed rather than oversubscribe
            # (note: none of this host accounting is thread-safe)
        self._pages_by_group[best] -= total_pages - k
        slot = self._slots_by_group[best].pop(0)
        if hit:
            key, k_use, pages = hit
            self.prefix[best].acquire(key)
            self._slot_prefix[slot] = (best, key, k_use, pages)
            self.stats.prefix_hits += 1
            self.stats.prefix_tokens_reused += k_use * self.page_size
        if self.prefix is not None and prompt_tokens is not None:
            self._slot_prompt[slot] = list(prompt_tokens)
        return slot

    def admit_requests(
        self, total_lens: Sequence[int], prompts=None
    ) -> List[int]:
        """try_admit for a whole batch; raises (and rolls back) if any
        request cannot be placed (the host-side guard — the in-jit allocator
        is masked arithmetic and cannot raise)."""
        with self._admission_lock:
            return self._admit_requests_locked(total_lens, prompts)

    def _admit_requests_locked(self, total_lens, prompts=None):
        slots: List[int] = []
        for i, n in enumerate(total_lens):
            s = self.try_admit(n, prompts[i] if prompts is not None else None)
            if s is None:
                self.release_slots(slots, total_lens[: len(slots)])
                raise RuntimeError(
                    f"KV capacity exhausted: {len(slots)}/{len(total_lens)} "
                    f"requests placed (free pages/group: {self._pages_by_group},"
                    f" free slots/group: {[len(g) for g in self._slots_by_group]})"
                )
            slots.append(s)
        return slots

    # -- construction -----------------------------------------------------
    @classmethod
    def build(
        cls, ckpt_dir: str, dtype=jnp.bfloat16, max_seq_len=None, **kw
    ) -> "InferenceEngine":
        """Load config + weights from an HF or engine-converted checkpoint dir
        (the reference's ModelExecutor.build, model_executor.py:33)."""
        from ..utils.weights import (
            is_converted_checkpoint,
            load_converted,
            load_hf_checkpoint,
        )

        overrides = {"dtype": dtype}
        if max_seq_len is not None:
            overrides["max_seq_len"] = max_seq_len
        config = load_config(ckpt_dir, **overrides)
        if is_converted_checkpoint(ckpt_dir):
            params = load_converted(ckpt_dir, dtype=dtype)
        else:
            params = load_hf_checkpoint(ckpt_dir, config)
        return cls(config, params, **kw)

    def _auto_num_pages(self, hbm_util: float) -> int:
        """Size the KV pool from free device memory (the reference's
        ComputeMaxAvailableBlocks profiling, mem_manager.py:16-143 — here we
        ask the runtime instead of measuring a dummy forward)."""
        cfg = self.config
        want = self.max_reqs * cdiv(cfg.max_seq_len, self.page_size)
        per_page = kv_cache_bytes(
            cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
            1, self.page_size, cfg.dtype,
        )
        try:
            stats = jax.devices()[0].memory_stats()
            free = stats["bytes_limit"] * hbm_util - stats["bytes_in_use"]
            fit = int(free // per_page)
            return max(64, min(want, fit))
        except Exception as e:  # pragma: no cover - runtime-specific
            # No runtime stats: compute the bound instead of sizing for the
            # theoretical max (which OOMed at alloc time on such runtimes —
            # VERDICT r3 next #10). Budget = a per-device-kind HBM table
            # (conservative default) minus the MEASURED parameter bytes
            # minus a fixed activation/workspace margin.
            from ..utils.logger import get_logger

            fit = self._fallback_page_fit(hbm_util, per_page)
            get_logger(__name__).warning(
                "memory_stats() unavailable (%s); sizing KV pool from the "
                "device-kind HBM table minus %.2f GB of weights: %d pages "
                "(wanted %d)", e,
                self._param_bytes() / 1e9, min(want, fit), want,
            )
            return max(64, min(want, fit))

    _HBM_BYTES_BY_KIND = {
        # Conservative per-chip HBM capacities (GiB) keyed by device_kind
        # substrings; unknown kinds fall back to the smallest table entry.
        "v5 lite": 16, "v5e": 16, "v4": 32, "v5p": 95, "v6": 32,
    }

    def _param_bytes(self) -> int:
        return int(sum(
            getattr(leaf, "nbytes", 0)
            for leaf in jax.tree_util.tree_leaves(self.params)
        ))

    def _fallback_page_fit(self, hbm_util: float, per_page: int) -> int:
        kind = ""
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:
            pass
        gib = min(self._HBM_BYTES_BY_KIND.values())
        for key, g in self._HBM_BYTES_BY_KIND.items():
            if key in kind:
                gib = g
                break
        budget = gib * (1 << 30) * hbm_util
        # Per-device parameter share: tensor-parallel shards split the big
        # matrices; dp replicates. Dividing by tp is slightly optimistic for
        # the replicated norms/embeddings, which the 1 GiB margin absorbs.
        params = self._param_bytes() / max(self.shard.tp, 1)
        margin = 1 << 30  # activations + workspace + allocator slack
        free = budget - params - margin
        return max(0, int(free // per_page))

    # -- jitted step functions -------------------------------------------
    def _samp_mode(self, sampling) -> str:
        """Host-side static exact/approx decision (the params are always
        host-known at the engine API boundary; baking the mode statically
        keeps the resident decode graph free of the exact path's [B, V]
        sort — a never-taken lax.cond branch still cost ~1% of decode)."""
        from ..generation.sampling import needs_exact_sampling

        return "exact" if needs_exact_sampling(
            np.asarray(sampling.temperature),
            np.asarray(sampling.top_p),
            np.asarray(sampling.top_k),
        ) else "approx"

    def _get_prefill_jit(self, mode: str):
        if mode not in self._prefill_jits:
            from jax.sharding import PartitionSpec as PS

            cs = (
                self.shard.dp_cache_specs(self.cache)
                if self.dp > 1 else None
            )
            fn = partial(self._prefill_step, sample_mode=mode)
            wrapped = self._dp_wrap(
                fn,
                in_specs=(PS(), cs, PS("dp", None), PS("dp"), PS("dp"),
                          PS(), SamplingParams(PS("dp"), PS("dp"), PS("dp"))),
                out_specs=(cs, PS("dp"), PS("dp", None), PS("dp")),
            )
            self._prefill_jits[mode] = jax.jit(wrapped, donate_argnums=(1,))
        return self._prefill_jits[mode]

    def _get_prefill_sample_jit(self, mode: str):
        if mode not in self._prefill_sample_jits:
            from jax.sharding import PartitionSpec as PS

            fn = partial(self._prefill_sample, sample_mode=mode)
            wrapped = self._dp_wrap(
                fn,
                in_specs=(PS("dp", None), PS(),
                          SamplingParams(PS("dp"), PS("dp"), PS("dp"))),
                out_specs=(PS("dp"), PS("dp")),
            )
            self._prefill_sample_jits[mode] = jax.jit(wrapped)
        return self._prefill_sample_jits[mode]

    def _prefill_step(
        self, params, cache, ids, lens, req_ids, key, sampling,
        sample_mode="auto",
    ):
        cfg = self.config
        key = self._dp_key(key)
        cache = alloc_prefill(cache, req_ids, lens)
        ctx = AttnContext(
            table_rows=cache.page_table[req_ids],
            seq_lens=lens,
            start_pos=jnp.zeros_like(lens),
            chunk_lens=lens,
        )
        last, kv = self._fwd_prefill(
            params, cfg, cache.kv_pages, ctx, input_ids=ids,
            shard=self._mshard, last_only=True,
        )
        cache = dataclasses.replace(cache, kv_pages=kv)
        tok = sample(last, key, sampling, mode=sample_mode)
        lp = log_softmax_gather(last, tok)
        return cache, tok, last, lp

    def _get_prefill_chunk_jit(self, hist_bound: int):
        """Chunked-prefill step, compiled per static history bound (page-
        rounded, pow2-bucketed by the caller so the compile count stays
        O(log max_seq)). The bound keeps the XLA fallback's dense history
        gather proportional to the ACTUAL pool history instead of the full
        page-table span (ADVICE r2 medium: a 32k-max_seq quantized engine
        used to materialize [B, Hq, S_chunk, 32k] scores per layer)."""
        if hist_bound not in self._prefill_chunk_jits:
            from jax.sharding import PartitionSpec as PS

            cs = (
                self.shard.dp_cache_specs(self.cache)
                if self.dp > 1 else None
            )
            fn = partial(self._prefill_chunk_step, hist_bound=hist_bound)
            wrapped = self._dp_wrap(
                fn,
                in_specs=(PS(), cs, PS("dp", None), PS("dp"), PS("dp"),
                          PS("dp"), PS("dp", None)),
                out_specs=(cs, PS("dp", None)),
            )
            self._prefill_chunk_jits[hist_bound] = jax.jit(
                wrapped, donate_argnums=(1, 6)
            )
        return self._prefill_chunk_jits[hist_bound]

    def _prefill_chunk_step(
        self, params, cache, ids_chunk, lens, req_ids, start, last_logits,
        hist_bound=None,
    ):
        """One bucketed chunk of a long (or prefix-cached) prompt: positions
        [start[b], start[b]+W) of every request (requests already fully
        consumed run fully masked). ``start`` is a per-request [B] vector:
        plain chunking passes a uniform ci*W; prefix-cache hits add each
        request's cached length so compute starts after the shared pages.
        Carries the running last-position logits so sampling happens once
        after the final chunk."""
        cfg = self.config
        W = ids_chunk.shape[1]
        chunk_lens = jnp.clip(lens - start, 0, W)
        ctx = AttnContext(
            table_rows=cache.page_table[req_ids],
            seq_lens=lens,
            start_pos=jnp.minimum(lens, start),  # [B] history per request
            chunk_lens=chunk_lens,
        )
        logits, kv = self._fwd_prefill(
            params, cfg, cache.kv_pages, ctx, input_ids=ids_chunk,
            shard=self._mshard, chunked=True, last_only=True,
            hist_bound=hist_bound,
        )
        cache = dataclasses.replace(cache, kv_pages=kv)
        ends_here = (lens > start) & (lens <= start + W)
        last_logits = jnp.where(ends_here[:, None], logits, last_logits)
        return cache, last_logits

    def _prefill_sample(self, last_logits, key, sampling, sample_mode="auto"):
        key = self._dp_key(key)
        tok = sample(last_logits, key, sampling, mode=sample_mode)
        lp = log_softmax_gather(last_logits, tok)
        return tok, lp

    def _decode_chunk(
        self, params, cache, req_ids, tok, done, stop_lens, key, sampling,
        n_limit, *, n_steps: int, sample_mode: str = "auto",
    ):
        """Runs ``n_steps`` (static, bucketed) scan iterations but only the
        first ``n_limit`` (traced) advance any state — steps past the limit
        execute masked, so one compiled shape serves every tail length."""
        cfg = self.config
        eos = self._eos_array
        pad = self.pad_id
        key = self._dp_key(key)

        def body(carry, xs):
            step_key, step_i = xs
            cache, tok, done = carry
            step_ok = step_i < n_limit
            active = ~done & step_ok
            cache = alloc_decode(cache, req_ids, active)
            pos = cache.seq_lens[req_ids] - 1
            ctx = AttnContext(
                table_rows=cache.page_table[req_ids],
                seq_lens=cache.seq_lens[req_ids],
                start_pos=pos,
                chunk_lens=jnp.ones_like(pos),
                active=active,
            )
            logits, kv = self._fwd_decode(
                params, cfg, cache.kv_pages, ctx, input_ids=tok,
                shard=self._mshard,
            )
            cache = dataclasses.replace(cache, kv_pages=kv)
            next_tok = sample(logits, step_key, sampling, mode=sample_mode)
            # Steps past n_limit are frozen: carry and emissions unchanged.
            next_tok = jnp.where(step_ok, next_tok, tok)
            emit = jnp.where(done | ~step_ok, pad, next_tok)
            emit_lp = jnp.where(
                done | ~step_ok, 0.0, log_softmax_gather(logits, next_tok)
            )
            hit_eos = jnp.isin(next_tok, eos) & step_ok
            hit_len = (cache.seq_lens[req_ids] >= stop_lens) & step_ok
            new_done = done | hit_eos | hit_len
            return (cache, next_tok, new_done), (emit, emit_lp)

        keys = jax.random.split(key, n_steps)
        steps = jnp.arange(n_steps, dtype=jnp.int32)
        (cache, tok, done), (toks, lps) = jax.lax.scan(
            body, (cache, tok, done), (keys, steps)
        )
        return cache, tok, done, toks, lps  # [n_steps, B] each

    # -- host API ---------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def acquire_slots(self, n: int) -> List[int]:
        """Legacy slot-only acquisition (round-robin over dp groups);
        prefer admit_requests, which also reserves pages per group."""
        if len(self._free_slots) < n:
            raise RuntimeError(
                f"request slots exhausted: want {n}, free {len(self._free_slots)}"
            )
        out = []
        g = 0
        while len(out) < n:
            if self._slots_by_group[g % self.dp]:
                out.append(self._slots_by_group[g % self.dp].pop(0))
            g += 1
        return out

    def release_slots(self, slots: Sequence[int], lens: Sequence[int]):
        with self._admission_lock:
            return self._release_slots_locked(slots, lens)

    def _release_slots_locked(self, slots, lens):
        if not slots:
            return
        keep = [0] * len(slots)
        returned = [cdiv(n, self.page_size) for n in lens]
        if self.prefix is not None:
            table_host = None
            for i, s in enumerate(slots):
                g = s // self.M_local
                used = self._slot_prefix.pop(s, None)
                prompt = self._slot_prompt.pop(s, None)
                filled = s in self._slot_filled
                self._slot_filled.discard(s)
                if used is not None:
                    # Shared pages belong to the cache entry; drop our ref.
                    _, key, n_pages, _ = used
                    self.prefix[g].release(key)
                    keep[i] = n_pages
                    returned[i] = cdiv(lens[i], self.page_size) - n_pages
                elif (
                    filled
                    and prompt is not None
                    and len(prompt) >= self.page_size
                ):
                    # Donate this prompt's full pages as a new prefix entry
                    # (only slots that actually prefilled — a rolled-back
                    # admission's table rows are zeros/stale).
                    keys = PrefixCache.chain_keys(prompt, self.page_size)
                    if keys and keys[-1] not in self.prefix[g].entries:
                        if table_host is None:
                            table_host = self._fetch(self.cache.page_table)
                        k_new = len(keys)
                        pages = table_host[s, :k_new].tolist()
                        self.prefix[g].register(keys[-1], pages)
                        keep[i] = k_new
                        returned[i] = cdiv(lens[i], self.page_size) - k_new
        pos, req_local, W = self._group_layout(slots)
        keep_l = np.zeros((self.dp * W,), np.int32)
        keep_l[pos] = keep
        self.cache = self._free_jit(
            self.cache, jnp.asarray(req_local), jnp.asarray(keep_l)
        )
        for s, n in zip(slots, returned):
            g = s // self.M_local
            self._pages_by_group[g] += n
            self._slots_by_group[g].append(s)

    def reserve_pages(self, total_lens: Sequence[int]):
        """Legacy single-pool capacity guard (dp=1 only; dp>1 callers must
        use admit_requests, which places each request in a group)."""
        assert self.dp == 1, "use admit_requests under data parallelism"
        need = sum(cdiv(n, self.page_size) for n in total_lens)
        if need > self._pages_by_group[0]:
            raise RuntimeError(
                f"KV pool exhausted: need {need} pages, free {self._pages_by_group[0]}"
            )
        self._pages_by_group[0] -= need

    def prefill(
        self, token_lists: Sequence[Sequence[int]], sampling, slots,
        return_logits: bool = False, min_width: int = 1,
    ):
        """Blocking prefill: dispatch + collect in one call. Returns
        (first_tokens [B] np, lens np, last_logits-or-None, lp)."""
        return self.prefill_collect(
            self.prefill_async(
                token_lists, sampling, slots,
                return_logits=return_logits, min_width=min_width,
            )
        )

    def prefill_async(
        self, token_lists: Sequence[Sequence[int]], sampling, slots,
        return_logits: bool = False, min_width: int = 1,
    ):
        """Pad to a bucket, dispatch the jitted prefill + first-token
        sampling WITHOUT blocking; returns a ``_PrefillBundle`` for
        ``prefill_collect`` (or for device-side consumption of
        ``bundle.tok_dev`` by ``update_session_rows`` — the serving
        scheduler wires prefill straight into the resident decode session
        with no host round trip on the critical path).

        BOTH dims bucket to powers of two: sequence by padding with pad_id,
        batch by appending dummy rows (lens 0, slot id == max_reqs, dropped
        by the allocator's OOB mode) — so a continuous-batching scheduler
        admitting odd batch sizes reuses a handful of compiled shapes
        instead of paying a multi-second XLA compile per (B, S) pair."""
        B = len(token_lists)
        pos, req_local, W = self._group_layout(slots, min_width=min_width)
        Bl = self.dp * W  # layout rows (group-blocked, pow2 per group)
        lens = np.zeros((Bl,), np.int32)
        lens[pos] = [len(t) for t in token_lists]
        S_max = int(lens.max())

        def lay1(x, fill, dtype):
            out = np.full((Bl,), fill, dtype)
            out[pos] = np.asarray(x)
            return jnp.asarray(out)

        # Static sample mode from the CALLER'S params, before layout: the
        # pad-row fill values (1.0, 1.0, 0) would otherwise satisfy the
        # untruncated-request exact predicate and silently flip every
        # padded prefill batch onto the full-vocab-sort path (pad rows'
        # samples are discarded, so their mode is irrelevant).
        mode = self._samp_mode(sampling)
        samp_p = SamplingParams(
            temperature=lay1(sampling.temperature, 1.0, np.float32),
            top_p=lay1(sampling.top_p, 1.0, np.float32),
            top_k=lay1(sampling.top_k, 0, np.int32),
        )
        req_ids = jnp.asarray(req_local)
        lens_arr = jnp.asarray(lens)
        ids_rows = np.asarray(pos)

        # Prefix-cache splice info (engine-local slot state set by try_admit).
        cached = np.zeros((Bl,), np.int32)  # cached TOKENS per layout row
        prefix_rows = np.zeros((Bl, self.cache.pages_per_req), np.int32)
        prefix_pages = np.zeros((Bl,), np.int32)
        for i, s in enumerate(slots):
            hit = self._slot_prefix.get(s)
            if hit is not None:
                _, _, n_use, pages = hit  # already clamped at admit time
                cached[ids_rows[i]] = n_use * self.page_size
                prefix_pages[ids_rows[i]] = n_use
                prefix_rows[ids_rows[i], :n_use] = pages

        if S_max > self.prefill_chunk or cached.any():
            # Chunked path: bucketed chunks through the paged-history
            # attention, with per-request start offsets — covers both long
            # prompts (a 33k prompt pads to the next 2k chunk instead of the
            # next power of two) and prefix-cache hits (compute starts after
            # the shared pages; their KV is already in the pool).
            resid_max = int((lens - cached).max())
            # Chunk width >= page_size: the history-streaming kernel walks
            # pool pages in BK-sized blocks, so BK (= min(block_k, W)) must
            # be a multiple of the page size.
            Wc = min(
                self.prefill_chunk,
                max(next_pow2(max(resid_max, 1)), self.page_size),
            )
            n_chunks = cdiv(resid_max, Wc)
            ids = np.full((Bl, n_chunks * Wc), self.pad_id, np.int32)
            for i, t in enumerate(token_lists):
                c = int(cached[ids_rows[i]])
                ids[ids_rows[i], : len(t) - c] = t[c:]
            self.cache = self._alloc_jit(
                self.cache, req_ids, lens_arr,
                jnp.asarray(prefix_rows), jnp.asarray(prefix_pages),
            )
            last_logits = jnp.zeros(
                (Bl, self.config.vocab_size), jnp.float32
            )
            cached_arr = jnp.asarray(cached)
            ppr = self.cache.pages_per_req
            ps = self.page_size
            for ci in range(n_chunks):
                # Static history bound for this chunk: no request can have
                # more pool history than max(cached) + ci*Wc (nor more than
                # the longest prompt); page-round and pow2-bucket it so the
                # fallback's dense gather scales with actual history while
                # the compile count stays O(log max_seq).
                hist_tok = min(int(cached.max()) + ci * Wc, int(lens.max()))
                hb = (
                    min(next_pow2(cdiv(hist_tok, ps)), ppr) * ps
                    if hist_tok > 0 else 0
                )
                self.cache, last_logits = self._get_prefill_chunk_jit(hb)(
                    self.params,
                    self.cache,
                    jnp.asarray(ids[:, ci * Wc : (ci + 1) * Wc]),
                    lens_arr,
                    req_ids,
                    cached_arr + ci * Wc,
                    last_logits,
                )
            tok, lp = self._get_prefill_sample_jit(mode)(
                last_logits, self._next_key(), samp_p
            )
            last = last_logits
            self.stats.prefill_tokens += int((lens - cached).sum())
        else:
            S = next_pow2(S_max)
            ids = np.full((Bl, S), self.pad_id, np.int32)
            for i, t in enumerate(token_lists):
                ids[ids_rows[i], : len(t)] = t
            self.cache, tok, last, lp = self._get_prefill_jit(mode)(
                self.params,
                self.cache,
                jnp.asarray(ids),
                lens_arr,
                req_ids,
                self._next_key(),
                samp_p,
            )
            self.stats.prefill_tokens += int(lens.sum())
        self._slot_filled.update(slots)
        # Pack the two small host-bound outputs into ONE download (a
        # blocking fetch costs a full tunnel RTT, ~120 ms measured); the
        # [B, vocab] logits (~6 MB for a 128k vocab) download only on
        # request — no current caller consumes them.
        packed = jnp.stack(
            [tok.astype(jnp.int32),
             jax.lax.bitcast_convert_type(lp.astype(jnp.float32), jnp.int32)]
        )
        return _PrefillBundle(
            packed=packed, tok_dev=tok, pos=pos, lens=lens,
            last=last if return_logits else None,
        )

    def prefill_collect(self, bundle: "_PrefillBundle"):
        """Block on a dispatched prefill's host-bound outputs. Returns
        (first_tokens [B] np, lens [B] np, last_logits-or-None, lp [B])."""
        ph = self._fetch(bundle.packed)
        return (
            ph[0][bundle.pos],
            bundle.lens[bundle.pos],
            self._fetch(bundle.last)[bundle.pos]
            if bundle.last is not None else None,
            ph[1].view(np.float32)[bundle.pos],
        )

    def start_decode_session(
        self, slots, tok, done, stop_lens, sampling
    ) -> DecodeSession:
        """Lay the batch out into dp-group blocks and upload the decode
        state ONCE (see DecodeSession). ``decode_session`` then runs chunks
        against the resident arrays with no further uploads until the
        membership changes."""
        pos, req_local, W = self._group_layout(slots)
        Bl = self.dp * W

        def lay(x, fill, dtype):
            out = np.full((Bl,), fill, dtype)
            out[pos] = np.asarray(x)
            return jnp.asarray(out)

        return DecodeSession(
            slots=tuple(slots),
            pos=pos,
            req_ids=jnp.asarray(req_local),
            tok=lay(tok, 0, np.int32),
            done=lay(done, True, bool),  # pad rows are born done
            stop=lay(stop_lens, 0, np.int32),
            samp=SamplingParams(
                temperature=lay(sampling.temperature, 1.0, np.float32),
                top_p=lay(sampling.top_p, 1.0, np.float32),
                top_k=lay(sampling.top_k, 0, np.int32),
            ),
            mode=self._samp_mode(sampling),
        )

    def update_session_rows(
        self, s: DecodeSession, rows, bundle: _PrefillBundle, bundle_idx,
        prompt_lens, stop_lens, temperature, top_p, top_k,
    ) -> None:
        """Splice freshly-prefilled requests into a resident full-width
        session WITHOUT a rebuild: one small donated jit scatters the
        prefill's ON-DEVICE first tokens (bundle.tok_dev) plus the host-known
        stop/sampling rows into the session arrays, and computes each new
        row's done flag on device (first token is eos, or the prompt already
        fills max_total). The decode chunk dispatched next therefore depends
        only on device-side values — admission never blocks on a download
        (the old rebuild re-uploaded every array and the scheduler blocked
        on the prefill fetch first; serve ran at ~54% of the batch loop).

        ``rows``: session layout rows to fill (== slots for the scheduler's
        full-width sessions); ``bundle_idx``: caller-order indices into the
        bundle (bundle.pos maps them to prefill layout rows). All host
        arrays are padded to a fixed width by the caller (rows == M is an
        out-of-bounds scatter index -> dropped), so ONE compiled update
        serves every admission size."""
        if self._update_rows_jit is None:
            def upd(tok, done, stop, st, sp, sk, src, pr, sr, stop_new,
                    plens, t_new, p_new, k_new, eos):
                newtok = src[pr]
                first_done = jnp.isin(newtok, eos) | (plens + 1 >= stop_new)
                return (
                    tok.at[sr].set(newtok),
                    done.at[sr].set(first_done),
                    stop.at[sr].set(stop_new),
                    st.at[sr].set(t_new),
                    sp.at[sr].set(p_new),
                    sk.at[sr].set(k_new),
                )

            self._update_rows_jit = jax.jit(
                upd, donate_argnums=(0, 1, 2, 3, 4, 5)
            )
        pr = np.asarray(bundle.pos)[np.asarray(bundle_idx, np.int64)]
        (s.tok, s.done, s.stop, st, sp, sk) = self._update_rows_jit(
            s.tok, s.done, s.stop, s.samp.temperature, s.samp.top_p,
            s.samp.top_k, bundle.tok_dev,
            jnp.asarray(np.asarray(pr, np.int32)),
            jnp.asarray(np.asarray(rows, np.int32)),
            jnp.asarray(np.asarray(stop_lens, np.int32)),
            jnp.asarray(np.asarray(prompt_lens, np.int32)),
            jnp.asarray(np.asarray(temperature, np.float32)),
            jnp.asarray(np.asarray(top_p, np.float32)),
            jnp.asarray(np.asarray(top_k, np.int32)),
            self._eos_array,
        )
        s.samp = SamplingParams(temperature=st, top_p=sp, top_k=sk)

    def dispatch_decode_chunk(self, s: DecodeSession, n: int):
        """Enqueue ONE decode chunk (n <= decode_chunk steps) against a
        resident session WITHOUT blocking. Returns an opaque bundle for
        ``collect_decode_chunk``. Dispatch is async — a pipelining
        scheduler can enqueue chunk k, then do host work (processing chunk
        k-1's results, admissions) while the device executes."""
        n = min(n, self.decode_chunk)
        run_steps = (
            self.decode_chunk if n >= self.decode_chunk else next_pow2(n)
        )
        self.cache, s.tok, s.done, toks, lps = self._get_chunk_jit(
            run_steps, s.mode
        )(
            self.params,
            self.cache,
            s.req_ids,
            s.tok,
            s.done,
            s.stop,
            self._next_key(),
            s.samp,
            jnp.asarray(n, jnp.int32),
        )
        # Pack the host-bound outputs into ONE int32 array (bitcasting the
        # logprobs): each blocking fetch costs a full tunnel RTT (~120 ms
        # measured), and three separate downloads per chunk were most of
        # the serving gap, not device work.
        packed = jnp.concatenate(
            [
                toks.astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    lps.astype(jnp.float32), jnp.int32
                ),
                s.done.astype(jnp.int32)[None, :],
            ],
            axis=0,
        )
        self.stats.chunks += 1
        return (packed, n, run_steps, s.pos)

    def collect_decode_chunk(self, bundle):
        """Block on a dispatched chunk's packed outputs. Returns
        (tokens [n, B] np.int32, logprobs [n, B] np.float32, done [B] bool)
        in the session's caller order."""
        packed, n, run_steps, pos = bundle
        ph = self._fetch(packed)
        toks = ph[:n][:, pos]
        lps = ph[run_steps : run_steps + n].view(np.float32)[:, pos]
        done_h = ph[-1].astype(bool)[pos]
        # Count only rows still live at chunk end (full-width serving
        # sessions carry masked done/empty rows; counting the packed width
        # overstated throughput by up to max_reqs x). Rows finishing
        # mid-chunk undercount by < n each — stats, not billing.
        self.stats.decode_tokens += int(n * int((~done_h).sum()))
        return toks, lps, done_h

    def decode_session(self, s: DecodeSession, n_steps: int):
        """Run ``n_steps`` decode steps against a resident session. Returns
        (tokens [n_steps, B], logprobs [n_steps, B], done [B] bool) in
        caller order, pad-filled after each row's eos; ``s.tok``/``s.done``
        advance on device. Serial dispatch+collect per inner chunk with an
        early exit once every live row is done."""
        B = len(s.pos)
        if n_steps <= 0:  # degenerate budget: report state, emit nothing
            return (
                np.zeros((0, B), np.int32),
                np.zeros((0, B), np.float32),
                self._fetch(s.done)[s.pos],
            )
        all_toks, all_lps = [], []
        done_h = None
        remaining = n_steps
        while remaining > 0:
            n = min(remaining, self.decode_chunk)
            toks, lps, done_h = self.collect_decode_chunk(
                self.dispatch_decode_chunk(s, n)
            )
            all_toks.append(toks)
            all_lps.append(lps)
            remaining -= n
            # Early exit once every live row is done (already synced by the
            # packed download — a pure host-side check) — callers pass
            # their full remaining budget in ONE decode()/session call and
            # the resident arrays upload only once.
            if remaining > 0 and bool(done_h.all()):
                break
        out = np.concatenate(all_toks, axis=0)
        lps_out = np.concatenate(all_lps, axis=0)
        return out, lps_out, done_h

    def decode(self, slots, tok, done, stop_lens, sampling, n_steps: int):
        """Run one jitted multi-step decode chunk. Returns (tokens
        [n_steps, B] np.int32 — pad-filled after each row's eos, done np).

        ``n_steps`` is bucketed to {decode_chunk, pow2 tails} so the jitted
        chunk compiles for a handful of shapes instead of one per distinct
        tail length (an unlucky tail used to pay a multi-second XLA compile
        mid-generation). The true count rides in as a traced limit: overshoot
        steps execute fully masked (state frozen), and their rows are
        trimmed from the result. ``n_steps > decode_chunk`` loops internally
        until the full count is consumed (callers decrement by n_steps, so
        silently clamping would truncate generations).

        Rows are internally re-laid out into dp-group blocks (pad rows run
        fully masked) and results are returned in caller order. One-shot
        wrapper over start_decode_session + decode_session; continuous
        serving holds a session across chunks instead
        (executor/scheduler.py)."""
        s = self.start_decode_session(slots, tok, done, stop_lens, sampling)
        out, lps_out, done_h = self.decode_session(s, n_steps)
        return (
            jnp.asarray(self._fetch(s.tok)[s.pos]),
            jnp.asarray(done_h),
            out,
            lps_out,
        )

    # -- speculative decoding (greedy verify) ------------------------------
    def spec_verify(self, slots, chunk_tokens, chunk_lens):
        """One greedy speculative-decoding verify step (beyond-reference;
        generation/speculative.py drives it with prompt-lookup drafts).

        ``chunk_tokens`` [B, K] int32: position 0 is each request's CURRENT
        next-token (sampled but not yet in the pool — the engine's virtual-
        token protocol), positions 1..c-1 are draft tokens;
        ``chunk_lens`` [B] gives each row's valid width c (0 = inactive row).
        One jitted program: allocate pages for the optimistic chunk, run a
        chunked prefill over it (writes KV for all c tokens), compute the
        longest draft prefix whose greedy argmax matches, REWIND page/length
        accounting to the accepted length (kv_cache.rewind_requests — the
        rejected rows stay physically in the pool beyond seq_lens and are
        overwritten in place later), and emit the accepted tokens plus the
        model's bonus token.

        Returns (emit [B, K] np.int32 — n_emit[b] valid tokens per row, pad
        after; n_emit [B]; next_tok [B] — the bonus token, each row's new
        "current next-token"). Greedy-exact: output equals plain greedy
        decoding token for token regardless of draft quality. dp=1 only
        (no group layout); tp shards through GSPMD as usual."""
        assert self.dp == 1, "speculative decoding: dp meshes unsupported"
        B, K = np.asarray(chunk_tokens).shape
        key = (B, K)
        if key not in self._spec_jits:
            self._spec_jits[key] = jax.jit(
                partial(self._spec_verify_step, K=K), donate_argnums=(1,),
            )
        self.cache, emit, n_emit, next_tok = self._spec_jits[key](
            self.params,
            self.cache,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(np.asarray(chunk_tokens, np.int32)),
            jnp.asarray(np.asarray(chunk_lens, np.int32)),
        )
        packed = jnp.concatenate(
            [emit, n_emit[:, None], next_tok[:, None]], axis=1
        )
        ph = self._fetch(packed)
        return ph[:, :K], ph[:, K], ph[:, K + 1]

    def _spec_verify_step(self, params, cache, req, chunk, chunk_lens, *,
                          K: int):
        from .kv_cache import rewind_requests

        cfg = self.config
        L = cache.seq_lens[req]  # pool token count (excl. current next-tok)
        new_total = L + chunk_lens
        cache = alloc_prefill(
            cache, req, new_total,
            prefix_rows=cache.page_table[req],
            prefix_pages=cdiv(L, self.page_size),
        )
        ctx = AttnContext(
            table_rows=cache.page_table[req],
            seq_lens=new_total,
            start_pos=L,
            chunk_lens=chunk_lens,
        )
        logits, kv = self._fwd_prefill(
            params, cfg, cache.kv_pages, ctx, input_ids=chunk,
            shard=self._mshard, chunked=True,
        )
        cache = dataclasses.replace(cache, kv_pages=kv)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K]
        idx = jnp.arange(K - 1, dtype=jnp.int32)
        # draft i (chunk col i+1) is accepted iff it matches the model's
        # prediction after the previous token AND is inside the valid chunk.
        ok = (chunk[:, 1:] == pred[:, :-1]) & (
            idx[None, :] + 1 < chunk_lens[:, None]
        )
        lead = jnp.cumprod(ok.astype(jnp.int32), axis=1)
        a = jnp.sum(lead, axis=1)  # [B] accepted draft count, 0..K-1
        B = chunk.shape[0]
        rows = jnp.arange(B)
        next_tok = pred[rows, a]  # bonus: model's token after last accept
        emit_idx = jnp.arange(K, dtype=jnp.int32)
        drafts_shift = jnp.concatenate(
            [chunk[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        emit = jnp.where(
            emit_idx[None, :] < a[:, None], drafts_shift, self.pad_id
        )
        emit = emit.at[rows, a].set(next_tok)
        n_emit = a + 1
        # Pool must hold L + a + 1 (t0 + accepted drafts); the bonus token
        # stays virtual. Inactive rows (chunk_lens 0) clamp to L.
        cache = rewind_requests(cache, req, L + a + 1)
        return cache, emit, n_emit, next_tok

    def spec_decode_chunk(
        self, slots, history, hist_len, cur, done, max_total,
        n_steps: int = 8, draft_len: int = 4, ngram: int = 3,
    ):
        """CHUNKED speculative decoding: ``n_steps`` verify iterations scan
        inside ONE jitted dispatch, with drafting on device
        (generation/speculative.device_prompt_lookup) from a device-resident
        token history — so the host syncs once per chunk instead of once
        per verify step. This is the tunnel-tolerant form the per-step
        ``spec_verify`` docstring names as the known fix: per-step host RTT
        (the measured 0.19x killer on this repo's tunneled chip) leaves the
        critical path entirely, the same way plain decoding's chunked scan
        does (dispatch_decode_chunk).

        State (device arrays, threaded opaquely by the caller):
        ``history`` int32 [B, S] — prompt + emitted tokens, row b valid in
        [0, hist_len[b]) and ENDING with the current next-token ``cur[b]``;
        ``done`` bool [B]; ``max_total`` int32 [B] (prompt + generation
        budget). Returns ``(history, hist_len, cur, done, emits
        [n_steps, B, K], keeps [n_steps, B], done_host [B])`` — step s of
        row b emitted ``keeps[s, b]`` tokens (eos- and budget-truncated;
        pad after). Greedy-exact like spec_verify. dp=1 only."""
        assert self.dp == 1, "speculative decoding: dp meshes unsupported"
        B = len(slots)
        K = draft_len + 1
        S = history.shape[1]
        key = ("chunk", B, K, S, n_steps, ngram)
        if key not in self._spec_jits:
            self._spec_jits[key] = jax.jit(
                partial(self._spec_chunk, K=K, n_steps=n_steps,
                        ngram=ngram),
                donate_argnums=(1, 3),  # cache, history
            )
        self.cache, history, hist_len, cur, done, packed = self._spec_jits[
            key
        ](
            self.params, self.cache,
            jnp.asarray(np.asarray(slots, np.int32)),
            history, hist_len, cur, done,
            jnp.asarray(np.asarray(max_total, np.int32)),
        )
        ph = self._fetch(packed)  # [n_steps, B, K+2] — ONE sync per chunk
        emits = ph[:, :, :K]
        keeps = ph[:, :, K]
        done_host = ph[0, :, K + 1].astype(bool)
        return history, hist_len, cur, done, emits, keeps, done_host

    def _spec_chunk(self, params, cache, req, history, hist_len, cur,
                    done, max_total, *, K: int, n_steps: int, ngram: int):
        from ..generation.speculative import device_prompt_lookup

        eos = self._eos_array
        B, S = history.shape
        kidx = jnp.arange(K, dtype=jnp.int32)
        rows_i = jnp.arange(B, dtype=jnp.int32)

        def step(carry, _):
            cache, history, hist_len, cur, done = carry
            room = max_total - hist_len
            active = (~done) & (room > 0)
            drafts, d = device_prompt_lookup(history, hist_len, K - 1,
                                             ngram)
            # A step emits up to d+1 tokens; never overshoot the budget.
            d = jnp.minimum(d, jnp.maximum(room - 1, 0))
            chunk = jnp.concatenate([cur[:, None], drafts], axis=1)
            chunk_lens = jnp.where(active, 1 + d, 0)
            cache, emit, n_emit, next_tok = self._spec_verify_step(
                params, cache, req, chunk, chunk_lens, K=K
            )
            # Keep up to (and including) the first eos, within budget —
            # the host-side generator's truncation, moved on device.
            within = kidx[None, :] < n_emit[:, None]
            is_eos = (
                (emit[..., None] == eos[None, None, :]).any(-1) & within
            )
            first_eos = jnp.min(
                jnp.where(is_eos, kidx[None, :], K), axis=1
            )
            n_keep = jnp.minimum(n_emit, first_eos + 1)
            n_keep = jnp.minimum(n_keep, room)
            n_keep = jnp.where(active, n_keep, 0)
            wpos = hist_len[:, None] + kidx[None, :]
            valid_w = (kidx[None, :] < n_keep[:, None]) & (wpos < S)
            tgt = jnp.where(valid_w, rows_i[:, None] * S + wpos, B * S)
            history = history.reshape(-1).at[tgt.reshape(-1)].set(
                emit.reshape(-1), mode="drop"
            ).reshape(B, S)
            hist_len = hist_len + n_keep
            done = done | (first_eos < n_keep) | (hist_len >= max_total)
            cur = jnp.where(active, next_tok, cur)
            out = jnp.concatenate(
                [
                    emit,
                    n_keep[:, None],
                    jnp.zeros((B, 1), jnp.int32),  # done slot, filled below
                ],
                axis=1,
            )
            return (cache, history, hist_len, cur, done), out

        (cache, history, hist_len, cur, done), outs = jax.lax.scan(
            step, (cache, history, hist_len, cur, done), None,
            length=n_steps,
        )
        # Final done mask rides in every step's last column (the host reads
        # step 0's — one fetch covers tokens + termination).
        outs = outs.at[:, :, K + 1].set(done.astype(jnp.int32)[None, :])
        return cache, history, hist_len, cur, done, outs

    def _get_chunk_jit(self, n_steps: int, mode: str = "approx"):
        """The decode chunk is compiled per static (step count, sampling
        mode); with dp > 1 each variant is wrapped in the manual-dp
        shard_map (shard_map has no static-kwarg passthrough, so the
        statics bind via partial first)."""
        if (n_steps, mode) not in self._chunk_jits:
            from jax.sharding import PartitionSpec as PS

            fn = partial(self._decode_chunk, n_steps=n_steps,
                         sample_mode=mode)
            cs = (
                self.shard.dp_cache_specs(self.cache)
                if self.dp > 1 else None
            )
            sp = SamplingParams(PS("dp"), PS("dp"), PS("dp"))
            wrapped = self._dp_wrap(
                fn,
                in_specs=(PS(), cs, PS("dp"), PS("dp"), PS("dp"),
                          PS("dp"), PS(), sp, PS()),
                out_specs=(cs, PS("dp"), PS("dp"), PS(None, "dp"),
                           PS(None, "dp")),
            )
            self._chunk_jits[(n_steps, mode)] = jax.jit(
                wrapped, donate_argnums=(1,)
            )
        return self._chunk_jits[(n_steps, mode)]
