"""Worker process for tests/test_multihost.py (NOT a test module).

Each of the two OS processes runs this script with 4 virtual CPU devices,
joins the jax.distributed cluster via the LLT_* env path, builds the engine
on the (dp=2-over-"DCN", tp=4) multihost mesh, and greedy-generates the SAME
batch — the SPMD host-replication contract (parallel/distributed.py). It
prints one JSON line with the generated tokens, the single-device reference
tokens computed in-process, and the addressability evidence for disjoint dp
state.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax import: 4 virtual CPU devices per process.
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")

from lite_llama_tpu.parallel.distributed import (
    init_distributed,
    make_multihost_mesh,
)

assert init_distributed(), "LLT_* env vars must configure the cluster"

import jax.numpy as jnp
import numpy as np

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import TextGenerator
from lite_llama_tpu.models.decoder import init_decoder_params


def main():
    pid = jax.process_index()
    assert jax.process_count() == 2 and jax.local_device_count() == 4
    mesh = make_multihost_mesh(tp=4)
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}, dict(mesh.shape)

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        vocab_size=96,  # divisible by tp=4 for vocab sharding
        max_seq_len=64, dtype=jnp.float32, eos_token_id=95,
    )
    # Identical params on every process (same seed): the tp shard of each
    # chip is taken from the same logical tree.
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(
        cfg, params, page_size=8, max_reqs=4, num_pages=32, decode_chunk=4,
        mesh=mesh,
    )

    # Disjoint dp state: this process addresses only its own dp group's
    # shard of the cache (4 of 8 devices; seq_lens rows of ITS group only).
    sl = engine.cache.seq_lens
    n_addr = len(sl.addressable_shards)
    n_total = len(sl.sharding.device_set)
    assert not sl.is_fully_addressable

    prompts = [[1, 2, 3], [7, 8], [11, 12, 13, 14], [5]]
    out = TextGenerator(engine).generate_tokens(
        prompts, max_gen_len=8, temperature=0.0, logprobs=True
    )
    tokens = [o.token_ids for o in out]
    lps = [o.logprobs for o in out]

    # In-process single-device reference (mesh=None -> local device 0).
    ref_engine = InferenceEngine(
        cfg, init_decoder_params(cfg, jax.random.PRNGKey(0)),
        page_size=8, max_reqs=4, num_pages=32, decode_chunk=4,
    )
    ref_out = TextGenerator(ref_engine).generate_tokens(
        prompts, max_gen_len=8, temperature=0.0, logprobs=True
    )
    ref_tokens = [o.token_ids for o in ref_out]
    ref_lps = [o.logprobs for o in ref_out]

    # Tiny random models echo the last prompt token (tied embeddings make
    # h ~= embed[tok]), so token equality alone is weak evidence — the
    # per-step LOGPROBS depend on the full [B, V] logits and discriminate
    # a broken sharded forward from a lucky echo.
    lp_diff = max(
        abs(a - b)
        for la, lb in zip(lps, ref_lps)
        for a, b in zip(la, lb)
    )

    print("RESULT " + json.dumps({
        "pid": pid,
        "tokens": tokens,
        "ref_tokens": ref_tokens,
        "parity": tokens == ref_tokens,
        "max_logprob_diff": lp_diff,
        "addressable_shards": n_addr,
        "total_devices": n_total,
    }), flush=True)


if __name__ == "__main__":
    main()
