"""Continuous batching scheduler: more requests than slots, interleaved
admission/completion, greedy-parity with isolated generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.executor.scheduler import ContinuousBatchingScheduler
from lite_llama_tpu.generation.generate import TextGenerator
from lite_llama_tpu.models.decoder import init_decoder_params


def make_engine(max_reqs=4, num_pages=32):
    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=97,
        max_seq_len=32,
        dtype=jnp.float32,
        eos_token_id=96,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(
        cfg, params, page_size=4, max_reqs=max_reqs, num_pages=num_pages,
        decode_chunk=4,
    )


def test_more_requests_than_slots_all_complete():
    engine = make_engine(max_reqs=4, num_pages=32)
    sched = ContinuousBatchingScheduler(engine, max_prefill_batch=2)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 96, size=rng.integers(2, 6)).tolist()
               for _ in range(10)]
    ids = [sched.submit(p, max_gen_len=6, temperature=0.0) for p in prompts]
    results = {r.req_id: r for r in sched.run()}
    assert len(results) == 10
    for i in ids:
        r = results[i]
        assert r.state == "done"
        assert 1 <= len(r.output_tokens) <= 6
    # engine fully drained
    assert len(engine._free_slots) == 4
    assert engine._host_free_pages == engine.num_pages
    assert int(engine.cache.free_top.sum()) == engine.num_pages


def test_scheduler_greedy_matches_isolated():
    engine = make_engine(max_reqs=4, num_pages=48)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5], [10, 20], [30], [4, 2]]
    # isolated reference outputs (fresh engine per prompt to be safe)
    expected = []
    for p in prompts:
        e2 = make_engine(max_reqs=4, num_pages=48)
        out = TextGenerator(e2).generate_tokens([p], max_gen_len=7,
                                                temperature=0.0)
        expected.append(out[0].token_ids)
    sched = ContinuousBatchingScheduler(engine, max_prefill_batch=3)
    ids = [sched.submit(p, max_gen_len=7, temperature=0.0) for p in prompts]
    results = {r.req_id: r for r in sched.run()}
    for i, want in zip(ids, expected):
        assert results[i].output_tokens == want, f"req {i}"


def test_streaming_callback():
    engine = make_engine()
    sched = ContinuousBatchingScheduler(engine)
    rid = sched.submit([3, 1, 4, 1, 5], max_gen_len=5, temperature=0.0)
    streamed = []
    results = sched.run(on_tokens=lambda r, toks: streamed.extend(toks))
    full = {r.req_id: r for r in results}[rid].output_tokens
    # every output token streams through the callback, INCLUDING the
    # prefill-sampled first token (review fix, round 3)
    assert full == streamed


def test_admission_respects_capacity():
    engine = make_engine(max_reqs=4, num_pages=12)  # tight pool
    sched = ContinuousBatchingScheduler(engine)
    for _ in range(6):
        sched.submit([1, 2, 3], max_gen_len=8, temperature=0.0)
    results = sched.run()
    assert len(results) == 6
    assert engine._host_free_pages == engine.num_pages


def test_decode_session_reuploads_only_on_membership_change():
    """Serving decode state is device-resident (engine.DecodeSession):
    with a stable live set, successive scheduler iterations must NOT
    rebuild (re-upload) the session — only admission/completion may
    (VERDICT r2 next #6: per-chunk host->device uploads dominated serve
    throughput on tunneled devices)."""
    import unittest.mock as mock

    engine = make_engine(max_reqs=4, num_pages=32)
    sched = ContinuousBatchingScheduler(engine)
    # max_seq_len 32 cap: prompt 3 + gen caps at 29; chunk_steps=4 so many
    # chunks pass with zero completions.
    for _ in range(2):
        sched.submit([1, 2, 3], max_gen_len=25, temperature=0.6, top_p=0.9)
    with mock.patch.object(
        engine, "start_decode_session",
        side_effect=engine.start_decode_session,
    ) as spy:
        # Iteration 1 admits (dirty) -> one build; iterations 2..4 decode
        # with no membership change -> zero builds.
        for _ in range(4):
            sched.step()
        assert spy.call_count == 1, spy.call_count
        # Drain to completion: the final chunks finish both requests, which
        # dirties the session again (at most one rebuild before empties).
        while sched.has_work():
            sched.step()
    results = sched.done
    assert len(results) == 2
    assert all(len(r.output_tokens) >= 1 for r in results)


def test_admit_every_batches_admissions():
    """admit_every=N: after the initial fill, waiting requests are admitted
    at most every N chunks (completions batch into one prefill instead of
    one prefill per finish), and everything still completes."""
    import unittest.mock as mock

    engine = make_engine(max_reqs=2, num_pages=32)
    sched = ContinuousBatchingScheduler(engine, admit_every=3,
                                        max_prefill_batch=2)
    for _ in range(6):
        sched.submit([1, 2, 3], max_gen_len=6, temperature=0.0)
    with mock.patch.object(
        engine, "prefill_async", side_effect=engine.prefill_async
    ) as spy:
        results = sched.run()
    assert len(results) == 6
    assert all(len(r.output_tokens) >= 1 for r in results)
    # 6 requests, 2 slots, prefill batches of <=2: at least 3 prefills are
    # necessary; admission batching must not add more than one per refill
    # window (strictly fewer calls than one-per-request).
    assert 3 <= spy.call_count < 6, spy.call_count


def test_impossible_requests_rejected_not_spun():
    """A request that can NEVER fit (prompt >= max_seq_len, or a footprint
    larger than a whole dp group's pool) must be rejected with a finish
    reason — run() previously busy-looped forever retrying try_admit
    (review fix, round 3)."""
    engine = make_engine(max_reqs=2, num_pages=8)  # page_size=8 -> 64 tokens
    sched = ContinuousBatchingScheduler(engine)
    too_long = sched.submit(list(range(40)), max_gen_len=4)  # > max_seq (32)
    ok = sched.submit([1, 2, 3], max_gen_len=4, temperature=0.0)
    results = {r.req_id: r for r in sched.run()}
    assert results[too_long].finish_reason == "rejected_too_long"
    assert results[too_long].output_tokens == []
    assert len(results[ok].output_tokens) >= 1


def test_session_never_rebuilt_across_admissions():
    """Round-4 serving redesign (VERDICT r3 next #2): the full-width session
    is built exactly ONCE; admissions splice rows in on device
    (engine.update_session_rows fed by prefill_async's on-device first
    tokens), so neither completions nor admissions ever rebuild it, and no
    admission blocks on a prefill download."""
    import unittest.mock as mock

    engine = make_engine(max_reqs=2, num_pages=32)
    sched = ContinuousBatchingScheduler(engine, max_prefill_batch=2)
    for i in range(7):
        sched.submit([1 + i, 2, 3], max_gen_len=4 + (i % 3),
                     temperature=0.0)
    with mock.patch.object(
        engine, "start_decode_session",
        side_effect=engine.start_decode_session,
    ) as build_spy, mock.patch.object(
        engine, "update_session_rows",
        side_effect=engine.update_session_rows,
    ) as splice_spy:
        results = sched.run()
    assert build_spy.call_count == 1, build_spy.call_count
    assert splice_spy.call_count >= 4, splice_spy.call_count  # 7 reqs/2 slots
    assert len(results) == 7
    assert all(len(r.output_tokens) >= 1 for r in results)


def test_slot_reuse_no_output_leak():
    """Decode-chunk results are applied through the snapshot taken at
    dispatch: a slot freed and immediately re-admitted must not receive the
    stale in-flight chunk's tokens, and outputs must match isolated greedy
    generation exactly."""
    engine = make_engine(max_reqs=2, num_pages=32)
    sched = ContinuousBatchingScheduler(engine, max_prefill_batch=2)
    prompts = [[7, 8, 9], [3, 4], [11, 12, 13], [5], [2, 9], [14, 3, 1]]
    gens = [3, 9, 5, 7, 4, 6]
    ids = [
        sched.submit(p, max_gen_len=g, temperature=0.0)
        for p, g in zip(prompts, gens)
    ]
    got = {r.req_id: r.output_tokens for r in sched.run()}
    for p, g, rid in zip(prompts, gens, ids):
        want = TextGenerator(engine).generate_tokens(
            [p], max_gen_len=g, temperature=0.0
        )[0].token_ids
        assert got[rid] == want, (rid, got[rid], want)


def test_chunk_log_and_steady_state_accounting():
    """The scheduler records per-chunk occupancy/token accounting and
    steady_state_tps summarizes the full-occupancy window (VERDICT r4 next
    #2: steady-state serving throughput measured, not argued)."""
    from lite_llama_tpu.utils.profiling import steady_state_tps

    engine = make_engine(max_reqs=2, num_pages=32)
    sched = ContinuousBatchingScheduler(engine, max_prefill_batch=2)
    for i in range(5):
        sched.submit([1 + i, 2, 3], max_gen_len=8, temperature=0.0)
    sched.run()
    log = sched.chunk_log
    assert log, "no chunks recorded"
    assert all(
        {"t", "occupancy", "tokens", "steps"} <= set(c) for c in log
    )
    total_emitted = sum(c["tokens"] for c in log)
    assert total_emitted > 0
    occs = {c["occupancy"] for c in log}
    assert max(occs) == 2  # both slots were live at some point

    # Synthetic log: exact arithmetic check of the steady-window math.
    synth = [
        {"t": 0.0, "occupancy": 1, "tokens": 4, "steps": 4},   # ramp (dropped: no predecessor)
        {"t": 1.0, "occupancy": 2, "tokens": 8, "steps": 4},   # steady: 8 tok / 1 s
        {"t": 2.0, "occupancy": 2, "tokens": 8, "steps": 4},   # steady: 8 tok / 1 s
        {"t": 4.0, "occupancy": 1, "tokens": 4, "steps": 4},   # drain: 4 tok / 2 s
    ]
    s = steady_state_tps(synth, full_occupancy=2)
    assert s["steady_tokens_per_s"] == 8.0
    assert s["steady_window_s"] == 2.0
    assert s["steady_chunks"] == 2
    assert s["total_chunks"] == 3
    # occupancy-weighted: 20 tokens / (2*1 + 2*1 + 1*2 = 6 slot-s) * 2 slots
    assert abs(s["occupancy_weighted_tokens_per_s"] - 20 / 6 * 2) < 0.05
    assert s["mean_occupancy"] == 1.5
