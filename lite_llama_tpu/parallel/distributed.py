"""Multi-host (multi-process) initialization plumbing.

The reference is strictly single-process (SURVEY.md §2.6); this module is the
beyond-reference DCN story: each host runs one process, `jax.distributed`
wires them into one SPMD program, and the ('dp', 'tp') mesh is laid out so
tp rides ICI within a host/slice and dp spans hosts over DCN — request-level
data parallelism needs no cross-host traffic inside a step (the scheduler
routes whole requests to dp groups; executor/kv_cache.py PagedKVCache).

Single-host multi-chip and the CPU-virtual-device test mesh skip this module
entirely (parallel/shardings.py make_mesh). Activate with:

    LLT_DIST=1 LLT_COORD=host0:8476 LLT_NUM_PROCS=2 LLT_PROC_ID=0 python ...

or call init_distributed() explicitly before any jax array op.

Execution contract — SPMD HOST REPLICATION: every process runs the SAME host
program and issues IDENTICAL engine calls (same requests, same order, same
seeds). Device work splits across processes automatically — each process's
chips execute only their dp shard inside the engine's manual-dp shard_map —
and the engine's deterministic host accounting (slots, pages, prefix
entries, RNG splits) stays byte-identical on every process without any
cross-host coordination messages. The only cross-host traffic is (a) XLA
collectives inside the compiled step, and (b) the small all-gather the
engine's ``_fetch`` runs to replicate sampled tokens to every host
(executor/engine.py). Verified end to end by tests/test_multihost.py: two
OS processes, localhost coordinator, greedy-token parity with the
single-process engine plus per-process disjoint KV state.

What the v5e-backed environment cannot measure: real DCN bandwidth/latency
(BASELINE.md's >=85% 1->2-host scaling gate needs two actual hosts); the
2-process CPU run proves the code path executes, not the interconnect.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or LLT_* env vars; returns True
    when multi-process mode is active. Safe to call on a single host (no-op
    unless configured)."""
    if coordinator_address is None:
        if os.environ.get("LLT_DIST") != "1":
            return False
        coordinator_address = os.environ["LLT_COORD"]
        num_processes = int(os.environ["LLT_NUM_PROCS"])
        process_id = int(os.environ["LLT_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_multihost_mesh(tp: Optional[int] = None):
    """('dp', 'tp') mesh over all processes' devices: tp = chips per host
    (ICI), dp = number of hosts (DCN). With one process this reduces to a
    local mesh. Uses create_hybrid_device_mesh so the dp axis maps onto the
    slower DCN links and tp onto ICI — the layout the scaling recipe calls
    for (collectives ride ICI; only request routing crosses DCN, and that
    happens host-side)."""
    from jax.sharding import Mesh

    n_local = jax.local_device_count()
    n_hosts = jax.process_count()
    tp = tp or n_local
    assert n_local % tp == 0, (n_local, tp)
    dp = n_hosts * (n_local // tp)
    if n_hosts > 1:
        try:
            from jax.experimental import mesh_utils

            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_local // tp, tp),
                dcn_mesh_shape=(n_hosts, 1),
            )
            return Mesh(devices.reshape(dp, tp), ("dp", "tp"))
        except ValueError:
            # Single-slice platforms (e.g. the multi-process CPU cluster the
            # 2-process test runs on) have no slice topology for the hybrid
            # helper — group by process instead: host-major dp axis, so each
            # process's devices form whole dp groups and tp never crosses a
            # host.
            devices = np.asarray(
                sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            ).reshape(dp, tp)
            return Mesh(devices, ("dp", "tp"))
    devices = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, ("dp", "tp"))
