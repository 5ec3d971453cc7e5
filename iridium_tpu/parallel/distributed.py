"""Multi-host runtime: `jax.distributed` initialization + mesh builders.

The reference is strictly single-process (its only inter-process channel
is sockets: ZMQ PUB frame_output.c:107-141, UDP GSMTAP/ACARS, TCP
airframes). Multi-host streaming is this framework's first-class new
component (SURVEY.md §2.5): a (hosts x chips) mesh time-shards the
sample stream; `parallel.stream.ShardedPipeline` runs the same SPMD
steps over it — collectives ride ICI within a slice and DCN across
hosts — and side-channel outputs stay on host 0, byte-compatible.

Usage (one process per host, e.g. under a TPU pod scheduler):

    from iridium_tpu.parallel import distributed as dist
    dist.initialize()                    # env-driven (TPU pods) or explicit
    mesh = dist.make_mesh()              # 1-D mesh over ALL global devices
    sp = ShardedPipeline(cfg, mesh=mesh)
    for f in sp.run_array(cap):          # frames yielded on host 0 only
        print(printer.format(f))

Every host must feed the same blocks (each host typically reads the
same capture file, or its ingest fans the stream out); the driver
all-gathers only the tiny per-shard gone tables so all hosts compute
identical burst routing and issue identical SPMD dispatches.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent `jax.distributed.initialize`. With no arguments the
    runtime autodetects cluster parameters from the environment (TPU
    pod metadata / SLURM / OMPI); explicit args override. Safe to call
    in single-process runs: a second call or a solo process is a no-op
    failure, mirroring the reference's graceful optional-subsystem
    degradation (e.g. main.c:582-634)."""
    global _initialized
    if _initialized:
        return
    try:
        # NOTE: must run before anything touches the XLA backend —
        # probing jax.process_count() here would itself initialize it.
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _initialized = True
    except (RuntimeError, ValueError) as e:
        if "must be called before" in str(e) and jax.process_count() > 1:
            # backend already initialized by an earlier call: fine
            _initialized = True
            return
        # single-process / no cluster env: run standalone
        if num_processes not in (None, 1):
            raise
        _initialized = True
        if jax.process_count() == 1:
            return
        raise e


def make_mesh(axis: str = "shards") -> Mesh:
    """1-D mesh over all global devices, ordered so consecutive time
    shards land on consecutive chips of the same host: neighbor halo
    `ppermute`s ride ICI; only the per-host boundary hops cross DCN."""
    devs = sorted(jax.devices(),
                  key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def is_host0() -> bool:
    return jax.process_index() == 0
