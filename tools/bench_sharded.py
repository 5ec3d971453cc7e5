#!/usr/bin/env python
"""Sharded-vs-single-device throughput on the virtual CPU mesh.

Measures the same capture through the single-device Pipeline and the
8-device ShardedPipeline and reports wall times + the throughput ratio.

Caveat (documented, SURVEY.md §2.5/M5): in this environment the 8
"devices" are XLA host-platform instances multiplexed onto the same
physical CPU cores, so the ratio measures SPMD overhead (collectives,
halo exchange, padded batches), NOT scaling — on real multi-chip TPU
hardware each shard owns a chip. A ratio near 1.0 here means the SPMD
program adds little overhead over the single-device program at equal
physical compute.

Usage: PALLAS_AXON_POOL_IPS= python tools/bench_sharded.py [--blocks 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", ""))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--bursts-per-block", type=int, default=6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from scipy.signal import resample_poly

    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.io import synth
    from iridium_tpu.parallel.stream import ShardedPipeline
    from iridium_tpu.runtime.pipeline import Pipeline

    # Production-proportioned shapes: the per-frame coupling psum is a
    # FIXED per-frame cost, so a toy fft_size makes it look huge
    # relative to the O(F) row work; 2048 bins at 2 MHz keeps the
    # frames/sample ratio within 4x of the 10 MHz production config.
    cfg = DetectorConfig(
        sample_rate=2_000_000, fft_size=2048, history_size=8,
        frames_per_block=64, burst_capacity=64, gone_capacity=64,
        max_new_per_frame=32, max_burst_len=18_000, burst_post_len=4_000,
    )
    p = cfg.derived()
    bs = p.block_samples
    rate = cfg.sample_rate
    rng = np.random.default_rng(0)
    total = args.blocks * bs
    cap = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
           ).astype(np.complex64) * np.float32(0.01 / np.sqrt(2))
    nr = max(4 * rate // 25_000, 8)
    ramp = (0.5 - 0.5 * np.cos(np.pi * np.arange(nr) / nr)) \
        .astype(np.float32)
    k = 0
    for b in range(args.blocks):
        for j in range(args.bursts_per_block):
            start = b * bs + 8_000 + j * (bs // (args.bursts_per_block + 1))
            bits = rng.integers(0, 2, 160).astype(np.uint8)
            bb = synth.modulate(synth.burst_symbols(
                bits, "UL" if rng.random() < 0.35 else "DL"))
            x = resample_poly(bb, up=rate // 250_000, down=1) \
                .astype(np.complex64)
            x[:nr] *= ramp
            x[-nr:] *= ramp[::-1]
            f = float(rng.uniform(-0.8e6, 0.8e6))
            n = np.arange(len(x), dtype=np.float64)
            x = (x * np.exp(2j * np.pi * f / rate * n)).astype(np.complex64)
            if start + len(x) < total:
                cap[start:start + len(x)] += np.float32(
                    0.01 * 10 ** (30 / 20)) * x
                k += 1
    secs = total / rate
    print(f"capture: {secs:.2f} s, {k} bursts", file=sys.stderr)

    def run(pipe):
        frames = list(pipe.run_array(cap))     # warm (compiles)
        pipe.reset(start_time_ns=0)
        t0 = time.perf_counter()
        frames = list(pipe.run_array(cap))
        return time.perf_counter() - t0, len(frames)

    single = Pipeline(det_cfg=cfg, burst_batch=8, start_time_ns=0,
                      agg_blocks=4)
    dt1, n1 = run(single)
    print(f"single-device: {dt1:.2f} s ({secs/dt1:.2f}x rt, {n1} frames)",
          file=sys.stderr)

    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    sp = ShardedPipeline(cfg, mesh=mesh, burst_batch=8, start_time_ns=0)
    dt8, n8 = run(sp)
    print(f"8-dev sharded: {dt8:.2f} s ({secs/dt8:.2f}x rt, {n8} frames)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "sharded_over_single_throughput_cpu_mesh",
        "value": round(dt1 / dt8, 3),
        "unit": "ratio",
        "single_wall_s": round(dt1, 2),
        "sharded_wall_s": round(dt8, 2),
        "frames": [n1, n8],
    }))


if __name__ == "__main__":
    main()
