#!/usr/bin/env python
"""Sharded-vs-single-device SPMD overhead on the virtual CPU mesh.

Measures the same capture through the single-device Pipeline and the
8-device ShardedPipeline and reports:

  * wall times + the throughput ratio (kept for continuity — but the
    8 "devices" are XLA host-platform instances MULTIPLEXED onto the
    same physical CPU cores, so wall conflates SPMD overhead with
    8-way core contention and redundant per-shard host work);
  * device-work INFLATION (round 5, the honest metric): total
    profiler op self-time of the sharded run over the single run.
    The 8 shards execute one identical SPMD program, so per-shard
    busy time is total/8 by construction; on real multi-chip
    hardware, where each shard owns a chip, projected N-chip scaling
    efficiency ~= 1 / inflation (collectives additionally ride ICI
    there instead of shared host memory). The CPU backend exposes a
    single '/host:CPU' plane, so per-shard planes are not available —
    symmetric-total is the measurable equivalent.

Companion on real hardware: tools/bench_mesh1.py prices the SPMD
program against the single-chip pipeline on the TPU itself.

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

    def op_time_ms(logdir) -> float:
        """Total XLA-op self-time (ms) across the host plane's thread
        lines of the latest trace under logdir."""
        import glob
        os.environ.setdefault(
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
        path = sorted(glob.glob(
            os.path.join(logdir, "**", "*.xplane.pb"),
            recursive=True))[-1]
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        total = 0.0
        for plane in xs.planes:
            if "CPU" not in plane.name and "TPU" not in plane.name:
                continue
            for line in plane.lines:
                # top-level events per thread line are non-overlapping;
                # summing durations counts busy core-time
                total += sum(ev.duration_ps for ev in line.events) / 1e9
        return total

    def run(pipe, tag):
        frames = list(pipe.run_array(cap))     # warm (compiles)
        pipe.reset(start_time_ns=0)
        logdir = f"/tmp/bench_sharded_{tag}"
        t0 = time.perf_counter()
        with jax.profiler.trace(logdir):
            frames = list(pipe.run_array(cap))
        return time.perf_counter() - t0, len(frames), op_time_ms(logdir)

    single = Pipeline(det_cfg=cfg, burst_batch=8, start_time_ns=0,
                      agg_blocks=4)
    dt1, n1, op1 = run(single, "single")
    print(f"single-device: {dt1:.2f} s ({secs/dt1:.2f}x rt, {n1} frames,"
          f" {op1:.0f} ms op-time)", file=sys.stderr)

    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    out = {
        "metric": "sharded_device_work_inflation_cpu_mesh",
        "unit": "x_single_device_op_time",
        "single_op_time_ms": round(op1, 1),
        "single_wall_s": round(dt1, 2),
        "frames_single": n1,
    }
    for mode in ("replicated", "binshard"):
        sp = ShardedPipeline(cfg, mesh=mesh, burst_batch=8,
                             start_time_ns=0, detect_mode=mode)
        dt8, n8, op8 = run(sp, f"sharded_{mode}")
        print(f"8-dev sharded ({mode}): {dt8:.2f} s "
              f"({secs/dt8:.2f}x rt, {n8} frames, {op8:.0f} ms op-time,"
              f" {op8/8:.0f} ms/shard)", file=sys.stderr)
        inflation = op8 / op1 if op1 > 0 else float("nan")
        out[mode] = {
            "inflation": round(inflation, 3),
            "projected_scaling_efficiency": round(1.0 / inflation, 3),
            "sharded_op_time_ms": round(op8, 1),
            "per_shard_op_time_ms": round(op8 / 8, 1),
            "wall_ratio_single_over_sharded": round(dt1 / dt8, 3),
            "sharded_wall_s": round(dt8, 2),
            "frames": n8,
        }
    # NOTE: the CPU proxy runs the XLA scan on every shard — it cannot
    # see the Mosaic-kernel scan that makes the replicated mode cheap
    # on TPU hardware (detect_pallas); tools/bench_mesh1.py prices the
    # real per-chip program on the TPU itself.
    out["value"] = out["replicated"]["inflation"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
