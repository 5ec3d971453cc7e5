#!/usr/bin/env python
"""Per-stage device timing on the current backend (SURVEY.md §5: the
jax.profiler/per-stage analogue of the reference's external profiling,
ARCHITECTURE.md:630-634).

Times, with device-resident inputs and block_until_ready around a fixed
repeat count:
  - detect step (batched FFT + state-machine scan) per block
  - burst processor (downmix+demod) per batch, for several batch sizes
  - the detect spectrogram alone (FFT path without the scan), isolating
    scan overhead from FFT cost

Usage: python tools/profile_stages.py [--frames 2048] [--reps 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_one(fn, args, reps):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.dsp import detect
    from iridium_tpu.runtime.pipeline import Pipeline

    print(f"backend: {jax.default_backend()} {jax.devices()}",
          file=sys.stderr)
    det = DetectorConfig(sample_rate=10_000_000,
                         frames_per_block=args.frames, gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, burst_batch=32, start_time_ns=0,
                    use_pallas=args.pallas or None)
    p = pipe.p
    bs = p.block_samples
    block_secs = bs / p.sample_rate

    rng = np.random.default_rng(0)
    pairs_np = rng.standard_normal((bs, 2)).astype(np.float32) * 0.01
    pairs = jnp.asarray(pairs_np)
    state = detect.init_state(p)
    jax.block_until_ready((pairs, state))

    # 1. full detect step (FFT + scan + tail bookkeeping)
    t = bench_one(
        lambda *a: pipe.step_fn(*a)[3],
        (pairs, pipe.tail, state, jnp.int32(bs), jnp.int32(0)), args.reps)
    print(f"detect step:        {t * 1e3:8.2f} ms/block "
          f"({block_secs / t:6.1f}x realtime if alone)")

    # 2. spectrogram alone (no scan) — isolates the scan's cost
    win = jnp.asarray(np.blackman(p.fft_size).astype(np.float32)
                      / np.float32(0.42))

    @jax.jit
    def spect(pr):
        blk = jax.lax.complex(pr[:, 0], pr[:, 1])
        return detect.spectrogram(blk, win, p.fft_size)

    t_fft = bench_one(spect, (pairs,), args.reps)
    print(f"spectrogram (FFT):  {t_fft * 1e3:8.2f} ms/block "
          f"-> scan+rest = {(t - t_fft) * 1e3:.2f} ms/block")

    # 3. burst processor at several batch sizes (small bucket)
    zs = jax.jit(lambda: jnp.zeros((2 * pipe.l_ext + bs,), jnp.complex64))()
    jax.block_until_ready(zs)
    for B in (16, 32, 64, 128):
        pp = Pipeline(det_cfg=det, burst_batch=B, start_time_ns=0,
                      use_pallas=args.pallas or None)
        starts = jnp.asarray(np.full(B, pipe.l_ext, np.int32))
        lens = jnp.asarray(np.full(B, pp.l_small, np.int32))
        bins = jnp.asarray(np.full(B, p.fft_size // 2 + 64, np.int32))
        t_b = bench_one(lambda *a: pp.process_small(*a)[2],
                        (zs, starts, lens, bins), args.reps)
        print(f"burst batch B={B:3d}:  {t_b * 1e3:8.2f} ms/batch "
              f"({t_b / B * 1e6:7.1f} us/burst)")


if __name__ == "__main__":
    main()
