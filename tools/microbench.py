#!/usr/bin/env python
"""Dependency-chained device micro-benchmarks.

The naive repeat-the-same-dispatch timing loop reads ~0.1 ms for ANY
program through this environment's TPU tunnel (identical dispatches are
replayed, not recomputed), so every measurement here chains rep k's
input on rep k-1's output: the device cannot dedup or overlap reps, and
the wall time over the chain is honest device time.

Stages measured (small-bucket shapes, the production hot path):
  - detect step (primed state, quiet + busy blocks), state chained
  - burst gather+downmix at several batch sizes
  - rotate+decimate (the 801-tap FIR) alone
  - demod (Gardner+PLL scans) alone, plus PLL-only and Gardner-only
Usage: python tools/microbench.py [--reps 6] [--batches 32,128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain_bench(step, x0, reps):
    """step: x -> x (same pytree structure); times reps chained calls."""
    import jax
    x = step(x0)
    jax.block_until_ready(x)          # compile + warm
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--batches", default="32,128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.dsp import demod as demod_mod
    from iridium_tpu.dsp import detect, downmix
    from iridium_tpu.runtime.pipeline import Pipeline

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    det = DetectorConfig(sample_rate=10_000_000,
                         frames_per_block=args.frames, gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, burst_batch=32, start_time_ns=0)
    p, dmp = pipe.p, pipe.dmp
    bs = p.block_samples
    block_secs = bs / p.sample_rate
    l_small = pipe.l_small
    dec_cap_small = (l_small - pipe.in_ntaps) // dmp.decimation + 1
    print(f"l_ext={pipe.l_ext} l_small={l_small} "
          f"dec_cap_small={dec_cap_small} S={dmp.max_symbols}", flush=True)

    rng = np.random.default_rng(0)
    noise = rng.standard_normal((bs, 2)).astype(np.float32) * 0.01
    t = np.arange(bs)
    busy = noise.copy()
    for k in range(8):
        f = (k - 4) * 0.9e6 + 0.45e6
        ph = 2 * np.pi * f / p.sample_rate * t
        busy[:, 0] += 0.2 * np.cos(ph).astype(np.float32)
        busy[:, 1] += 0.2 * np.sin(ph).astype(np.float32)
    pairs_quiet = jnp.asarray(noise)
    pairs_busy = jnp.asarray(busy)

    # prime the noise floor
    st = detect.init_state(p)
    for _ in range(2):
        st, _, _, _ = pipe.step_fn(pairs_quiet, pipe.tail, st,
                                   jnp.int32(bs), jnp.int32(0))
    jax.block_until_ready(st)

    for name, pairs in (("quiet", pairs_quiet), ("busy", pairs_busy)):
        def dstep(s, pairs=pairs):
            s2, _, _, _ = pipe.step_fn(pairs, pipe.tail, s,
                                       jnp.int32(bs), jnp.int32(1))
            return s2
        tt = chain_bench(dstep, st, args.reps)
        print(f"detect {name:5s}: {tt * 1e3:8.2f} ms/block "
              f"({block_secs / tt:7.1f}x rt)", flush=True)

    # device-resident stream for burst stages
    zs = jax.jit(lambda: jnp.zeros((2 * pipe.l_ext + bs,), jnp.complex64))()
    jax.block_until_ready(zs)

    for B in [int(b) for b in args.batches.split(",")]:
        pp = Pipeline(det_cfg=det, burst_batch=B, start_time_ns=0)
        base = np.full(B, pipe.l_ext, np.int32)
        lens = jnp.asarray(np.full(B, l_small, np.int32))
        bins = jnp.asarray(np.full(B, p.fft_size // 2 + 64, np.int32))

        # full small-bucket processor; chain via starts perturbation
        def pstep(x, pp=pp, lens=lens, bins=bins, base=base):
            starts, _ = x
            _, _, pf = pp.process_small(zs, starts, lens, bins)
            dep = jax.lax.bitcast_convert_type(pf[0, -1], jnp.int32) & 0
            return (jnp.asarray(base) + dep, pf)
        tt = chain_bench(lambda x: pstep(x),
                         (jnp.asarray(base), None), args.reps)
        print(f"full proc B={B:3d}: {tt * 1e3:8.2f} ms/batch "
              f"({tt / B * 1e6:7.1f} us/burst)", flush=True)

        # rotate+decimate alone, both FIR modes
        for mode in ("mxu", "conv"):
            dm_one = downmix.make_downmix_one(
                p, dmp, l_small, dmp.max_frame_samples,
                dec_cap=dec_cap_small, fir_mode=mode)
            base_np = base

            @jax.jit
            def rd(starts, bins, dm_one=dm_one, base_np=base_np):
                xs = jax.vmap(lambda s: jax.lax.dynamic_slice(
                    zs, (s,), (l_small,)))(starts)
                o = dm_one.rotate_decimate(xs, bins - p.fft_size // 2)
                dep = (o[0, 0].real * 0).astype(jnp.int32)
                return jnp.asarray(base_np) + dep, o

            def rdstep(x, bins=bins, rd=rd):
                starts, prev = x
                s2, o = rd(starts, bins)
                return (s2, o)
            tt = chain_bench(rdstep, (jnp.asarray(base), None), args.reps)
            print(f"rot+dec/{mode} B={B:3d}: {tt * 1e3:8.2f} ms/batch "
                  f"({tt / B * 1e6:7.1f} us/burst)", flush=True)

        # gather alone (dynamic_slice of B windows from the stream)
        @jax.jit
        def ga(starts):
            xs = jax.vmap(lambda s: jax.lax.dynamic_slice(
                zs, (s,), (l_small,)))(starts)
            dep = (xs[0, 0].real * 0).astype(jnp.int32)
            return jnp.asarray(base) + dep, jnp.sum(jnp.abs(xs))

        tt = chain_bench(lambda x: ga(x[0]),
                         (jnp.asarray(base), None), args.reps)
        print(f"gather       B={B:3d}: {tt * 1e3:8.2f} ms/batch "
              f"({tt / B * 1e6:7.1f} us/burst)", flush=True)

        # demod alone (fused gardner+pll scan)
        S = dmp.max_symbols
        demod_one = demod_mod.make_demod(S, dmp.samples_per_symbol, True)
        xs_d = jnp.asarray(
            (rng.standard_normal((B, dmp.max_frame_samples))
             + 1j * rng.standard_normal((B, dmp.max_frame_samples))
             ).astype(np.complex64))
        ns = jnp.asarray(np.full(B, dmp.max_frame_samples, np.int32))

        @jax.jit
        def de(dirs):
            o = jax.vmap(demod_one)(xs_d, ns, dirs).bits
            return o[:, 0] * 0, o

        def destep(x):
            dirs, prev = x
            return de(dirs)
        tt = chain_bench(destep, (jnp.asarray(np.zeros(B, np.int32)), None), args.reps)
        print(f"demod        B={B:3d}: {tt * 1e3:8.2f} ms/batch "
              f"({tt / B * 1e6:7.1f} us/burst)  [S={S}]", flush=True)


if __name__ == "__main__":
    main()
