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

        # rotate+decimate alone
        dm_one = downmix.make_downmix_one(
            p, dmp, l_small, dmp.max_frame_samples, dec_cap=dec_cap_small)
        nm = (np.arange(l_small, dtype=np.int64) % p.fft_size).astype(np.int32)
        in_taps = np.asarray(downmix.make_consts(dmp).input_taps)

        @jax.jit
        def rd(starts, bins):
            xs = jax.vmap(lambda s: jax.lax.dynamic_slice(
                zs, (s,), (l_small,)))(starts)
            ks = bins - p.fft_size // 2

            def one(x, k):
                m = jnp.mod(k * nm, p.fft_size)
                ang = (-2.0 * np.pi / p.fft_size) * m.astype(jnp.float32)
                xx = x * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
                lhs = jnp.stack([xx.real, xx.imag])[:, None, :]
                rhs = jnp.asarray(in_taps)[None, None, :]
                out = jax.lax.conv_general_dilated(
                    lhs, rhs, window_strides=(dmp.decimation,),
                    padding="VALID")
                return out[0, 0][:dec_cap_small]
            return jax.vmap(one)(xs, ks)

        def rdstep(x, bins=bins, base=base):
            starts, prev = x
            o = rd(starts, bins)
            dep = (o[0, 0] * 0).astype(jnp.int32)
            return (jnp.asarray(base) + dep, o)
        tt = chain_bench(lambda x: rdstep(x),
                         (jnp.asarray(base), None), args.reps)
        print(f"rot+dec  B={B:3d}: {tt * 1e3:8.2f} ms/batch "
              f"({tt / B * 1e6:7.1f} us/burst)", flush=True)

        # demod alone (+ gardner-only, pll-only)
        S = dmp.max_symbols
        demod_one = demod_mod.make_demod(S, dmp.samples_per_symbol, True)
        xs_d = jnp.asarray(
            (rng.standard_normal((B, dmp.max_frame_samples))
             + 1j * rng.standard_normal((B, dmp.max_frame_samples))
             ).astype(np.complex64))
        ns = jnp.asarray(np.full(B, dmp.max_frame_samples, np.int32))
        de = jax.jit(lambda a, d: jax.vmap(demod_one)(
            a, ns, d).bits)

        def destep(x):
            dirs, prev = x
            o = de(xs_d, dirs)
            return (o[:, 0] * 0, o)
        tt = chain_bench(destep, (jnp.zeros(B, jnp.int32), None), args.reps)
        print(f"demod    B={B:3d}: {tt * 1e3:8.2f} ms/batch "
              f"({tt / B * 1e6:7.1f} us/burst)  [S={S}]", flush=True)


if __name__ == "__main__":
    main()
