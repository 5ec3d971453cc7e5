#!/usr/bin/env python
"""Split burst-path device timing: downmix alone vs demod alone vs the
fused processor, plus the detect step under realistic bursty load (the
quiet fast path does not fire when bursts are present). Complements
tools/profile_stages.py (SURVEY.md §5 profiling analogue).

Usage: python tools/profile_burst.py [--pallas] [--reps 10]
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.dsp import demod as demod_mod
    from iridium_tpu.dsp import detect, downmix
    from iridium_tpu.runtime.pipeline import Pipeline

    print(f"backend: {jax.default_backend()} {jax.devices()}",
          file=sys.stderr)
    det = DetectorConfig(sample_rate=10_000_000, frames_per_block=2048,
                         gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, burst_batch=args.batch, start_time_ns=0,
                    use_pallas=args.pallas or None)
    p, dmp = pipe.p, pipe.dmp
    bs = p.block_samples
    block_secs = bs / p.sample_rate
    B = args.batch
    l_small = pipe.l_small
    dec_cap_small = (l_small - pipe.in_ntaps) // dmp.decimation + 1
    print(f"l_ext={pipe.l_ext} l_small={l_small} dec_cap_small="
          f"{dec_cap_small} max_symbols={dmp.max_symbols}", file=sys.stderr)

    rng = np.random.default_rng(0)

    # --- detect step under bursty load: inject strong tones so frames
    # take the full path (state machine active) ---
    t = np.arange(bs)
    sig = (rng.standard_normal((bs, 2)).astype(np.float32) * 0.01)
    for k in range(8):   # 8 simultaneous carriers, always-on
        f = (k - 4) * 0.9e6 + 0.45e6
        ph = 2 * np.pi * f / p.sample_rate * t
        sig[:, 0] += 0.2 * np.cos(ph).astype(np.float32)
        sig[:, 1] += 0.2 * np.sin(ph).astype(np.float32)
    pairs_busy = jnp.asarray(sig)
    pairs_quiet = jnp.asarray(
        rng.standard_normal((bs, 2)).astype(np.float32) * 0.01)
    state = detect.init_state(p)
    # prime the noise floor so the state machine is live
    st = state
    for _ in range(2):
        st, _, _, _ = pipe.step_fn(pairs_quiet, pipe.tail, st,
                                   jnp.int32(bs), jnp.int32(0))
    jax.block_until_ready(st)

    t_q = bench_one(lambda *a: pipe.step_fn(*a)[0].n_tagged,
                    (pairs_quiet, pipe.tail, st, jnp.int32(bs),
                     jnp.int32(1)), args.reps)
    t_b = bench_one(lambda *a: pipe.step_fn(*a)[0].n_tagged,
                    (pairs_busy, pipe.tail, st, jnp.int32(bs),
                     jnp.int32(1)), args.reps)
    print(f"detect step quiet:  {t_q * 1e3:8.2f} ms/block "
          f"({block_secs / t_q:7.1f}x rt)")
    print(f"detect step busy:   {t_b * 1e3:8.2f} ms/block "
          f"({block_secs / t_b:7.1f}x rt)")

    # --- burst path, small bucket ---
    dm_one = downmix.make_downmix_one(
        p, dmp, l_small, dmp.max_frame_samples, dec_cap=dec_cap_small,
        use_pallas=args.pallas)
    demod_one = demod_mod.make_demod(dmp.max_symbols,
                                     dmp.samples_per_symbol, True)
    zs = jax.jit(lambda: jnp.zeros((2 * pipe.l_ext + bs,), jnp.complex64))()
    starts = jnp.asarray(np.full(B, pipe.l_ext, np.int32))
    lens = jnp.asarray(np.full(B, l_small, np.int32))
    bins = jnp.asarray(np.full(B, p.fft_size // 2 + 64, np.int32))

    dm_fn = jax.jit(lambda s, a, b, c: dm_one.batch(s, a, b, c).samples)
    t_dm = bench_one(dm_fn, (zs, starts, lens, bins), args.reps)
    print(f"downmix B={B:3d}:     {t_dm * 1e3:8.2f} ms/batch "
          f"({t_dm / B * 1e6:7.1f} us/burst)")

    # rotate+decimate alone (the 801-tap FIR stage)
    def rot_only(s, a, c):
        xs = jax.vmap(
            lambda st: jax.lax.dynamic_slice(s, (st,), (l_small,)))(a)
        ks = c - p.fft_size // 2
        if args.pallas:
            from iridium_tpu.ops import pallas_fir
            in_taps = np.asarray(downmix.make_consts(dmp).input_taps)
            rd = pallas_fir.make_rotate_decimate(
                l_small, dec_cap_small, dmp.decimation, in_taps, p.fft_size)
            o_re, o_im = rd(xs.real, xs.imag, ks)
            return o_re
        nm = (np.arange(l_small, dtype=np.int64) % p.fft_size).astype(np.int32)
        in_taps = np.asarray(downmix.make_consts(dmp).input_taps)

        def one(x, k):
            m = jnp.mod(k * nm, p.fft_size)
            ang = (-2.0 * np.pi / p.fft_size) * m.astype(jnp.float32)
            xx = x * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
            lhs = jnp.stack([xx.real, xx.imag])[:, None, :]
            rhs = jnp.asarray(in_taps)[None, None, :]
            out = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(dmp.decimation,), padding="VALID")
            return out[0, 0][:dec_cap_small]
        return jax.vmap(one)(xs, ks)

    rot_fn = jax.jit(rot_only)
    t_rot = bench_one(rot_fn, (zs, starts, bins), args.reps)
    print(f"rot+dec B={B:3d}:     {t_rot * 1e3:8.2f} ms/batch "
          f"({t_rot / B * 1e6:7.1f} us/burst)")

    # demod alone on random symbols
    S = dmp.max_symbols
    xs_d = jnp.asarray(
        (rng.standard_normal((B, dmp.max_frame_samples))
         + 1j * rng.standard_normal((B, dmp.max_frame_samples))
         ).astype(np.complex64))
    ns = jnp.asarray(np.full(B, dmp.max_frame_samples, np.int32))
    dirs = jnp.asarray(np.zeros(B, np.int32))
    de_fn = jax.jit(lambda a, b, c: jax.vmap(demod_one)(a, b, c).bits)
    t_de = bench_one(de_fn, (xs_d, ns, dirs), args.reps)
    print(f"demod B={B:3d}:       {t_de * 1e3:8.2f} ms/batch "
          f"({t_de / B * 1e6:7.1f} us/burst)  [S={S}]")

    # fused full processor (what the pipeline dispatches)
    t_full = bench_one(lambda *a: pipe.process_small(*a)[2],
                       (zs, starts, lens, bins), args.reps)
    print(f"full proc B={B:3d}:   {t_full * 1e3:8.2f} ms/batch "
          f"({t_full / B * 1e6:7.1f} us/burst)")


if __name__ == "__main__":
    main()
