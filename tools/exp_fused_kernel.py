#!/usr/bin/env python
"""Chained in-jit timing of the fused front-end kernel vs the window
gather (the eager-chain approach pays one tunnel RPC per rep; a
lax.fori_loop chain pays one dispatch total).

Usage: python tools/exp_fused_kernel.py [--reps 8] [--batch 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.iridium-tpu-xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from iridium_tpu.ops import fused_frontend as ff
    from iridium_tpu.ops import window_gather as wg
    from iridium_tpu.ops import filters

    F, D, L = 8192, 40, 327680
    B = args.batch
    REPS = args.reps
    taps = np.asarray(filters.lpf_taps(1.0, 1e7, 1e5, 5e4))
    n = 40 * wg.ALIGN
    rng = np.random.default_rng(0)
    sre = jnp.asarray(rng.standard_normal((n // 128, 128))
                      .astype(np.float32))
    sim = jnp.asarray(rng.standard_normal((n // 128, 128))
                      .astype(np.float32))
    starts = np.stack([rng.integers(0, 20, B).astype(np.int32),
                       rng.integers(0, 40, B).astype(np.int32)], axis=1)
    ks = rng.integers(-4000, 4000, B).astype(np.int32)
    fn = ff.make_fused_frontend(L, F, D, taps)
    ramps = ff.make_ramp_table(F)
    gf = wg.make_window_gather(L)
    s2 = jnp.asarray(starts)
    ksj = jnp.asarray(ks)

    @jax.jit
    def loop_fused(sre, sim, s2, ksj):
        rre, rim = ramps(ksj)

        def body(i, c):
            o1, _ = fn(sre + c * 0, sim, s2, rre, rim)
            return o1[0, 0] * 0

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def loop_gather(sre, sim, s2):
        def body(i, c):
            o1, _ = gf(sre + c * 0, sim, s2)
            return o1[0, 0] * 0

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    for name, f, fargs in (("fused", loop_fused, (sre, sim, s2, ksj)),
                           ("gather", loop_gather, (sre, sim, s2))):
        out = f(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*fargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:>7} B={B}: {dt*1e3:7.2f} ms/call "
              f"({dt/B*1e6:6.1f} us/burst)", flush=True)


if __name__ == "__main__":
    main()
