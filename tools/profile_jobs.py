#!/usr/bin/env python
"""Isolate the burst-job cost on REAL bench-capture data: per-batch
processor vs the lax.map group processor vs a python-unrolled group, at
the production shapes. Chained timings (see tools/microbench.py).

Usage: python tools/profile_jobs.py [--blocks 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.join(os.path.dirname(__file__), "..")


def chain_bench(step, x0, reps=5):
    import jax
    x = step(x0)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--burst-rate", type=float, default=175.0)
    ap.add_argument("--trace", metavar="DIR",
                    help="write a jax.profiler trace of one real-data "
                         "per-batch dispatch + one detect step "
                         "(inspect with tools/trace_summary.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.iridium-tpu-xla-cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, REPO)
    import bench as bench_mod
    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.dsp import demod as demod_mod
    from iridium_tpu.dsp import downmix
    from iridium_tpu.runtime import pipeline as pl_mod
    from iridium_tpu.runtime.pipeline import Pipeline

    rate = 10_000_000
    det = DetectorConfig(sample_rate=rate, frames_per_block=2048,
                         gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, burst_batch=128, start_time_ns=0,
                    want_llr=False, agg_blocks=args.blocks, group_jobs=12)
    p, dmp = pipe.p, pipe.dmp
    bs = p.block_samples
    print(f"devices: {jax.devices()}", flush=True)
    cap, n_inj = bench_mod.make_capture(args.blocks, bs, rate,
                                        args.burst_rate)

    blocks = [jnp.asarray(cap[i0:i0 + bs].view(np.float32).reshape(-1, 2))
              for i0 in range(0, len(cap), bs)]
    jax.block_until_ready(blocks)

    # run detect to get a REAL gone table + group stream
    ctxs = [pipe._dispatch_step(b, bs) for b in blocks]
    pk = np.asarray(pipe._stack_fn(*[c[1] for c in ctxs])) \
        if len(ctxs) > 1 else np.asarray(ctxs[0][1])[None]
    blocks_g = []
    for bi, ctx in enumerate(ctxs):
        tab = pk[bi]
        gc = int(tab[0, 0])
        if gc <= 0:
            continue
        rows = tab[1:1 + gc]
        g = dict(id=rows[:, 0], start=rows[:, 1], stop=rows[:, 2],
                 bin=rows[:, 3], mag=rows[:, 4].view(np.float32),
                 noise=rows[:, 5].view(np.float32))
        blocks_g.append((bi, g, ctx[2]))
    ginfo = pipe._route_group(blocks_g)
    flat = pipe._concat_fn(*[c[0] for c in ctxs]) if len(ctxs) > 1 \
        else ctxs[0][0]
    jax.block_until_ready(flat)
    n_small = len(ginfo["small"])
    print(f"{n_small} small bursts, {len(ginfo['large'])} large",
          flush=True)

    B = 128
    sel = ginfo["small"][:B]
    flat_start = (ginfo["tile"].astype(np.int64) * pipe._wg.ALIGN
                  + ginfo["r"] + ginfo["shift_dec"].astype(np.int64)
                  * pipe.dmp.decimation)
    params1 = np.zeros((3, B), np.int32)
    params1[0, :len(sel)] = flat_start[sel]
    params1[1, :len(sel)] = ginfo["ext_len"][sel]
    params1[2, :len(sel)] = ginfo["bin"][sel]

    # 1. per-batch processor on real data
    def pstep(x):
        st, _ = x
        _, _, pf = pipe.process_small(flat, st, jnp.asarray(params1[1]),
                                      jnp.asarray(params1[2]))
        dep = (pf[0, -1] & 0)
        return (jnp.asarray(params1[0]) + dep, pf)

    t = chain_bench(pstep, (jnp.asarray(params1[0]), None))
    print(f"per-batch  B=128 real data: {t*1e3:8.2f} ms "
          f"({t/B*1e6:6.1f} us/burst)", flush=True)

    if args.trace:
        # trace ONE group-processor dispatch (the production path) and
        # one detect step, with real data/params
        ginfo2 = ginfo
        J = pipe.group_small_n.n_jobs
        Bb = pipe.group_small_n.batch
        params_g = np.zeros((J, 5, Bb), np.int32)
        for j in range(J):
            s = ginfo2["small"][j * Bb:(j + 1) * Bb]
            params_g[j, 0, :len(s)] = ginfo2["tile"][s]
            params_g[j, 1, :len(s)] = ginfo2["r"][s]
            params_g[j, 2, :len(s)] = ginfo2["ext_len"][s]
            params_g[j, 3, :len(s)] = ginfo2["bin"][s]
            params_g[j, 4, :len(s)] = ginfo2["shift_dec"][s]
        pg = jnp.asarray(params_g)
        out = pipe.group_small_n(flat, pg)      # compile
        np.asarray(out[0, 0, :1])
        with jax.profiler.trace(args.trace):
            out = pipe.group_small_n(flat, pg)
            np.asarray(out[0, 0, :1])
            s2 = pipe._dispatch_step(blocks[0], bs)
            np.asarray(s2[1][:1, :1])
        print(f"trace written to {args.trace}", flush=True)
        return

    # 2. group processor (lax.map, J=12) with real params
    J = pipe.group_small_n.n_jobs
    params = np.zeros((J, 3, B), np.int32)
    for j in range(J):
        s = ginfo["small"][j * B:(j + 1) * B]
        params[j, 0, :len(s)] = ginfo["flat_start"][s]
        params[j, 1, :len(s)] = ginfo["ext_len"][s]
        params[j, 2, :len(s)] = ginfo["bin"][s]

    def gstep(x):
        pr, _ = x
        pf = pipe.group_small_n(flat, pr)
        dep = (pf[0, 0, -1] & 0)
        return (jnp.asarray(params) + dep, pf)

    t = chain_bench(gstep, (jnp.asarray(params), None))
    print(f"group map J={J} B=128:      {t*1e3:8.2f} ms "
          f"({t/(J*B)*1e6:6.1f} us/burst)", flush=True)

    # 3. python-unrolled group (same J) — lets XLA fuse across jobs
    dm_one = downmix.make_downmix_one(
        p, dmp, pipe.l_small, dmp.max_frame_samples,
        dec_cap=(pipe.l_small - pipe.in_ntaps) // dmp.decimation + 1,
        fir_mode="mxu")
    demod_one = demod_mod.make_demod(dmp.max_symbols,
                                     dmp.samples_per_symbol, True)

    @jax.jit
    def unrolled(fl, pr):
        outs = []
        for j in range(J):
            dm = dm_one.batch(fl, pr[j, 0], pr[j, 1], pr[j, 2])
            dd = jax.vmap(demod_one)(dm.samples, dm.n_samples,
                                     dm.direction)
            outs.append(pl_mod.pack_outputs(
                dm, dd, want_llr=False, s2_pad=2 * dmp.max_symbols))
        return jnp.stack(outs)

    def ustep(x):
        pr, _ = x
        pf = unrolled(flat, pr)
        dep = (pf[0, 0, -1] & 0)
        return (jnp.asarray(params) + dep, pf)

    t = chain_bench(ustep, (jnp.asarray(params), None))
    print(f"group unrolled J={J}:       {t*1e3:8.2f} ms "
          f"({t/(J*B)*1e6:6.1f} us/burst)", flush=True)

    # 4. large-bucket group on real large bursts
    Jl, Bl = pipe.group_large.n_jobs, pipe.group_large.batch
    paramsL = np.zeros((Jl, 3, Bl), np.int32)
    for j in range(Jl):
        s = ginfo["large"][j * Bl:(j + 1) * Bl]
        paramsL[j, 0, :len(s)] = ginfo["flat_start"][s]
        paramsL[j, 1, :len(s)] = ginfo["ext_len"][s]
        paramsL[j, 2, :len(s)] = ginfo["bin"][s]

    def lstep(x):
        pr, _ = x
        pf = pipe.group_large(flat, pr)
        dep = (pf[0, 0, -1] & 0)
        return (jnp.asarray(paramsL) + dep, pf)

    t = chain_bench(lstep, (jnp.asarray(paramsL), None))
    print(f"group large J={Jl} B={Bl}:    {t*1e3:8.2f} ms "
          f"({t/(Jl*Bl)*1e6:6.1f} us/burst)", flush=True)


if __name__ == "__main__":
    main()


