#!/usr/bin/env python
"""Serialized per-phase timing of the production group pipeline on the
bench capture: detect compute, gone-table fetch, job dispatch+compute,
row fetch, host routing/format. Deliberately UN-pipelined (explicit
block_until_ready at each phase) so each phase's cost is isolated —
the bench overlaps these, so the sum here is an upper bound on the
pipelined wall time per group.

Usage: python tools/profile_groups.py [--blocks 4] [--burst-rate 175]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--burst-rate", type=float, default=175.0)
    ap.add_argument("--agg", type=int, default=4)
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
    from iridium_tpu.runtime.pipeline import Pipeline

    rate = 10_000_000
    det = DetectorConfig(sample_rate=rate, frames_per_block=2048,
                         gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, burst_batch=128, start_time_ns=0,
                    want_llr=False, agg_blocks=args.agg, group_jobs=12)
    bs = pipe.p.block_samples
    print(f"devices: {jax.devices()}", flush=True)
    cap, n_inj = bench_mod.make_capture(args.blocks, bs, rate,
                                        args.burst_rate)
    print(f"capture {len(cap)/rate:.1f} s, {n_inj} injected", flush=True)

    blocks = []
    for i0 in range(0, len(cap), bs):
        pairs = cap[i0:i0 + bs].view(np.float32).reshape(-1, 2)
        blocks.append(jnp.asarray(pairs))
    jax.block_until_ready(blocks)

    # warm run (all compiles)
    t0 = time.perf_counter()
    n = sum(len(fl) for fl in pipe.run_blocks(
        (b, bs) for b in blocks))
    print(f"warm: {n} frames in {time.perf_counter()-t0:.1f} s", flush=True)

    # serialized phases
    pipe.reset(start_time_ns=0)
    t_detect = t_tabfetch = t_jobs = t_rowfetch = t_host = 0.0
    nrows = 0
    i = 0
    while i < len(blocks):
        grp = blocks[i:i + args.agg]
        i += args.agg
        t0 = time.perf_counter()
        ctxs = [pipe._dispatch_step(b, bs) for b in grp]
        jax.block_until_ready([c[1] for c in ctxs])
        t_detect += time.perf_counter() - t0

        t0 = time.perf_counter()
        pk = (np.asarray(ctxs[0][1])[None] if len(ctxs) == 1
              else np.asarray(pipe._stack_fn(*[c[1] for c in ctxs])))
        t_tabfetch += time.perf_counter() - t0

        t0 = time.perf_counter()
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
        if not blocks_g:
            continue
        ginfo = pipe._route_group(blocks_g)
        small = ginfo["small"]
        sim = ginfo["bin"][small] >= pipe.simplex_bin_min
        rounds = []
        for proc, idx in ((pipe.group_small_n, small[~sim]),
                          (pipe.group_small_s, small[sim]),
                          (pipe.group_large, ginfo["large"])):
            J, Bb = proc.n_jobs, proc.batch
            per_round = J * Bb
            for r0 in range(0, len(idx), per_round):
                sel = idx[r0:r0 + per_round]
                params = np.zeros((J, 5, Bb), np.int32)
                for j0 in range(0, len(sel), Bb):
                    j = j0 // Bb
                    s = sel[j0:j0 + Bb]
                    params[j, 0, :len(s)] = ginfo["tile"][s]
                    params[j, 1, :len(s)] = ginfo["r"][s]
                    params[j, 2, :len(s)] = ginfo["ext_len"][s]
                    params[j, 3, :len(s)] = ginfo["bin"][s]
                    params[j, 4, :len(s)] = ginfo["shift_dec"][s]
                rounds.append((proc, params))
        t_host += time.perf_counter() - t0

        t0 = time.perf_counter()
        flat = ctxs[0][0] if len(ctxs) == 1 \
            else pipe._concat_fn(*[c[0] for c in ctxs])
        outs = [proc(flat, jnp.asarray(params)) for proc, params in rounds]
        pf = pipe._flatcat(*outs)
        jax.block_until_ready(pf)
        t_jobs += time.perf_counter() - t0

        t0 = time.perf_counter()
        pf_np = np.asarray(pf)
        t_rowfetch += time.perf_counter() - t0
        nrows += pf_np.shape[0]
        print(f"group: {len(ginfo['small'])} small "
              f"{len(ginfo['large'])} large bursts, "
              f"{len(rounds)} rounds, rows {pf_np.shape}", flush=True)

    secs = len(cap) / rate
    tot = t_detect + t_tabfetch + t_jobs + t_rowfetch + t_host
    for k, v in (("detect compute", t_detect),
                 ("table fetch", t_tabfetch),
                 ("host route", t_host),
                 ("jobs compute", t_jobs),
                 ("row fetch", t_rowfetch)):
        print(f"{k:15s}: {v:7.3f} s", flush=True)
    print(f"serial total {tot:.3f} s for {secs:.1f} s "
          f"({secs/tot:.1f}x rt unpipelined; fetched {nrows} rows)",
          flush=True)


if __name__ == "__main__":
    main()
