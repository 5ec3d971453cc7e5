#!/usr/bin/env python
"""Per-op device trace of the PRODUCTION fused group program
(runtime/pipeline.py:_fused_for — on-device routing + the three class
processors) on a bench-density group, via jax.profiler.trace.

Prints (and optionally saves) the trace_summary top ops — the artifact
VERDICT round 4 asked to commit before attacking the group program
(reference analogue: external profiling, ARCHITECTURE.md:630-634).

Usage: python tools/profile_fused_group.py [--blocks 4]
       [--burst-rate 175] [--out tools/traces/group_r05.txt]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--burst-rate", type=float, default=175.0)
    ap.add_argument("--group-jobs", type=int, default=12)
    ap.add_argument("--out", default=None)
    ap.add_argument("--logdir", default="/tmp/fused_group_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.expanduser("~/.iridium-tpu-xla-cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench as bench_mod
    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.runtime.pipeline import Pipeline

    rate = 10_000_000
    det = DetectorConfig(sample_rate=rate, frames_per_block=2048,
                         gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, burst_batch=128, start_time_ns=0,
                    want_llr=False, agg_blocks=args.blocks,
                    group_jobs=args.group_jobs)
    bs = pipe.p.block_samples
    print(f"devices: {jax.devices()}", flush=True)
    cap, n_inj = bench_mod.make_capture(args.blocks, bs, rate,
                                        args.burst_rate)
    print(f"capture {len(cap)/rate:.1f} s, {n_inj} injected", flush=True)

    def run_group(perturb):
        """Dispatch the group's detect steps + fused program; returns
        the device buffer. `perturb` defeats the tunnel's replay of
        identical dispatches."""
        pipe.reset(start_time_ns=0)
        ctxs = []
        for i0 in range(0, len(cap), bs):
            pairs = cap[i0:i0 + bs].view(np.float32).reshape(-1, 2)
            pairs = pairs + np.float32(perturb)
            ctxs.append(pipe._dispatch_step(pairs, bs))
        buf = pipe._dispatch_group_fused(ctxs, np.zeros(3, np.int64))
        return ctxs, buf

    t0 = time.perf_counter()
    ctxs, buf = run_group(0.0)          # compile everything
    jax.block_until_ready(buf)
    print(f"warm group in {time.perf_counter()-t0:.1f} s", flush=True)

    # traced pass (fresh payload so the device really executes)
    with jax.profiler.trace(args.logdir):
        ctxs, buf = run_group(1e-9)
        jax.block_until_ready(buf)

    # summarize
    import subprocess
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "trace_summary.py"),
         args.logdir, "--top", str(args.top)],
        capture_output=True, text=True)
    print(res.stdout)
    if res.returncode != 0:
        print(res.stderr, file=sys.stderr)
        return 1
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(f"# fused group program trace: {args.blocks} blocks, "
                    f"{n_inj} injected bursts, "
                    f"group_jobs={args.group_jobs}\n")
            f.write(res.stdout)
        print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
