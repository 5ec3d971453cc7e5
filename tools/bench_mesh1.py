#!/usr/bin/env python
"""SPMD-program overhead ON REAL HARDWARE: run the sharded pipeline
with a 1-device mesh on the TPU over the bench capture and compare
against the single-chip Pipeline (VERDICT round-4 ask — the reference
analogue is benchmarking its GPU-offload seam both ways,
ARCHITECTURE.md:313-320).

The honest pairing is ShardedPipeline(mesh=1) vs Pipeline(--scan xla):
both then run the SAME XLA branchless detector scan, so the ratio
isolates the shard_map program structure (collective stubs, halo
arithmetic, per-shard padding) from the detector implementation. The
production single-chip number (Mosaic-kernel scan) is reported
alongside for context.

Usage: python tools/bench_mesh1.py [--blocks 8] [--burst-rate 175]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--burst-rate", type=float, default=175.0)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser("~/.iridium-tpu-xla-cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from jax.sharding import Mesh

    import bench as bench_mod
    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.parallel.stream import ShardedPipeline
    from iridium_tpu.runtime.pipeline import Pipeline

    rate = 10_000_000
    cfg = DetectorConfig(sample_rate=rate, frames_per_block=2048,
                         gone_capacity=2048)
    p = cfg.derived()
    bs = p.block_samples
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cap, n_inj = bench_mod.make_capture(args.blocks, bs, rate,
                                        args.burst_rate)
    secs = len(cap) / rate
    print(f"capture {secs:.1f} s, {n_inj} injected", file=sys.stderr,
          flush=True)

    def run(pipe, tag):
        t0 = time.perf_counter()
        n = len(list(pipe.run_array(cap)))        # warm (compiles)
        print(f"{tag}: warm {n} frames in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        best = None
        for _ in range(2):
            pipe.reset(start_time_ns=0)
            t0 = time.perf_counter()
            n = len(list(pipe.run_array(cap)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rtf = secs / best
        print(f"{tag}: {best:.2f} s ({rtf:.2f}x rt, {n} frames)",
              file=sys.stderr, flush=True)
        return best, rtf, n

    kw = dict(burst_batch=128, start_time_ns=0, want_llr=False)
    single_xla = Pipeline(det_cfg=cfg, agg_blocks=args.blocks,
                          group_jobs=12, detect_impl="fast", **kw)
    w_xla, r_xla, n_xla = run(single_xla, "single-chip (xla scan)")
    del single_xla

    single = Pipeline(det_cfg=cfg, agg_blocks=args.blocks,
                      group_jobs=12, **kw)
    w_pl, r_pl, n_pl = run(single, "single-chip (production)")
    del single

    mesh = Mesh(np.array(jax.devices()[:1]), ("shards",))
    sp = ShardedPipeline(cfg, mesh=mesh, agg_blocks=args.blocks,
                         group_jobs=12, **kw)
    w_sh, r_sh, n_sh = run(sp, "sharded mesh=1")

    print(json.dumps({
        "metric": "mesh1_over_single_chip_rtf_tpu",
        "value": round(r_sh / r_xla, 3),
        "unit": "ratio_vs_xla_scan_single_chip",
        "mesh1_rtf": round(r_sh, 2),
        "single_chip_xla_scan_rtf": round(r_xla, 2),
        "single_chip_production_rtf": round(r_pl, 2),
        "frames": [n_sh, n_xla, n_pl],
        "walls_s": [round(w_sh, 2), round(w_xla, 2), round(w_pl, 2)],
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
