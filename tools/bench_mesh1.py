#!/usr/bin/env python
"""SPMD-program overhead ON REAL HARDWARE: run the sharded pipeline
with a 1-device mesh on the TPU over the bench capture and compare
against the single-chip Pipeline (VERDICT round-4 ask — the reference
analogue is benchmarking its GPU-offload seam both ways,
ARCHITECTURE.md:313-320).

The sharded pipeline's default replicated-scan mode runs the SAME
Mosaic-kernel scan as the production single-chip path, so the headline
ratio is mesh1 vs the production pipeline: it isolates the shard_map
program structure (collective stubs, halo arithmetic, per-shard table
duplication, stream assembly) at identical per-chip work. The
--scan xla single-chip number is reported alongside (the round-4
pairing, kept for continuity).

Measured on the v5e (2026-08-21): mesh1 24.75x vs production 30.49x =
0.81 — the full SPMD program costs ~19% on one chip; the multi-chip
efficiency model in README.md composes this with the measured stage
decomposition.

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

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def run(pipe, tag, sharding=None):
        # pre-stage the capture on device (untimed), exactly like
        # bench.py — the tunnel uploads at ~10-45 MB/s and would
        # otherwise dominate all three measurements equally
        blocks = []
        for i0 in range(0, len(cap), bs):
            pairs = cap[i0:i0 + bs].view(np.float32).reshape(-1, 2)
            d = (jax.device_put(pairs, sharding) if sharding is not None
                 else jnp.asarray(pairs))
            blocks.append((d, bs))
        jax.block_until_ready([b for b, _ in blocks])
        t0 = time.perf_counter()
        n = sum(len(fl) for fl in pipe.run_blocks(iter(blocks)))
        print(f"{tag}: warm {n} frames in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        best = None
        for _ in range(2):
            pipe.reset(start_time_ns=0)
            t0 = time.perf_counter()
            n = sum(len(fl) for fl in pipe.run_blocks(iter(blocks)))
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
    w_sh, r_sh, n_sh = run(sp, "sharded mesh=1",
                           sharding=NamedSharding(mesh, P("shards")))

    print(json.dumps({
        "metric": "mesh1_over_single_chip_rtf_tpu",
        "value": round(r_sh / r_pl, 3),
        "unit": "ratio_vs_production_single_chip",
        "mesh1_rtf": round(r_sh, 2),
        "single_chip_production_rtf": round(r_pl, 2),
        "single_chip_xla_scan_rtf": round(r_xla, 2),
        "ratio_vs_xla_scan": round(r_sh / r_xla, 3),
        "frames": [n_sh, n_pl, n_xla],
        "walls_s": [round(w_sh, 2), round(w_pl, 2), round(w_xla, 2)],
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
