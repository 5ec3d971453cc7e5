#!/usr/bin/env python
"""Live stdin-mode measurement: sustained throughput and output latency
of `iridium-tpu -f -` (the reference's live-SDR operating mode,
ARCHITECTURE.md:343-377; its published numbers are 83-95 ok/s on a
10 MHz B210 stream).

Method: ONE CLI process is fed the synthetic capture REPS times
back-to-back; every RAW line is timestamped on arrival and assigned to
a repetition by its capture-relative time field. Startup/compile cost
is excluded by measuring the span from the first line of repetition 2
to the last line of the final repetition (steady state):

  throughput_rtf = (REPS-1) * capture_s / steady_span

A second, PACED pass (stdin throttled to 1x realtime) measures output
latency: arrival_wall - (feed_start + line_capture_time); p50/p95
include the block-fill delay inherent to any block-batched design
(frames_per_block * 8192 / rate seconds).

Usage: python tools/bench_live.py [--blocks 4] [--reps 3]
Prints one JSON line.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def run_mode(cap_bytes, rate, fpb, reps, paced, secs):
    proc = subprocess.Popen(
        [sys.executable, "-m", "iridium_tpu.cli", "-f", "-",
         "--format", "cf32", "-r", str(rate),
         "--frames-per-block", str(fpb)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, cwd=REPO)
    lines = []

    def reader():
        for raw in proc.stdout:
            t = time.perf_counter()
            line = raw.decode(errors="replace").strip()
            if line.startswith("RAW: "):
                lines.append((t, line))

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    chunk = 1 << 20
    bytes_per_s = rate * 8
    t0 = time.perf_counter()
    sent = 0
    total = len(cap_bytes) * reps
    for rep in range(reps):
        off = 0
        while off < len(cap_bytes):
            n = min(chunk, len(cap_bytes) - off)
            proc.stdin.write(cap_bytes[off:off + n])
            off += n
            sent += n
            if paced:
                target = t0 + sent / bytes_per_s
                dt = target - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
    proc.stdin.close()
    proc.wait(timeout=900)
    th.join(timeout=60)
    return t0, lines


def line_ts(line):
    m = re.match(r"RAW: \S+ (\d+\.\d+) ", line)
    return float(m.group(1)) / 1e3 if m else None


def staged_mode(cap, rate, fpb, reps, burst_batch=128, group_jobs=12):
    """STAGED-live variant (VERDICT round-4 ask): blocks pre-staged on
    device, agg_blocks=1 (one fetch per block — the live latency
    shape), isolating the COMPUTE path from the tunnel upload exactly
    as the offline bench's staged/ingest split does. Returns
    (throughput_rtf, paced p50/p95 output latency).

    Latency definition: a block's samples are all "received" at its
    airtime end; latency of its frames = wall(frames yielded) -
    airtime end, measured while pacing ingest at 1x realtime."""
    import jax
    import jax.numpy as jnp

    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.runtime.pipeline import Pipeline

    det = DetectorConfig(sample_rate=rate, frames_per_block=fpb,
                         gone_capacity=2048)
    pipe = Pipeline(det_cfg=det, want_llr=False, agg_blocks=1,
                    burst_batch=burst_batch, group_jobs=group_jobs,
                    start_time_ns=0)
    bs = pipe.p.block_samples
    blk_s = bs / rate
    blocks = []
    for i0 in range(0, len(cap) - bs + 1, bs):
        pairs = cap[i0:i0 + bs].view(np.float32).reshape(-1, 2)
        blocks.append(jax.device_put(jnp.asarray(pairs)))
    jax.block_until_ready(blocks)
    seq = blocks * reps

    n = sum(len(fl) for fl in pipe.run_blocks(
        (b, bs) for b in seq[:len(blocks)]))     # warm (compiles)
    print(f"staged warm: {n} frames", file=sys.stderr, flush=True)

    # throughput: free-running over reps copies of the staged capture
    pipe.reset(start_time_ns=0)
    t0 = time.perf_counter()
    n = sum(len(fl) for fl in pipe.run_blocks((b, bs) for b in seq))
    span = time.perf_counter() - t0
    rtf = len(seq) * blk_s / span
    ok_per_s = n / (len(seq) * blk_s)
    print(f"staged-live: {len(seq)} blocks in {span:.2f} s -> "
          f"{rtf:.2f}x realtime, {n} frames", file=sys.stderr,
          flush=True)

    # paced pass: 1x-realtime ingest, per-block output latency
    pipe.reset(start_time_ns=0)
    start = time.perf_counter()

    def paced():
        for i, b in enumerate(seq):
            target = start + (i + 1) * blk_s
            dt = target - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
            yield b, bs

    lats = []
    for k, frames in enumerate(pipe.run_blocks(paced())):
        if frames:
            lats.append(time.perf_counter() - start - (k + 1) * blk_s)
    lats = np.array(lats) if lats else np.array([np.nan])
    p50 = float(np.percentile(lats, 50))
    p95 = float(np.percentile(lats, 95))
    print(f"staged paced latency: p50={p50:.2f} s p95={p95:.2f} s "
          f"(block fill floor {blk_s:.2f} s is upstream of this)",
          file=sys.stderr, flush=True)
    return rtf, ok_per_s, p50, p95


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--burst-rate", type=float, default=175.0)
    ap.add_argument("--frames-per-block", type=int, default=512)
    ap.add_argument("--skip-latency", action="store_true")
    ap.add_argument("--staged", action="store_true",
                    help="run the STAGED-live variant instead (blocks "
                         "pre-staged on device, agg=1: isolates the "
                         "compute path from the tunnel upload)")
    args = ap.parse_args()

    import bench as bench_mod
    rate = 10_000_000
    fpb = args.frames_per_block
    bs = fpb * 8192
    cap, n_inj = bench_mod.make_capture(args.blocks, bs, rate,
                                        args.burst_rate)
    secs = len(cap) / rate
    cap_bytes = cap.view(np.float32).tobytes()
    print(f"capture: {secs:.2f} s x {args.reps} reps, {n_inj} bursts",
          file=sys.stderr)

    if args.staged:
        rtf, ok_per_s, p50, p95 = staged_mode(cap, rate, fpb,
                                              args.reps)
        print(json.dumps(dict(
            metric="live_staged", capture_s=round(secs, 2),
            throughput_rtf=round(rtf, 2), ok_per_s=round(ok_per_s, 1),
            latency_p50_s=round(p50, 2), latency_p95_s=round(p95, 2),
            block_fill_floor_s=round(bs / rate, 2))), flush=True)
        return

    t0, lines = run_mode(cap_bytes, rate, fpb, args.reps, False, secs)
    # steady state: drop repetition 1 (startup/compile)
    steady = [(t, line) for t, line in lines
              if (ts := line_ts(line)) is not None and ts >= secs]
    out = dict(metric="live_stdin", capture_s=round(secs, 2),
               raw_lines=len(lines))
    if len(steady) >= 2:
        span = steady[-1][0] - steady[0][0]
        covered = (args.reps - 1) * secs
        rtf = covered / span if span > 0 else 0.0
        out.update(throughput_rtf=round(rtf, 2),
                   steady_lines=len(steady),
                   ok_per_s=round(len(steady) / covered, 1))
        print(f"steady state: {len(steady)} RAW lines over "
              f"{span:.2f} s wall covering {covered:.2f} s of stream "
              f"-> {rtf:.2f}x realtime", file=sys.stderr)

    if not args.skip_latency and out.get("throughput_rtf", 0) >= 1.0:
        t0, lines = run_mode(cap_bytes, rate, fpb, args.reps, True,
                             secs)
        lats = []
        for arrival, line in lines:
            ts = line_ts(line)
            if ts is None or ts < secs:      # skip startup repetition
                continue
            lats.append(arrival - t0 - ts)
        if lats:
            lats = np.array(lats)
            out.update(
                latency_p50_s=round(float(np.percentile(lats, 50)), 2),
                latency_p95_s=round(float(np.percentile(lats, 95)), 2),
                block_fill_floor_s=round(bs / rate, 2),
                paced_raw_lines=len(lats))
            print(f"latency: p50={out['latency_p50_s']} s "
                  f"p95={out['latency_p95_s']} s "
                  f"(block fill floor {out['block_fill_floor_s']} s)",
                  file=sys.stderr)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
