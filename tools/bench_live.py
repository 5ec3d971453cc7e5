#!/usr/bin/env python
"""Live stdin-mode measurement: sustained throughput and output latency
of `iridium-tpu -f -` (the reference's live-SDR operating mode,
ARCHITECTURE.md:343-377; its published numbers are 83-95 ok/s on a
10 MHz B210 stream).

Two measurements on one synthetic 10 MHz capture (same generator as
bench.py):

  throughput: feed stdin as fast as the pipe accepts; realtime factor =
    capture seconds / wall. This is the live path's capacity (agg=1:
    every block pays its own fetch round-trip, unlike the offline
    group-aggregated mode).

  latency: feed stdin PACED at 1x realtime and timestamp every RAW
    line on arrival. A line's output latency = arrival_wall -
    (feed_start + line_capture_time). Reported p50/p95 include the
    block accumulation delay (a burst waits for its ~fpb*fft/rate
    second block to fill — the floor for any block-batched design).

Usage: python tools/bench_live.py [--blocks 4] [--skip-latency]
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


def spawn(rate, fpb):
    env = dict(os.environ)
    return subprocess.Popen(
        [sys.executable, "-m", "iridium_tpu.cli", "-f", "-",
         "--format", "cf32", "-r", str(rate),
         "--frames-per-block", str(fpb)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, cwd=REPO, env=env)


def run_mode(cap_bytes, rate, fpb, paced: bool, secs: float):
    proc = spawn(rate, fpb)
    lines = []          # (arrival_wall, line)
    done = threading.Event()

    def reader():
        for raw in proc.stdout:
            t = time.perf_counter()
            line = raw.decode(errors="replace").strip()
            if line.startswith("RAW: "):
                lines.append((t, line))
        done.set()

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    chunk = 1 << 20                       # 1 MiB (65.5 kSamp cf32)
    bytes_per_s = rate * 8
    t0 = time.perf_counter()
    sent = 0
    while sent < len(cap_bytes):
        n = min(chunk, len(cap_bytes) - sent)
        proc.stdin.write(cap_bytes[sent:sent + n])
        sent += n
        if paced:
            target = t0 + sent / bytes_per_s
            dt = target - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
    proc.stdin.close()
    proc.wait(timeout=600)
    done.wait(timeout=60)
    wall = time.perf_counter() - t0
    return t0, wall, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--burst-rate", type=float, default=175.0)
    ap.add_argument("--frames-per-block", type=int, default=512)
    ap.add_argument("--skip-latency", action="store_true")
    args = ap.parse_args()

    import bench as bench_mod
    rate = 10_000_000
    fpb = args.frames_per_block
    bs = fpb * 8192
    cap, n_inj = bench_mod.make_capture(args.blocks, bs, rate,
                                        args.burst_rate)
    secs = len(cap) / rate
    cap_bytes = cap.view(np.float32).tobytes()
    print(f"capture: {secs:.2f} s, {n_inj} bursts", file=sys.stderr)

    # warm the persistent compile cache with a short run first
    print("warm-up run (compiles)...", file=sys.stderr)
    run_mode(cap_bytes[: 2 * bs * 8], rate, fpb, paced=False, secs=secs)

    t0, wall, lines = run_mode(cap_bytes, rate, fpb, paced=False,
                               secs=secs)
    rtf = secs / wall
    print(f"throughput: {len(lines)} RAW lines, {wall:.2f} s wall "
          f"-> {rtf:.2f}x realtime", file=sys.stderr)

    out = dict(metric="live_stdin", capture_s=round(secs, 2),
               raw_lines=len(lines),
               throughput_rtf=round(rtf, 2),
               ok_per_s=round(len(lines) / secs, 1))

    if not args.skip_latency and rtf >= 1.0:
        t0, wall, lines = run_mode(cap_bytes, rate, fpb, paced=True,
                                   secs=secs)
        lats = []
        for arrival, line in lines:
            m = re.match(r"RAW: \S+ (\d+\.\d+) ", line)
            if not m:
                continue
            # line timestamp is capture-relative ms (t0 latched to the
            # first frame's second — sub-second bias < 1 s is removed
            # by measuring against the stream position instead)
            cap_t = float(m.group(1)) / 1e3
            lats.append(arrival - t0 - cap_t)
        if lats:
            lats = np.array(lats)
            # remove the printer's t0 second-floor bias by aligning the
            # minimum latency class to the block-fill floor
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
