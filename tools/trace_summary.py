#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by total self time.

Reads the .xplane.pb files a `jax.profiler.trace` run writes under
<logdir>/plugins/profile/<run>/ and aggregates XLA op durations on the
device planes (host planes are skipped). The TPU analogue of `perf
report` for a single dispatch.

Usage: python tools/trace_summary.py <logdir> [--top 30]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane-filter", default="TPU",
                    help="substring of plane names to include")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no .xplane.pb under", args.logdir, file=sys.stderr)
        sys.exit(1)
    path = paths[-1]
    print(f"reading {path}", file=sys.stderr)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    # SELF time: events within one plane are hierarchical across LINES
    # (line k+1 events nest inside line k events). For each event,
    # subtract the duration of events on the NEXT line contained in its
    # span; leaf lines keep their full duration.
    tot = defaultdict(float)
    cnt = defaultdict(int)
    plane_total = 0.0
    for plane in xs.planes:
        if args.plane_filter not in plane.name:
            continue
        print(f"plane: {plane.name}", file=sys.stderr)
        lines = [sorted(((ev.offset_ps, ev.duration_ps, ev.metadata_id)
                         for ev in line.events))
                 for line in plane.lines if line.events]
        for li, evs in enumerate(lines):
            child = lines[li + 1] if li + 1 < len(lines) else []
            starts = [c[0] for c in child]
            import bisect
            for off, dur, mid in evs:
                name = plane.event_metadata[mid].name
                lo = bisect.bisect_left(starts, off)
                covered = 0
                j = lo
                while j < len(child) and child[j][0] < off + dur:
                    covered += min(child[j][1], off + dur - child[j][0])
                    j += 1
                self_ps = max(dur - covered, 0)
                tot[name] += self_ps / 1e9
                cnt[name] += 1
                plane_total += self_ps / 1e9

    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]
    print(f"{'self ms':>10} {'count':>7}  op")
    for name, ms in rows:
        print(f"{ms:10.3f} {cnt[name]:7d}  {name[:110]}")
    print(f"(self-time sum over shown planes: {plane_total:.1f} ms)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
