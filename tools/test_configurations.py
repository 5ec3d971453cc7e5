#!/usr/bin/env python
"""Configuration-matrix equivalence harness.

Port of the reference's end-to-end verification methodology
(`test-configurations.sh`): run the decoder across configurations on the
same IQ file, collect RAW/IDA counts and a timestamp-stripped sorted MD5
of the output, and compare groups. Optionally also runs the C reference
binary (built via tools/refbuild/build.sh) as an external oracle.

Usage:
    python tools/test_configurations.py CAPTURE.cf32 [--with-reference]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import subprocess
import sys
import time

CONFIGS = [
    ("default", []),
    ("scan-xla", ["--scan", "xla"]),       # cf. reference --no-simd
    ("gather-xla", ["--gather", "xla"]),
    ("no-gardner", ["--no-gardner"]),
    ("parsed", ["--parsed"]),
]

REF_BIN = "/tmp/refbuild/iridium-sniffer-ref"


def strip_ts(line: str) -> str:
    f = line.split()
    if len(f) > 3 and f[0] in ("RAW:", "IDA:"):
        return " ".join([f[0]] + f[3:])
    return line


def run_ours(path: str, extra: list[str]) -> tuple[list[str], float]:
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "iridium_tpu.cli", "-f", path] + extra,
        capture_output=True, text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines()
             if l.startswith(("RAW:", "IDA:"))]
    return lines, time.time() - t0


def run_reference(path: str, extra: list[str]) -> tuple[list[str], float]:
    t0 = time.time()
    out = subprocess.run([REF_BIN, "-f", path] + extra,
                         capture_output=True, text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines()
             if l.startswith(("RAW:", "IDA:"))]
    return lines, time.time() - t0


def digest(lines: list[str]) -> str:
    stripped = sorted(strip_ts(l) for l in lines)
    return hashlib.md5("\n".join(stripped).encode()).hexdigest()[:12]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("capture")
    ap.add_argument("--with-reference", action="store_true")
    args = ap.parse_args()

    results = {}
    for name, extra in CONFIGS:
        lines, dt = run_ours(args.capture, extra)
        results[name] = (lines, dt)
        raw = sum(l.startswith("RAW:") for l in lines)
        ida = sum(l.startswith("IDA:") for l in lines)
        print(f"{name:>12}: {raw:5d} RAW, {ida:5d} IDA, "
              f"{dt:6.1f} s, md5 {digest(lines)}")

    if args.with_reference:
        if not os.path.exists(REF_BIN):
            subprocess.run(
                ["bash", os.path.join(os.path.dirname(__file__),
                                      "refbuild", "build.sh")], check=True)
        for name, extra in (("ref-default", []), ("ref-parsed", ["--parsed"])):
            lines, dt = run_reference(args.capture, extra)
            results[name] = (lines, dt)
            raw = sum(l.startswith("RAW:") for l in lines)
            ida = sum(l.startswith("IDA:") for l in lines)
            print(f"{name:>12}: {raw:5d} RAW, {ida:5d} IDA, "
                  f"{dt:6.1f} s, md5 {digest(lines)}")

    # Integrity: group identical digests (reference methodology:
    # 1 group = bit-identical; small groups = FP-backend rounding)
    groups: dict[str, list[str]] = {}
    for name, (lines, _) in results.items():
        groups.setdefault(digest(lines), []).append(name)
    print(f"\n{len(groups)} digest group(s):")
    for d, names in groups.items():
        print(f"  {d}: {', '.join(names)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
