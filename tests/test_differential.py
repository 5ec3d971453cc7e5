"""Differential test against the C reference binary.

Builds the reference (read-only at /root/reference) with the local fftw
shim (tools/refbuild/), runs it on a synthetic multi-burst capture, and
compares timestamp-stripped sorted RAW lines with our pipeline — the
reference's own equivalence methodology (`test-configurations.sh:149-151`:
sorted MD5 with timestamps stripped; `ARCHITECTURE.md:293-309`: identical
bits, small metadata drift allowed between FP backends).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from iridium_tpu.config import DetectorConfig
from iridium_tpu.io import synth
from iridium_tpu.runtime.pipeline import Pipeline

REF_DIR = "/root/reference"
BUILD_SH = os.path.join(os.path.dirname(__file__), "..",
                        "tools", "refbuild", "build.sh")
REF_BIN = "/tmp/refbuild/iridium-sniffer-ref"


def reference_binary():
    if os.path.exists(REF_BIN):
        return REF_BIN
    if not (os.path.isdir(REF_DIR) and shutil.which("gcc")):
        pytest.skip("reference sources or gcc unavailable")
    subprocess.run(["bash", BUILD_SH], check=True, capture_output=True)
    return REF_BIN


def synth_capture(path, n_bursts=4, seed=21):
    rng = np.random.default_rng(seed)
    caps = []
    for k in range(n_bursts):
        bits = rng.integers(0, 2, 240 + 20 * k).astype(np.uint8)
        caps.append(synth.make_capture(
            bits, sample_rate=10_000_000,
            freq_offset_hz=float(rng.uniform(-3e6, 3e6)),
            snr_db=27.0,
            burst_start_sample=(512 + 40) * 8192 if k == 0 else 120_000,
            total_samples=None if k == 0 else 1_200_000,
            seed=100 + k))
    cap = np.concatenate(caps)
    inter = np.empty(2 * len(cap), np.float32)
    inter[0::2], inter[1::2] = cap.real, cap.imag
    inter.tofile(path)
    return cap


def strip_line(line):
    """Drop file_info + timestamp; the rest must match field-for-field
    (level gets a tolerance, everything else exact)."""
    f = line.split()
    return f[3:]


def test_raw_parity_with_reference(tmp_path):
    ref_bin = reference_binary()
    path = str(tmp_path / "diff.cf32")
    synth_capture(path)

    out = subprocess.run([ref_bin, "-f", path], capture_output=True,
                         text=True, timeout=300)
    ref_lines = [l for l in out.stdout.splitlines() if l.startswith("RAW:")]

    pipe = Pipeline(start_time_ns=1_755_000_000_000_000_000)
    from iridium_tpu.output.raw import RawPrinter
    printer = RawPrinter()
    our_lines = [printer.format(f) for f in pipe.run_file(path)]

    assert len(ref_lines) >= 3, out.stderr[-2000:]
    assert len(our_lines) == len(ref_lines)

    ref_sorted = sorted(map(strip_line, ref_lines))
    our_sorted = sorted(map(strip_line, our_lines))
    for ours, ref in zip(our_sorted, ref_sorted):
        assert len(ours) == len(ref)
        for i, (a, b) in enumerate(zip(ours, ref)):
            if i == 4:   # level: FP-backend drift tolerated
                assert abs(float(a) - float(b)) < 2e-3, (a, b)
            else:
                assert a == b, f"field {i}: ours={a} ref={b}"
