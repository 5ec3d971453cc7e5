"""Long multi-burst differential test vs the C reference binary.

A ~4 s, 10 MHz capture with a mix of DL data bursts at random
frequencies/SNRs plus valid IDA frames — both decoders must produce the
same timestamp-stripped output (bits identical; level FP drift allowed;
the reference's own GPU-vs-CPU tolerance of ±a few marginal bursts is
granted on counts)."""

import os
import subprocess

import numpy as np
import pytest

from iridium_tpu.io import synth, synth_frames as sf
from iridium_tpu.output.raw import RawPrinter
from iridium_tpu.runtime.pipeline import Pipeline
from tests.test_differential import reference_binary, strip_line

pytestmark = pytest.mark.slow


def build_capture(path, seconds=4.0, rate=10_000_000, seed=42):
    rng = np.random.default_rng(seed)
    total = int(seconds * rate)
    cap = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
           ).astype(np.complex64) * np.float32(0.01 / np.sqrt(2))
    prime = 516 * 8192
    pos = prime
    n = 0
    while pos < total - 400_000:
        kind = rng.integers(0, 3)
        if kind == 0:       # random payload burst
            bits = rng.integers(0, 2, int(rng.integers(150, 400))
                                * 2).astype(np.uint8)
        elif kind == 1:     # valid IDA frame + filler
            payload = bytes(rng.integers(0, 256, int(rng.integers(1, 18)),
                                         dtype=np.uint8))
            bits = np.concatenate([
                sf.ida_payload_bits(payload, cont=0, ctr=0, lcw_code=6,
                                    lcw3_val=int(rng.integers(0, 1 << 21))),
                rng.integers(0, 2, 80).astype(np.uint8)])
        else:               # IRA frame + filler
            bits = np.concatenate([
                sf.ira_payload_bits(int(rng.integers(1, 127)),
                                    int(rng.integers(0, 63)),
                                    (int(rng.integers(-1790, 1790)),
                                     int(rng.integers(-1790, 1790)),
                                     int(rng.integers(-1000, 1000)))),
                rng.integers(0, 2, 60).astype(np.uint8)])
        freq = float(rng.uniform(-4.2e6, 4.2e6))
        snr = float(rng.uniform(22.0, 33.0))
        burst = synth.make_capture(
            bits, sample_rate=rate, freq_offset_hz=freq, snr_db=snr,
            burst_start_sample=0, total_samples=360_000,
            noise_floor=0.0001, seed=int(rng.integers(1 << 30)))
        cap[pos:pos + len(burst)] += burst * 100.0
        pos += int(rng.uniform(0.05, 0.12) * rate)
        n += 1
    inter = np.empty(2 * total, np.float32)
    inter[0::2], inter[1::2] = cap.real, cap.imag
    inter.tofile(path)
    return n


def test_long_capture_parity(tmp_path):
    ref_bin = reference_binary()
    path = str(tmp_path / "stress.cf32")
    n_injected = build_capture(path)
    assert n_injected >= 20

    out = subprocess.run([ref_bin, "-f", path], capture_output=True,
                         text=True, timeout=900)
    ref_lines = [l for l in out.stdout.splitlines() if l.startswith("RAW:")]

    pipe = Pipeline(start_time_ns=1_755_000_000_000_000_000)
    printer = RawPrinter()
    our_lines = [printer.format(f) for f in pipe.run_file(path)]

    assert len(ref_lines) >= n_injected // 2
    # counts must match exactly on synthetic clean bursts
    assert len(our_lines) == len(ref_lines), (len(our_lines), len(ref_lines))

    ours = sorted(map(strip_line, our_lines))
    ref = sorted(map(strip_line, ref_lines))
    mismatched_fields = 0
    for a, b in zip(ours, ref):
        assert len(a) == len(b)
        for i, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if i == 4:    # level FP drift
                assert abs(float(x) - float(y)) < 3e-3, (x, y)
                continue
            if i == 0:    # frequency: ±1 Hz rounding at the .5 boundary
                assert abs(int(x) - int(y)) <= 1, (x, y)
                continue
            mismatched_fields += 1
    assert mismatched_fields == 0, f"{mismatched_fields} field mismatches"
