"""Differential coverage matrix vs the C reference binary.

Expands the single-scenario differential tests across the reference's own
verification axes (`test-configurations.sh:159-205`, `README.md:185-228`):
  - detection thresholds 16 dB (default) and 18 dB (matched-comparison mode)
  - UL-heavy burst mixes (the reference correlates DL and UL sync words,
    `burst_downmix.c:539-639`)
  - ci8 / ci16 input formats (lossy >>8 ci16 path, `main.c:239-249`)
  - `--parsed` IDA-line comparison (the attainable offline analogue of the
    external iridium-parser.py cross-check in `test-configurations.sh:181-205`:
    the reference's own --parsed IDA printer is the oracle; its byte format
    was itself verified against iridium-parser.py upstream,
    `frame_output.c:203-362`)
"""

import subprocess

import numpy as np
import pytest

from iridium_tpu.config import DetectorConfig
from iridium_tpu.io import synth, synth_frames as sf
from iridium_tpu.output.raw import RawPrinter
from iridium_tpu.runtime.pipeline import Pipeline
from tests.test_differential import reference_binary, strip_line

pytestmark = pytest.mark.slow


def build_mixed_capture(seconds, rate=10_000_000, seed=7, ul_frac=0.0,
                        ida_frac=0.0, snr_lo=22.0, snr_hi=33.0):
    """Noise + data bursts; a ul_frac share carry the UL sync word, an
    ida_frac share are valid IDA frames (for --parsed comparison)."""
    rng = np.random.default_rng(seed)
    total = int(seconds * rate)
    cap = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
           ).astype(np.complex64) * np.float32(0.01 / np.sqrt(2))
    pos = 516 * 8192                      # detector noise priming
    n = 0
    while pos < total - 400_000:
        direction = "UL" if rng.random() < ul_frac else "DL"
        if direction == "DL" and rng.random() < ida_frac:
            payload = bytes(rng.integers(0, 256, int(rng.integers(1, 18)),
                                         dtype=np.uint8))
            bits = np.concatenate([
                sf.ida_payload_bits(payload, cont=0, ctr=0, lcw_code=6,
                                    lcw3_val=int(rng.integers(0, 1 << 21))),
                rng.integers(0, 2, 80).astype(np.uint8)])
        else:
            bits = rng.integers(0, 2, 2 * int(rng.integers(120, 320))
                                ).astype(np.uint8)
        burst = synth.make_capture(
            bits, sample_rate=rate, direction=direction,
            freq_offset_hz=float(rng.uniform(-4.2e6, 4.2e6)),
            snr_db=float(rng.uniform(snr_lo, snr_hi)),
            burst_start_sample=0, total_samples=330_000,
            noise_floor=0.0001, seed=int(rng.integers(1 << 30)))
        cap[pos:pos + len(burst)] += burst * 100.0
        pos += int(rng.uniform(0.06, 0.13) * rate)
        n += 1
    return cap, n


def write_fmt(cap, path, fmt):
    if fmt == "cf32":
        inter = np.empty(2 * len(cap), np.float32)
        inter[0::2], inter[1::2] = cap.real, cap.imag
        inter.tofile(path)
    elif fmt == "ci16":
        inter = np.empty(2 * len(cap), np.float32)
        inter[0::2], inter[1::2] = cap.real, cap.imag
        np.clip(np.round(inter * 32767.0), -32768, 32767
                ).astype(np.int16).tofile(path)
    else:                                 # ci8
        inter = np.empty(2 * len(cap), np.float32)
        inter[0::2], inter[1::2] = cap.real, cap.imag
        np.clip(np.round(inter * 127.0), -128, 127
                ).astype(np.int8).tofile(path)


def run_reference(path, extra=()):
    out = subprocess.run([reference_binary(), "-f", path, *extra],
                         capture_output=True, text=True, timeout=900)
    return out


def run_ours(path, threshold_db=16.0):
    det = DetectorConfig(sample_rate=10_000_000, threshold_db=threshold_db)
    pipe = Pipeline(det_cfg=det, start_time_ns=1_755_000_000_000_000_000)
    printer = RawPrinter()
    return [printer.format(f) for f in pipe.run_file(path)]


def assert_line_parity(our_lines, ref_lines, level_tol=3e-3):
    assert len(our_lines) == len(ref_lines), \
        (len(our_lines), len(ref_lines))
    ours = sorted(map(strip_line, our_lines))
    ref = sorted(map(strip_line, ref_lines))
    for a, b in zip(ours, ref):
        assert len(a) == len(b), (a, b)
        for i, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if i == 4:          # level: FP-backend drift tolerated
                assert abs(float(x) - float(y)) < level_tol, (x, y)
            elif i == 0:        # frequency: ±1 Hz rounding at .5
                assert abs(int(x) - int(y)) <= 1, (x, y)
            elif i == 5:
                # end-of-frame magnitude-drop gray zone: the reference's
                # own backends flip the last symbol on marginal bursts
                # (ARCHITECTURE.md:504-512); allow ±1 symbol, bits must
                # then agree prefix-wise (checked at i==6)
                assert abs(int(x) - int(y)) <= 1, (x, y)
            elif i == 6 and abs(int(a[5]) - int(b[5])) == 1:
                short, long_ = (x, y) if len(x) < len(y) else (y, x)
                assert long_.startswith(short), (x, y)
            else:
                raise AssertionError(f"field {i}: ours={x} ref={y}")


@pytest.mark.parametrize("fmt,threshold,ul_frac,seed", [
    ("cf32", 18.0, 0.7, 11),     # 18 dB matched mode, UL-heavy
    ("ci16", 16.0, 0.3, 12),     # lossy >>8 int16 path
    ("ci8", 16.0, 0.3, 13),      # default-format int8 path
])
def test_matrix_raw_parity(tmp_path, fmt, threshold, ul_frac, seed):
    ref_bin = reference_binary()
    assert ref_bin
    cap, n_inj = build_mixed_capture(2.6, seed=seed, ul_frac=ul_frac,
                                     snr_lo=24.0, snr_hi=33.0)
    path = str(tmp_path / f"mx.{fmt}")
    write_fmt(cap, path, fmt)

    extra = [] if threshold == 16.0 else ["-d", str(threshold)]
    out = run_reference(path, extra)
    ref_lines = [l for l in out.stdout.splitlines() if l.startswith("RAW:")]
    # the 18 dB threshold clips burst edges harder, so the reference
    # demods fewer of the marginal ULs — parity (below) is the contract,
    # this only guards against an empty run
    assert len(ref_lines) >= max(3, n_inj // 8), out.stderr[-2000:]

    our_lines = run_ours(path, threshold_db=threshold)
    assert_line_parity(our_lines, ref_lines)


def test_parsed_ida_parity(tmp_path):
    """--parsed mode: IDA lines (LCW header + payload hex + CRC) must match
    the reference's byte format field-for-field after timestamp strip."""
    from iridium_tpu.decode import ida as ida_mod

    ref_bin = reference_binary()
    cap, _ = build_mixed_capture(2.6, seed=14, ul_frac=0.0, ida_frac=1.0,
                                 snr_lo=26.0, snr_hi=33.0)
    path = str(tmp_path / "ida.cf32")
    write_fmt(cap, path, "cf32")

    out = run_reference(path, ["--parsed"])
    ref_ida = [l for l in out.stdout.splitlines() if l.startswith("IDA:")]
    ref_raw = [l for l in out.stdout.splitlines() if l.startswith("RAW:")]
    assert len(ref_ida) >= 5, out.stderr[-2000:]

    det = DetectorConfig(sample_rate=10_000_000)
    pipe = Pipeline(det_cfg=det, start_time_ns=1_755_000_000_000_000_000)
    printer = RawPrinter()
    our_ida, our_raw = [], []
    for f in pipe.run_file(path):
        burst = ida_mod.ida_decode(f)
        if burst is not None:
            our_ida.append(printer.format_ida(burst))
        else:
            our_raw.append(printer.format(f))

    # IDA split must agree exactly: same frames decodable on both sides
    assert len(our_ida) == len(ref_ida)
    assert len(our_raw) == len(ref_raw)
    ours = sorted(map(strip_line, our_ida))
    ref = sorted(map(strip_line, ref_ida))
    for a, b in zip(ours, ref):
        assert len(a) == len(b), (a, b)
        for i, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if i == 2 and "|" in x:
                # leveldB|noise|magnitude: level carries the same FP-
                # backend drift as the RAW level field, here in dB
                ldb_a, rest_a = x.split("|", 1)
                ldb_b, rest_b = y.split("|", 1)
                assert rest_a == rest_b, (x, y)
                assert abs(float(ldb_a) - float(ldb_b)) < 0.05, (x, y)
            elif i == 0:
                assert abs(int(x) - int(y)) <= 1, (x, y)
            else:
                raise AssertionError(f"IDA field {i}: ours={x} ref={y}")
