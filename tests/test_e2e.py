"""End-to-end golden tests: synthetic Iridium bursts through the full
detect -> downmix -> demod pipeline must come back with byte-identical
bits (the reference's own oracle, ARCHITECTURE.md:244-283).
"""

import numpy as np
import pytest

from iridium_tpu import iridium
from iridium_tpu.config import DetectorConfig
from iridium_tpu.io import synth
from iridium_tpu.output.raw import RawPrinter
from iridium_tpu.runtime.pipeline import Pipeline


def small_pipeline(**kw):
    det = DetectorConfig(
        sample_rate=10_000_000,
        frames_per_block=512,     # 512 * 8192 = 4.2 Msamples/block
        burst_capacity=64,
        gone_capacity=128,
        max_new_per_frame=8,
    )
    return Pipeline(det_cfg=det, burst_batch=4,
                    start_time_ns=1_700_000_000_000_000_000, **kw)


def payload_bits(n_bits, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, n_bits).astype(np.uint8)


@pytest.mark.parametrize("direction", ["DL"])
def test_synthetic_burst_bits_roundtrip(direction):
    bits = payload_bits(300)
    cap = synth.make_capture(bits, sample_rate=10_000_000,
                             freq_offset_hz=137_000.0,
                             direction=direction, snr_db=30.0)
    pipe = small_pipeline()
    frames = list(pipe.run_array(cap))
    assert len(frames) >= 1, "burst not detected/demodulated"
    f = frames[0]
    expected = synth.expected_bits(bits, direction)
    got = np.asarray(f["bits"])
    assert len(got) >= len(expected)
    np.testing.assert_array_equal(got[:len(expected)], expected)
    assert f["direction"] == direction
    assert f["confidence"] >= 90
    # Frequency estimate: capture center 1622 MHz + offset
    want_freq = 1_622_000_000 + 137_000
    assert abs(f["frequency"] - want_freq) < 200.0


def test_burst_near_block_boundary():
    """Burst straddling two device blocks exercises the tail/extraction
    cross-block path (the reference's ring buffer equivalent). History is
    shortened so the noise floor is primed well before the boundary."""
    bits = payload_bits(200, seed=9)
    det = DetectorConfig(sample_rate=10_000_000, frames_per_block=256,
                        history_size=128,
                        burst_capacity=64, gone_capacity=128,
                        max_new_per_frame=8)
    block = 256 * 8192
    cap = synth.make_capture(
        bits, sample_rate=10_000_000, freq_offset_hz=-220_000.0,
        burst_start_sample=block - 30_000,
        total_samples=block + 2_000_000, snr_db=30.0)
    pipe = Pipeline(det_cfg=det, burst_batch=4,
                    start_time_ns=1_700_000_000_000_000_000)
    frames = list(pipe.run_array(cap))
    assert len(frames) >= 1
    expected = synth.expected_bits(bits, "DL")
    got = np.asarray(frames[0]["bits"])
    np.testing.assert_array_equal(got[:len(expected)], expected)


def test_ul_burst_rejected_like_reference():
    """The reference's UL uw_start math (burst_downmix.c:632-637: template
    has a 16-symbol preamble but uw_start adds 32 symbols) places the frame
    start 16 symbols past the correlated UW, so a textbook UL burst FAILS
    its UW check — verified by running the reference binary on this exact
    vector ("demod: UW check failed ... dir=UL"). Parity means we reject
    it too."""
    bits = payload_bits(300)
    cap = synth.make_capture(bits, sample_rate=10_000_000,
                             freq_offset_hz=137_000.0,
                             direction="UL", snr_db=30.0)
    pipe = small_pipeline()
    frames = list(pipe.run_array(cap))
    assert frames == []
    assert pipe.stats.n_handled >= 1      # downmixed, then UW-rejected


def test_raw_line_format():
    p = RawPrinter()
    frame = dict(timestamp_ns=1_700_000_000_123_400_000,
                 frequency=1_622_137_000.4,
                 magnitude=23.45, noise=-99.87, id=1230,
                 confidence=97, level=0.0123456, n_symbols=162,
                 bits=np.array([1, 0, 1, 1, 0, 0, 1, 1], np.uint8))
    line = p.format(frame)
    assert line == ("RAW: i-1700000000-t1 0000123.4000 1622137000 "
                    "N:23.45-99.87 I:00000001230  97% 0.01235 150 10110011")
