"""Fused on-device group routing vs the host-routed oracle.

The production finish path routes bursts ON DEVICE (gone table -> class
split -> gather params) inside one jitted program per group
(runtime/pipeline.py:_fused_for); the host-routed two-RPC flow
(_finish_group_host) remains as the save-bursts/debug path and is the
oracle here: both must produce identical RAW frames on the same capture,
including when a class overflows its per-dispatch capacity and the fused
path takes extra skip rounds.
"""

import numpy as np
import pytest
from scipy.signal import resample_poly

from iridium_tpu.config import DetectorConfig
from iridium_tpu.io import synth
from iridium_tpu.output.raw import RawPrinter
from iridium_tpu.runtime.pipeline import Pipeline

RATE = 2_000_000


def tiny_cfg(**kw):
    cfg = dict(
        sample_rate=RATE, fft_size=512, history_size=8,
        frames_per_block=64, burst_capacity=64, gone_capacity=64,
        max_new_per_frame=32, max_burst_len=18_000, burst_post_len=4_000,
    )
    cfg.update(kw)
    return DetectorConfig(**cfg)


def multi_burst_capture(n_blocks=4):
    p = tiny_cfg().derived()
    bs = p.block_samples
    rng = np.random.default_rng(7)
    total = n_blocks * bs
    cap = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
           ).astype(np.complex64) * np.float32(0.01 / np.sqrt(2))
    placements = [
        (12_000, 120_000.0, 1),
        (bs - 6_000, -350_000.0, 2),      # straddles group-internal edge
        (bs + 10_000, 480_000.0, 3),
        (2 * bs - 8_000, -480_000.0, 6),
        (2 * bs + 5_000, -120_000.0, 4),
        (3 * bs + 10_000, 240_000.0, 5),
    ]
    for start, freq, seed in placements:
        bits = np.random.default_rng(seed).integers(0, 2, 160
                                                    ).astype(np.uint8)
        bb = synth.modulate(synth.burst_symbols(bits, "DL"))
        x = resample_poly(bb, up=RATE // 250_000, down=1
                          ).astype(np.complex64)
        n = np.arange(len(x), dtype=np.float64)
        cap[start:start + len(x)] += (
            0.12 * x * np.exp(2j * np.pi * freq / RATE * n)
        ).astype(np.complex64)
    return cap


def run_frames(pipe, cap, host_routed=False):
    if host_routed:
        pipe._finish_group = pipe._finish_group_host
    return list(pipe.run_array(cap))


def lines(frames):
    pr = RawPrinter("t")
    return [pr.format(f) for f in frames]


@pytest.mark.parametrize("agg", [1, 4])
def test_fused_matches_host_routing(agg):
    cap = multi_burst_capture()
    kw = dict(det_cfg=tiny_cfg(), burst_batch=4, agg_blocks=agg,
              group_jobs=2, start_time_ns=1_700_000_000_000_000_000)
    fused = run_frames(Pipeline(**kw), cap)
    host = run_frames(Pipeline(**kw), cap, host_routed=True)
    assert len(fused) >= 5
    assert lines(fused) == lines(host)


def test_fused_overflow_rounds():
    """Capacity far below the group's burst count: the fused path must
    drain via skip rounds and still match the host-routed oracle."""
    cap = multi_burst_capture()
    kw = dict(det_cfg=tiny_cfg(), burst_batch=2, agg_blocks=4,
              group_jobs=1, start_time_ns=1_700_000_000_000_000_000)
    pipe = Pipeline(**kw)
    fused = run_frames(pipe, cap)
    assert pipe.timing["n_overflow_rounds"] >= 1, \
        "capacity was not exceeded; overflow path untested"
    host = run_frames(Pipeline(**kw), cap, host_routed=True)
    assert len(fused) >= 5
    assert lines(fused) == lines(host)
    # stats must agree too (overflow rounds must not double-count)
    p2 = Pipeline(**kw)
    run_frames(p2, cap, host_routed=True)
    assert pipe.stats.n_detected == p2.stats.n_detected
    assert pipe.stats.n_ok == p2.stats.n_ok
    assert pipe.stats.n_handled == p2.stats.n_handled
