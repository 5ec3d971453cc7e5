"""Equivalence: the branchless chunked detector (dsp/detect_fast.py,
the production fast path) against the reference-faithful per-frame scan
(dsp/detect.py, itself oracle-tested in test_detect.py).

Within the fast path's documented capacity bounds (<=4 creations and
<=8 deletions per frame — never hit in these scenarios) the two must
produce identical burst tables; emission ORDER differs (slot-major vs
id-major within a frame), so tables are compared sorted by burst id."""

import numpy as np
import jax
import jax.numpy as jnp

from iridium_tpu.config import DetectorConfig
from iridium_tpu.dsp import detect, detect_fast

from test_detect import OracleDetector, small_params, tone_capture


def gone_sorted(state):
    n = int(state.g_count)
    rows = [dict(id=int(state.g_id[i]), start=int(state.g_start[i]),
                 stop=int(state.g_stop[i]), bin=int(state.g_bin[i]),
                 mag=float(state.g_mag[i]), noise=float(state.g_noise[i]),
                 last=int(state.g_last[i]))
            for i in range(n)]
    return sorted(rows, key=lambda r: r["id"])


def run_impl(p, samples, make, n_blocks=1):
    det = jax.jit(make(p))
    state = (detect_fast.init_state(p)
             if make is detect_fast.make_detect_block_fast
             else detect.init_state(p))
    out = []
    base = 0
    for k in range(n_blocks):
        block = samples[k * p.block_samples:(k + 1) * p.block_samples]
        state = det(jnp.asarray(block), state, jnp.int32(len(block)))
        for g in gone_sorted(state):
            g["start"] += base
            g["stop"] += base
            g["last"] += base
            out.append(g)
        state = detect.rebase_state(state, p.block_samples)
        base += p.block_samples
    return sorted(out, key=lambda r: r["id"]), state


def check_same(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for x, y in zip(a, b):
        for k in ("id", "start", "stop", "last", "bin"):
            assert x[k] == y[k], (k, x, y)
        np.testing.assert_allclose(x["mag"], y["mag"], rtol=1e-5)
        np.testing.assert_allclose(x["noise"], y["noise"], rtol=1e-5)


def test_fast_matches_exact_multi_burst():
    p = small_params()
    events = [
        (0.08, 0.010, 100_000.0, 0.05),
        (0.085, 0.030, -200_000.0, 0.08),
        (0.12, 0.008, 300_000.0, 0.04),
        (0.13, 0.015, 99_000.0, 0.06),
    ]
    x = tone_capture(p, events)
    want, _ = run_impl(p, x, detect.make_detect_block)
    got, st = run_impl(p, x, detect_fast.make_detect_block_fast)
    assert len(got) == 4
    check_same(got, want)


def test_fast_matches_exact_multiblock_carry():
    p = small_params()
    events = [
        (0.10, 0.02, 150_000.0, 0.05),
        (0.255, 0.02, -150_000.0, 0.05),   # straddles block boundary
        (0.30, 0.01, 250_000.0, 0.05),
    ]
    x = tone_capture(p, events, n_blocks=2)
    want, _ = run_impl(p, x, detect.make_detect_block, n_blocks=2)
    got, _ = run_impl(p, x, detect_fast.make_detect_block_fast,
                      n_blocks=2)
    assert len(got) == 3
    check_same(got, want)


def test_fast_matches_exact_long_burst_and_oracle():
    p = small_params()
    x = tone_capture(p, [(0.08, 0.15, 50_000.0, 0.05)])
    want_det = OracleDetector(p)
    want_det.feed(x)
    got, _ = run_impl(p, x, detect_fast.make_detect_block_fast)
    oracle = sorted(
        (dict(id=b["id"], start=b["start"], stop=b["stop"],
              last=b["last"], bin=b["bin"], mag=float(b["mag"]),
              noise=float(b["noise"])) for b in want_det.gone),
        key=lambda r: r["id"])
    check_same(got, oracle)


def test_fast_squelch():
    p = small_params(max_bursts=4, max_new_per_frame=4)
    n = p.block_samples
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64) * np.float32(0.01 / np.sqrt(2))
    i0 = int(0.1 * p.sample_rate)
    x[i0:i0 + 20000] += (0.5 * (rng.standard_normal(20000)
                                + 1j * rng.standard_normal(20000))
                         ).astype(np.complex64)
    want, _ = run_impl(p, x, detect.make_detect_block)
    got, _ = run_impl(p, x, detect_fast.make_detect_block_fast)
    check_same(got, want)


def test_fast_squelch_overflow_drop_accounting():
    """Blast density that overflows the per-frame squelch emission
    capacity (E_SQ=16): 20 established bursts + a 4-burst blast trip
    squelch with 20 flagged emissions in one frame; the 4 beyond E_SQ
    must be DROPPED but still counted in n_tagged (the host's d:
    counter), per the documented bounded-capacity divergence class
    (reference analogue: drop-on-full queues, burst_detect.c:929-937)."""
    p = small_params(max_bursts=20, max_new_per_frame=8,
                     burst_capacity=64)
    F = p.fft_size
    bw_hz = p.sample_rate / F
    # 20 staggered long tones (4 creations/frame -> all active well
    # before the blast), then 4 more at once; everything ends together
    # so post-squelch recreation stays bounded
    t_blast = 0.16
    t_end = 0.165
    events = []
    for i in range(20):
        f = -420_000.0 + i * 42_000.0
        if abs(f) < 5 * bw_hz:          # keep off the DC notch
            f += 6 * bw_hz
        events.append((0.10 + 0.002 * i, t_end - (0.10 + 0.002 * i),
                       f, 0.06))
    for i in range(4):
        f = 431_000.0 + i * 12_000.0
        events.append((t_blast, t_end - t_blast, f, 0.06))
    x = tone_capture(p, events)
    got, st = run_impl(p, x, detect_fast.make_detect_block_fast)
    n_tagged = int(st.n_tagged)
    n_emitted = len(got)
    # the squelch frame flags 20 bursts; 16 emit, >=4 drop (post-squelch
    # recreation can add fully-emitted delete events but never drops)
    assert n_tagged - n_emitted >= 4, (n_tagged, n_emitted)
    # round 5: the drop count is now surfaced as a state field
    assert int(st.burst_dropped) >= 4
    assert n_emitted >= 16
    # squelch emission burst: >=16 rows sharing one stop frame
    from collections import Counter
    stops = Counter(g["stop"] for g in got)
    assert max(stops.values()) >= 16


def test_drop_counters_reach_pipeline_stats():
    """The surfaced burst_dropped counter must ride the detect-step
    head row into PipelineStats.n_em_dropped (the stats d: breakdown,
    reference drop accounting analogue: burst_detect.c:929-937)."""
    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.runtime.pipeline import Pipeline

    cfg = DetectorConfig(
        sample_rate=1_000_000, history_size=64, frames_per_block=256,
        burst_capacity=32, max_new_per_frame=8, gone_capacity=64,
        max_bursts=20)
    p = cfg.derived()
    bw_hz = p.sample_rate / p.fft_size
    t_blast, t_end = 0.16, 0.165
    events = []
    for i in range(20):
        f = -420_000.0 + i * 42_000.0
        if abs(f) < 5 * bw_hz:
            f += 6 * bw_hz
        events.append((0.10 + 0.002 * i, t_end - (0.10 + 0.002 * i),
                       f, 0.06))
    for i in range(4):
        events.append((t_blast, t_end - t_blast,
                       431_000.0 + i * 12_000.0, 0.06))
    x = tone_capture(p, events)
    pipe = Pipeline(det_cfg=cfg, burst_batch=8, start_time_ns=0,
                    detect_impl="fast")
    list(pipe.run_array(x))
    assert pipe.stats.n_em_dropped >= 4
    assert pipe.stats.n_dropped >= pipe.stats.n_em_dropped


def test_fast_mass_deletion_mask_release():
    """More than E_DEL=8 bursts deleting in ONE frame: the excess rows
    drop from the emission table, but their +-half_bw mask coverage must
    be fully released (the subtraction uses the deletion flags, not the
    capped emission rows) — a second wave of bursts on the SAME bins
    must all be created and emitted."""
    p = small_params(max_new_per_frame=8, burst_capacity=64)
    F = p.fft_size
    n_tones = 12
    freqs = [-300_000.0 + i * 52_000.0 for i in range(n_tones)]
    freqs = [f if abs(f) > 8_000 else f + 26_000.0 for f in freqs]
    wave1 = [(0.10 + 0.002 * i, 0.160 - (0.10 + 0.002 * i), f, 0.06)
             for i, f in enumerate(freqs)]
    # second wave starts after wave 1's post_len deletion window
    wave2 = [(0.22 + 0.002 * i, 0.020, f, 0.06)
             for i, f in enumerate(freqs)]
    # two blocks so every wave-2 burst's post_len deletion window
    # closes inside the capture
    x = tone_capture(p, wave1 + wave2, n_blocks=2)
    got, st = run_impl(p, x, detect_fast.make_detect_block_fast,
                       n_blocks=2)
    w1_end = int(0.165 * p.sample_rate)
    wave2_rows = [g for g in got if g["start"] > w1_end]
    wave2_bins = {g["bin"] for g in wave2_rows}
    # every tone's bin neighborhood must reappear in wave 2
    assert len(wave2_rows) >= n_tones, \
        (len(wave2_rows), sorted(wave2_bins))
