"""Equivalence: the single-Mosaic-kernel detector scan
(dsp/detect_pallas.py, interpret mode on CPU) against BOTH the XLA
branchless scan (dsp/detect_fast.py — same creation budget, so the two
must be table-identical) and the exact per-frame oracle twin
(dsp/detect.py). Mirrors test_detect_fast.py's scenarios; the
--scan xla|pallas CLI seam provides the on-hardware A/B
(reference analogue: --no-simd, ARCHITECTURE.md:638)."""

import numpy as np

from iridium_tpu.dsp import detect, detect_fast, detect_pallas

from test_detect import OracleDetector, small_params, tone_capture
from test_detect_fast import check_same, run_impl


def make_pallas(p):
    return detect_pallas.make_detect_block_pallas(p, interpret=True)


def run_pallas(p, samples, n_blocks=1):
    """run_impl for the pallas impl (FastState init)."""
    import jax
    import jax.numpy as jnp
    det = make_pallas(p)
    state = detect_fast.init_state(p)
    out = []
    base = 0
    for k in range(n_blocks):
        block = samples[k * p.block_samples:(k + 1) * p.block_samples]
        state = det(jnp.asarray(block), state, jnp.int32(len(block)))
        from test_detect_fast import gone_sorted
        for g in gone_sorted(state):
            g["start"] += base
            g["stop"] += base
            g["last"] += base
            out.append(g)
        state = detect.rebase_state(state, p.block_samples)
        base += p.block_samples
    return sorted(out, key=lambda r: r["id"]), state


def test_supports_production_shape():
    from iridium_tpu.config import DetectorConfig
    p = DetectorConfig(frames_per_block=2048).derived()
    assert detect_pallas.supports(p)
    assert detect_pallas.supports(small_params())


def test_pallas_matches_fast_multi_burst():
    p = small_params()
    events = [
        (0.08, 0.010, 100_000.0, 0.05),
        (0.085, 0.030, -200_000.0, 0.08),
        (0.12, 0.008, 300_000.0, 0.04),
        (0.13, 0.015, 99_000.0, 0.06),
    ]
    x = tone_capture(p, events)
    want, _ = run_impl(p, x, detect_fast.make_detect_block_fast)
    got, _ = run_pallas(p, x)
    assert len(got) == 4
    check_same(got, want)


def test_pallas_matches_fast_multiblock_carry():
    p = small_params()
    events = [
        (0.10, 0.02, 150_000.0, 0.05),
        (0.255, 0.02, -150_000.0, 0.05),   # straddles block boundary
        (0.30, 0.01, 250_000.0, 0.05),
    ]
    x = tone_capture(p, events, n_blocks=2)
    want, _ = run_impl(p, x, detect_fast.make_detect_block_fast,
                       n_blocks=2)
    got, _ = run_pallas(p, x, n_blocks=2)
    assert len(got) == 3
    check_same(got, want)


def test_pallas_matches_oracle_long_burst():
    p = small_params()
    x = tone_capture(p, [(0.08, 0.15, 50_000.0, 0.05)])
    want_det = OracleDetector(p)
    want_det.feed(x)
    got, _ = run_pallas(p, x)
    oracle = sorted(
        (dict(id=b["id"], start=b["start"], stop=b["stop"],
              last=b["last"], bin=b["bin"], mag=float(b["mag"]),
              noise=float(b["noise"])) for b in want_det.gone),
        key=lambda r: r["id"])
    check_same(got, oracle)


def test_pallas_squelch():
    p = small_params(max_bursts=4, max_new_per_frame=4)
    n = p.block_samples
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64) * np.float32(0.01 / np.sqrt(2))
    i0 = int(0.1 * p.sample_rate)
    x[i0:i0 + 20000] += (0.5 * (rng.standard_normal(20000)
                                + 1j * rng.standard_normal(20000))
                         ).astype(np.complex64)
    want, _ = run_impl(p, x, detect_fast.make_detect_block_fast)
    got, _ = run_pallas(p, x)
    check_same(got, want)


def test_pallas_squelch_overflow_drop_accounting():
    """Same blast scenario as the fast impl's: >E_SQ squelch emissions
    in one frame drop but stay counted in n_tagged AND in the (now
    surfaced) burst_dropped counter."""
    p = small_params(max_bursts=20, max_new_per_frame=8,
                     burst_capacity=64)
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
    got, st = run_pallas(p, x)
    n_tagged = int(st.n_tagged)
    n_emitted = len(got)
    assert n_tagged - n_emitted >= 4, (n_tagged, n_emitted)
    assert int(st.burst_dropped) >= 4
    assert n_emitted >= 16
    from collections import Counter
    stops = Counter(g["stop"] for g in got)
    assert max(stops.values()) >= 16


def test_pallas_mass_deletion_mask_release():
    p = small_params(max_new_per_frame=8, burst_capacity=64)
    n_tones = 12
    freqs = [-300_000.0 + i * 52_000.0 for i in range(n_tones)]
    freqs = [f if abs(f) > 8_000 else f + 26_000.0 for f in freqs]
    wave1 = [(0.10 + 0.002 * i, 0.160 - (0.10 + 0.002 * i), f, 0.06)
             for i, f in enumerate(freqs)]
    wave2 = [(0.22 + 0.002 * i, 0.020, f, 0.06)
             for i, f in enumerate(freqs)]
    x = tone_capture(p, wave1 + wave2, n_blocks=2)
    got, st = run_pallas(p, x, n_blocks=2)
    w1_end = int(0.165 * p.sample_rate)
    wave2_rows = [g for g in got if g["start"] > w1_end]
    assert len(wave2_rows) >= n_tones


def test_pallas_eof_partial_block():
    """A final block with n_valid < block_samples: frames past the
    valid region must not mutate state, and the partial-block tables
    must equal the XLA scan's."""
    import jax
    import jax.numpy as jnp
    p = small_params()
    events = [(0.08, 0.010, 100_000.0, 0.05),
              (0.12, 0.015, -200_000.0, 0.06)]
    x = tone_capture(p, events)
    n_valid = int(0.60 * p.block_samples)
    pad = np.zeros(p.block_samples - n_valid, np.complex64)
    xb = np.concatenate([x[:n_valid], pad])

    det_f = jax.jit(detect_fast.make_detect_block_fast(p))
    st_f = det_f(jnp.asarray(xb), detect_fast.init_state(p),
                 jnp.int32(n_valid))
    det_p = make_pallas(p)
    st_p = det_p(jnp.asarray(xb), detect_fast.init_state(p),
                 jnp.int32(n_valid))
    from test_detect_fast import gone_sorted
    check_same(gone_sorted(st_p), gone_sorted(st_f))
    assert int(st_p.g_count) >= 1
    np.testing.assert_allclose(np.asarray(st_p.baseline_sum),
                               np.asarray(st_f.baseline_sum),
                               rtol=1e-6)
    assert int(st_p.primed) == int(st_f.primed)


def test_pallas_state_interchangeable_with_fast():
    """A stream can switch implementations mid-run: block 1 through the
    pallas kernel, block 2 through the XLA scan (states share the
    FastState contract; hist_idx canonicalisation is absorbed by the
    ring formulation)."""
    import jax.numpy as jnp
    p = small_params()
    events = [
        (0.10, 0.02, 150_000.0, 0.05),
        (0.255, 0.02, -150_000.0, 0.05),
        (0.30, 0.01, 250_000.0, 0.05),
    ]
    x = tone_capture(p, events, n_blocks=2)
    want, _ = run_impl(p, x, detect_fast.make_detect_block_fast,
                       n_blocks=2)

    det_p = make_pallas(p)
    det_f = detect_fast.make_detect_block_fast(p)
    from test_detect_fast import gone_sorted
    state = detect_fast.init_state(p)
    out = []
    base = 0
    for k, det in enumerate([det_p, det_f]):
        block = x[k * p.block_samples:(k + 1) * p.block_samples]
        state = det(jnp.asarray(block), state, jnp.int32(len(block)))
        for g in gone_sorted(state):
            g["start"] += base
            g["stop"] += base
            g["last"] += base
            out.append(g)
        state = detect.rebase_state(state, p.block_samples)
        base += p.block_samples
    got = sorted(out, key=lambda r: r["id"])
    assert len(got) == 3
    check_same(got, want)
