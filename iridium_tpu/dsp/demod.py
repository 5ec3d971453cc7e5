"""Batched DQPSK demodulator: Gardner timing recovery + 1st-order PLL +
hard/soft UW verification + differential decode, as fixed-length masked
`lax.scan`s vectorized over the burst batch.

Behavior parity sources (reference file:line):
  - Catmull-Rom cubic interpolation:  qpsk_demod.c:56-81
  - Gardner TED loop (Kp=0.02,
    Ki=0.0002, +-0.5 clamps):         qpsk_demod.c:85-130
  - simple strided decimation:        qpsk_demod.c:134-141
  - 1st-order PLL alpha=0.2:          qpsk_demod.c:145-195
  - hard decision + confidence +
    end-of-frame magnitude drop:      qpsk_demod.c:199-260
  - DQPSK map {0,2,3,1}:              qpsk_demod.c:264-273
  - UW hard check (Hamming<=2 with
    3->1 wraparound):                 qpsk_demod.c:277-293
  - soft angular UW check (<=3.0):    qpsk_demod.c:297-325
  - bits + per-bit LLR:               qpsk_demod.c:329-335, 489-503
  - PLL residual CFO refinement:      qpsk_demod.c:521-527

The reference runs these per burst on one thread; here every step is
vectorized over the batch, and the two genuinely sequential loops
(Gardner position tracking, PLL phase tracking) are `lax.scan`s whose
carries are (batch,)-shaped — one compiled program demodulates the whole
batch in lockstep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import iridium

PLL_ALPHA = 0.2
SQRT1_2 = 0.70710678118654752
CONFIDENCE_ANGLE = 22.0
MAGNITUDE_DROP = 8.0
MAX_LOW_COUNT = 3
UW_MAX_ERRORS = 2
UW_SOFT_THRESHOLD = 3.0
GARDNER_KP = 0.02
GARDNER_KI = 0.0002

DQPSK_MAP = np.array([0, 2, 3, 1], dtype=np.int32)

DIR_DL = 0
DIR_UL = 1


class DemodOut(NamedTuple):
    ok: jax.Array            # (B,) bool — UW verified
    direction: jax.Array     # (B,) i32 final direction
    n_symbols: jax.Array     # (B,) i32 actual symbols (after EOF trim)
    confidence: jax.Array    # (B,) i32 percent
    level: jax.Array         # (B,) f32 mean magnitude
    total_phase: jax.Array   # (B,) f32 summed PLL corrections (for CFO)
    bits: jax.Array          # (B, 2*S) int32
    llr: jax.Array           # (B, 2*S) f32


def _cubic4(x, pos, n_samp):
    """Catmull-Rom interpolation with the reference's clamping: mu keeps
    the pre-clamp fraction (qpsk_demod.c:56-81)."""
    idx0 = pos.astype(jnp.int32)
    mu = pos - idx0.astype(jnp.float32)
    idx = jnp.clip(idx0, 1, n_samp - 3)
    w = jax.lax.dynamic_slice(x, (idx - 1,), (4,))
    s0, s1, s2, s3 = w[0], w[1], w[2], w[3]
    mu2 = mu * mu
    mu3 = mu2 * mu
    a = -0.5 * s0 + 1.5 * s1 - 1.5 * s2 + 0.5 * s3
    b = s0 - 2.5 * s1 + 2.0 * s2 - 0.5 * s3
    cc = -0.5 * s0 + 0.5 * s2
    return a * mu3 + b * mu2 + cc * mu + s1


def make_demod(max_symbols: int, sps: float, use_gardner: bool = True,
               gather_mode: str = "auto"):
    """Build demod(x, n_samples, direction) for a (L,) burst; vmap over B.

    gather_mode:
      "window" — the Gardner/PLL scan reads its samples from STATIC
        per-symbol windows streamed through the scan's xs (no dynamic
        memory indexing: a dynamic-address op costs ~20-40 us on this
        TPU runtime, and the reference loop needs 4 per symbol). The
        window provably covers every reachable position: the timing
        adjustment is clamped to +-0.5/symbol (qpsk_demod.c:120), so
        |pos_t - t*sps| <= 0.5 t <= S/2. Bit-exact for every VALID
        symbol; symbols past end-of-burst (whose outputs are masked
        everywhere downstream) read zeros instead of clamped samples.
      "gather" — per-symbol dynamic_slice (the reference-shaped code).
      "auto" — "window" when sps is an integer, else "gather".
    """
    S = max_symbols
    uw_dl = np.array(iridium.UW_DL, np.int32)
    uw_ul = np.array(iridium.UW_UL, np.int32)
    dqpsk_map = DQPSK_MAP
    iota_s = np.arange(S, dtype=np.int32)
    isps = int(round(sps))
    if gather_mode == "auto":
        gather_mode = "window" if abs(sps - isps) < 1e-9 else "gather"

    # window geometry: window t covers x[t*isps - LEFT, t*isps - LEFT + WW)
    LEFT = S // 2 + 12
    _r_cnt = (LEFT + S // 2 + 2 * isps + 8) // isps + 1
    WW = _r_cnt * isps
    iota_w = np.arange(WW, dtype=np.int32)

    def _pll_update(phi, total, sym, v):
        """One PLL step (qpsk_demod.c:145-195) on the in-flight symbol."""
        out = sym * phi
        re, im = out.real, out.imag
        s = np.float32(SQRT1_2)
        xh = jnp.where(
            (re >= 0) & (im >= 0), jax.lax.complex(s, s),
            jnp.where(re >= 0, jax.lax.complex(s, -s),
                      jnp.where(im < 0, jax.lax.complex(-s, -s),
                                jax.lax.complex(-s, s))))
        er = jnp.conj(xh) * out
        er_mag = jnp.abs(er)
        skip = er_mag < 1e-10
        ang = jnp.arctan2(er.imag, er.real)
        sc = PLL_ALPHA * ang
        corr = jax.lax.complex(jnp.cos(sc), jnp.sin(sc))
        phi2 = jnp.conj(corr) * phi
        pm = jnp.abs(phi2)
        phi2 = jnp.where(pm > 0, phi2 / pm, phi2)
        upd = v & ~skip
        return (jnp.where(upd, phi2, phi),
                jnp.where(upd, total + sc, total), out)

    # Gardner + PLL run as ONE fused scan: the PLL consumes symbols in
    # production order, so fusing its update into the Gardner body is
    # mathematically identical to the reference's two sequential loops
    # (decimate_gardner then qpsk_pll, qpsk_demod.c:85-195) but halves
    # the number of sequential scan steps — the dominant fixed cost of a
    # burst batch on TPU is these tiny-vector sequential steps, not FLOPs.

    def gardner_pll(x, n_samp):
        nf = n_samp.astype(jnp.float32)

        def body(carry, t):
            pos, tmo, prev, done, phi, total = carry
            active = (~done) & (pos < nf - 3)
            done = done | ~active
            on = _cubic4(x, pos, n_samp)
            midpos = pos - sps * 0.5
            mid = _cubic4(x, midpos, n_samp)
            do_mid = (t > 0) & (midpos >= 1.0)
            diff = prev - on
            err = jnp.clip((diff * jnp.conj(mid)).real, -1.0, 1.0)
            tmo2 = jnp.where(do_mid, tmo + GARDNER_KI * err, tmo)
            adjust = jnp.clip(GARDNER_KP * err + tmo2, -0.5, 0.5)
            pos2 = jnp.where(do_mid, pos + adjust, pos)
            phi2, total2, out = _pll_update(phi, total, on, active)
            new = (jnp.where(active, pos2 + sps, pos),
                   jnp.where(active, tmo2, tmo),
                   jnp.where(active, on, prev),
                   done, phi2, total2)
            return new, (out, active)

        init = (np.float32(0.0), np.float32(0.0), np.complex64(0.0),
                np.bool_(False), np.complex64(1.0), np.float32(0.0))
        # unroll: the per-symbol body is a handful of VPU ops; unrolling
        # amortizes the compiled while-loop overhead over 8 symbols
        (_, _, _, _, _, total), (out, valid) = jax.lax.scan(
            body, init, iota_s, unroll=8)
        return out, valid, total

    def _w4(win_t, base, pos, n_samp):
        """Catmull-Rom taps read from the static window (bit-equal to
        _cubic4 whenever the clamped index lies inside the window, which
        covers every position reachable by a still-active symbol)."""
        idx0 = pos.astype(jnp.int32)
        mu = pos - idx0.astype(jnp.float32)
        idx = jnp.clip(idx0, 1, n_samp - 3)
        rel = idx - 1 - base

        def pick(d):
            return jnp.sum(jnp.where(iota_w == rel + d, win_t, 0))

        s0, s1, s2, s3 = pick(0), pick(1), pick(2), pick(3)
        mu2 = mu * mu
        mu3 = mu2 * mu
        a = -0.5 * s0 + 1.5 * s1 - 1.5 * s2 + 0.5 * s3
        b = s0 - 2.5 * s1 + 2.0 * s2 - 0.5 * s3
        cc = -0.5 * s0 + 0.5 * s2
        return a * mu3 + b * mu2 + cc * mu + s1

    def gardner_pll_win(x, n_samp):
        """gardner_pll with all sample reads from static windows (see
        make_demod docstring)."""
        nf = n_samp.astype(jnp.float32)
        L = x.shape[0]
        total = (S - 1 + _r_cnt) * isps
        xpad = jnp.pad(x, (LEFT, max(total - LEFT - L, 0)))[:total]
        A = xpad.reshape(S - 1 + _r_cnt, isps)
        win = jnp.concatenate([A[r:r + S] for r in range(_r_cnt)],
                              axis=1)            # (S, WW)

        def body(carry, inp):
            t, win_t = inp
            pos, tmo, prev, done, phi, total = carry
            base = t * isps - LEFT
            active = (~done) & (pos < nf - 3)
            done = done | ~active
            on = _w4(win_t, base, pos, n_samp)
            midpos = pos - sps * 0.5
            mid = _w4(win_t, base, midpos, n_samp)
            do_mid = (t > 0) & (midpos >= 1.0)
            diff = prev - on
            err = jnp.clip((diff * jnp.conj(mid)).real, -1.0, 1.0)
            tmo2 = jnp.where(do_mid, tmo + GARDNER_KI * err, tmo)
            adjust = jnp.clip(GARDNER_KP * err + tmo2, -0.5, 0.5)
            pos2 = jnp.where(do_mid, pos + adjust, pos)
            phi2, total2, out = _pll_update(phi, total, on, active)
            new = (jnp.where(active, pos2 + sps, pos),
                   jnp.where(active, tmo2, tmo),
                   jnp.where(active, on, prev),
                   done, phi2, total2)
            return new, (out, active)

        init = (np.float32(0.0), np.float32(0.0), np.complex64(0.0),
                np.bool_(False), np.complex64(1.0), np.float32(0.0))
        (_, _, _, _, _, total), (out, valid) = jax.lax.scan(
            body, init, (iota_s, win), unroll=8)
        return out, valid, total

    def simple(x, n_samp):
        isps = int(round(sps))
        idx = iota_s * isps
        valid = idx < n_samp
        return x[jnp.clip(idx, 0, x.shape[0] - 1)], valid

    def pll_only(syms, valid):
        def body(carry, inp):
            phi, total = carry
            sym, v = inp
            phi2, total2, out = _pll_update(phi, total, sym, v)
            return (phi2, total2), out

        init = (np.complex64(1.0), np.float32(0.0))
        (_, total), out = jax.lax.scan(body, init, (syms, valid), unroll=8)
        return out, total

    def demod(x, n_samples, direction):
        if use_gardner and gather_mode == "window":
            pll_out, valid, total_phase = gardner_pll_win(x, n_samples)
        elif use_gardner:
            pll_out, valid, total_phase = gardner_pll(x, n_samples)
        else:
            syms, valid = simple(x, n_samples)
            pll_out, total_phase = pll_only(syms, valid)
        n_sym = jnp.sum(valid.astype(jnp.int32))

        # --- demod_qpsk: hard decisions, EOF detect, confidence ---
        re, im = pll_out.real, pll_out.imag
        mags = jnp.abs(pll_out)
        hard = jnp.where(
            (re >= 0) & (im >= 0), 0,
            jnp.where((re < 0) & (im >= 0), 1,
                      jnp.where(re < 0, 2, 3))).astype(jnp.int32)
        mags_m = jnp.where(valid, mags, -jnp.inf)
        cmax = jax.lax.associative_scan(jnp.maximum, mags_m)
        low = valid & (mags < cmax / MAGNITUDE_DROP)
        low1 = jnp.concatenate([np.zeros(1, bool), low[:-1]])
        low2 = jnp.concatenate([np.zeros(2, bool), low[:-2]])
        trip = low & low1 & low2
        any_trip = jnp.any(trip)
        first_trip = jnp.argmax(trip).astype(jnp.int32)
        actual = jnp.where(any_trip, first_trip + 1 - MAX_LOW_COUNT, n_sym)
        amask = iota_s < actual

        phase = (jnp.arctan2(im, re) + np.pi) * (180.0 / np.pi)
        offsets = 45.0 - jnp.mod(phase, 90.0)
        n_ok = jnp.sum((amask & (jnp.abs(offsets) <= CONFIDENCE_ANGLE))
                       .astype(jnp.int32))
        safe_n = jnp.maximum(actual, 1)
        level = jnp.where(actual > 0,
                          jnp.sum(jnp.where(amask, mags, 0.0)) / safe_n, 0.0)
        confidence = jnp.where(actual > 0, (100 * n_ok) // safe_n, 0)

        # --- UW checks ---
        uw_syms = hard[:iridium.UW_LENGTH]

        def hard_check(uw):
            d = jnp.abs(uw_syms - uw)
            d = jnp.where(d == 3, 1, d)
            return (actual >= iridium.UW_LENGTH) & (jnp.sum(d) <= UW_MAX_ERRORS)

        def soft_check(uw):
            expected = np.pi * 0.25 + uw.astype(jnp.float32) * (np.pi * 0.5)
            a = jnp.arctan2(im[:iridium.UW_LENGTH], re[:iridium.UW_LENGTH])
            a = jnp.where(a < 0, a + 2 * np.pi, a)
            d = a - expected
            d = jnp.where(d > np.pi, d - 2 * np.pi, d)
            d = jnp.where(d < -np.pi, d + 2 * np.pi, d)
            err = jnp.sum(jnp.abs(d)) * (2.0 / np.pi)
            return jnp.where(actual >= iridium.UW_LENGTH, err, 999.0)

        dl_ok = hard_check(uw_dl)
        ul_ok = hard_check(uw_ul)
        both_fail = ~dl_ok & ~ul_ok
        dl_err = soft_check(uw_dl)
        ul_err = soft_check(uw_ul)
        min_err = jnp.minimum(dl_err, ul_err)
        ok = ~both_fail | (min_err <= UW_SOFT_THRESHOLD)
        direction = jnp.where(
            both_fail,
            jnp.where(ul_err < dl_err, DIR_UL, DIR_DL),
            jnp.where(ul_ok & ~dl_ok, DIR_UL,
                      jnp.where(dl_ok & ~ul_ok, DIR_DL, direction)))

        # --- DQPSK differential decode + bits ---
        prev = jnp.concatenate([np.zeros(1, np.int32), hard[:-1]])
        d4 = jnp.mod(hard - prev, 4)
        # dqpsk_map {0:0,1:2,2:3,3:1} as a where-chain (no table
        # gather: a constant-table gather would eager-allocate
        # on device during tracing)
        dec = jnp.where(d4 == 0, 0,
                        jnp.where(d4 == 1, 2,
                                  jnp.where(d4 == 2, 3, 1)))
        bits = jnp.stack([(dec >> 1) & 1, dec & 1], axis=-1).reshape(-1)
        bmask = np.arange(2 * S) < 2 * actual
        # int32, not uint8: the axon backend can only transfer
        # f32/i32 buffers to the host
        bits = jnp.where(bmask, bits, 0).astype(jnp.int32)

        # --- LLR ---
        sum_mag = jnp.sum(jnp.where(amask, mags, 0.0))
        scale = jnp.where((actual > 0) & (sum_mag > 0),
                          SQRT1_2 / (sum_mag / safe_n), 1.0)
        llr = jnp.stack([jnp.abs(re), jnp.abs(im)], axis=-1).reshape(-1) * scale
        llr = jnp.where(bmask, llr, 0.0)

        return DemodOut(ok=ok,
                        direction=direction.astype(jnp.int32),
                        n_symbols=actual,
                        confidence=confidence.astype(jnp.int32),
                        level=level.astype(jnp.float32),
                        total_phase=total_phase,
                        bits=bits, llr=llr)

    return demod
