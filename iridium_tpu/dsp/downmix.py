"""Batched per-burst downmix chain (device, vmap-able).

TPU-first re-derivation of the reference `burst_downmix.c`: the reference
runs 4 worker threads each processing one burst at a time with FFTW plans
and SIMD FIRs; here the whole chain runs as one jitted program over a
fixed-size *batch* of bursts (the worker pool becomes a batch dimension),
with FIRs as strided XLA convolutions (MXU) and FFTs batched.

Behavior parity sources (reference file:line):
  - sync word templates:        burst_downmix.c:138-219
  - coarse CFO rotate:          burst_downmix.c:663-672 (+ rotator.h:36-46)
  - decimating anti-alias FIR:  burst_downmix.c:417-437 (250-499: tap design
                                at fixed 10 MHz design rate)
  - noise-limiting LPF (same):  burst_downmix.c:682-698
  - burst start detect:         burst_downmix.c:441-478
  - fine CFO (squared FFT x16
    oversample + quad interp):  burst_downmix.c:482-535
  - RRC matched filter:         burst_downmix.c:723-734
  - FFT sync correlation:       burst_downmix.c:539-639
  - phase align + extraction:   burst_downmix.c:749-793

All comparisons/aggregations are masked by the burst's true lengths so a
zero-padded fixed-shape batch reproduces the variable-length reference
behavior.

Exactness notes: the coarse CFO phase ramp uses exact integer phase
arithmetic ((k*n) mod fft_size) instead of the reference's incrementally
renormalized rotator, and the fine CFO ramp splits the frequency into an
integer FFT-bin part (exact int mod) plus a fractional correction, so
float32 phase accuracy holds over million-sample bursts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import iridium
from ..config import DetectorParams, DownmixParams
from ..ops import filters, windows

RRC_NTAPS = 51
RC_NTAPS = 51
RRC_ALPHA = 0.4
START_THRESHOLD = 0.45
DIR_DL = 0
DIR_UL = 1


class DownmixConsts(NamedTuple):
    """Host-precomputed numpy constants for the downmix chain."""
    input_taps: np.ndarray      # (801,) f32 anti-alias decimation FIR
    noise_taps: np.ndarray      # (25,) f32
    box_taps: np.ndarray        # (20,) f32
    rrc_taps: np.ndarray        # (51,) f32
    cfo_window: np.ndarray      # (cfo_fft_size,) f32 Blackman
    dl_sync_fft: np.ndarray     # (corr_fft,) c64
    ul_sync_fft: np.ndarray     # (corr_fft,) c64
    dl_sync_len: int
    ul_sync_len: int


def generate_sync_word(dmp: DownmixParams, uw, preamble_len: int,
                       is_uplink: bool, rc: np.ndarray):
    """Correlation template: preamble+UW symbols, upsampled, RC-shaped,
    reversed+conjugated, FFT'd (reference burst_downmix.c:138-219)."""
    s0 = np.complex64(1 + 1j)
    s1 = np.complex64(-1 - 1j)
    if is_uplink:
        pre = [s1 if i % 2 == 0 else s0 for i in range(preamble_len)]
    else:
        pre = [s0] * preamble_len
    symbols = np.array(pre + [s0 if u == 0 else s1 for u in uw],
                       dtype=np.complex64)
    isps = int(round(dmp.samples_per_symbol))
    padded_len = len(symbols) * isps - (isps - 1)
    padded = np.zeros(padded_len, np.complex64)
    padded[::isps] = symbols
    half = (len(rc) - 1) // 2
    buf = np.concatenate([np.zeros(half, np.complex64), padded,
                          np.zeros(len(rc) - 1 - half, np.complex64)])
    # fir_filter_ccf is a correlation: out[i] = sum_k taps[k] * in[i+k]
    shaped = (np.correlate(buf.real, rc, mode="valid")
              + 1j * np.correlate(buf.imag, rc, mode="valid")
              ).astype(np.complex64)
    template = np.conj(shaped[::-1])
    padded_fft = np.zeros(dmp.corr_fft_size, np.complex64)
    padded_fft[:padded_len] = template
    return np.fft.fft(padded_fft).astype(np.complex64), padded_len


def make_consts(dmp: DownmixParams) -> DownmixConsts:
    out_rate = float(dmp.output_sample_rate)
    # Input anti-alias filter designed at a FIXED 10 MHz rate regardless of
    # the true input rate (reference burst_downmix.c:250-261)
    input_taps = filters.lpf_taps(1.0, 10_000_000.0, out_rate * 0.4,
                                  out_rate * 0.2)
    noise_taps = filters.lpf_taps(1.0, out_rate, 40_000.0 / 2.0, 40_000.0)
    box_len = max(int(dmp.samples_per_symbol * 2), 3)
    box = filters.box_taps(box_len)
    rrc = filters.rrc_taps(1.0, out_rate, iridium.SYMBOLS_PER_SECOND,
                           RRC_ALPHA, RRC_NTAPS)
    rc = filters.rc_taps(out_rate, iridium.SYMBOLS_PER_SECOND,
                         RRC_ALPHA, RC_NTAPS)
    cfo_win = windows.blackman(dmp.cfo_fft_size)
    dl_fft, dl_len = generate_sync_word(
        dmp, iridium.UW_DL, iridium.PREAMBLE_LENGTH_SHORT, False, rc)
    ul_fft, ul_len = generate_sync_word(
        dmp, iridium.UW_UL, iridium.PREAMBLE_LENGTH_SHORT, True, rc)
    return DownmixConsts(input_taps, noise_taps, box, rrc, cfo_win,
                         dl_fft, ul_fft, dl_len, ul_len)


def _fir_valid_c(x: jax.Array, taps: jax.Array, stride: int = 1) -> jax.Array:
    """Valid-mode correlation FIR on complex input via two real strided
    convolutions (maps onto the MXU): out[i] = sum_k taps[k]*x[i*stride+k]."""
    lhs = jnp.stack([x.real, x.imag])[:, None, :]          # (2, 1, L)
    rhs = taps[None, None, :]                               # (1, 1, T)
    # HIGH (bf16x3): without a precision request the TPU conv rounds
    # operands to plain bf16 (seen as bf16 operand copies in profiler
    # traces) — too coarse for the noise/RRC filters feeding bit-level
    # demod decisions; bf16x3 restores ~f32-grade error at 3 passes
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        precision=jax.lax.Precision.HIGH)
    return jax.lax.complex(out[0, 0], out[1, 0])


def _fir_valid_small(x: jax.Array, taps) -> jax.Array:
    """Small-tap valid FIR as STATIC SHIFTED ADDS in f32.

    Why not a conv: XLA lays the vmapped (B, 1, L) TPU conv out with
    1-sublane T(1,128) tiles — 8x VPU waste, measured ~11 ms per dense
    group for the 25/20-tap filters alone (round-5 trace). The unrolled
    slice-multiply-accumulate fuses into ordinary (8,128)-tiled
    elementwise kernels, and the SEQUENTIAL f32 accumulation matches
    the reference's scalar FIR loop ordering (fir_filter.c) more
    closely than the conv's bf16x3 emulation did. Works on complex
    input directly (real taps)."""
    t = np.asarray(taps, np.float32)
    n_out = x.shape[-1] - len(t) + 1
    acc = None
    for k, c in enumerate(t.tolist()):
        term = np.float32(c) * x[..., k:k + n_out]
        acc = term if acc is None else acc + term
    return acc


_SMALL_FIR_MAX = 64


def _fir_same_c(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Centered same-length correlation FIR (reference pads with zeros and
    runs valid: burst_downmix.c:686-693)."""
    t = taps.shape[0]
    half = (t - 1) // 2
    xp = jnp.pad(x, (half, t - 1 - half))
    if t <= _SMALL_FIR_MAX:
        return _fir_valid_small(xp, np.asarray(taps))
    return _fir_valid_c(xp, taps)


def _fir_valid_f(x: jax.Array, taps: jax.Array) -> jax.Array:
    if taps.shape[0] <= _SMALL_FIR_MAX:
        return _fir_valid_small(x, np.asarray(taps))
    lhs = x[None, None, :]
    rhs = taps[None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        precision=jax.lax.Precision.HIGH)
    return out[0, 0]


def _shift_take(x: jax.Array, start: jax.Array, out_len: int) -> jax.Array:
    """out[i] = x[start + i] for i < out_len (x already padded so that
    start + out_len <= len(x)), WITHOUT a dynamic-address memory op — a
    dynamic_slice costs ~20-40 us through this TPU runtime regardless of
    size, and the burst chain needs several per burst.

    Two exact branchless levels over 128-lane rows:
      coarse: select rows q..q+nbo of x.reshape(-1, 128)  (q = start//128)
      fine:   rotate by r = start%128 using row pairs
    Both are ONE-HOT i32 MATMULS on the bitcast planes: each output
    element is the product of exactly one input word and a 1, summed
    with zeros — bit-exact, and the MXU runs it an order of magnitude
    faster than the equivalent VPU where-masked sum (the round-3
    formulation, which dominated the burst-job profile)."""
    r = start % 128
    q = start // 128
    nb = x.shape[0] // 128
    # complex -> (nb, 128, 2) i32 word planes
    W = jax.lax.bitcast_convert_type(
        jnp.stack([x.real, x.imag], axis=-1), jnp.int32)
    A = W[: nb * 128 * 2].reshape(nb, 128, 2) \
        if W.ndim == 1 else W[:nb * 128].reshape(nb, 128, 2)
    nbo = out_len // 128 + 2      # fine stage consumes row PAIRS
    # coarse row select: C[ro] = A[q + ro] via (nbo, nb) one-hot matmul
    iota_nb = jax.lax.iota(jnp.int32, nb)
    sel = (iota_nb[None, :]
           == (q + jax.lax.iota(jnp.int32, nbo)[:, None])).astype(jnp.int32)
    C = jax.lax.dot_general(
        sel, A.reshape(nb, 256),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(nbo, 128, 2)
    # fine rotate: out[u, v] = concat(C[u], C[u+1])[v + r] via a
    # (256, 128) one-hot matmul shared by all rows
    F2 = jnp.concatenate([C[:-1], C[1:]], axis=1)    # (nbo-1, 256, 2)
    iota256 = jax.lax.iota(jnp.int32, 256)
    pick = (iota256[:, None]
            == (r + jax.lax.iota(jnp.int32, 128)[None, :])
            ).astype(jnp.int32)                       # (256, 128)
    out = jax.lax.dot_general(
        F2.transpose(0, 2, 1).reshape(-1, 256), pick,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (2*(nbo-1), 128)
    out = out.reshape(nbo - 1, 2, 128).transpose(0, 2, 1)
    planes = jax.lax.bitcast_convert_type(
        out.reshape(-1, 2)[:out_len], jnp.float32)
    return jax.lax.complex(planes[:, 0], planes[:, 1])


def _pick1(vec: jax.Array, idx: jax.Array):
    """vec[idx] without a dynamic-address op (branchless mask-sum)."""
    n = vec.shape[0]
    return jnp.sum(jnp.where(jax.lax.iota(jnp.int32, n) == idx, vec, 0))


def _quad_interp(alpha, beta, gamma):
    """Three-point quadratic peak interpolation with the reference's
    denominator guard (burst_downmix.c:526-528)."""
    denom = alpha - 2.0 * beta + gamma
    return jnp.where(jnp.abs(denom) > 1e-10,
                     0.5 * (alpha - gamma) / denom, 0.0)


class DownmixOut(NamedTuple):
    samples: jax.Array        # (max_frame_cap,) c64 from uw_start
    n_samples: jax.Array      # i32 extract length
    ok: jax.Array             # bool
    direction: jax.Array      # i32 (0=DL, 1=UL)
    start_dec: jax.Array      # i32 decimated-domain start (for timestamp)
    fine_offset: jax.Array    # f32 fractional CFO (of output rate)
    uw_corr: jax.Array        # f32 sub-sample UW start correction


def make_downmix_one(det: DetectorParams, dmp: DownmixParams,
                     l_ext: int, max_frame_cap: int,
                     dec_cap: int | None = None,
                     fir_mode: str = "mxu"):
    """Build the single-burst downmix function (vmap over the batch dim).

    Args of the returned fn:
      x:        (l_ext,) complex64 — extracted burst window (zero-padded)
      ext_len:  i32 true number of valid samples in x
      center_bin: i32 detector FFT bin (fftshifted)

    `dec_cap` caps the decimated-domain length; the default (from dmp)
    covers the longest legal burst. Smaller window variants (the
    pipeline's short-burst bucket) pass a proportionally smaller cap.

    `fir_mode` selects the rotate+decimate implementation: "mxu"
    (polyphase-matmul production path) or "conv" (the strided-conv
    verification reference — the analogue of the reference's
    --no-simd/--no-gpu switches, ARCHITECTURE.md:638).
    """
    c = make_consts(dmp)
    F = det.fft_size
    in_rate = det.sample_rate
    decim = dmp.decimation
    in_ntaps = len(c.input_taps)
    noise_ntaps = len(c.noise_taps)
    box_ntaps = len(c.box_taps)
    box_half = (box_ntaps - 1) // 2
    cfo_n = dmp.cfo_fft_size
    cfo_total = dmp.cfo_fft_total
    corr_n = dmp.corr_fft_size
    search_cap = dmp.sync_search_len
    if dec_cap is None:
        dec_cap = dmp.dec_cap
    assert dec_cap >= max(cfo_n, search_cap, 128)
    # conv output length must cover dec_cap
    n_conv = (l_ext - in_ntaps) // decim + 1
    assert n_conv >= dec_cap, (n_conv, dec_cap)

    # numpy closure constants: embedded at lowering without any
    # device->host copies (the axon backend cannot download constants)
    input_taps = np.asarray(c.input_taps)
    noise_taps = np.asarray(c.noise_taps)
    box_t = np.asarray(c.box_taps)
    rrc_t = np.asarray(c.rrc_taps)
    cfo_win = np.asarray(c.cfo_window)
    dl_fft = np.asarray(c.dl_sync_fft)
    ul_fft = np.asarray(c.ul_sync_fft)

    nm_ext = (np.arange(l_ext, dtype=np.int64) % F).astype(np.int32)
    iota_dec = np.arange(dec_cap, dtype=np.int32)
    iota_cfo = np.arange(cfo_n, dtype=np.int32)
    iota_corr = np.arange(corr_n, dtype=np.int32)
    iota_search = np.arange(search_cap, dtype=np.int32)

    sps = float(dmp.samples_per_symbol)
    dl_pre_off = int(iridium.PREAMBLE_LENGTH_SHORT * sps)
    ul_pre_off = int(32 * sps)

    def rotate_decimate_xla(x, k):
        """Steps 1+2 (conv path): exact integer-phase coarse CFO rotate +
        valid strided decimating FIR (burst_downmix.c:663-679)."""
        m = jnp.mod(k * nm_ext, F)
        ang = (-2.0 * np.pi / F) * m.astype(jnp.float32)
        x = x * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        return _fir_valid_c(x, input_taps, stride=decim)[:dec_cap]

    # ---- MXU path: periodic-ramp rotate + polyphase-matmul FIR ----
    #
    # Same math as rotate_decimate_xla, restructured for the hardware:
    #
    # 1. The coarse-CFO ramp exp(-2*pi*i*(k*n mod F)/F) is EXACTLY
    #    periodic in n with period F, so one (B, F) table of cos/sin
    #    broadcast-multiplies the signal viewed as (B, ceil(L/F), F) —
    #    O(B*F) transcendentals instead of O(B*L) (36x fewer at the
    #    production L).
    # 2. The 801-tap stride-40 FIR is a matvec per output sample, which
    #    cannot tile onto the MXU (1 output column). Blocking SB=128
    #    consecutive outputs into the columns of one matmul fixes that:
    #      out[c*SB + s] = sum_u x[c*SB*D + u] * h[u - s*D]
    #    i.e. X2 (B, n_super, K) @ TAPM (K, SB) with K = (SB+J-1)*D,
    #    J = ceil(ntaps/D). TAPM is ~1/8 dense (zeros elsewhere), so the
    #    MXU does ~8x the minimal FLOPs but at full tiling — measured
    #    ~5x faster than the 1-channel strided conv XLA emits, and it
    #    needs no hand-written kernel.
    # X2 rows are built from two shifted reshapes (no im2col gather).
    _SB = 128
    _J = (in_ntaps + decim - 1) // decim
    _K = (_SB + _J - 1) * decim
    _n_super = (dec_cap + _SB - 1) // _SB
    _q_rot = (l_ext + F - 1) // F

    def _tap_matrix() -> np.ndarray:
        tm = np.zeros((_K, _SB), np.float32)
        for s in range(_SB):
            tm[s * decim:s * decim + in_ntaps, s] = input_taps
        return tm

    _TAPM = _tap_matrix()
    _iota_f = np.arange(F, dtype=np.int32)

    def rotate_mxu(x, k):
        """(B, l_ext) x (B,) k -> rotated (B, l_ext), exact integer
        phase via the length-F periodic ramp."""
        B = x.shape[0]
        m = jnp.mod(k[:, None] * _iota_f[None, :], F)
        ang = (-2.0 * np.pi / F) * m.astype(jnp.float32)
        ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))   # (B, F)
        xp = jnp.pad(x, ((0, 0), (0, _q_rot * F - l_ext)))
        xr = xp.reshape(B, _q_rot, F) * ramp[:, None, :]
        return xr.reshape(B, _q_rot * F)[:, :l_ext]

    # A K-wide input row spans ceil(K / (SB*D)) consecutive SB*D-sized
    # super-rows (2 at the production D=40; more when D is small).
    _n_extra = -(-_K // (_SB * decim)) - 1

    def decimate_mxu(xr):
        """(B, L) rotated -> (B, dec_cap) decimated, via the blocked
        polyphase matmul."""
        B = xr.shape[0]
        need = (_n_super + _n_extra) * _SB * decim
        xp = jnp.pad(xr, ((0, 0), (0, max(need - l_ext, 0))))[:, :need]
        A = xp.reshape(B, _n_super + _n_extra, _SB * decim)
        parts = [A[:, :_n_super]]
        for r in range(1, _n_extra + 1):
            width = min(_SB * decim, _K - r * _SB * decim)
            parts.append(A[:, r:r + _n_super, :width])
        X2 = jnp.concatenate(parts, axis=2)
        Yr = jnp.einsum("bck,ks->bcs", X2.real, _TAPM,
                        precision=jax.lax.Precision.HIGHEST)
        Yi = jnp.einsum("bck,ks->bcs", X2.imag, _TAPM,
                        precision=jax.lax.Precision.HIGHEST)
        Y = jax.lax.complex(Yr, Yi).reshape(B, _n_super * _SB)
        return Y[:, :dec_cap]

    def rotate_decimate_mxu_batch(xs, ks):
        return decimate_mxu(rotate_mxu(xs, ks))

    def downmix_from_dec(dec_full, ext_len, center_bin, shift_dec):
        # shift_dec: gather-alignment lead, in DECIMATED samples. The
        # window holds shift_dec*decim extra leading stream samples the
        # reference's window does not; zeroing their decimated image and
        # shifting every start/clamp by shift_dec reproduces the
        # reference window edge bit-exactly (ALIGN % decim == 0, so the
        # decimation grid is unchanged; see ops/window_gather.py).
        ok = ext_len - shift_dec * decim >= 100
        k = center_bin - F // 2
        dec_len = jnp.clip((ext_len - in_ntaps + 1) // decim, 0, dec_cap)
        ok &= dec_len - shift_dec >= 100
        dec_full = jnp.where((iota_dec < dec_len)
                             & (iota_dec >= shift_dec), dec_full, 0.0)

        # --- Step 2b: noise LPF ("same"; skipped for very short bursts,
        # burst_downmix.c:684-697) ---
        nl = _fir_same_c(dec_full, noise_taps)
        xd = jnp.where(dec_len - noise_ntaps + 1 > 0, nl, dec_full)
        # re-zero the alignment lead: the LPF smears burst energy into
        # it, which positions the reference's window does not have
        xd = jnp.where((iota_dec < dec_len) & (iota_dec >= shift_dec),
                       xd, 0.0)

        # --- Step 3: find burst start ---
        mag2 = jnp.abs(xd) ** 2
        filt = _fir_valid_f(jnp.pad(mag2, (0, box_ntaps - 1)), box_t)
        flen = jnp.maximum(dec_len - box_ntaps + 1, 0)
        fmask = iota_dec < flen
        filt_m = jnp.where(fmask, filt, -jnp.inf)
        max_val = jnp.max(filt_m)
        thr = START_THRESHOLD * max_val
        hit = fmask & (filt >= thr)
        first = jnp.argmax(hit).astype(jnp.int32)
        found = jnp.any(hit)
        first = jnp.where(found, first, flen)
        start = jnp.where(
            first > shift_dec,
            jnp.maximum(first + box_half - dmp.pre_start_samples,
                        shift_dec),
            shift_dec)
        start = jnp.where(flen > 0, start, shift_dec)
        ok &= start < dec_len - 100
        frame_len = dec_len - start

        # --- frame gather: shift so the frame starts at index 0 ---
        pad_to = -(-(2 * dec_cap + 256) // 128) * 128
        xf = _shift_take(jnp.pad(xd, (0, pad_to - dec_cap)), start, dec_cap)
        xf = jnp.where(iota_dec < frame_len, xf, 0.0)

        # --- Step 4: fine CFO estimate ---
        ncfo = jnp.minimum(cfo_n, frame_len)
        z = xf[:cfo_n]
        z = jnp.where(iota_cfo < ncfo, z * z * cfo_win, 0.0)
        spec = jnp.fft.fft(z, n=cfo_total)
        p = jnp.abs(spec) ** 2
        idx = jnp.argmax(p).astype(jnp.int32)
        u = jnp.where(idx >= cfo_total // 2, idx - cfo_total, idx)
        interior = (idx > 0) & (idx < cfo_total - 1)
        a = _pick1(p, jnp.clip(idx - 1, 0, cfo_total - 1))
        b_ = _pick1(p, idx)
        g = _pick1(p, jnp.clip(idx + 1, 0, cfo_total - 1))
        corr = jnp.where(interior, _quad_interp(a, b_, g), 0.0)
        fine_offset = (u.astype(jnp.float32) + corr) / cfo_total / 2.0

        # --- Step 5: fine rotate (integer part exact, fraction in f32) ---
        two_total = 2 * cfo_total
        mfine = jnp.mod(u * iota_dec, two_total).astype(jnp.float32)
        frac = (corr * iota_dec.astype(jnp.float32)) / two_total
        angf = (-2.0 * np.pi) * (mfine / two_total + frac)
        xf = xf * jax.lax.complex(jnp.cos(angf), jnp.sin(angf))

        # --- Step 6: RRC matched filter ("same") ---
        xf = jnp.where(iota_dec < frame_len, xf, 0.0)
        xr = _fir_same_c(xf, rrc_t)

        # --- Step 7: sync-word correlation ---
        search_len = jnp.minimum(search_cap, frame_len)
        fwd_in = jnp.where(iota_search < search_len, xr[:search_cap], 0.0)
        fwd = jnp.fft.fft(fwd_in, n=corr_n)
        dl_c = jnp.fft.ifft(fwd * dl_fft)
        ul_c = jnp.fft.ifft(fwd * ul_fft)
        smask = iota_corr < search_len

        def peak(cc):
            pm = jnp.where(smask, jnp.abs(cc) ** 2, -1.0)
            off = jnp.argmax(pm).astype(jnp.int32)
            return off, _pick1(pm, off)

        off_dl, max_dl = peak(dl_c)
        off_ul, max_ul = peak(ul_c)
        is_dl = max_dl >= max_ul
        off = jnp.where(is_dl, off_dl, off_ul)
        cc = jnp.where(is_dl, dl_c, ul_c)
        corr_val = _pick1(cc, off)
        interior = (off > 0) & (off < search_len - 1)
        pa = jnp.abs(_pick1(cc, jnp.clip(off - 1, 0, corr_n - 1))) ** 2
        pb = jnp.abs(corr_val) ** 2
        pg = jnp.abs(_pick1(cc, jnp.clip(off + 1, 0, corr_n - 1))) ** 2
        uw_corr = jnp.where(interior, _quad_interp(pa, pb, pg), 0.0)

        sync_len = jnp.where(is_dl, c.dl_sync_len, c.ul_sync_len)
        pre_off = jnp.where(is_dl, dl_pre_off, ul_pre_off)
        uw_start = off - sync_len + 1 + pre_off
        ok &= (uw_start >= 0) & (uw_start < frame_len)

        # --- Step 8: phase align ---
        cmag = jnp.abs(corr_val)
        pc = jnp.where(cmag > 0, jnp.conj(corr_val / cmag),
                       np.complex64(1.0))
        xa = xr * pc

        # --- Step 9: extract from uw_start ---
        # center frequency at this point: base + coarse + fine; the
        # simplex/normal split needs the absolute frequency, computed here
        # from exact parts (reference burst_downmix.c:763-770)
        # f32 is enough here: only the simplex/normal split consumes this
        # (boundary fuzz ~1 kHz out of a 10 MHz band); the printed frequency
        # is reassembled on the host in float64 from the exact parts.
        cf = (det.center_frequency
              + k.astype(jnp.float32) / F * in_rate
              + fine_offset * dmp.output_sample_rate)
        simplex = cf > iridium.SIMPLEX_FREQUENCY_MIN
        max_len = jnp.where(simplex,
                            np.int32(int(iridium.MAX_FRAME_LENGTH_SIMPLEX * sps)),
                            np.int32(int(iridium.MAX_FRAME_LENGTH_NORMAL * sps)))
        min_len = jnp.where(simplex,
                            np.int32(int(iridium.MIN_FRAME_LENGTH_SIMPLEX * sps)),
                            np.int32(int(iridium.MIN_FRAME_LENGTH_NORMAL * sps)))
        available = frame_len - uw_start
        ok &= available >= min_len
        n_samples = jnp.minimum(available, max_len)
        pad_to2 = -(-(dec_cap + max_frame_cap + 256) // 128) * 128
        out = _shift_take(jnp.pad(xa, (0, pad_to2 - dec_cap)),
                          jnp.clip(uw_start, 0, dec_cap), max_frame_cap)
        out = jnp.where(np.arange(max_frame_cap) < n_samples, out, 0.0)

        return DownmixOut(
            samples=out,
            n_samples=jnp.where(ok, n_samples, 0),
            ok=ok,
            direction=jnp.where(is_dl, DIR_DL, DIR_UL).astype(jnp.int32),
            start_dec=start,
            fine_offset=fine_offset,
            uw_corr=uw_corr,
        )

    def downmix_one(x, ext_len, center_bin):
        k = center_bin - F // 2
        if fir_mode == "mxu":
            dec_full = rotate_decimate_mxu_batch(
                x[None], jnp.reshape(k, (1,)))[0]
        else:
            dec_full = rotate_decimate_xla(x, k)
        return downmix_from_dec(dec_full, ext_len, center_bin,
                                jnp.int32(0))

    def downmix_batch(stream, starts, ext_lens, bins):
        """Batched entry: gathers each burst's window from the device-
        resident stream, runs the rotate+decimate over the whole batch
        (batch-native: the MXU matmul and the Pallas grid both want the
        batch as a leading dim, not a vmap), then vmaps the rest of the
        chain."""
        xs = jax.vmap(
            lambda s: jax.lax.dynamic_slice(stream, (s,), (l_ext,)))(starts)
        ks = bins - F // 2
        if fir_mode == "mxu":
            dec_full = rotate_decimate_mxu_batch(xs, ks)
        else:
            dec_full = jax.vmap(rotate_decimate_xla)(xs, ks)
        zero_sd = jnp.zeros(xs.shape[0], jnp.int32)
        return jax.vmap(downmix_from_dec)(dec_full, ext_lens, bins,
                                          zero_sd)

    def downmix_windows(xs_re, xs_im, ext_lens, bins, shift_dec):
        """Pre-gathered-window entry (the Pallas gather path): xs planes
        (B, l_ext) f32; shift_dec (B,) i32 alignment leads in decimated
        samples. See ops/window_gather.py for the exactness argument."""
        xs = jax.lax.complex(xs_re, xs_im)
        ks = bins - F // 2
        if fir_mode == "mxu":
            dec_full = rotate_decimate_mxu_batch(xs, ks)
        else:
            dec_full = jax.vmap(rotate_decimate_xla)(xs, ks)
        return jax.vmap(downmix_from_dec)(dec_full, ext_lens, bins,
                                          shift_dec)

    downmix_one.batch = downmix_batch
    downmix_one.windows = downmix_windows
    # pre-decimated entry (the fused Pallas front-end kernel produces
    # dec_full directly; ops/fused_frontend.py)
    downmix_one.from_dec = jax.vmap(downmix_from_dec)
    downmix_one.input_taps = input_taps
    # expose the rotate+decimate stage for parity tests / profiling
    if fir_mode == "mxu":
        downmix_one.rotate_decimate = rotate_decimate_mxu_batch
    else:
        downmix_one.rotate_decimate = (
            lambda xs, ks: jax.vmap(rotate_decimate_xla)(xs, ks))
    return downmix_one
