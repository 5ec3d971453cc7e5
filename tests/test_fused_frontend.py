"""Fused gather+rotate+decimate kernel (ops/fused_frontend.py) vs the
unfused reference math, in interpret mode.

Oracle: float64 numpy — window = stream[tile*ALIGN + r :][:l_win],
rotated[n] = window[n] * exp(-2j*pi*((k*n) mod F)/F), dec[m] =
sum_t taps[t] * rotated[m*D + t]. Comparable outputs are the 'valid'
region m*D + ntaps <= l_win (beyond it the fused kernel reads stream
content where the XLA path reads zero padding; that region is always
masked downstream by dec_len)."""

import numpy as np
import jax.numpy as jnp
import pytest

from iridium_tpu.ops import fused_frontend as ff
from iridium_tpu.ops import window_gather as wg
from iridium_tpu.ops import filters


F = 512
D = 8
L_WIN = 2 * wg.ALIGN
NTAPS = 801


def oracle(stream, tile, r, k, taps):
    base = tile * wg.ALIGN + r
    win = stream[base:base + L_WIN + NTAPS].astype(np.complex128)
    n = np.arange(len(win), dtype=np.int64)
    rot = win * np.exp(-2j * np.pi * ((k * n) % F) / F)
    n_out = L_WIN // D
    out = np.zeros(n_out, np.complex128)
    for m in range((L_WIN - NTAPS) // D + 1):
        out[m] = np.dot(taps, rot[m * D:m * D + NTAPS])
    return out


@pytest.mark.parametrize("cases", [
    [(0, 0, 7), (1, 3, -100), (0, 7, 250), (2, 1, 0), (1, 5, -255)],
])
def test_fused_matches_oracle(cases):
    taps = filters.lpf_taps(1.0, 10_000_000.0, 100_000.0, 50_000.0)
    assert len(taps) == NTAPS
    rng = np.random.default_rng(3)
    n = L_WIN + 4 * wg.ALIGN
    stream = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
              ).astype(np.complex64)
    s = jnp.asarray(stream)
    planes = wg.stream_planes(s)
    assert ff.supports(F, D, L_WIN)
    fn = ff.make_fused_frontend(L_WIN, F, D, np.asarray(taps),
                                interpret=True)
    ramps = ff.make_ramp_table(F)
    starts2 = np.array([[t, r] for t, r, _ in cases], np.int32)
    ks = np.array([k for _, _, k in cases], np.int32)
    ramp = ramps(jnp.asarray(ks))
    sp = ff.stack_planes(planes[0], planes[1])
    o_re, o_im = fn(sp, jnp.asarray(starts2), ramp)
    o_re, o_im = np.asarray(o_re), np.asarray(o_im)
    n_cmp = (L_WIN - NTAPS) // D
    for i, (t, r, k) in enumerate(cases):
        want = oracle(stream, t, r, k, np.asarray(taps))
        got = o_re[i] + 1j * o_im[i]
        np.testing.assert_allclose(got[:n_cmp], want[:n_cmp],
                                   rtol=2e-4, atol=2e-3)
