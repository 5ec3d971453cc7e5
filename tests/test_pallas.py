"""Pallas kernel correctness vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iridium_tpu.ops import filters, pallas_fir


def xla_rotate_decimate(x, k, taps, fft_size, decim, dec_cap):
    """The downmix.py math: exact integer-phase rotate + valid strided FIR."""
    l_ext = x.shape[0]
    nm = (np.arange(l_ext, dtype=np.int64) % fft_size).astype(np.int32)
    m = np.mod(k * nm, fft_size)
    ang = (-2.0 * np.pi / fft_size) * m.astype(np.float32)
    rot = x * (np.cos(ang) + 1j * np.sin(ang)).astype(np.complex64)
    out = np.zeros(dec_cap, np.complex64)
    for i in range(dec_cap):
        seg = rot[i * decim: i * decim + len(taps)]
        if len(seg) < len(taps):
            seg = np.pad(seg, (0, len(taps) - len(seg)))
        out[i] = np.dot(taps, seg)
    return out


def test_pallas_rotate_decimate_matches_xla():
    rng = np.random.default_rng(0)
    fft_size = 1024
    decim = 40
    dec_cap = 640
    l_ext = dec_cap * decim + 801 + 128
    taps = filters.lpf_taps(1.0, 10_000_000.0, 100_000.0, 50_000.0)
    x = (rng.standard_normal(l_ext)
         + 1j * rng.standard_normal(l_ext)).astype(np.complex64)
    k = 137

    want = xla_rotate_decimate(x, k, taps.astype(np.float64), fft_size,
                               decim, dec_cap)

    rot_dec = pallas_fir.make_rotate_decimate(
        l_ext, dec_cap, decim, taps, fft_size, tile=128, interpret=True)
    o_re, o_im = jax.jit(rot_dec)(
        jnp.asarray(x.real), jnp.asarray(x.imag), np.int32(k))
    got = np.asarray(o_re) + 1j * np.asarray(o_im)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_rotate_decimate_batched():
    rng = np.random.default_rng(2)
    fft_size = 1024
    decim = 40
    dec_cap = 640
    l_ext = dec_cap * decim + 801 + 128
    taps = filters.lpf_taps(1.0, 10_000_000.0, 100_000.0, 50_000.0)
    B = 3
    x = (rng.standard_normal((B, l_ext))
         + 1j * rng.standard_normal((B, l_ext))).astype(np.complex64)
    ks = np.array([137, -64, 0], np.int32)
    want = np.stack([
        xla_rotate_decimate(x[b], int(ks[b]), taps.astype(np.float64),
                            fft_size, decim, dec_cap) for b in range(B)])
    rot_dec = pallas_fir.make_rotate_decimate(
        l_ext, dec_cap, decim, taps, fft_size, tile=128, interpret=True)
    o_re, o_im = jax.jit(rot_dec)(
        jnp.asarray(x.real), jnp.asarray(x.imag), jnp.asarray(ks))
    got = np.asarray(o_re) + 1j * np.asarray(o_im)
    assert got.shape == (B, dec_cap)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_rotate_decimate_zero_k():
    rng = np.random.default_rng(1)
    decim = 4
    dec_cap = 256
    taps = np.ones(9, np.float32) / 9
    l_ext = dec_cap * decim + 64
    x = (rng.standard_normal(l_ext)
         + 1j * rng.standard_normal(l_ext)).astype(np.complex64)
    want = xla_rotate_decimate(x, 0, taps.astype(np.float64), 256,
                               decim, dec_cap)
    rot_dec = pallas_fir.make_rotate_decimate(
        l_ext, dec_cap, decim, taps, 256, tile=128, interpret=True)
    o_re, o_im = rot_dec(jnp.asarray(x.real), jnp.asarray(x.imag),
                         np.int32(0))
    got = np.asarray(o_re) + 1j * np.asarray(o_im)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
