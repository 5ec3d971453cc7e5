"""Parity: the MXU polyphase-matmul rotate+decimate path (the production
default) against the 1-channel strided-conv path (the verification
reference, cf. the reference's --no-simd switch, ARCHITECTURE.md:638),
and both against a float64 numpy oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from iridium_tpu.config import DetectorConfig, DownmixConfig  # noqa: E402
from iridium_tpu.dsp import downmix  # noqa: E402


def _small_params():
    det = DetectorConfig(sample_rate=1_000_000, fft_size=256,
                         history_size=8, frames_per_block=32,
                         max_burst_len=9_000, burst_post_len=2_000).derived()
    dmp = DownmixConfig().derived(det)
    return det, dmp


def _oracle(x, k, taps, F, decim, dec_cap):
    n = np.arange(len(x), dtype=np.int64)
    ang = -2.0 * np.pi / F * ((k * n) % F)
    xr = x.astype(np.complex128) * np.exp(1j * ang)
    out = np.zeros(dec_cap, np.complex128)
    for c in range(dec_cap):
        seg = xr[c * decim:c * decim + len(taps)]
        out[c] = np.dot(seg, taps[:len(seg)])
    return out


def _gather(stream, starts, l_ext):
    return jax.vmap(lambda s: jax.lax.dynamic_slice(
        stream, (s,), (l_ext,)))(starts)


def test_mxu_rotate_decimate_vs_oracle_and_conv():
    det, dmp = _small_params()
    rng = np.random.default_rng(3)
    l_ext = 8192
    dec_cap = (l_ext - 801) // dmp.decimation + 1
    B = 4
    x = (rng.standard_normal((B, l_ext))
         + 1j * rng.standard_normal((B, l_ext))).astype(np.complex64)
    ks = np.array([-128, -1, 0, 127], np.int32)
    taps64 = np.asarray(downmix.make_consts(dmp).input_taps, np.float64)

    dm_mxu = downmix.make_downmix_one(det, dmp, l_ext,
                                      dmp.max_frame_samples,
                                      dec_cap=dec_cap, fir_mode="mxu")
    dm_conv = downmix.make_downmix_one(det, dmp, l_ext,
                                       dmp.max_frame_samples,
                                       dec_cap=dec_cap, fir_mode="conv")

    stream = jnp.concatenate([jnp.asarray(x.reshape(-1)),
                              jnp.zeros(l_ext, jnp.complex64)])
    starts = jnp.asarray(np.arange(B, dtype=np.int32) * l_ext)
    ksj = jnp.asarray(ks)

    got_mxu = np.asarray(jax.jit(
        lambda: dm_mxu.rotate_decimate(_gather(stream, starts, l_ext),
                                       ksj))())
    got_conv = np.asarray(jax.jit(
        lambda: dm_conv.rotate_decimate(_gather(stream, starts, l_ext),
                                        ksj))())

    for b in range(B):
        want = _oracle(x[b], int(ks[b]), taps64, det.fft_size,
                       dmp.decimation, dec_cap)
        scale = np.abs(want).max() + 1e-12
        np.testing.assert_allclose(got_mxu[b], want,
                                   rtol=0, atol=3e-4 * scale)
        np.testing.assert_allclose(got_conv[b], want,
                                   rtol=0, atol=3e-4 * scale)


def test_mxu_full_downmix_agrees_with_conv():
    """The complete downmix chain built on the two FIR paths agrees on
    every decision field (FP-rounding-tolerance class, README.md:226)."""
    det, dmp = _small_params()
    rng = np.random.default_rng(11)
    l_ext = 6144
    dec_cap = (l_ext - 801) // dmp.decimation + 1
    B = 3
    # synthetic tone bursts so the chain makes real decisions
    n = np.arange(l_ext)
    x = np.zeros((B, l_ext), np.complex64)
    ks = np.array([-20, 0, 35], np.int32)
    for b in range(B):
        ph = 2 * np.pi * (ks[b] / det.fft_size) * n
        x[b, 200:4200] = (np.exp(1j * ph)[200:4200]
                          * (1.0 + 0.05 * rng.standard_normal(4000))
                          ).astype(np.complex64)
    stream = jnp.concatenate([jnp.asarray(x.reshape(-1)),
                              jnp.zeros(l_ext, jnp.complex64)])
    starts = jnp.asarray(np.arange(B, dtype=np.int32) * l_ext)
    lens = jnp.asarray(np.full(B, l_ext, np.int32))
    bins = jnp.asarray(ks + det.fft_size // 2)

    outs = {}
    for mode in ("mxu", "conv"):
        dm_one = downmix.make_downmix_one(det, dmp, l_ext,
                                          dmp.max_frame_samples,
                                          dec_cap=dec_cap, fir_mode=mode)
        outs[mode] = jax.jit(dm_one.batch)(stream, starts, lens, bins)

    a, c = outs["mxu"], outs["conv"]
    assert np.array_equal(np.asarray(a.ok), np.asarray(c.ok))
    assert np.array_equal(np.asarray(a.direction), np.asarray(c.direction))
    assert np.array_equal(np.asarray(a.start_dec), np.asarray(c.start_dec))
    np.testing.assert_allclose(np.asarray(a.fine_offset),
                               np.asarray(c.fine_offset), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.samples),
                               np.asarray(c.samples), atol=2e-3)
