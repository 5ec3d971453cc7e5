"""Unit tests for the production Pallas window-gather kernel
(ops/window_gather.py) — interpret-mode parity against the XLA gather
across fine-shift extremes (r=0, 1, MAX_SHIFT-1), tile boundaries,
last-block spill reads, multi-block windows, and batch > 1.

This is the kernel-level analogue of the reference's --no-simd
verification switch (ARCHITECTURE.md:638): the same windows must come
out of both implementations bit-exactly (both are pure data movement).
On real TPU hardware the compiled kernel can be A/B'd against the XLA
path with the pipeline's gather_mode seam (--gather xla|pallas).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iridium_tpu.ops import window_gather as wg


def _stream(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)
            ).astype(np.complex64)


def _run_both(stream, starts2, l_win):
    s = jnp.asarray(stream)
    planes = wg.stream_planes(s)
    gfn = wg.make_window_gather(l_win, interpret=True)
    p_re, p_im = gfn(planes[0], planes[1], jnp.asarray(starts2))
    # the XLA path needs the stream itself to cover window end + r
    pad = jnp.pad(s, (0, wg.MAX_SHIFT + 128))
    x_re, x_im = wg.gather_windows_xla(pad, jnp.asarray(starts2), l_win)
    return (np.asarray(p_re), np.asarray(p_im),
            np.asarray(x_re), np.asarray(x_im))


@pytest.mark.parametrize("r", [0, 1, 7, wg.MAX_SHIFT - 1])
def test_single_block_shifts(r):
    l_win = wg.ALIGN
    stream = _stream(3 * wg.ALIGN)
    starts2 = np.array([[0, r], [1, r]], np.int32)
    p_re, p_im, x_re, x_im = _run_both(stream, starts2, l_win)
    np.testing.assert_array_equal(p_re, x_re)
    np.testing.assert_array_equal(p_im, x_im)


def test_multi_block_window_and_batch():
    # two-ALIGN window exercises the inter-block grid loop; the batch
    # mixes every r class and both tile positions
    l_win = 2 * wg.ALIGN
    stream = _stream(5 * wg.ALIGN, seed=1)
    starts2 = np.array(
        [[0, 0], [0, 39], [1, 1], [2, 17], [1, 39], [0, 20]], np.int32)
    p_re, p_im, x_re, x_im = _run_both(stream, starts2, l_win)
    np.testing.assert_array_equal(p_re, x_re)
    np.testing.assert_array_equal(p_im, x_im)


def test_last_block_spill_read():
    # window ending at the stream's last ALIGN block: the spill block
    # (+8 rows past the window end) must read the stream_planes padding,
    # and the delivered window must still match the XLA gather
    l_win = wg.ALIGN
    n = 3 * wg.ALIGN + 64          # NOT an ALIGN multiple
    stream = _stream(n, seed=2)
    starts2 = np.array([[2, 39], [2, 0]], np.int32)
    p_re, p_im, x_re, x_im = _run_both(stream, starts2, l_win)
    np.testing.assert_array_equal(p_re, x_re)
    np.testing.assert_array_equal(p_im, x_im)


def test_roll_boundary_values():
    # a counting stream makes any off-by-one in the lane roll / spill
    # merge visible as an exact integer mismatch
    l_win = wg.ALIGN
    n = 3 * wg.ALIGN
    stream = (np.arange(n, dtype=np.float32)
              + 1j * np.arange(n, dtype=np.float32)[::-1].copy()
              ).astype(np.complex64)
    s = jnp.asarray(stream)
    planes = wg.stream_planes(s)
    gfn = wg.make_window_gather(l_win, interpret=True)
    for tile, r in [(0, 39), (1, 39), (1, 0), (0, 1)]:
        starts2 = jnp.asarray(np.array([[tile, r]], np.int32))
        p_re, p_im = gfn(planes[0], planes[1], starts2)
        base = tile * wg.ALIGN + r
        np.testing.assert_array_equal(
            np.asarray(p_re)[0], stream.real[base:base + l_win])
        np.testing.assert_array_equal(
            np.asarray(p_im)[0], stream.imag[base:base + l_win])
