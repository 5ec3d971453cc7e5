"""Pallas TPU kernel: fused coarse-CFO rotation + polyphase decimating FIR.

The heaviest op in the burst path is the 801-tap anti-alias FIR that
decimates each burst from the input rate to 250 kHz
(burst_downmix.c:674-679; the dominant downmix FLOPs). The XLA version
(downmix.py) materializes the coarse-rotated burst (a full-rate HBM
round trip plus cos/sin over every input sample) and then runs a strided
convolution that XLA lowers poorly (1 output channel -> no MXU tiling).

This kernel restructures the math so the rotation rides on the TAPS, not
the signal. With the exact integer phase theta(n) = -2*pi*((k*n) mod F)/F
and n = c*D + t (c output index, t tap index):

    out[c] = e^{i*theta(c*D)} * sum_t (h[t] e^{i*theta(t)}) x[c*D + t]

because (k*(c*D + t)) mod F == ((k*c*D mod F) + (k*t mod F)) mod F and
e^{-2*pi*i*m/F} is exactly periodic in m. So:
  - per burst, rotate the 801 taps (cheap, done in XLA outside the kernel),
  - run a complex-tap polyphase FIR over the RAW IQ planes (this kernel),
  - post-rotate the ~dec_cap outputs (cheap, XLA outside).
Total transcendentals drop from O(l_ext) per burst to O(ntaps + dec_cap).

Polyphase layout: with X[i, p] = x[iD + p] (i time row, p phase in
[0, D) lane) and T[j, p] = h_rot[jD + p], the FIR is
out[c] = sum_j X[c+j, :] . T[j, :] — j_rows row-shifted multiply-
accumulates over a (tile + halo, LANES) VMEM window, reduced across
lanes.

Pipelining: grid = (B, n_tiles); every input/output rides a standard
BlockSpec, so Pallas double-buffers the HBM<->VMEM copies across grid
steps automatically (no manual DMA, no dynamic VMEM indexing — an
earlier manual-DMA variant was 4x slower than XLA because Mosaic turned
its dynamically indexed slot reads into per-iteration VMEM copies).
Because blocks cannot overlap, the j_rows-1 halo rows that tile t
borrows from tile t+1 travel as a small side array (built by XLA
slicing, ~1% of the input) and are stitched onto the main block in a
VMEM scratch before the shift-accumulate loop.

Correctness is pinned against the XLA implementation in tests
(interpret mode on CPU; compiled on TPU when available).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_rotate_decimate(l_ext: int, dec_cap: int, decim: int,
                         taps: np.ndarray, fft_size: int,
                         tile: int = 2048, interpret: bool = False):
    """Build rot_dec(x_re, x_im, k) -> (out_re, out_im).

    x_re/x_im: (l_ext,) or (B, l_ext) f32 raw burst IQ planes; k: i32
    scalar / (B,) detector bin offset. Output matches
    rotate(x, k) -> 801-tap FIR -> decimate by `decim`, with rotation
    exp(-2*pi*i*(k*n mod F)/F) — the same exact integer phase as the
    XLA path (see module docstring for the tap-rotation identity).
    """
    ntaps = len(taps)
    j_rows = math.ceil(ntaps / decim)             # 21 for 801/40
    h = np.zeros(j_rows * decim, np.float32)
    h[:ntaps] = taps
    # Lane-pad decim -> LANES: Mosaic block slices must be 128-aligned
    # on the lane dim. Zero taps kill the pad columns.
    LANES = 128 * math.ceil(decim / 128)

    assert tile % 128 == 0, "tile must be a multiple of 128 lanes"
    n_tiles = math.ceil(dec_cap / tile)
    halo = 8 * math.ceil(j_rows / 8)              # 24 rows for 21 taps-rows
    main_rows = n_tiles * tile
    out_len = n_tiles * tile
    trows = tile // 128                           # output rows per tile

    def kernel(tr_ref, ti_ref, xm_r, xm_i, xh_r, xh_i, our_ref, oui_ref,
               st_r, st_i):
        # stitch main block + halo rows into one contiguous window
        st_r[:tile, :] = xm_r[0]
        st_i[:tile, :] = xm_i[0]
        st_r[tile:, :] = xh_r[0, 0]
        st_i[tile:, :] = xh_i[0, 0]

        acc_r = jnp.zeros((tile, LANES), jnp.float32)
        acc_i = jnp.zeros((tile, LANES), jnp.float32)
        for j in range(j_rows):
            trj = tr_ref[0, j, :][None, :]
            tij = ti_ref[0, j, :][None, :]
            xr = st_r[j:j + tile, :]
            xi = st_i[j:j + tile, :]
            # complex taps x complex signal (rotation rides on the taps)
            acc_r = acc_r + (xr * trj - xi * tij)
            acc_i = acc_i + (xr * tij + xi * trj)
        our_ref[0] = jnp.sum(acc_r, axis=1).reshape(trows, 128)
        oui_ref[0] = jnp.sum(acc_i, axis=1).reshape(trows, 128)

    def build_call(B: int):
        return pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, j_rows, LANES), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),   # taps re
                pl.BlockSpec((1, j_rows, LANES), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),   # taps im
                pl.BlockSpec((1, tile, LANES), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),   # main re
                pl.BlockSpec((1, tile, LANES), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),   # main im
                pl.BlockSpec((1, 1, halo, LANES),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),   # halo re
                pl.BlockSpec((1, 1, halo, LANES),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),   # halo im
            ],
            out_specs=[
                pl.BlockSpec((1, trows, 128), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, trows, 128), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, out_len // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((B, out_len // 128, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile + halo, LANES), jnp.float32),
                pltpu.VMEM((tile + halo, LANES), jnp.float32),
            ],
            interpret=interpret,
        )

    pad_rows = main_rows + halo
    pad_flat = pad_rows * decim
    iota_tap = np.arange(j_rows * decim, dtype=np.int32)
    # (c*D) mod F precomputed in i64 so k*m stays within i32 at runtime
    iota_out_m = ((np.arange(out_len, dtype=np.int64) * decim)
                  % fft_size).astype(np.int32)
    h_row = h  # (j_rows*decim,)

    def rot_dec(x_re, x_im, k):
        batched = x_re.ndim == 2
        if not batched:
            x_re, x_im = x_re[None], x_im[None]
            k = jnp.reshape(k, (1,))
        B = x_re.shape[0]
        k = k.astype(jnp.int32)

        # --- rotated taps, (B, j_rows, LANES) f32 x2 (XLA, cheap) ---
        m2 = jnp.mod(k[:, None] * (iota_tap % fft_size), fft_size)
        ang2 = m2.astype(jnp.float32) * np.float32(-2.0 * np.pi / fft_size)
        tr = (h_row[None, :] * jnp.cos(ang2)).reshape(B, j_rows, decim)
        ti = (h_row[None, :] * jnp.sin(ang2)).reshape(B, j_rows, decim)
        if LANES != decim:
            lp = ((0, 0), (0, 0), (0, LANES - decim))
            tr = jnp.pad(tr, lp)
            ti = jnp.pad(ti, lp)

        # --- input planes: polyphase rows, lane-padded, + halo windows ---
        pad = max(pad_flat - l_ext, 0)
        xr = jnp.pad(x_re, ((0, 0), (0, pad)))[:, :pad_flat]
        xi = jnp.pad(x_im, ((0, 0), (0, pad)))[:, :pad_flat]
        xr = xr.reshape(B, pad_rows, decim)
        xi = xi.reshape(B, pad_rows, decim)
        if LANES != decim:
            lp = ((0, 0), (0, 0), (0, LANES - decim))
            xr = jnp.pad(xr, lp)
            xi = jnp.pad(xi, lp)
        xm_r, xm_i = xr[:, :main_rows], xi[:, :main_rows]
        xh_r = jnp.stack(
            [xr[:, (t + 1) * tile:(t + 1) * tile + halo]
             for t in range(n_tiles)], axis=1)
        xh_i = jnp.stack(
            [xi[:, (t + 1) * tile:(t + 1) * tile + halo]
             for t in range(n_tiles)], axis=1)

        o_re, o_im = build_call(B)(tr, ti, xm_r, xm_i, xh_r, xh_i)
        o_re = o_re.reshape(B, out_len)
        o_im = o_im.reshape(B, out_len)

        # --- post-rotation of the decimated outputs (XLA, cheap) ---
        m1 = jnp.mod(k[:, None] * iota_out_m, fft_size)
        ang1 = m1.astype(jnp.float32) * np.float32(-2.0 * np.pi / fft_size)
        c1 = jnp.cos(ang1)
        s1 = jnp.sin(ang1)
        f_re = (o_re * c1 - o_im * s1)[:, :dec_cap]
        f_im = (o_re * s1 + o_im * c1)[:, :dec_cap]
        if not batched:
            f_re, f_im = f_re[0], f_im[0]
        return f_re, f_im

    return rot_dec
