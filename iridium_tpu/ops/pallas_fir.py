"""Pallas TPU kernel: fused coarse-CFO rotation + polyphase decimating FIR.

The heaviest op in the burst path is the 801-tap anti-alias FIR that
decimates each burst from the input rate to 250 kHz
(burst_downmix.c:674-679; the dominant downmix FLOPs). The XLA version
(downmix.py) materializes the coarse-rotated burst (a full-rate HBM
round trip) and then runs a strided convolution. This kernel fuses the
two: per output tile it DMAs the raw IQ slice into VMEM once, applies
the exact integer-phase rotation there, and accumulates the polyphase
products — the rotated signal never touches HBM.

Polyphase layout: out[k] = sum_t h[t] x[kD+t]; with X[i, p] = x[iD + p]
(i time, p phase in [0, D)) this is out[k] = sum_j X[k+j, :] . H[j, :]
where H[j, p] = h[jD + p] — j_rows shifted row-wise products
accumulated in VMEM.

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
                         tile: int = 512, interpret: bool = False):
    """Build rot_dec(x_re, x_im, k) -> (out_re, out_im).

    x_re/x_im: (l_ext,) f32 raw burst IQ planes; k: i32 scalar detector
    bin offset. Rotation: exp(-2*pi*i*(k*n mod F)/F) — the same exact
    integer phase as the XLA path.
    """
    ntaps = len(taps)
    j_rows = math.ceil(ntaps / decim)             # 21 for 801/40
    h = np.zeros(j_rows * decim, np.float32)
    h[:ntaps] = taps
    H = h.reshape(j_rows, decim)                   # numpy constant

    n_tiles = math.ceil(dec_cap / tile)
    in_rows = tile + j_rows
    pad_rows = n_tiles * tile + j_rows
    out_len = n_tiles * tile

    def kernel(k_ref, h_ref, xr_hbm, xi_hbm, ore_ref, oim_ref, sr, si, sems):
        t = pl.program_id(0)
        k = k_ref[0]
        base_row = t * tile

        cpr = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(base_row, in_rows), :], sr, sems.at[0])
        cpi = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(base_row, in_rows), :], si, sems.at[1])
        cpr.start()
        cpi.start()
        cpr.wait()
        cpi.wait()

        # exact integer phase for n = (base_row + i)*D + p
        row = jax.lax.broadcasted_iota(jnp.int32, (in_rows, decim), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (in_rows, decim), 1)
        n = (base_row + row) * decim + col
        m = jax.lax.rem(k * jax.lax.rem(n, fft_size), fft_size)
        ang = m.astype(jnp.float32) * np.float32(-2.0 * np.pi / fft_size)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        xr = sr[...]
        xi = si[...]
        rr = xr * c - xi * s
        ri = xr * s + xi * c

        acc_r = jnp.zeros((tile, decim), jnp.float32)
        acc_i = jnp.zeros((tile, decim), jnp.float32)
        for j in range(j_rows):
            hj = h_ref[j, :][None, :]
            acc_r = acc_r + rr[j:j + tile, :] * hj
            acc_i = acc_i + ri[j:j + tile, :] * hj
        ore_ref[...] = jnp.sum(acc_r, axis=1)
        oim_ref[...] = jnp.sum(acc_i, axis=1)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # taps matrix
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_len,), jnp.float32),
            jax.ShapeDtypeStruct((out_len,), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((in_rows, decim), jnp.float32),
            pltpu.VMEM((in_rows, decim), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    pad_flat = pad_rows * decim

    def rot_dec(x_re, x_im, k):
        xr = jnp.pad(x_re, (0, max(pad_flat - l_ext, 0)))[:pad_flat]
        xi = jnp.pad(x_im, (0, max(pad_flat - l_ext, 0)))[:pad_flat]
        xr = xr.reshape(pad_rows, decim)
        xi = xi.reshape(pad_rows, decim)
        k_arr = jnp.reshape(k, (1,)).astype(jnp.int32)
        o_re, o_im = call(k_arr, H, xr, xi)
        return o_re[:dec_cap], o_im[:dec_cap]

    return rot_dec
