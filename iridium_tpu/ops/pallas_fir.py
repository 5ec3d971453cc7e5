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

The kernel is batch-native: the burst batch is the leading grid axis
(grid = (B, n_tiles)), per-burst bin offsets ride in SMEM as a full
(B,) array, and outputs live in ANY memory written by explicit DMA —
the shapes stay legal under Mosaic's (8, 128) block-mapping rules,
which a vmap-of-pallas transform would violate.

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

    x_re/x_im: (l_ext,) or (B, l_ext) f32 raw burst IQ planes; k: i32
    scalar / (B,) detector bin offset. Rotation:
    exp(-2*pi*i*(k*n mod F)/F) — the same exact integer phase as the
    XLA path.
    """
    ntaps = len(taps)
    j_rows = math.ceil(ntaps / decim)             # 21 for 801/40
    h = np.zeros(j_rows * decim, np.float32)
    h[:ntaps] = taps
    # Lane-pad the polyphase tap matrix decim -> LANES: Mosaic DMA slices
    # must be 128-aligned on the lane dim. Zero taps kill the pad columns.
    LANES = 128 * math.ceil(decim / 128)
    H = np.zeros((j_rows, LANES), np.float32)
    H[:, :decim] = h.reshape(j_rows, decim)

    assert tile % 128 == 0, "tile must be a multiple of 128 lanes"
    n_tiles = math.ceil(dec_cap / tile)
    # Sublane-align every DMA: in_rows (the HBM->VMEM copy extent) is
    # rounded to the f32 sublane count (8), and pad_rows (the per-burst
    # row stride) along with it, so row0 = b*pad_rows + t*tile is always
    # 8-aligned. Mosaic's dynamic-slice DMA faults the TPU worker on
    # misaligned sublane offsets (observed as UNAVAILABLE worker crashes
    # through the axon runtime). The extra rows are zero padding; the
    # accumulation loop only reads the first tile + j_rows of them.
    in_rows = tile + 8 * math.ceil(j_rows / 8)
    pad_rows = n_tiles * tile + (in_rows - tile)
    out_len = n_tiles * tile

    def kernel(k_ref, h_ref, xr_hbm, xi_hbm, ore_hbm, oim_hbm,
               sr, si, obr, obi, sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        k = k_ref[b]
        base_row = t * tile

        row0 = b * pad_rows + base_row
        cpr = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(row0, in_rows), :], sr, sems.at[0])
        cpi = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(row0, in_rows), :], si, sems.at[1])
        cpr.start()
        cpi.start()
        cpr.wait()
        cpi.wait()

        # exact integer phase for n = (base_row + i)*D + p
        row = jax.lax.broadcasted_iota(jnp.int32, (in_rows, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (in_rows, LANES), 1)
        n = (base_row + row) * decim + col
        m = jax.lax.rem(k * jax.lax.rem(n, fft_size), fft_size)
        ang = m.astype(jnp.float32) * np.float32(-2.0 * np.pi / fft_size)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        xr = sr[...]
        xi = si[...]
        rr = xr * c - xi * s
        ri = xr * s + xi * c

        acc_r = jnp.zeros((tile, LANES), jnp.float32)
        acc_i = jnp.zeros((tile, LANES), jnp.float32)
        for j in range(j_rows):
            hj = h_ref[j, :][None, :]
            acc_r = acc_r + rr[j:j + tile, :] * hj
            acc_i = acc_i + ri[j:j + tile, :] * hj
        obr[...] = jnp.sum(acc_r, axis=1).reshape(tile // 128, 128)
        obi[...] = jnp.sum(acc_i, axis=1).reshape(tile // 128, 128)

        out_row0 = (b * out_len + base_row) // 128
        cor = pltpu.make_async_copy(
            obr, ore_hbm.at[pl.ds(out_row0, tile // 128), :], sems.at[2])
        coi = pltpu.make_async_copy(
            obi, oim_hbm.at[pl.ds(out_row0, tile // 128), :], sems.at[3])
        cor.start()
        coi.start()
        cor.wait()
        coi.wait()

    def build_call(B: int):
        return pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # k (B,)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # taps matrix
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * out_len // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((B * out_len // 128, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((in_rows, LANES), jnp.float32),
                pltpu.VMEM((in_rows, LANES), jnp.float32),
                pltpu.VMEM((tile // 128, 128), jnp.float32),
                pltpu.VMEM((tile // 128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )

    pad_flat = pad_rows * decim

    def rot_dec(x_re, x_im, k):
        batched = x_re.ndim == 2
        if not batched:
            x_re, x_im = x_re[None], x_im[None]
            k = jnp.reshape(k, (1,))
        B = x_re.shape[0]
        pad = max(pad_flat - l_ext, 0)
        xr = jnp.pad(x_re, ((0, 0), (0, pad)))[:, :pad_flat]
        xi = jnp.pad(x_im, ((0, 0), (0, pad)))[:, :pad_flat]
        xr = xr.reshape(B * pad_rows, decim)
        xi = xi.reshape(B * pad_rows, decim)
        if LANES != decim:
            lp = ((0, 0), (0, LANES - decim))
            xr = jnp.pad(xr, lp)
            xi = jnp.pad(xi, lp)
        o_re, o_im = build_call(B)(k.astype(jnp.int32), H, xr, xi)
        o_re = o_re.reshape(B, out_len)[:, :dec_cap]
        o_im = o_im.reshape(B, out_len)[:, :dec_cap]
        if not batched:
            o_re, o_im = o_re[0], o_im[0]
        return o_re, o_im

    return rot_dec
