"""Burst-window gather: B windows of l_win samples from the device
stream at per-burst starts.

The XLA lowering of a batched dynamic_slice (vmap or lax.map) issues a
serialized per-row loop whose dynamic-address staging costs ~20-40 us
per row on this TPU runtime (~20 ms for a 128-burst batch — measured,
tools/exp_pallas_gather.py). This Pallas kernel instead block-DMAs
R_ROWS-row tiles chosen by a scalar-prefetched start table: ~3 ms for
the same batch.

Start decomposition (runtime/pipeline.py routing): a window beginning
at sample `w` is fetched as
    w = tile * ALIGN + r,   r = w mod 40  in [0, decim)
so the DMA grid is ALIGN-aligned while the delivered window starts at a
sample CONGRUENT to the reference's window start modulo the decimation
factor — the decimated grid, burst-start search and timestamps then
reproduce the reference's window bit-exactly, with the (multiple-of-40)
alignment lead zeroed downstream (dsp/downmix.py shift_dec).

The fine shift r is applied inside the kernel on VMEM data (a lane
rotate + row select); the main blocks plus an 8-row spill block provide
the r extra samples past the block end.

Gathers both f32 planes of the complex stream in one kernel launch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128                     # native lane width: pltpu.roll is exact
R_ROWS = 160
ALIGN = TILE * R_ROWS          # 20480 samples; multiple of 128 and 40
MAX_SHIFT = 40                 # fine shift r < decimation factor


def make_window_gather(l_win: int, interpret: bool = False):
    """Build gather(sre, sim, starts2) -> (B, l_win) f32 x2.

    sre/sim: (Mt, TILE) f32 stream planes (Mt*TILE must cover every
    window end + MAX_SHIFT).
    starts2: (B, 2) i32 — [:, 0] window start tile (sample/ALIGN),
    [:, 1] fine shift r in [0, MAX_SHIFT).
    l_win must be a multiple of ALIGN.
    """
    assert l_win % ALIGN == 0, l_win
    nt = l_win // TILE
    n_blk = nt // R_ROWS
    spill_idx_scale = R_ROWS // 8

    def kernel(st_ref, re_ref, im_ref, sre_ref, sim_ref,
               ore_ref, oim_ref):
        b = pl.program_id(0)
        r = st_ref[b, 1]
        # pltpu.roll demands a NON-NEGATIVE shift; roll(x, TILE-r) is
        # the left-roll by r we need (mod TILE), with r==0 mapped to 0.
        sh = jnp.where(r == 0, 0, TILE - r)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

        def do_plane(main, spill, out):
            # out_flat[i] = in_flat[i + r], in = [main rows | spill row0]
            rolled = pltpu.roll(main[...], sh, 1)        # lane roll by r
            rolled_n = jnp.concatenate(
                [rolled[1:], pltpu.roll(spill[0:1], sh, 1)], axis=0)
            keep = lane_iota < (TILE - r)
            out[0] = jnp.where(keep, rolled, rolled_n)

        do_plane(re_ref, sre_ref, ore_ref)
        do_plane(im_ref, sim_ref, oim_ref)

    def gather(sre, sim, starts2):
        B = starts2.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_blk),
            in_specs=[
                pl.BlockSpec((R_ROWS, TILE),
                             lambda b, t, st: (st[b, 0] + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_ROWS, TILE),
                             lambda b, t, st: (st[b, 0] + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE),
                             lambda b, t, st:
                             ((st[b, 0] + t + 1) * spill_idx_scale, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE),
                             lambda b, t, st:
                             ((st[b, 0] + t + 1) * spill_idx_scale, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, R_ROWS, TILE),
                             lambda b, t, st: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_ROWS, TILE),
                             lambda b, t, st: (b, t, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        o_re, o_im = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, nt, TILE), jnp.float32),
                jax.ShapeDtypeStruct((B, nt, TILE), jnp.float32),
            ],
            interpret=interpret,
        )(starts2, sre, sim, sre, sim)
        return o_re.reshape(B, l_win), o_im.reshape(B, l_win)

    return gather


def stream_planes(stream: jax.Array):
    """Complex device stream -> ((Mt, TILE) f32 re, im), zero-padded to
    a TILE multiple plus a spill tile."""
    n = stream.shape[0]
    mt = -(-n // TILE) + R_ROWS // 8 + 1
    pad = mt * TILE - n
    sp = jnp.pad(stream, (0, pad))
    return (sp.real.reshape(mt, TILE), sp.imag.reshape(mt, TILE))


def gather_windows_xla(stream: jax.Array, starts2: jax.Array,
                       l_win: int):
    """XLA fallback (CPU tests / verification): same windows from the
    complex stream; starts2 as in make_window_gather."""
    samp = starts2[:, 0] * ALIGN + starts2[:, 1]
    xs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(stream, (s,), (l_win,)))(samp)
    return xs.real, xs.imag
