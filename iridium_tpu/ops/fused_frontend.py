"""Fused burst front-end kernel: window gather + coarse-CFO rotate +
polyphase decimating FIR in ONE pass over the stream.

The unfused chain (ops/window_gather.py gather -> dsp/downmix.py
rotate_mxu -> decimate_mxu) materializes the (B, l_win) burst windows
plus several full-window temporaries (pads, layout copies, the (B,
n_super, K) im2col operand) — ~8 HBM passes over ~170 MB per 128-burst
job, measured as the bulk of the burst-path device time (profiler
trace, round 4). This kernel reads each window's stream tiles ONCE into
VMEM and emits only the (B, l_win/D) decimated output (a ~40x data
reduction at the production D=40):

  per grid step (burst b, ALIGN-block t):
    1. DMA the block's R_ROWS stream rows + a 16-row spill — both
       planes in one stacked DMA each — chosen by the scalar-prefetched
       start table (like the window gather);
    2. apply the fine shift r in-register (lane roll + row select);
    3. rotate by the per-burst coarse-CFO ramp exp(-2*pi*i*(k*n mod F)
       / F): the ramp is EXACTLY periodic in F, so a per-burst (F/128,
       128) table (precomputed by XLA, same values as
       downmix.rotate_mxu) is row-rolled by (t*ALIGN mod F)/128 and
       tiled — no per-sample transcendentals;
    4. polyphase matmul on the MXU: out[s*128 + c] = sum_u x[s*128*D +
       c*D + u] * h[u] as (n_sb, K_pad) @ (K_pad, 128) dots against
       the zero-interleaved tap matrix (downmix.decimate_mxu's TAPM),
       with a manual bf16x3 split for ~f32-grade accuracy. The operand
       rows are TILE-aligned 1-D chunks of the flattened rotated block
       (exactly one sublane->lane relayout per plane per step).

Preconditions (the caller falls back to the unfused path otherwise):
  - fft_size % 128 == 0 (ramp rows are lane-aligned)
  - decimation % 8 == 0 (operand chunk offsets stay aligned)
  - l_win % ALIGN == 0 (window_gather's granularity)

Start decomposition and exactness argument are shared with
ops/window_gather.py: starts2[:, 0] = window start tile, [:, 1] = fine
shift r in [0, decimation); the alignment lead is masked downstream
(dsp/downmix.py shift_dec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_gather import ALIGN, R_ROWS, TILE

SPILL_ROWS = 16


def supports(fft_size: int, decim: int, l_win: int) -> bool:
    return (fft_size % TILE == 0 and decim % 8 == 0
            and l_win % ALIGN == 0 and ALIGN % (TILE * decim) == 0)


def stack_planes(sre, sim):
    """(Mt, TILE) x2 -> (2, Mt, TILE): one stacked DMA feeds both
    planes per grid step."""
    return jnp.stack([sre, sim], axis=0)


def make_ramp_table(fft_size: int):
    """Per-burst coarse-CFO ramp planes: ks (B,) i32 bin offsets ->
    (B, 2, F/128, 128) f32 cos/sin of -2*pi*(k*n mod F)/F (exact
    integer phase; identical values to downmix.rotate_mxu's ramp)."""
    F = fft_size
    iota_f = np.arange(F, dtype=np.int32)

    def ramps(ks):
        m = jnp.mod(ks[:, None] * iota_f[None, :], F)
        ang = (-2.0 * np.pi / F) * m.astype(jnp.float32)
        shape = (-1, F // TILE, TILE)
        return jnp.stack([jnp.cos(ang).reshape(shape),
                          jnp.sin(ang).reshape(shape)], axis=1)

    return ramps


def make_fused_frontend(l_win: int, fft_size: int, decim: int,
                        taps: np.ndarray, interpret: bool = False,
                        nb: int = 8):
    """Build fused(splanes, starts2, ramp) -> (B, l_win//decim) f32 x2
    decimated planes.

    splanes: (2, Mt, TILE) stacked stream planes (stack_planes).
    starts2: (B, 2) i32 [tile, r].
    ramp: (B, 2, F/128, 128) from make_ramp_table.

    nb: bursts per grid step (round 5). At nb=1 the polyphase dot is
    (n_sb, K_pad) @ (K_pad, 128) with n_sb ~ 4 operand rows — 3% MXU
    row utilization, and the kernel measured grid-step-overhead bound
    (44.5 ms per dense group, tools/traces/group_r05_pre.txt). nb
    bursts stack their operand rows into ONE (nb*n_sb, K_pad) dot per
    plane per pass and cut grid steps nb-fold; B is padded to a
    multiple of nb on the host side (padded rows read tile 0 and are
    sliced off)."""
    assert supports(fft_size, decim, l_win), (fft_size, decim, l_win)
    NB = max(1, nb)
    F = fft_size
    Fr = F // TILE
    n_blk = l_win // ALIGN
    SB = TILE                                 # output columns per dot
    D = decim
    n_sb = ALIGN // (SB * D)                  # SB-blocks per ALIGN block
    ntaps = len(taps)
    J = (ntaps + D - 1) // D
    K = (SB + J - 1) * D
    KR = -(-K // TILE) + 1                    # operand rows (+1 slack)
    K_pad = KR * TILE
    # rows of rotated window needed per ALIGN block
    NEED = (n_sb - 1) * D + KR
    assert NEED <= R_ROWS + SPILL_ROWS - 2, (NEED, R_ROWS)
    n_reps = -(-NEED // Fr) + 1
    spill_scale = R_ROWS // SPILL_ROWS
    off_step = ALIGN // TILE                  # ramp row offset per block

    tapm = np.zeros((K_pad, SB), np.float32)
    for s in range(SB):
        tapm[s * D:s * D + ntaps, s] = taps
    # hi/lo bf16 split of the tap matrix for the manual bf16x3 matmul
    # (Mosaic supports only DEFAULT dot precision in-kernel)
    tap_hi = tapm.astype(np.dtype("bfloat16"))
    tap_lo = (tapm - tap_hi.astype(np.float32)) \
        .astype(np.dtype("bfloat16"))
    tap_hl = np.stack([tap_hi, tap_lo], axis=0)   # (2, K_pad, SB) bf16

    def kernel(*refs):
        st_ref = refs[0]
        mains = refs[1:1 + NB]
        spills = refs[1 + NB:1 + 2 * NB]
        ramp_ref = refs[1 + 2 * NB]
        tap_ref = refs[2 + 2 * NB]
        ore_ref, oim_ref = refs[3 + 2 * NB], refs[4 + 2 * NB]
        g = pl.program_id(0)
        t = pl.program_id(1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

        # ramp rows for window rows [t*off_step ...): roll + tile
        # (shared by all NB bursts: same t)
        offr = jax.lax.rem(t * off_step, Fr)
        shr = jax.lax.rem(Fr - offr, Fr)

        def dot3(X):
            # manual bf16x3: X = Xh + Xl, T = Th + Tl (exact bf16
            # splits); Xh@Th + Xh@Tl + Xl@Th accumulated in f32 gives
            # ~f32-grade error (~2^-22 relative) at 3 MXU passes —
            # XLA's HIGHEST f32 emulation measured 5.6 of this
            # kernel's 7.2 ms per 128-burst job, and Mosaic supports
            # only DEFAULT dot precision in-kernel.
            Xh = X.astype(jnp.bfloat16)
            Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)
            Th = tap_ref[0]
            Tl = tap_ref[1]
            dims = (((1,), (0,)), ((), ()))

            def d(a, b):
                return jax.lax.dot_general(
                    a, b, dims, preferred_element_type=jnp.float32)

            return d(Xh, Th) + (d(Xh, Tl) + d(Xl, Th))

        Xre_l, Xim_l = [], []
        for i in range(NB):
            r = st_ref[g * NB + i, 1]
            sh = jnp.where(r == 0, 0, TILE - r)
            keep = lane_iota < (TILE - r)

            def shifted(pi, i=i, sh=sh, keep=keep):
                """window rows [t*R_ROWS, t*R_ROWS + NEED) after the
                fine r shift (same two-level roll as the window
                gather)."""
                full = jnp.concatenate([mains[i][pi], spills[i][pi]],
                                       axis=0)
                rolled = pltpu.roll(full, sh, 1)
                nxt = rolled[1:NEED + 1]
                return jnp.where(keep, rolled[:NEED], nxt)

            def ramp_tiled(pi, i=i):
                rolled = pltpu.roll(ramp_ref[i, pi], shr, 0)
                return jnp.concatenate([rolled] * n_reps, axis=0)[:NEED]

            xr = shifted(0)
            xi = shifted(1)
            cr = ramp_tiled(0)
            ci = ramp_tiled(1)
            yr = xr * cr - xi * ci
            yi = xr * ci + xi * cr

            def xop(y):
                # ONE flatten per plane (the unavoidable sublane->lane
                # relayout), then the n_sb operand rows are cheap 1-D
                # lane chunks of it (offsets are TILE-aligned:
                # SB*D % TILE == 0)
                yf = y[:NEED].reshape(NEED * TILE)
                return jnp.concatenate(
                    [yf[s * SB * D:s * SB * D + K_pad][None]
                     for s in range(n_sb)], axis=0)

            Xre_l.append(xop(yr))
            Xim_l.append(xop(yi))

        # ONE stacked (NB*n_sb, K_pad) @ (K_pad, SB) dot per plane per
        # bf16 pass — NB x the operand rows of the per-burst dot
        Ore = dot3(jnp.concatenate(Xre_l, axis=0))
        Oim = dot3(jnp.concatenate(Xim_l, axis=0))
        # each step fills its own row t of every burst's output block
        for i in range(NB):
            ore_ref[i, t] = Ore[i * n_sb:(i + 1) * n_sb].reshape(
                n_sb * SB)
            oim_ref[i, t] = Oim[i * n_sb:(i + 1) * n_sb].reshape(
                n_sb * SB)

    def fused(splanes, starts2, ramp):
        B = starts2.shape[0]
        Bp = -(-B // NB) * NB
        if Bp != B:
            starts2 = jnp.concatenate(
                [starts2, jnp.zeros((Bp - B, 2), jnp.int32)])
            ramp = jnp.concatenate(
                [ramp, jnp.zeros((Bp - B,) + ramp.shape[1:],
                                 ramp.dtype)])

        def main_spec(i):
            return pl.BlockSpec(
                (2, R_ROWS, TILE),
                lambda g, t, st, i=i: (0, st[g * NB + i, 0] + t, 0),
                memory_space=pltpu.VMEM)

        def spill_spec(i):
            return pl.BlockSpec(
                (2, SPILL_ROWS, TILE),
                lambda g, t, st, i=i:
                (0, (st[g * NB + i, 0] + t + 1) * spill_scale, 0),
                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // NB, n_blk),
            in_specs=(
                [main_spec(i) for i in range(NB)]
                + [spill_spec(i) for i in range(NB)]
                + [
                    pl.BlockSpec((NB, 2, Fr, TILE),
                                 lambda g, t, st: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, K_pad, SB),
                                 lambda g, t, st: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ]),
            out_specs=[
                pl.BlockSpec((NB, n_blk, n_sb * SB),
                             lambda g, t, st: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, n_blk, n_sb * SB),
                             lambda g, t, st: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        o_re, o_im = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Bp, n_blk, n_sb * SB),
                                     jnp.float32),
                jax.ShapeDtypeStruct((Bp, n_blk, n_sb * SB),
                                     jnp.float32),
            ],
            interpret=interpret,
        )(starts2, *([splanes] * NB), *([splanes] * NB), ramp,
          jnp.asarray(tap_hl))
        n_out = l_win // D
        return (o_re.reshape(Bp, n_blk * n_sb * SB)[:B, :n_out],
                o_im.reshape(Bp, n_blk * n_sb * SB)[:B, :n_out])

    return fused
