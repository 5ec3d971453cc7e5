"""ONE-Mosaic-kernel burst-detector scan (the round-5 single-chip fast
path): the entire per-bin detector state machine (dsp/detect_fast.py's
semantics, itself derived from the reference burst_detect.c:426-699)
runs inside a single Pallas kernel, one grid step per 32-frame chunk.

Why: the XLA formulation of the branchless scan lowers to ~30 fused
kernels per frame at ~1.2 us fixed cost each — 78.5 ms per 2048-frame
block, 62% of the round-4 bench wall (BENCH_r04.json decomposition),
kernel-COUNT bound, not FLOP bound. In-kernel, the same per-frame body
is a handful of VPU ops on (F/128, 128) vectors plus scalar-unit
branches, and the rare paths (creation / deletion / squelch, ~14% of
frames) sit behind `pl.when` scalar branches that cost nothing when
not taken — the same control-flow shape as the reference's CPU code,
which XLA's trace-once model could not express without paying fixed
per-cond dispatch latency.

Design notes (vs the XLA twin in detect_fast.py):
  * (F,) per-bin state lives in VMEM as (F/128, 128) planes for the
    whole block; only mag2 rows stream in and emission rows stream out.
  * The noise-history ring becomes a LINEAR APPEND BUFFER in HBM
    (rows [0,H) = carried history oldest-first; row H+k = update k's
    magnitude row). Update k evicts row k — the ring arithmetic
    disappears, and each chunk needs ONE dynamic-offset DMA read of
    the next C2 candidate eviction rows and ONE append write. C2 <= H
    guarantees reads never race appends (see the chunk-safety
    argument in make_scan_pallas).
  * Burst creation is the reference's literal greedy argmax-and-mask
    walk (burst_detect.c:556-632) — clamped to the same K_CREATE
    budget as detect_fast. NOTE: detect_fast draws candidates from
    SEGMENT MAXIMA (its documented pool divergence); this kernel walks
    the true per-bin argmax like the reference, so on smooth spectral
    skirts the two can place same-frame SECONDARY creations on
    different (nearby) bins — the kernel's choice is the
    reference-faithful one (observed on-hardware: primary rows and
    baseline sums bit-identical, shoulder-peak rows at +-10 bins).
    Emission compaction is a tiny scalar loop over actually-flagged
    bins (first-bin-first = detect_fast's rank order) instead of a
    cumsum + one-hot matmul.
  * `create_waits` diverges slightly from detect_fast's diagnostic:
    here it counts frames where a candidate anywhere remained above
    threshold after a full budget, not just within the 2*K top-k pool.

The emitted gone-burst table, all carried state fields, and the
divergence bounds are identical to detect_fast (tests compare the two
row-for-row); states are interchangeable between the two
implementations (the linear buffer re-canonicalises hist_idx to 0,
which the ring formulation accepts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DetectorParams
from ..ops import windows
from .detect_fast import E_DEL, E_SQ, E_TOT, FastState  # noqa: F401

BIG = np.int32(2**30)


def _chunk_of(p: DetectorParams) -> int:
    CHUNK = max(min(32, p.history_size // 2), 1)
    while p.frames_per_block % CHUNK:
        CHUNK //= 2
    return CHUNK


def supports(p: DetectorParams) -> bool:
    """Single-chip shapes the kernel handles; callers fall back to
    detect_fast otherwise."""
    CHUNK = _chunk_of(p)
    return (p.fft_size % 128 == 0
            and CHUNK % 16 == 0              # ems block lane alignment
            and 2 * CHUNK <= p.history_size  # chunk-safety invariant
            and p.gone_capacity <= p.frames_per_block * E_TOT)


def resolve_impl(p: DetectorParams, requested: str = "auto") -> str:
    """'auto' -> 'pallas' on TPU-class backends when the shape is
    supported, else 'fast' (Mosaic does not target the CPU backend;
    interpret mode is for tests only)."""
    if requested != "auto":
        return requested
    backend = jax.default_backend()
    return "pallas" if (backend != "cpu" and supports(p)) else "fast"


def make_scan_pallas(p: DetectorParams, interpret: bool = False):
    """Build run(mag2, state, n_valid) -> FastState over per-frame
    fftshifted magnitude^2 rows. Single-chip only (the sharded path
    keeps the XLA scan: its per-frame psum coupling belongs to XLA's
    collective layer, not a per-chip kernel)."""
    assert supports(p), "use detect_fast for this configuration"
    F = p.fft_size
    R = F // 128
    H = p.history_size
    G = p.gone_capacity
    half_bw = p.burst_width_bins // 2
    dc = F // 2
    threshold = np.float32(p.threshold)
    hist_f = np.float32(H)
    enbw = np.float32(windows.BLACKMAN_ENBW)
    bin_width = np.float32(p.sample_rate) / np.float32(F)
    f2 = np.float32(F) * np.float32(F)
    K_CREATE = max(1, min(4, p.max_new_per_frame))
    n_frames = p.frames_per_block
    CHUNK = _chunk_of(p)
    C2 = 2 * CHUNK
    n_chunks = n_frames // CHUNK
    U_MAX = 2 * n_frames                     # <=2 noise updates / frame
    NE = CHUNK * E_TOT
    max_burst_len = np.int32(p.max_burst_len)
    post_len = np.int32(p.burst_post_len)
    pre_len = np.int32(p.burst_pre_len)
    max_bursts = int(p.max_bursts)

    i32 = jnp.int32

    def _gidx():
        return (jax.lax.broadcasted_iota(i32, (R, 128), 0) * 128
                + jax.lax.broadcasted_iota(i32, (R, 128), 1))

    def _col():
        return jax.lax.broadcasted_iota(i32, (R, 128), 1)

    def _shift_p1(x):
        """y[i] = x[i+1] in flattened bin order; y[F-1] = 0.
        pltpu.roll moves elements toward higher indices, so a shift of
        N-1 is the backward roll."""
        l = pltpu.roll(x, 127, axis=1)
        rr = pltpu.roll(l, R - 1, axis=0)
        y = jnp.where(_col() == 127, rr, l)
        return jnp.where(_gidx() == F - 1, 0.0, y)

    def _shift_m1(x):
        """y[i] = x[i-1]; y[0] = 0."""
        l = pltpu.roll(x, 1, axis=1)
        rr = pltpu.roll(l, 1, axis=0)
        y = jnp.where(_col() == 0, rr, l)
        return jnp.where(_gidx() == 0, 0.0, y)

    def _at_i(vec_i32, oh):
        return jnp.sum(jnp.where(oh, vec_i32, 0))

    def _at_f(vec_f32, oh):
        return jnp.sum(jnp.where(oh, vec_f32, 0.0))

    def kernel(sci, scf, svi, svf, mag_ref, hist_in,
               ems_ref, sco_i, sco_f, svi_o, svf_o, hist_out,
               pre, win, cand, flg, crt, sems, sm):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            for k in range(8):
                sco_i[k] = sci[k]
            sco_f[0] = scf[0]
            sco_f[1] = jnp.float32(0)
            svi_o[:] = svi[:]
            svf_o[:] = svf[:]
            d = pltpu.make_async_copy(
                hist_in, hist_out.at[pl.ds(0, H)], sems.at[2])
            d.start()
            d.wait()

        n_valid = sci[7]
        k_start = sco_i[4]
        sm[0] = k_start
        rd = pltpu.make_async_copy(
            hist_out.at[pl.ds(k_start, C2)], pre, sems.at[0])
        rd.start()
        rd.wait()
        ems_ref[:] = jnp.zeros((8, NE), i32)

        def write_ems(col, idv, startv, stopv, lastv, binv, magb, noiseb):
            cio = jax.lax.broadcasted_iota(i32, (1, NE), 1)
            vals = jnp.stack([idv, startv, stopv, lastv, binv,
                              magb, noiseb, i32(1)]).reshape(8, 1)
            ems_ref[:] = jnp.where(cio == col, vals, ems_ref[:])

        def noise_update(mag):
            """Running-sum update (burst_detect.c:438-454), linear-
            buffer addressing: update k evicts row k, appends row H+k
            (the append DMA happens at chunk end from `win`)."""
            k_loc = sco_i[4] - sm[0]
            ev = pre[k_loc]
            gate = sco_i[0] >= H
            svf_o[2] = (svf_o[2] - jnp.where(gate, ev, 0.0)) + mag
            win[k_loc] = mag
            sco_i[0] = jnp.minimum(sco_i[0] + 1, H)
            sco_i[4] = sco_i[4] + 1

        def frame_body(f, _):
            idx = (c * CHUNK + f) * F
            act = (idx + F) <= n_valid
            mag = mag_ref[f]
            primed = (sco_i[0] >= H) & act
            bsum0 = svf_o[2]
            rel = jnp.where(bsum0 > 0, mag / bsum0, 0.0)
            n_act_pre = jnp.sum(svi_o[0])

            # candidate pool from the CARRIED (frame-start) mask
            # (reference extract_peaks runs before delete_gone,
            # burst_detect.c:679-699)
            g = _gidx()
            elig = ((g >= half_bw) & (g < F - half_bw)
                    & ~((g >= dc - 3) & (g <= dc + 3)))
            relm = jnp.where((svi_o[4] == 0) & elig, rel, 0.0)
            cand[:] = jnp.where(relm > threshold, relm, 0.0)
            crt[:] = jnp.zeros((R, 128), i32)
            sm[1] = 0          # accepted creations this frame
            sm[2] = 1          # creation walk live

            @pl.when(primed & (n_act_pre > 0))
            def _():
                # update_bursts: extend last_active on +-1-bin
                # threshold dilation (burst_detect.c:458-469)
                dil = jnp.maximum(rel, jnp.maximum(
                    _shift_p1(rel), _shift_m1(rel))) > threshold
                avl = svi_o[0] > 0
                svi_o[3] = jnp.where(avl & dil, idx, svi_o[3])

                # delete_gone_bursts (burst_detect.c:490-518)
                longb = avl & ((svi_o[3] - svi_o[2]) > max_burst_len)
                gone = avl & (((svi_o[3] + post_len) <= idx) | longb)
                n_del = jnp.sum(gone.astype(i32))

                @pl.when(n_del > 0)
                def _():
                    any_long = jnp.sum(longb.astype(i32)) > 0
                    flg[:] = gone.astype(i32)
                    sco_i[3] = sco_i[3] + n_del
                    sco_i[5] = sco_i[5] + jnp.maximum(n_del - E_DEL, 0)
                    magb_v = pltpu.bitcast(svf_o[0], i32)
                    noiseb_v = pltpu.bitcast(svf_o[1], i32)

                    def del_body(e, _):
                        b = jnp.min(jnp.where(flg[:] > 0, _gidx(), BIG))
                        oh = _gidx() == b
                        # release the +-half_bw mask interval (clip at
                        # edges, burst_detect.c:473-486)
                        svi_o[4] = (svi_o[4]
                                    - (jnp.abs(_gidx() - b) <= half_bw)
                                    .astype(i32))
                        flg[:] = jnp.where(oh, 0, flg[:])

                        @pl.when(e < E_DEL)
                        def _():
                            write_ems(f * E_TOT + e,
                                      _at_i(svi_o[1], oh),
                                      _at_i(svi_o[2], oh), idx,
                                      _at_i(svi_o[3], oh), b,
                                      _at_i(magb_v, oh),
                                      _at_i(noiseb_v, oh))
                        return 0

                    jax.lax.fori_loop(0, n_del, del_body, 0)
                    svi_o[0] = jnp.where(gone, 0, svi_o[0])

                    # forced noise update on long-burst deletion
                    # (burst_detect.c:516)
                    @pl.when(any_long)
                    def _():
                        noise_update(mag)

            # create_new_bursts: greedy argmax-and-mask
            # (burst_detect.c:556-632); budget K_CREATE as detect_fast
            for _j in range(K_CREATE):
                @pl.when(sm[2] > 0)
                def _():
                    m = jnp.max(cand[:])
                    take = primed & (m > threshold)

                    @pl.when(take)
                    def _():
                        b = jnp.min(jnp.where(cand[:] == m, _gidx(),
                                              BIG))
                        oh = _gidx() == b
                        base_at = _at_f(svf_o[2], oh)
                        mag_db = 10.0 * jnp.log10(
                            jnp.maximum(m * hist_f * enbw,
                                        jnp.float32(1e-30)))
                        noise_db = 10.0 * jnp.log10(jnp.maximum(
                            base_at / hist_f / f2 / enbw / bin_width,
                            jnp.float32(1e-30)))
                        idv = sco_i[1]
                        sco_i[1] = idv + 10
                        svi_o[0] = jnp.where(oh, 1, svi_o[0])
                        svi_o[1] = jnp.where(oh, idv, svi_o[1])
                        svi_o[2] = jnp.where(oh, idx - pre_len,
                                             svi_o[2])
                        svi_o[3] = jnp.where(oh, idx - pre_len,
                                             svi_o[3])
                        svf_o[0] = jnp.where(oh, mag_db, svf_o[0])
                        svf_o[1] = jnp.where(oh, noise_db, svf_o[1])
                        crt[:] = jnp.where(oh, 1, crt[:])
                        nb = jnp.abs(_gidx() - b) <= half_bw
                        svi_o[4] = svi_o[4] + nb.astype(i32)
                        cand[:] = jnp.where(nb, 0.0, cand[:])
                        sco_f[0] = jnp.maximum(sco_f[0], mag_db)
                        sm[1] = sm[1] + 1

                    @pl.when(jnp.logical_not(take))
                    def _():
                        sm[2] = 0

            @pl.when(sm[1] == K_CREATE)
            def _():
                sco_i[6] = sco_i[6] + (jnp.max(cand[:])
                                       > threshold).astype(i32)

            # squelch (burst_detect.c:594-631)
            n_act_post = jnp.sum(svi_o[0])
            squelch = (primed & (n_act_post > max_bursts)
                       if max_bursts > 0 else jnp.bool_(False))

            @pl.when(squelch)
            def _():
                sq = (svi_o[0] > 0) & (crt[:] == 0)
                n_sq = jnp.sum(sq.astype(i32))
                sco_i[3] = sco_i[3] + n_sq
                sco_i[5] = sco_i[5] + jnp.maximum(n_sq - E_SQ, 0)
                flg[:] = sq.astype(i32)
                magb_v = pltpu.bitcast(svf_o[0], i32)
                noiseb_v = pltpu.bitcast(svf_o[1], i32)

                def sq_body(e, _):
                    b = jnp.min(jnp.where(flg[:] > 0, _gidx(), BIG))
                    oh = _gidx() == b
                    write_ems(f * E_TOT + E_DEL + e,
                              _at_i(svi_o[1], oh),
                              _at_i(svi_o[2], oh), idx,
                              _at_i(svi_o[3], oh), b,
                              _at_i(magb_v, oh), _at_i(noiseb_v, oh))
                    flg[:] = jnp.where(oh, 0, flg[:])
                    return 0

                jax.lax.fori_loop(0, jnp.minimum(n_sq, E_SQ),
                                  sq_body, 0)
                svi_o[0] = jnp.zeros((R, 128), i32)
                svi_o[4] = jnp.zeros((R, 128), i32)
                sco_i[2] = sco_i[2] + 3

            @pl.when(jnp.logical_not(squelch) & act)
            def _():
                sco_i[2] = jnp.maximum(sco_i[2] - 1, 0)

            # noise-estimate reset after repeated squelch; history
            # rows continue contiguously (primed gate re-arms)
            @pl.when(act & (sco_i[2] >= 10))
            def _():
                svf_o[2] = jnp.zeros((R, 128), jnp.float32)
                sco_i[0] = 0
                sco_i[2] = 0

            # final noise update if no active bursts
            # (burst_detect.c:698); squelch emptied the table exactly
            n2 = jnp.where(squelch, 0, n_act_post)

            @pl.when(act & (n2 == 0))
            def _():
                noise_update(mag)

            return 0

        jax.lax.fori_loop(0, CHUNK, frame_body, 0)

        wr = pltpu.make_async_copy(
            win, hist_out.at[pl.ds(H + k_start, C2)], sems.at[1])
        wr.start()
        wr.wait()

    @jax.jit
    def run(mag2, state: FastState, n_valid):
        # resolve the carried ring to oldest-first linear order
        hist_res = jnp.roll(state.baseline_hist, -state.hist_idx,
                            axis=0).reshape(H, R, 128)
        sci = jnp.stack([state.primed, state.burst_id,
                         state.squelch_count, state.n_tagged,
                         jnp.int32(0), state.burst_dropped,
                         state.create_waits,
                         jnp.asarray(n_valid, jnp.int32)])
        scf = jnp.stack([state.peak_signal_db, jnp.float32(0)])
        svi = jnp.stack([state.a_valid.astype(jnp.int32), state.a_id,
                         state.a_start, state.a_last,
                         state.mask_count]).reshape(5, R, 128)
        svf = jnp.stack([state.a_mag, state.a_noise,
                         state.baseline_sum]).reshape(3, R, 128)
        mag3 = mag2.reshape(n_frames, R, 128)

        ems, sco_i, sco_f, svi_o, svf_o, hist_lin = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, R, 128), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((8, NE), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((8, n_frames * E_TOT), jnp.int32),
                jax.ShapeDtypeStruct((8,), jnp.int32),
                jax.ShapeDtypeStruct((2,), jnp.float32),
                jax.ShapeDtypeStruct((5, R, 128), jnp.int32),
                jax.ShapeDtypeStruct((3, R, 128), jnp.float32),
                jax.ShapeDtypeStruct((H + U_MAX + C2, R, 128),
                                     jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((C2, R, 128), jnp.float32),
                pltpu.VMEM((C2, R, 128), jnp.float32),
                pltpu.VMEM((R, 128), jnp.float32),
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SMEM((4,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(sci, scf, svi, svf, mag3, hist_res)

        total_upd = sco_i[4]
        new_hist = jax.lax.dynamic_slice(
            hist_lin, (total_upd, 0, 0), (H, R, 128)).reshape(H, F)

        # gone-table assembly: same frame-major emission-slot order as
        # detect_fast.run's multi-operand sort
        valid_i = ems[7] > 0
        key = jnp.where(valid_i,
                        jnp.arange(ems.shape[1], dtype=jnp.int32),
                        BIG)
        cols = jax.lax.sort(
            [key] + [ems[c] for c in range(7)], num_keys=1)
        n_emitted = jnp.sum(valid_i.astype(jnp.int32))
        in_table = jnp.arange(G, dtype=jnp.int32) < n_emitted

        def col(i):
            return jnp.where(in_table, cols[1 + i][:G], 0)

        return state._replace(
            baseline_hist=new_hist,
            baseline_sum=svf_o[2].reshape(F),
            hist_idx=jnp.int32(0),
            primed=sco_i[0],
            a_valid=svi_o[0].reshape(F) > 0,
            a_id=svi_o[1].reshape(F),
            a_start=svi_o[2].reshape(F),
            a_last=svi_o[3].reshape(F),
            a_mag=svf_o[0].reshape(F),
            a_noise=svf_o[1].reshape(F),
            mask_count=svi_o[4].reshape(F),
            g_count=jnp.minimum(n_emitted, G),
            g_id=col(0), g_start=col(1), g_stop=col(2), g_last=col(3),
            g_bin=col(4),
            g_mag=jax.lax.bitcast_convert_type(col(5), jnp.float32),
            g_noise=jax.lax.bitcast_convert_type(col(6), jnp.float32),
            burst_id=sco_i[1],
            squelch_count=sco_i[2],
            n_tagged=sco_i[3],
            peak_signal_db=sco_f[0],
            burst_dropped=sco_i[5],
            create_waits=sco_i[6],
        )

    return run


def make_detect_block_pallas(p: DetectorParams, interpret: bool = False):
    """detect(samples, state, n_valid) -> FastState: batched
    window+FFT+mag^2 spectrogram (XLA — large batched FFTs are already
    MXU/FFT-library territory) feeding the single-kernel scan."""
    F = p.fft_size
    n_frames = p.frames_per_block
    window = windows.blackman(F) / np.float32(0.42)
    run = make_scan_pallas(p, interpret=interpret)

    def detect(samples: jax.Array, state: FastState,
               n_valid: jax.Array) -> FastState:
        frames = samples[: n_frames * F].reshape(n_frames, F)
        spec = jnp.fft.fft(frames * jnp.asarray(window)[None, :])
        mag2 = jnp.fft.fftshift(
            (jnp.abs(spec) ** 2).astype(jnp.float32), axes=-1)
        return run(mag2, state, n_valid)

    return detect
