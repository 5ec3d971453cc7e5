"""Multi-chip sharded pipeline (mesh + shard_map + collectives).

The reference is a single-node pthread pipeline (`main.c:666-734`); its
only "distribution" is socket fan-out. This module is the TPU-native
first-class replacement (SURVEY.md §2.5): an SPMD pipeline over a 1-D
device mesh with a multi-block host driver.

Two jitted SPMD steps per block:

  detect_step: spectrogram with the FFT-frame axis time-sharded (the
    embarrassingly parallel bulk compute) -> `all_to_all` transpose to
    bin-sharded layout -> `ppermute` +-halo bin strips -> per-bin-shard
    burst state machine. Default is the branchless chunked per-bin scan
    (dsp/detect_fast.py) — the single-chip fast path — whose only
    global couplings (active-burst count for the noise gate and
    squelch, forced noise update on long bursts; burst_detect.c:
    438-454, 516, 594-631) are three scalar psums per frame. The exact
    per-frame scan (dsp/detect.py) remains available via
    detect_impl="exact" as the verification twin.

  process_step: FULLY DEVICE-ROUTED burst downmix+demod, the sharded
    twin of the single-chip fused group program (runtime/pipeline.py:
    _fused_for). Each shard all_gathers the (tiny) gone tables over
    ICI, computes the identical global routing (extraction window,
    owner = time-shard containing the window end, small-normal /
    small-simplex / large class split, gather-kernel start
    decomposition), keeps the bursts IT owns, rank-compacts them into
    fixed (J, 5, Bb) params per class, and runs the bucket processors
    against its local halo-extended stream (left halo via a ring
    `ppermute` chain; shard 0 splices the previous block's tail). The
    result buffer [local gone table | per-class counts | meta | packed
    demod rows] comes back in ONE fetch per block; per-shard batch
    counts are independent (an idle shard's padded jobs are skipped by
    a cond, so the most-loaded shard no longer sets every shard's
    cost).

Burst ids are globally unique via per-shard offset + stride; known
divergence class vs single-chip: deep masking chains across bin-shard
borders (same tolerance class as the reference's own GPU-vs-CPU
divergence, README.md:226).

Multi-host: see parallel/distributed.py — the same mesh/steps span
(hosts x chips); every host fetches the identical result buffer (its
addressable shards + a process allgather), so routing, stats and
overflow rounds agree everywhere; emission stays host-0-only.
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import iridium
from ..config import DetectorConfig, DetectorParams, DownmixConfig, DownmixParams
from ..dsp import demod as demod_mod
from ..dsp import detect, detect_fast, downmix
from ..ops import window_gather as wg
from ..ops import windows
from ..runtime import pipeline as pl_mod

AXIS = "shards"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedPipeline:
    """SPMD detect + fused burst-process steps over an n-device mesh,
    plus a multi-block host driver with the same frame-dict output
    contract as the single-chip `runtime.pipeline.Pipeline`."""

    def __init__(self,
                 det_cfg: DetectorConfig,
                 dm_cfg: DownmixConfig | None = None,
                 mesh: Mesh | None = None,
                 burst_batch: int = 8,
                 use_gardner: bool = True,
                 start_time_ns: int | None = None,
                 want_llr: bool = True,
                 fir_mode: str = "mxu",
                 gather_mode: str = "auto",
                 detect_impl: str = "fast",
                 group_jobs: int = 2,
                 agg_blocks: int = 4,
                 detect_mode: str = "replicated",
                 scan_mode: str = "auto"):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (AXIS,))
        self.mesh = mesh
        self.n = mesh.devices.size
        self.p: DetectorParams = det_cfg.derived()
        self.dmp: DownmixParams = (dm_cfg or DownmixConfig()).derived(self.p)
        p, dmp, n = self.p, self.dmp, self.n

        # detect_mode (round 5):
        #   "replicated" (default): the spectrogram is computed on each
        #     chip's TIME slice, all_gathered over ICI (64 MB/block at
        #     production shapes — sub-ms on chip links), and the
        #     detector state machine runs IDENTICALLY on every chip
        #     (the single-Mosaic-kernel scan costs ~3 ms/block, so
        #     replicating it is far cheaper than the bin-sharded
        #     scan's per-frame psum coupling + fixed per-frame op
        #     count, which does NOT shrink with shard width). No
        #     detect collectives at all; burst ids and tables match
        #     single-chip EXACTLY.
        #   "binshard": the round-4 per-bin sharded scan (one
        #     two-element psum per frame) — kept as the A/B twin and
        #     for meshes where even the replicated scan's fixed cost
        #     matters.
        assert detect_mode in ("replicated", "binshard"), detect_mode
        self.detect_mode = detect_mode
        # scan_mode (replicated mode only): 'auto' = Mosaic kernel on
        # TPU / XLA scan elsewhere; 'xla' forces the XLA scan (the
        # --scan hardware A/B seam, like the single-chip pipeline)
        assert scan_mode in ("auto", "pallas", "xla"), scan_mode
        self.scan_mode = scan_mode
        assert p.fft_size % n == 0, "fft_size must divide by mesh size"
        assert (p.frames_per_block % n) == 0, \
            "frames_per_block must divide by mesh size"
        assert (p.block_samples % n) == 0
        self.own_bins = p.fft_size // n
        # Two mask widths: covers second-order masking chains across the
        # border (burst A masks B, whose absence admits C, ...). Deeper
        # chains can still race at borders — same tolerance class as the
        # reference's own GPU-vs-CPU divergence (README.md:226).
        self.halo = 2 * (p.burst_width_bins // 2) + 1
        assert detect_mode == "replicated" or self.halo <= self.own_bins, \
            "bin shard narrower than burst mask halo"
        self.n_bins_local = self.own_bins + 2 * self.halo
        self.burst_batch = burst_batch
        self.group_jobs = max(group_jobs, 1)
        # agg_blocks: how many blocks share ONE result fetch (the
        # single-chip driver's group aggregation, ported round 5; the
        # process dispatches stay per-block — every host issues the
        # same SPMD calls in the same order — but their buffers are
        # stacked on device and fetched in one RPC)
        self.agg_blocks = max(agg_blocks, 1)
        self.want_llr = want_llr
        self.fir_mode = fir_mode
        assert gather_mode in ("auto", "pallas", "xla"), gather_mode
        self.gather_mode = gather_mode
        self.detect_impl = detect_impl
        self.slice_len = p.block_samples // n

        in_ntaps = len(downmix.make_consts(dmp).input_taps)
        self.in_ntaps = in_ntaps
        # Window sizing mirrors the single-chip pipeline: gather-kernel
        # ALIGN granularity + one block of alignment lead
        self.l_ext = _round_up(
            max(p.max_extract,
                (dmp.dec_cap - 1) * dmp.decimation + in_ntaps)
            + wg.ALIGN,
            wg.ALIGN)
        self.l_small = min(self.l_ext, _round_up(
            p.burst_pre_len + p.burst_post_len + 120_000 + in_ntaps
            + wg.ALIGN, wg.ALIGN))
        # Ring hops needed so each shard's left halo spans l_ext samples
        # even when the per-shard time slice is shorter than a window.
        self.k_hops = -(-self.l_ext // self.slice_len)

        margin_hz = 150e3
        self.simplex_bin_min = int(np.floor(
            (iridium.SIMPLEX_FREQUENCY_MIN - margin_hz
             - p.center_frequency) * p.fft_size / p.sample_rate)
        ) + p.fft_size // 2

        self._build(use_gardner)
        # group-fetch stack (one compile per group arity)
        self._stack_bufs = jax.jit(lambda *xs: jnp.stack(xs))
        self.start_time_ns = start_time_ns
        self.reset(start_time_ns)

    # ---- state helpers ----

    def init_state(self):
        """Replicated full-spectrum state (detect_mode=replicated) or
        stacked per-shard state sharded over the mesh (binshard)."""
        mk = (detect_fast.init_state if self.detect_impl == "fast"
              else detect.init_state)
        if self.detect_mode == "replicated":
            st = mk(self.p)
            sh = NamedSharding(self.mesh, P())
            return jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), sh), st)
        shards = [mk(self.p, self.n_bins_local, id_offset=i)
                  for i in range(self.n)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *shards)
        sh = NamedSharding(self.mesh, P(AXIS))
        return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)

    def reset(self, start_time_ns: int | None = None) -> None:
        import collections
        self.state = self.init_state()
        self.tail = jax.device_put(
            np.zeros((self.l_ext, 2), np.float32),
            NamedSharding(self.mesh, P()))
        self._rebase = 0
        self.base_index = 0
        self.prev_tagged = 0
        self.stats = pl_mod.PipelineStats()
        self.start_time_ns = start_time_ns
        self.timing = collections.Counter()

    # ---- the SPMD steps ----

    def _max_symbols_for(self, frame_cap: int) -> int:
        sps = self.dmp.samples_per_symbol
        return int(frame_cap / (sps - 0.5)) + 4

    def _make_bucket(self, l_win: int, frame_cap: int, J: int, Bb: int,
                     use_gardner: bool):
        """One demod-length/window bucket: gather + downmix + demod +
        pack over (J, 5, Bb) params against the local shard stream
        (the sharded twin of pipeline._make_group_processor)."""
        p, dmp = self.p, self.dmp
        dec_cap = (l_win - self.in_ntaps) // dmp.decimation + 1
        dm_one = downmix.make_downmix_one(p, dmp, l_win, frame_cap,
                                          dec_cap=dec_cap,
                                          fir_mode=self.fir_mode)
        demod_one = demod_mod.make_demod(
            self._max_symbols_for(frame_cap),
            dmp.samples_per_symbol, use_gardner)
        want_llr = self.want_llr
        # per-CLASS packed width (round 5, like the single-chip
        # processors): pad only to this bucket's own symbol cap
        ms_cls = self._max_symbols_for(frame_cap)
        s2_pad = 2 * ms_cls
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = (self.gather_mode == "pallas"
                      or (self.gather_mode == "auto" and on_tpu))
        from ..ops import fused_frontend as ff
        use_fused = use_pallas and ff.supports(p.fft_size,
                                               dmp.decimation, l_win)
        if use_fused:
            fused_fn = ff.make_fused_frontend(
                l_win, p.fft_size, dmp.decimation,
                np.asarray(dm_one.input_taps))
            ramp_fn = ff.make_ramp_table(p.fft_size)
            gfn = None
        else:
            fused_fn = None
            gfn = wg.make_window_gather(l_win) if use_pallas else None
        W = pl_mod.packed_width(ms_cls, want_llr)

        def one(stream, planes, pr):
            def live():
                starts2 = jnp.stack([pr[0], pr[1]], axis=1)
                if fused_fn is not None:
                    ramp = ramp_fn(pr[3] - p.fft_size // 2)
                    dre, dim = fused_fn(planes[2], starts2, ramp)
                    dec_full = jax.lax.complex(dre, dim)[:, :dec_cap]
                    dm = dm_one.from_dec(dec_full, pr[2], pr[3], pr[4])
                elif gfn is not None:
                    xs_re, xs_im = gfn(planes[0], planes[1], starts2)
                    dm = dm_one.windows(xs_re, xs_im, pr[2], pr[3],
                                        pr[4])
                else:
                    xs_re, xs_im = wg.gather_windows_xla(
                        stream, starts2, l_win)
                    dm = dm_one.windows(xs_re, xs_im, pr[2], pr[3],
                                        pr[4])
                dd = jax.vmap(demod_one)(dm.samples, dm.n_samples,
                                         dm.direction)
                return pl_mod.pack_outputs(dm, dd, want_llr=want_llr,
                                           s2_pad=s2_pad)

            return jax.lax.cond(
                jnp.any(pr[2] > 0), live,
                lambda: jnp.zeros((Bb, W), jnp.int32))

        def run(stream, planes, params):
            return jax.lax.map(lambda pr: one(stream, planes, pr),
                               params)

        run.n_jobs = J
        run.batch = Bb
        run.W = W
        run.max_symbols = ms_cls
        return run

    def _build(self, use_gardner: bool):
        p, dmp, n = self.p, self.dmp, self.n
        F = p.fft_size
        FL = self.n_bins_local
        halo = self.halo
        own = self.own_bins
        ls = self.slice_len
        l_ext, l_small = self.l_ext, self.l_small
        G = p.gone_capacity
        window = windows.blackman(F) / np.float32(0.42)
        perm_r = [(i, (i + 1) % n) for i in range(n)]
        perm_l = [(i, (i - 1) % n) for i in range(n)]
        fast = self.detect_impl == "fast"
        rep = self.detect_mode == "replicated"
        if rep:
            from ..dsp import detect_pallas
            want = ("pallas" if self.scan_mode == "pallas"
                    else detect_pallas.resolve_impl(p, "auto")
                    if self.scan_mode == "auto" else "fast")
            if fast and want == "pallas":
                run_rep = detect_pallas.make_scan_pallas(p)
            elif fast:
                run_rep = detect_fast.make_scan_fast(p)
            else:
                frame_step_rep = detect.make_frame_step(p)

                def run_rep(mag2, state, n_valid):
                    idxs = np.arange(p.frames_per_block,
                                     dtype=np.int32) * F
                    active = (idxs + F) <= n_valid
                    return detect.run_state_machine(
                        mag2, idxs, active, state, frame_step_rep)
        elif fast:
            run_fast = detect_fast.make_scan_fast(p, FL, axis_name=AXIS,
                                                  id_stride=n)

        def bc_i32(v):
            return jax.lax.bitcast_convert_type(v, jnp.int32)

        # -- detect --

        def shard_detect_rep(pairs_loc, state, n_valid, do_rebase):
            """Replicated scan: local-time spectrogram, all_gather the
            frame rows over ICI, then the full-spectrum state machine
            runs identically on every chip (no collectives; tables and
            burst ids equal single-chip bit-for-bit)."""
            shift = do_rebase * p.block_samples
            state = state._replace(
                a_start=state.a_start - shift,
                a_last=state.a_last - shift,
                g_count=state.g_count * 0)
            samples_loc = jax.lax.complex(pairs_loc[:, 0],
                                          pairs_loc[:, 1])
            mag2_loc = detect.spectrogram(samples_loc, window, F)
            mag2 = jax.lax.all_gather(mag2_loc, AXIS, tiled=True)
            state = run_rep(mag2, state, n_valid)
            z = jnp.zeros((), jnp.int32)
            head = jnp.stack([state.g_count, state.n_tagged,
                              getattr(state, "burst_dropped", z),
                              getattr(state, "create_waits", z), z, z])
            rows = jnp.stack(
                [state.g_id, state.g_start, state.g_stop, state.g_bin,
                 bc_i32(state.g_mag), bc_i32(state.g_noise)], axis=1)
            packed = jnp.concatenate([head[None, :], rows], axis=0)
            return state, packed

        def shard_detect(pairs_loc, state, n_valid, do_rebase):
            state = jax.tree.map(lambda x: x[0], state)
            shift = do_rebase * p.block_samples
            state = state._replace(
                a_start=state.a_start - shift,
                a_last=state.a_last - shift,
                g_count=state.g_count * 0)
            me = jax.lax.axis_index(AXIS)
            bin_lo = me * own - halo
            samples_loc = jax.lax.complex(pairs_loc[:, 0], pairs_loc[:, 1])

            # 1. spectrogram on the local time shard
            mag2 = detect.spectrogram(samples_loc, window, F)
            frames_loc = mag2.shape[0]

            # 2. transpose to bin shards + ring halo exchange
            magT = jax.lax.all_to_all(mag2, AXIS, split_axis=1,
                                      concat_axis=0, tiled=True)
            left = jax.lax.ppermute(magT[:, -halo:], AXIS, perm_r)
            right = jax.lax.ppermute(magT[:, :halo], AXIS, perm_l)
            mag_ext = jnp.concatenate([left, magT, right], axis=1)

            # 3. burst state machine over this shard's bins
            if fast:
                state = run_fast(mag_ext, state, n_valid,
                                 bin_lo=bin_lo, own_lo=me * own,
                                 own_hi=(me + 1) * own)
            else:
                frame_step = detect.make_frame_step(
                    p, axis_name=AXIS, bin_lo=bin_lo, n_bins=FL,
                    own_lo=me * own, own_hi=(me + 1) * own, id_stride=n)
                n_frames = frames_loc * n
                idxs = np.arange(n_frames, dtype=np.int32) * F
                active = (idxs + F) <= n_valid
                state = detect.run_state_machine(mag_ext, idxs, active,
                                                 state, frame_step)

            # 4. packed per-shard gone table
            z = jnp.zeros((), jnp.int32)
            head = jnp.stack([state.g_count, state.n_tagged,
                              getattr(state, "burst_dropped", z),
                              getattr(state, "create_waits", z), z, z])
            rows = jnp.stack(
                [state.g_id, state.g_start, state.g_stop, state.g_bin,
                 bc_i32(state.g_mag), bc_i32(state.g_noise)], axis=1)
            packed = jnp.concatenate([head[None, :], rows], axis=0)

            state = jax.tree.map(lambda x: x[None], state)
            return state, packed[None]

        if rep:
            init_for_specs = (detect_fast.init_state(self.p) if fast
                              else detect.init_state(self.p))
            state_specs = jax.tree.map(lambda _: P(), init_for_specs)
            packed_spec = P()
            detect_sm = jax.shard_map(
                shard_detect_rep, mesh=self.mesh,
                in_specs=(P(AXIS), state_specs, P(), P()),
                out_specs=(state_specs, packed_spec),
                check_vma=False)
        else:
            init_for_specs = (detect_fast.init_state(self.p, FL) if fast
                              else detect.init_state(self.p, FL))
            state_specs = jax.tree.map(lambda _: P(AXIS), init_for_specs)
            packed_spec = P(AXIS)
            detect_sm = jax.shard_map(
                shard_detect, mesh=self.mesh,
                in_specs=(P(AXIS), state_specs, P(), P()),
                out_specs=(state_specs, packed_spec),
                check_vma=False)

        def detect_step(pairs, state, n_valid, do_rebase, prev_tail):
            state, packed = detect_sm(pairs, state, n_valid, do_rebase)
            # replicated rolling tail for the next block's shard-0 halo
            # (accumulated across blocks: l_ext may exceed one block)
            tail = jnp.concatenate([prev_tail, pairs], axis=0)[-l_ext:]
            return state, packed, tail

        def _spec_sh(spec):
            return NamedSharding(self.mesh, spec)

        st_spec = P() if rep else P(AXIS)
        self.detect_step = jax.jit(
            detect_step,
            out_shardings=(
                jax.tree.map(lambda _: _spec_sh(st_spec),
                             init_for_specs),
                _spec_sh(packed_spec),
                _spec_sh(P())))

        # -- fused on-device-routed burst processing --

        cap_n = int(iridium.MAX_FRAME_LENGTH_NORMAL
                    * dmp.samples_per_symbol) + 8
        # fewer, fuller jobs per class (round-5 reshape, mirroring the
        # single-chip processors: per-JOB fixed cost dominated the
        # dense-group profile)
        Bb = self.burst_batch
        Bl = max(2, Bb // 8)
        J = self.group_jobs
        buckets = [
            self._make_bucket(l_small, cap_n, max(J // 2, 1), 2 * Bb,
                              use_gardner),
            self._make_bucket(l_small, dmp.max_frame_samples,
                              max(J // 6, 1), 3 * Bl, use_gardner),
            self._make_bucket(l_ext, dmp.max_frame_samples,
                              max(J // 12, 1), 3 * Bl, use_gardner),
        ]
        self.class_caps = [b.n_jobs * b.batch for b in buckets]
        self.class_ws = [b.W for b in buckets]
        self.class_mss = [b.max_symbols for b in buckets]
        # per-shard buffer: [head (6)] [ncs (3)] [metas] [table
        # windows (6*cap per class)] [packed rows at per-class widths]
        self.buf_len = (6 + 3 + 7 * sum(self.class_caps)
                        + sum(c * w for c, w in zip(self.class_caps,
                                                    self.class_ws)))
        k_hops = self.k_hops
        hist_pad = k_hops * ls - l_ext
        decim = dmp.decimation
        ALIGN = wg.ALIGN
        pre = p.burst_pre_len
        simplex_min = self.simplex_bin_min
        # replicated mode: ONE full table (every shard already has it);
        # binshard: the per-shard tables are all_gathered and stacked
        NG = G if rep else n * G
        iota_G = np.arange(G, dtype=np.int32)
        iota_NG = np.arange(NG, dtype=np.int32)
        BIG = np.int32(2**31 - 1)

        def shard_process(pairs_loc, prev_tail, packed_loc, floor,
                          skips):
            me = jax.lax.axis_index(AXIS)
            local = jax.lax.complex(pairs_loc[:, 0], pairs_loc[:, 1])
            tail_c = jax.lax.complex(prev_tail[:, 0], prev_tail[:, 1])
            hist = jnp.concatenate(
                [jnp.zeros((hist_pad,), jnp.complex64), tail_c])
            if k_hops <= 2:
                # left halo via a short ring ppermute chain (ICI
                # traffic ~= l_ext samples per shard; the production
                # regime: slices much longer than a burst window)
                parts = []
                cur = local
                for h in range(k_hops):
                    cur = jax.lax.ppermute(cur, AXIS, perm_r)
                    src = me - h - 1
                    hist_part = jax.lax.dynamic_slice(
                        hist, ((k_hops + src) * ls,), (ls,))
                    parts.append(jnp.where(src >= 0, cur, hist_part))
                left = jnp.concatenate(parts[::-1])[-l_ext:]
            else:
                # window >= several slices (small-block configs): one
                # all_gather of the block beats a k_hops-deep chain
                blk = jax.lax.all_gather(local, AXIS, tiled=True)
                full = jnp.concatenate([hist[-l_ext:], blk])
                left = jax.lax.dynamic_slice(full, (me * ls,), (l_ext,))
            stream = jnp.concatenate(
                [left, local, jnp.zeros((l_ext,), jnp.complex64)])

            # global gone tables: replicated-detect shards already hold
            # the ONE full table; binshard all_gathers the per-shard
            # tables over ICI (tiny: n*(G+1)*6 i32)
            if rep:
                tabs = packed_loc[None]                # (1, G+1, 6)
            else:
                tabs = jax.lax.all_gather(packed_loc[0], AXIS)
            rows = tabs[:, 1:, :]
            valid = (iota_G[None, :] < tabs[:, 0, 0][:, None])
            start, stop, bins = rows[..., 1], rows[..., 2], rows[..., 3]
            # run-start clamp (floor = -base_index, <=0 after block 0)
            start_rel = jnp.maximum(start, floor)
            ext_len = jnp.minimum(stop + pre - start_rel,
                                  np.int32(l_ext - ALIGN))
            eff_end = start_rel + ext_len
            owner = jnp.clip((eff_end - 1) // ls, 0, n - 1)
            mine = owner == me
            local_start = jnp.clip(start_rel - me * ls + l_ext,
                                   0, l_ext + ls)
            r = jnp.mod(local_start, decim)
            tile = (local_start - r) // ALIGN
            lead = local_start - (tile * ALIGN + r)
            ext_infl = ext_len + lead
            sd = lead // decim
            small = ext_infl <= l_small
            sim = bins >= simplex_min
            cols = [x.reshape(NG).astype(jnp.int32)
                    for x in (tile, r, ext_infl, bins, sd)]
            # table-row columns ride the routing sort so the fetch
            # carries only processed bursts' rows (round-5 trim, like
            # the single-chip fused program)
            trc = [rows[..., 0].reshape(NG), start.reshape(NG),
                   stop.reshape(NG), rows[..., 4].reshape(NG),
                   rows[..., 5].reshape(NG)]
            members = [
                (valid & mine & small & ~sim).reshape(NG),
                (valid & mine & small & sim).reshape(NG),
                (valid & mine & ~small).reshape(NG),
            ]
            pr_, pi_ = wg.stream_planes(stream)
            from ..ops import fused_frontend as _ff
            planes = (pr_, pi_, _ff.stack_planes(pr_, pi_))
            outs, metas, tws, ncs = [], [], [], []
            for k, (bk, cap, member) in enumerate(
                    zip(buckets, self.class_caps, members)):
                nk = jnp.sum(member.astype(jnp.int32))
                ncs.append(nk)
                skip = skips[k]
                J, Bb = bk.n_jobs, bk.batch

                def routed(member=member, cap=cap, skip=skip, nk=nk,
                           J=J, Bb=Bb):
                    key = jnp.where(member, iota_NG, BIG)
                    srt = jax.lax.sort([key] + cols + trc, num_keys=1)
                    srt = [jnp.concatenate(
                        [s, jnp.full((cap,), BIG if i == 0 else 0,
                                     jnp.int32)])
                        for i, s in enumerate(srt)]
                    win = [jax.lax.dynamic_slice(s, (skip,), (cap,))
                           for s in srt]
                    in_cap = (np.arange(cap, dtype=np.int32)
                              < (nk - skip))
                    meta = jnp.where(in_cap, win[0], -1)
                    pr = jnp.stack([jnp.where(in_cap, w, 0)
                                    for w in win[1:6]])
                    params = pr.reshape(5, J, Bb).transpose(1, 0, 2)
                    tw = jnp.stack([win[6], win[7], win[8], win[4],
                                    win[9], win[10]])
                    return meta, jnp.where(in_cap[None, :], tw, 0), \
                        params

                def empty(cap=cap, J=J, Bb=Bb):
                    return (jnp.full((cap,), -1, jnp.int32),
                            jnp.zeros((6, cap), jnp.int32),
                            jnp.zeros((J, 5, Bb), jnp.int32))

                meta, tw, params = jax.lax.cond(nk > skip, routed,
                                                empty)
                metas.append(meta)
                tws.append(tw.reshape(-1))
                out = bk(stream, planes, params)
                outs.append(out.reshape(-1))
            head = (packed_loc[0] if rep else packed_loc[0][0])
            buf = jnp.concatenate(
                [head, jnp.stack(ncs)] + metas + tws + outs)
            return buf[None]

        process_sm = jax.shard_map(
            shard_process, mesh=self.mesh,
            in_specs=(P(AXIS), P(), P() if rep else P(AXIS), P(), P()),
            out_specs=P(AXIS),
            check_vma=False)
        self.process_step = jax.jit(process_sm)

    # ---- host driver ----

    def _dispatch_step(self, samples, n_valid: int):
        """Enqueue one block's detect step; returns the finish context."""
        p = self.p
        if self.start_time_ns is None:
            self.start_time_ns = time.time_ns()
        if isinstance(samples, np.ndarray) and samples.dtype != np.float32:
            samples = np.ascontiguousarray(
                samples, np.complex64).view(np.float32).reshape(-1, 2)
        pairs = jax.device_put(
            samples, NamedSharding(self.mesh, P(AXIS)))
        prev_state, rebase = self.state, self._rebase

        prev_tail = self.tail

        def dispatch():
            return self.detect_step(pairs, prev_state,
                                    jnp.int32(n_valid), jnp.int32(rebase),
                                    prev_tail)

        t0 = time.perf_counter()
        self.state, packed, tail = pl_mod._retry(dispatch, tag="detect step")
        self.timing["step_dispatch"] += time.perf_counter() - t0
        self.timing["n_blocks"] += 1
        ctx = (pairs, self.tail, packed, self.base_index)
        self.tail = tail
        self._rebase = 1
        self.stats.n_samples += n_valid
        self.base_index += p.block_samples
        return ctx

    def _dispatch_process(self, ctx, skips: np.ndarray):
        pairs, prev_tail, packed, base_index = ctx
        floor = np.int32(max(-base_index, -(2**31 - 1)))
        t0 = time.perf_counter()
        buf = pl_mod._retry(
            lambda: self.process_step(
                pairs, prev_tail, packed, jnp.int32(floor),
                jnp.asarray(skips.astype(np.int32))),
            tag="sharded process")
        self.timing["group_dispatch"] += time.perf_counter() - t0
        return buf

    def _finish_from_buf(self, ctx, buf) -> list[dict]:
        """Parse one block's fetched process buffer into frames,
        re-dispatching (rare) overflow rounds until every class's
        bursts are drained."""
        frames: list[dict] = []
        skips = np.zeros(3, np.int64)
        first = True
        while True:
            skips, done = self._consume_buf(buf, ctx, skips, frames,
                                            first)
            first = False
            if done:
                break
            buf_dev = self._dispatch_process(ctx, skips)
            t0 = time.perf_counter()
            buf = self._fetch_rows(buf_dev)
            self.timing["result_fetch_wait"] += time.perf_counter() - t0
            self.timing["n_overflow_rounds"] += 1
        frames.sort(key=lambda f: f["id"])
        return frames

    def _consume_buf(self, buf, ctx, skips, frames, first):
        p, dmp, n = self.p, self.dmp, self.n
        caps, Ws, mss = self.class_caps, self.class_ws, self.class_mss
        base_index = ctx[3]
        heads = buf[:, :6]                       # (n, 6)
        ncs = buf[:, 6:9].astype(np.int64)       # (n, 3)
        o = 9
        metas, tws, rows_l = [], [], []
        for cap in caps:
            metas.append(buf[:, o:o + cap])
            o += cap
        for cap in caps:
            tws.append(buf[:, o:o + 6 * cap].reshape(n, 6, cap))
            o += 6 * cap
        for cap, W in zip(caps, Ws):
            rows_l.append(buf[:, o:o + cap * W].reshape(n, cap, W))
            o += cap * W

        if first:
            # replicated detect: every shard carries the SAME head —
            # count it once; binshard: per-shard heads are disjoint
            eff = (heads[:1] if self.detect_mode == "replicated"
                   else heads)
            n_tagged = int(eff[:, 1].sum())
            self.prev_tagged = max(self.prev_tagged, n_tagged)
            self.stats.n_detected += int(eff[:, 0].sum())
            self.stats.n_dropped = (self.prev_tagged
                                    - self.stats.n_detected)
            self.stats.n_em_dropped = max(self.stats.n_em_dropped,
                                          int(eff[:, 2].sum()))
            self.stats.n_create_waits = max(self.stats.n_create_waits,
                                            int(eff[:, 3].sum()))

        ls, l_ext = self.slice_len, self.l_ext
        ALIGN = wg.ALIGN
        for meta_s, tw_s, rows_s, ms, W in zip(metas, tws, rows_l,
                                               mss, Ws):
            meta = meta_s.reshape(-1)
            tw = np.concatenate(list(tw_s), axis=1)     # (6, n*cap)
            rows = rows_s.reshape(-1, W)
            sel = meta >= 0
            if not sel.any():
                continue
            u = pl_mod.unpack_outputs(rows, ms, self.want_llr)
            self.stats.n_handled += int((u["dm_ok"] & sel).sum())
            ok = u["dm_ok"] & u["dd_ok"] & sel
            self.stats.n_ok += int(ok.sum())
            magf = np.ascontiguousarray(tw[4]).view(np.float32)
            noisef = np.ascontiguousarray(tw[5]).view(np.float32)
            for j in np.nonzero(ok)[0]:
                # reconstruct the gather alignment lead exactly as
                # the device routing computed it (the delivered
                # window starts `lead` samples early; start_dec
                # already includes the matching shift_dec)
                start_rel = max(int(tw[1, j]), -base_index)
                ext_len = min(int(tw[2, j]) + p.burst_pre_len
                              - start_rel, l_ext - ALIGN)
                owner = min(max((start_rel + ext_len - 1) // ls, 0),
                            n - 1)
                local_start = min(max(start_rel - owner * ls
                                      + l_ext, 0), l_ext + ls)
                lead = (local_start % ALIGN) - (local_start
                                                % dmp.decimation)
                abs_al = start_rel + base_index - lead
                frames.append(pl_mod.build_frame(
                    p, dmp, self.in_ntaps, self.start_time_ns,
                    int(tw[0, j]), int(tw[3, j]),
                    float(magf[j]), float(noisef[j]),
                    abs_al, u, j))
        want = ncs.max(axis=0)                   # per-class max load
        lim = skips + np.asarray(caps, np.int64)
        done = bool(np.all(want <= lim))
        return np.minimum(lim, want), done

    def _fetch_rows(self, pf) -> np.ndarray:
        """Fetch a P(AXIS)-sharded (n, ...) result to every host.
        Single-process: plain device fetch. Multihost: gather local
        shards, then allgather across processes (stats are maintained on
        every host; emission stays host-0-only in run_array)."""
        if jax.process_count() == 1:
            return np.asarray(pf)
        from jax.experimental import multihost_utils
        shards = sorted(pf.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(multihost_utils.process_allgather(
            local, tiled=True))

    def _fetch_stacked(self, stacked) -> np.ndarray:
        """Fetch a group's device-stacked (nb, n, L) process buffers —
        sharded over dim 1 — in ONE transfer per host."""
        if jax.process_count() == 1:
            return np.asarray(stacked)
        from jax.experimental import multihost_utils
        shards = sorted(stacked.addressable_shards,
                        key=lambda s: s.index[1].start or 0)
        local = np.concatenate([np.asarray(s.data) for s in shards],
                               axis=1)
        # process_allgather tiles axis 0; rotate the shard axis there
        g = np.asarray(multihost_utils.process_allgather(
            np.swapaxes(local, 0, 1), tiled=True))
        return np.swapaxes(g, 0, 1)

    def _fetch_gone(self, packed) -> np.ndarray:
        """Fetch the (n, G+1, 6) gone tables to EVERY host (detect-step
        verification surface; the production routing happens on device).

        Multihost: the tables are mostly empty, so allgather the tiny
        occupancy counts first, then only the globally maximal occupied
        prefix (identical K on every process, so the collective shapes
        agree)."""
        if self.detect_mode == "replicated":
            # the ONE full table is replicated; every host reads it
            return np.asarray(packed)[None]
        if jax.process_count() == 1:
            return np.asarray(packed)
        from jax.experimental import multihost_utils
        shards = sorted(packed.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        counts = local[:, 0, 0].astype(np.int32)
        all_counts = np.asarray(multihost_utils.process_allgather(
            counts, tiled=True))
        k = int(all_counts.max(initial=0))
        prefix = np.ascontiguousarray(local[:, :1 + k])
        gathered = np.asarray(multihost_utils.process_allgather(
            prefix, tiled=True))               # (n_global, 1+k, 6)
        G = self.p.gone_capacity
        out = np.zeros((gathered.shape[0], G + 1, 6), local.dtype)
        out[:, :1 + k] = gathered
        return out

    def run_blocks(self, blocks) -> Iterator[list[dict]]:
        """Multi-block driver: chains detector state + the overlap-save
        tail across blocks, GROUP-AGGREGATED like the single-chip
        driver: SPMD process dispatches stay per-block and on the
        calling thread — deterministic grouping keeps every host
        issuing identical SPMD calls in identical order — but the
        group's buffers are stacked on device and fetched in ONE
        transfer per `agg_blocks` blocks. Single-process runs overlap
        fetch+parse on a worker thread (tunnel-latency hiding);
        multihost runs keep finish inline, because overflow re-dispatch
        from a second thread could interleave differently per host and
        misorder the collective programs."""
        import concurrent.futures as cf
        from collections import deque

        agg = self.agg_blocks
        threaded = jax.process_count() == 1

        def dispatch_group(ctxs):
            z = np.zeros(3, np.int64)
            bufs = [self._dispatch_process(c, z) for c in ctxs]
            return ctxs, self._stack_bufs(*bufs)

        def finish_group(ctxs, stacked):
            t0 = time.perf_counter()
            buf_all = self._fetch_stacked(stacked)   # (nb, n, L)
            self.timing["result_fetch_wait"] += time.perf_counter() - t0
            self.timing["n_groups"] += 1
            return [self._finish_from_buf(ctx, buf_all[i])
                    for i, ctx in enumerate(ctxs)]

        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            fut: deque = deque()
            pend: list = []

            def flush():
                if not pend:
                    return
                grp = dispatch_group(list(pend))
                pend.clear()
                if threaded:
                    fut.append(pool.submit(finish_group, *grp))
                else:
                    fut.append(finish_group(*grp))

            def take():
                f = fut.popleft()
                return f.result() if threaded else f

            for samples, n_valid in blocks:
                pend.append(self._dispatch_step(samples, n_valid))
                self.stats.q_peak = max(self.stats.q_peak,
                                        len(fut) * agg + len(pend))
                if len(pend) >= agg:
                    flush()
                while len(fut) > 1:
                    yield from take()
            flush()
            while fut:
                yield from take()

    # -- CLI-facing shims (same surface as runtime.pipeline.Pipeline) --

    def take_q_peak(self) -> int:
        v = self.stats.q_peak
        self.stats.q_peak = 0
        return v

    def noise_floor_db(self) -> float:
        """Average noise floor in dBFS/Hz over the OWNED bins of every
        shard (burst_detect.c:363-380). Halo bins are duplicated across
        shards, so only the owned span is summed."""
        p = self.p
        hist = np.asarray(jax.device_get(self.state.baseline_sum))
        if self.detect_mode == "replicated":
            owned = hist                       # full spectrum, (F,)
        else:
            owned = hist[:, self.halo:self.halo + self.own_bins]
        avg = float(owned.sum()) / (p.fft_size * p.history_size)
        bin_width = p.sample_rate / p.fft_size
        if avg > 0 and bin_width > 0:
            return 10.0 * float(np.log10(avg / bin_width))
        return -120.0

    def peak_signal_db(self) -> float:
        return float(np.asarray(
            jax.device_get(self.state.peak_signal_db)).max())

    def run_file(self, path: str, fmt: str | None = None) -> Iterator[dict]:
        from ..io import native
        bs = self.p.block_samples
        emit = jax.process_index() == 0
        for frames in self.run_blocks(native.read_blocks(path, bs, fmt)):
            if emit:
                yield from frames

    def run_array(self, samples: np.ndarray) -> Iterator[dict]:
        bs = self.p.block_samples

        def blocks():
            for i0 in range(0, len(samples), bs):
                chunk = samples[i0:i0 + bs]
                nv = len(chunk)
                if nv < bs:
                    chunk = np.concatenate(
                        [chunk, np.zeros(bs - nv, np.complex64)])
                yield chunk, nv

        emit = jax.process_index() == 0
        for frames in self.run_blocks(blocks()):
            if emit:
                yield from frames
