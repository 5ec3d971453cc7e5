"""Multi-chip sharded pipeline (mesh + shard_map + collectives).

The reference is a single-node pthread pipeline (`main.c:666-734`); its
only "distribution" is socket fan-out. This module is the TPU-native
first-class replacement (SURVEY.md §2.5): an SPMD pipeline over a 1-D
device mesh with a multi-block host driver.

Two jitted SPMD steps per block:

  detect_step: spectrogram with the FFT-frame axis time-sharded (the
    embarrassingly parallel bulk compute) -> `all_to_all` transpose to
    bin-sharded layout -> `ppermute` +-halo bin strips -> per-bin-shard
    sequential burst state machine (global couplings — active-burst
    count for the noise gate and squelch, burst_detect.c:438-454,
    594-631 — are psum'd). Emits a tiny packed per-shard gone table and
    the replicated block tail.

  process_step: burst downmix+demod with the sample axis TIME-sharded.
    Each shard holds its slice plus an `l_ext` left halo from its ring
    neighbor (`ppermute`; shard 0 splices the previous block's tail) —
    no block-wide `all_gather`. The host routes each gone burst to the
    shard whose time range contains its extraction-window END; since
    window length <= l_ext, the halo always covers the window.

Burst ids are globally unique via per-shard offset + stride; known
divergence class vs single-chip: deep masking chains across bin-shard
borders (same tolerance class as the reference's own GPU-vs-CPU
divergence, README.md:226).

Multi-host: see parallel/distributed.py — the same mesh/steps span
(hosts x chips); the driver all-gathers only the tiny gone tables so
every host computes identical routing, and emits frames on host 0.
"""

from __future__ import annotations

import sys
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DetectorConfig, DetectorParams, DownmixConfig, DownmixParams
from ..dsp import demod as demod_mod
from ..dsp import detect, downmix
from ..ops import windows
from ..runtime import pipeline as pl_mod

AXIS = "shards"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedPipeline:
    """SPMD detect + burst-process steps over an n-device mesh, plus a
    multi-block host driver with the same frame-dict output contract as
    the single-chip `runtime.pipeline.Pipeline`."""

    def __init__(self,
                 det_cfg: DetectorConfig,
                 dm_cfg: DownmixConfig | None = None,
                 mesh: Mesh | None = None,
                 burst_batch: int = 8,
                 use_gardner: bool = True,
                 start_time_ns: int | None = None):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (AXIS,))
        self.mesh = mesh
        self.n = mesh.devices.size
        self.p: DetectorParams = det_cfg.derived()
        self.dmp: DownmixParams = (dm_cfg or DownmixConfig()).derived(self.p)
        p, dmp, n = self.p, self.dmp, self.n

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
        assert self.halo <= self.own_bins, \
            "bin shard narrower than burst mask halo"
        self.n_bins_local = self.own_bins + 2 * self.halo
        self.burst_batch = burst_batch
        self.slice_len = p.block_samples // n

        in_ntaps = len(downmix.make_consts(dmp).input_taps)
        self.in_ntaps = in_ntaps
        self.l_ext = _round_up(
            max(p.max_extract, (dmp.dec_cap - 1) * dmp.decimation + in_ntaps),
            128)
        # Ring hops needed so each shard's left halo spans l_ext samples
        # even when the per-shard time slice is shorter than a window.
        self.k_hops = -(-self.l_ext // self.slice_len)

        self._build(use_gardner)
        self.start_time_ns = start_time_ns
        self.reset(start_time_ns)

    # ---- state helpers ----

    def init_state(self):
        """Stacked per-shard state, sharded over the mesh."""
        shards = [detect.init_state(self.p, self.n_bins_local, id_offset=i)
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

    def _build(self, use_gardner: bool):
        p, dmp, n = self.p, self.dmp, self.n
        F = p.fft_size
        FL = self.n_bins_local
        halo = self.halo
        own = self.own_bins
        ls = self.slice_len
        l_ext = self.l_ext
        G = p.gone_capacity
        window = windows.blackman(F) / np.float32(0.42)
        dm_one = downmix.make_downmix_one(p, dmp, l_ext,
                                          dmp.max_frame_samples)
        demod_one = demod_mod.make_demod(dmp.max_symbols,
                                         dmp.samples_per_symbol, use_gardner)
        DB = self.burst_batch
        perm_r = [(i, (i + 1) % n) for i in range(n)]
        perm_l = [(i, (i - 1) % n) for i in range(n)]

        def bc_i32(v):
            return jax.lax.bitcast_convert_type(v, jnp.int32)

        # -- detect --

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
            frame_step = detect.make_frame_step(
                p, axis_name=AXIS, bin_lo=bin_lo, n_bins=FL,
                own_lo=me * own, own_hi=(me + 1) * own, id_stride=n)
            n_frames = frames_loc * n
            idxs = np.arange(n_frames, dtype=np.int32) * F
            active = (idxs + F) <= n_valid
            state = detect.run_state_machine(mag_ext, idxs, active,
                                             state, frame_step)

            # 4. packed per-shard gone table (single tiny i32 download)
            z = jnp.zeros((), jnp.int32)
            head = jnp.stack([state.g_count, state.n_tagged, z, z, z, z])
            rows = jnp.stack(
                [state.g_id, state.g_start, state.g_stop, state.g_bin,
                 bc_i32(state.g_mag), bc_i32(state.g_noise)], axis=1)
            packed = jnp.concatenate([head[None, :], rows], axis=0)

            state = jax.tree.map(lambda x: x[None], state)
            return state, packed[None]

        state_specs = jax.tree.map(lambda _: P(AXIS),
                                   detect.init_state(self.p, FL))
        detect_sm = jax.shard_map(
            shard_detect, mesh=self.mesh,
            in_specs=(P(AXIS), state_specs, P(), P()),
            out_specs=(state_specs, P(AXIS)),
            check_vma=False)

        def detect_step(pairs, state, n_valid, do_rebase):
            state, packed = detect_sm(pairs, state, n_valid, do_rebase)
            # replicated block tail for the next block's shard-0 halo
            tail = jax.lax.dynamic_slice(
                pairs, (p.block_samples - l_ext, 0), (l_ext, 2))
            return state, packed, tail

        self.detect_step = jax.jit(
            detect_step,
            out_shardings=(
                jax.tree.map(lambda _: NamedSharding(self.mesh, P(AXIS)),
                             detect.init_state(self.p, FL)),
                NamedSharding(self.mesh, P(AXIS)),
                NamedSharding(self.mesh, P())))

        # -- burst processing (time-sharded with left halo) --

        k_hops = self.k_hops
        # history splice: hist_tail left-padded with zeros to k_hops
        # whole slices, so hop h of shard me reads slice (me-h-1) from it
        # when that slice index is negative (before the block)
        hist_pad = k_hops * ls - l_ext

        def shard_process(pairs_loc, prev_tail, starts, ext_lens, bins):
            # starts are LOCAL: relative to (shard_start - l_ext)
            starts, ext_lens, bins = starts[0], ext_lens[0], bins[0]
            local = jax.lax.complex(pairs_loc[:, 0], pairs_loc[:, 1])
            tail_c = jax.lax.complex(prev_tail[:, 0], prev_tail[:, 1])
            hist = jnp.concatenate(
                [jnp.zeros((hist_pad,), jnp.complex64), tail_c])
            me = jax.lax.axis_index(AXIS)
            # left halo via a ring ppermute chain: after h+1 right-shifts
            # each shard holds slice (me-h-1); hops that reach before the
            # block splice the previous block's tail instead. Total halo
            # traffic per shard ~= l_ext samples over ICI — no block-wide
            # all_gather.
            parts = []
            cur = local
            for h in range(k_hops):
                cur = jax.lax.ppermute(cur, AXIS, perm_r)
                src = me - h - 1
                hist_part = jax.lax.dynamic_slice(
                    hist, ((k_hops + src) * ls,), (ls,))
                parts.append(jnp.where(src >= 0, cur, hist_part))
            left = jnp.concatenate(parts[::-1])[-l_ext:]
            stream = jnp.concatenate(
                [left, local, jnp.zeros((l_ext,), jnp.complex64)])
            dm = dm_one.batch(stream, starts, ext_lens, bins)
            dd = jax.vmap(demod_one)(dm.samples, dm.n_samples, dm.direction)
            return pl_mod.pack_outputs(dm, dd)[None]

        process_sm = jax.shard_map(
            shard_process, mesh=self.mesh,
            in_specs=(P(AXIS), P(), P(AXIS), P(AXIS), P(AXIS)),
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

        def dispatch():
            return self.detect_step(pairs, prev_state,
                                    jnp.int32(n_valid), jnp.int32(rebase))

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

    def _finish_block(self, ctx) -> list[dict]:
        pairs, prev_tail, packed, base_index = ctx
        p = self.p
        t0 = time.perf_counter()
        pk = self._fetch_gone(packed)          # (n, G+1, 6) i32
        self.timing["gone_fetch_wait"] += time.perf_counter() - t0
        counts = pk[:, 0, 0]
        n_tagged = int(pk[:, 0, 1].sum())
        self.prev_tagged = max(self.prev_tagged, n_tagged)
        self.stats.n_detected += int(counts.sum())
        self.stats.n_dropped = self.prev_tagged - self.stats.n_detected
        if counts.sum() <= 0:
            return []

        # Flatten all shards' gone bursts, route by extraction-window end
        rows = np.concatenate(
            [pk[s, 1:1 + counts[s]] for s in range(self.n)], axis=0)
        g = dict(id=rows[:, 0], start=rows[:, 1], stop=rows[:, 2],
                 bin=rows[:, 3], mag=rows[:, 4].view(np.float32),
                 noise=rows[:, 5].view(np.float32))
        frames = self._demod_routed(pairs, prev_tail, g, base_index)
        frames.sort(key=lambda f: f["id"])
        return frames

    def _demod_routed(self, pairs, prev_tail, g, base_index) -> list[dict]:
        p, dmp, n, ls = self.p, self.dmp, self.n, self.slice_len
        nb = len(g["id"])
        abs_start = g["start"].astype(np.int64) + base_index
        abs_start_cl = np.maximum(abs_start, 0)
        start_rel = (abs_start_cl - base_index).astype(np.int64)
        end = g["stop"].astype(np.int64) + p.burst_pre_len
        ext_len = np.minimum(end - start_rel, self.l_ext).astype(np.int32)
        # owner shard: the one whose [s*ls, (s+1)*ls) range contains the
        # CLAMPED window end (over-long bursts are head-anchored, losing
        # their tail — same as the single-chip window); window length
        # <= l_ext so the owner's left halo always covers it
        eff_end = start_rel + ext_len
        owner = np.clip((eff_end - 1) // ls, 0, n - 1).astype(np.int64)
        # start relative to the owner's local stream [halo | slice | pad]
        local_start = (start_rel - owner * ls + self.l_ext)
        local_start = np.clip(local_start, 0, self.l_ext + ls).astype(np.int32)

        by_shard = [np.nonzero(owner == s)[0] for s in range(n)]
        k_max = max(len(ix) for ix in by_shard)
        DB = self.burst_batch
        frames: list[dict] = []
        for j0 in range(0, k_max, DB):
            starts = np.zeros((n, DB), np.int32)
            lens = np.zeros((n, DB), np.int32)
            bins = np.zeros((n, DB), np.int32)
            sel = np.full((n, DB), -1, np.int64)
            for s in range(n):
                ix = by_shard[s][j0:j0 + DB]
                starts[s, :len(ix)] = local_start[ix]
                lens[s, :len(ix)] = ext_len[ix]
                bins[s, :len(ix)] = g["bin"][ix]
                sel[s, :len(ix)] = ix

            def dispatch():
                pf = self.process_step(
                    pairs, prev_tail,
                    self._put_rows(starts), self._put_rows(lens),
                    self._put_rows(bins))
                return self._fetch_rows(pf)

            t0 = time.perf_counter()
            pf = pl_mod._retry(dispatch, tag="sharded burst batch")
            self.timing["burst_fetch_wait"] += time.perf_counter() - t0
            self.timing["n_burst_batches"] += 1
            pf2 = pf.reshape(n * DB, pf.shape[-1])
            u = pl_mod.unpack_outputs(pf2, dmp.max_symbols)
            flat_sel = sel.reshape(-1)
            valid = flat_sel >= 0
            self.stats.n_handled += int((u["dm_ok"] & valid).sum())
            ok = u["dm_ok"] & u["dd_ok"] & valid
            self.stats.n_ok += int(ok.sum())
            for j in np.nonzero(ok)[0]:
                gi = int(flat_sel[j])
                frames.append(pl_mod.build_frame(
                    p, dmp, self.in_ntaps, self.start_time_ns,
                    int(g["id"][gi]), int(g["bin"][gi]),
                    float(g["mag"][gi]), float(g["noise"][gi]),
                    int(abs_start_cl[gi]), u, j))
        return frames

    def _put_rows(self, arr: np.ndarray):
        return jax.device_put(arr, NamedSharding(self.mesh, P(AXIS)))

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

    def _fetch_gone(self, packed) -> np.ndarray:
        """Fetch the (n, G+1, 6) gone tables to EVERY host (they drive
        routing, which must be identical across processes).

        Multihost: the tables are mostly empty (G rows of capacity,
        a handful occupied), so allgathering them whole costs ~400 kB
        of DCN per block at G=2048 x 8 shards. Instead: allgather the
        tiny occupancy counts first, then allgather only the globally
        maximal occupied prefix (identical K on every process, so the
        collective shapes agree)."""
        if jax.process_count() == 1:
            return np.asarray(packed)
        from jax.experimental import multihost_utils
        # this process's shards, in global shard order (device order on
        # the mesh is process-major, so concatenation across processes
        # reassembles the global table)
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
        tail across blocks (the sharded analogue of the single-chip
        run_blocks; dispatch/finish are kept serial here because every
        host must issue the same SPMD calls in the same order)."""
        pending = None
        for samples, n_valid in blocks:
            ctx = self._dispatch_step(samples, n_valid)
            if pending is not None:
                yield self._finish_block(pending)
            pending = ctx
        if pending is not None:
            yield self._finish_block(pending)

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
