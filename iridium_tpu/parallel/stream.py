"""Multi-chip sharded pipeline step (mesh + shard_map + collectives).

The reference is a single-node pthread pipeline (`main.c:666-734`); its
only "distribution" is socket fan-out. This module is the TPU-native
first-class replacement (SURVEY.md §2.5): one SPMD step over a 1-D device
mesh that

  1. computes the detection spectrogram with the FFT-frame axis sharded
     across devices (the embarrassingly parallel bulk compute),
  2. `all_to_all`-transposes the (frames, bins) magnitude matrix to
     bin-sharded layout and `ppermute`-exchanges +-halo bin strips with
     ring neighbors,
  3. runs the sequential burst state machine per bin shard (each device
     scans all frames over its own bins; the reference's global couplings
     — active-burst count for the noise gate and squelch,
     `burst_detect.c:438-454,594-631` — are psum'd),
  4. downmixes + demodulates each shard's own completed bursts against the
     all-gathered sample block.

Burst ids are globally unique via per-shard offset + stride; emission
stays with the owning shard (burst center bin inside the shard's range).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DetectorConfig, DetectorParams, DownmixConfig, DownmixParams
from ..dsp import demod as demod_mod
from ..dsp import detect, downmix
from ..ops import windows

AXIS = "shards"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedPipeline:
    """Builds the jitted SPMD step over an n-device mesh.

    step(samples_block, state, n_valid, hist_tail, hist_avail) ->
        (new_state, downmix_out, demod_out)

    - samples_block: (block_samples,) c64, sharded over the time axis
    - state: stacked DetectorState with leading (n_shards,) dim
    - hist_tail: (l_ext,) c64 replicated tail of the previous blocks
    - hist_avail: i32 — how many tail samples are real history
    """

    def __init__(self,
                 det_cfg: DetectorConfig,
                 dm_cfg: DownmixConfig | None = None,
                 mesh: Mesh | None = None,
                 burst_batch: int = 8,
                 use_gardner: bool = True):
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

        in_ntaps = len(downmix.make_consts(dmp).input_taps)
        self.l_ext = _round_up(
            max(p.max_extract, (dmp.dec_cap - 1) * dmp.decimation + in_ntaps),
            128)

        self._build(use_gardner)

    # ---- state helpers ----

    def init_state(self):
        """Stacked per-shard state, sharded over the mesh."""
        shards = [detect.init_state(self.p, self.n_bins_local, id_offset=i)
                  for i in range(self.n)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *shards)
        sh = NamedSharding(self.mesh, P(AXIS))
        return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)

    # ---- the SPMD step ----

    def _build(self, use_gardner: bool):
        p, dmp, n = self.p, self.dmp, self.n
        F = p.fft_size
        FL = self.n_bins_local
        halo = self.halo
        own = self.own_bins
        window = windows.blackman(F) / np.float32(0.42)
        dm_one = downmix.make_downmix_one(p, dmp, self.l_ext,
                                          dmp.max_frame_samples)
        demod_one = demod_mod.make_demod(dmp.max_symbols,
                                         dmp.samples_per_symbol, use_gardner)
        DB = self.burst_batch
        perm_r = [(i, (i + 1) % n) for i in range(n)]
        perm_l = [(i, (i - 1) % n) for i in range(n)]

        def shard_step(samples_loc, state, n_valid, hist_tail, hist_avail):
            # state arrives with leading (1,) shard dim
            state = jax.tree.map(lambda x: x[0], state)
            me = jax.lax.axis_index(AXIS)
            bin_lo = me * own - halo

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

            # 4. downmix + demod this shard's own gone bursts against the
            # all-gathered block (dryrun-scale; production path will gather
            # windows via ppermute chains instead)
            block = jax.lax.all_gather(samples_loc, AXIS, tiled=True)
            stream = jnp.concatenate(
                [hist_tail, block,
                 np.zeros((self.l_ext,), np.complex64)])
            rows = np.arange(DB, dtype=np.int32)
            valid = rows < state.g_count
            start_cl = jnp.maximum(state.g_start[:DB], -hist_avail)
            ext_len = jnp.where(
                valid,
                jnp.minimum(state.g_stop[:DB] + p.burst_pre_len - start_cl,
                            self.l_ext),
                0).astype(jnp.int32)
            starts = jnp.clip(start_cl + self.l_ext, 0,
                              stream.shape[0] - self.l_ext).astype(jnp.int32)
            bins = state.g_bin[:DB]

            def one(start, elen, bin_):
                x = jax.lax.dynamic_slice(stream, (start,), (self.l_ext,))
                dm = dm_one(x, elen, bin_)
                dd = demod_one(dm.samples, dm.n_samples, dm.direction)
                return dm, dd

            dm, dd = jax.vmap(one)(starts, ext_len, bins)
            dm = dm._replace(ok=dm.ok & valid)
            dd = dd._replace(ok=dd.ok & valid)

            state = jax.tree.map(lambda x: x[None], state)
            dm = jax.tree.map(lambda x: x[None], dm)
            dd = jax.tree.map(lambda x: x[None], dd)
            return state, dm, dd

        state_specs = jax.tree.map(lambda _: P(AXIS),
                                   detect.init_state(self.p, FL))
        self.step = jax.jit(jax.shard_map(
            shard_step, mesh=self.mesh,
            in_specs=(P(AXIS), state_specs, P(), P(), P()),
            out_specs=(state_specs,
                       jax.tree.map(lambda _: P(AXIS),
                                    downmix.DownmixOut(*[0] * 7)),
                       jax.tree.map(lambda _: P(AXIS),
                                    demod_mod.DemodOut(*[0] * 8))),
            check_vma=False))

    def rebase(self, state):
        """Per-shard index rebase between blocks (vmapped over shards)."""
        return jax.vmap(
            lambda s: detect.rebase_state(s, self.p.block_samples))(state)
