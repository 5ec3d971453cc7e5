"""Single-chip block pipeline: host orchestration of the jitted stages.

Replaces the reference's 7-thread architecture (`main.c:666-734`,
`ARCHITECTURE.md:138-146`) with a block-synchronous design:

  reader -> [device] detect block (batched FFT + state-machine scan)
         -> host reads tiny gone-burst table
         -> [device] gather + downmix + demod over burst batches
         -> host formats RAW lines

The detector's IQ ring buffer (`burst_detect.c:388-422`) becomes a
device-resident tail of the previous `l_ext` samples, concatenated in
front of each block so extraction windows spanning block boundaries
resolve without host round-trips.

Timestamp arithmetic matches the reference exactly:
  - burst:  start_time_ns + trunc(start/in_rate*1e9)   (burst_downmix.c:659-660)
  - + FIR group delay (ntaps/2)*1e9/in_rate (integer)   (burst_downmix.c:430-434)
  - + trunc(start_dec/out_rate*1e9)                     (burst_downmix.c:783)

Known benign divergence from the reference: bursts whose extraction window
extends past the final processed frame read zeros instead of future
samples (the reference's ring buffer already holds them); the affected
region is inside the post-burst noise padding.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .. import iridium
from ..config import DetectorConfig, DetectorParams, DownmixConfig, DownmixParams
from ..dsp import demod as demod_mod
from ..dsp import detect, downmix
from ..io import readers


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _retry(fn, attempts: int = 3, tag: str = ""):
    """Re-issue a pure device call on transient backend faults.

    The axon TPU tunnel in this environment sporadically returns
    UNIMPLEMENTED / stalls on individual RPCs; every call here is a pure
    function of its inputs, so retrying is safe."""
    import jax

    for k in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:   # pragma: no cover
            if k == attempts - 1 or "UNIMPLEMENTED" not in str(e):
                raise
            print(f"warning: transient TPU fault in {tag}, retrying "
                  f"({k + 1}/{attempts})", file=sys.stderr)
            time.sleep(1.0 + k)
    raise RuntimeError("unreachable")


@dataclasses.dataclass
class PipelineStats:
    """Counters matching the reference's stats line inputs (main.c:181-187)."""
    n_samples: int = 0
    n_detected: int = 0
    n_handled: int = 0
    n_ok: int = 0
    n_dropped: int = 0


class Pipeline:
    def __init__(self,
                 det_cfg: DetectorConfig | None = None,
                 dm_cfg: DownmixConfig | None = None,
                 burst_batch: int = 16,
                 use_gardner: bool = True,
                 start_time_ns: int | None = None,
                 save_bursts_dir: str | None = None):
        det_cfg = det_cfg or DetectorConfig()
        dm_cfg = dm_cfg or DownmixConfig()
        self.p: DetectorParams = det_cfg.derived()
        self.dmp: DownmixParams = dm_cfg.derived(self.p)
        p, dmp = self.p, self.dmp

        self.in_ntaps = len(downmix.make_consts(dmp).input_taps)
        # Extraction window capacity: covers the longest possible
        # [start, stop+pre) window AND enough input for dec_cap outputs.
        self.l_ext = _round_up(
            max(p.max_extract,
                (dmp.dec_cap - 1) * dmp.decimation + self.in_ntaps),
            128)
        self.burst_batch = burst_batch
        self.use_gardner = use_gardner
        self.start_time_ns = start_time_ns

        self.detect_fn = jax.jit(detect.make_detect_block(p))
        self._build_burst_processor()

        self.state = detect.init_state(p)
        self.tail = jnp.zeros((self.l_ext,), jnp.complex64)
        self.base_index = 0          # absolute sample index of block start
        self.prev_tagged = 0
        self.stats = PipelineStats()
        self.save_bursts_dir = save_bursts_dir

    def _build_burst_processor(self):
        p, dmp = self.p, self.dmp
        dm_one = downmix.make_downmix_one(p, dmp, self.l_ext,
                                          dmp.max_frame_samples)
        demod_one = demod_mod.make_demod(dmp.max_symbols,
                                         dmp.samples_per_symbol,
                                         self.use_gardner)

        def one(stream, start, ext_len, bin_):
            x = jax.lax.dynamic_slice(stream, (start,), (self.l_ext,))
            dm = dm_one(x, ext_len, bin_)
            dd = demod_one(dm.samples, dm.n_samples, dm.direction)
            return dm, dd

        def process(stream, starts, ext_lens, bins):
            dm, dd = jax.vmap(one, in_axes=(None, 0, 0, 0))(
                stream, starts, ext_lens, bins)
            # host-fetched fields must be f32/i32 (the axon TPU tunnel
            # cannot transfer bool/u8/c64 buffers device->host)
            dm = dm._replace(ok=dm.ok.astype(jnp.int32))
            dd = dd._replace(ok=dd.ok.astype(jnp.int32))
            return dm, dd

        self.process_fn = jax.jit(process)

    # ---- block processing ----

    def process_block(self, samples: np.ndarray, n_valid: int) -> list[dict]:
        """Feed one block (padded to block_samples); returns demod frames."""
        p = self.p
        assert len(samples) == p.block_samples
        if self.start_time_ns is None:
            self.start_time_ns = time.time_ns()
        block = _retry(lambda: jnp.asarray(samples, jnp.complex64),
                       tag="upload")
        self.state = _retry(
            lambda: self.detect_fn(block, self.state, jnp.int32(n_valid)),
            tag="detect")
        self.stats.n_samples += n_valid

        # Fetch the (tiny) gone-burst table
        s = self.state
        g_count = _retry(lambda: int(s.g_count), tag="g_count fetch")
        n_tagged = int(s.n_tagged)
        self.stats.n_dropped += (n_tagged - self.prev_tagged) - g_count
        self.prev_tagged = n_tagged
        self.stats.n_detected += g_count

        frames: list[dict] = []
        if g_count > 0:
            g = {k: np.asarray(getattr(s, "g_" + k)[:g_count])
                 for k in ("id", "start", "stop", "bin", "mag", "noise")}
            stream = jnp.concatenate(
                [self.tail, block,
                 jnp.zeros((self.l_ext,), jnp.complex64)])
            frames = self._demod_bursts(stream, g)

        # Roll state for the next block
        self.tail = jnp.concatenate([self.tail, block])[-self.l_ext:]
        self.state = detect.rebase_state(self.state, p.block_samples)
        self.base_index += p.block_samples
        return frames

    def _demod_bursts(self, stream, g) -> list[dict]:
        p, dmp = self.p, self.dmp
        F = p.fft_size
        n = len(g["id"])
        # Absolute sample indices & ring-buffer clamp at stream start
        abs_start = g["start"].astype(np.int64) + self.base_index
        abs_start_cl = np.maximum(abs_start, 0)
        ext_len = (g["stop"].astype(np.int64) + p.burst_pre_len
                   + self.base_index - abs_start_cl)
        ext_len = np.minimum(ext_len, self.l_ext).astype(np.int32)
        rel_start = (abs_start_cl - self.base_index + self.l_ext
                     ).astype(np.int32)

        frames = []
        B = self.burst_batch
        for i0 in range(0, n, B):
            sl = slice(i0, min(i0 + B, n))
            m = sl.stop - sl.start
            starts = np.zeros(B, np.int32)
            lens = np.zeros(B, np.int32)
            bins = np.zeros(B, np.int32)
            starts[:m] = rel_start[sl]
            lens[:m] = ext_len[sl]
            bins[:m] = g["bin"][sl]
            dm, dd = _retry(
                lambda: self.process_fn(stream, jnp.asarray(starts),
                                        jnp.asarray(lens),
                                        jnp.asarray(bins)),
                tag="burst batch")
            dm_ok = np.asarray(dm.ok).astype(bool)
            dd_ok = np.asarray(dd.ok).astype(bool)
            if self.save_bursts_dir:
                self._save_bursts(dm, dd, g, i0, m)
            self.stats.n_handled += int(dm_ok[:m].sum())
            ok = dm_ok & dd_ok
            ok[m:] = False
            if not ok.any():
                continue
            n_sym = np.asarray(dd.n_symbols)
            conf = np.asarray(dd.confidence)
            level = np.asarray(dd.level)
            total = np.asarray(dd.total_phase, np.float64)
            fine = np.asarray(dm.fine_offset, np.float64)
            sdec = np.asarray(dm.start_dec, np.int64)
            direc = np.asarray(dd.direction)
            bits = np.asarray(dd.bits)
            llr = np.asarray(dd.llr)
            for j in np.nonzero(ok)[0]:
                gi = i0 + j
                k = int(g["bin"][gi]) - F // 2
                cf = (p.center_frequency
                      + k / F * p.sample_rate
                      + fine[j] * dmp.output_sample_rate)
                ns = int(n_sym[j])
                if ns > 0:
                    cf += total[j] / (ns / iridium.SYMBOLS_PER_SECOND) \
                        / np.pi / 2.0
                ts = (self.start_time_ns
                      + int(int(abs_start_cl[gi]) / p.sample_rate * 1e9)
                      + (self.in_ntaps // 2) * 1_000_000_000
                      // p.sample_rate
                      + int(int(sdec[j]) / dmp.output_sample_rate * 1e9))
                frames.append(dict(
                    id=int(g["id"][gi]),
                    timestamp_ns=ts,
                    frequency=cf,
                    magnitude=float(g["mag"][gi]),
                    noise=float(g["noise"][gi]),
                    confidence=int(conf[j]),
                    level=float(level[j]),
                    n_symbols=ns,
                    direction="UL" if int(direc[j]) else "DL",
                    bits=bits[j, :2 * ns],
                    llr=llr[j, :2 * ns],
                ))
            self.stats.n_ok += int(ok[:m].sum())
        return frames

    def noise_floor_db(self) -> float:
        """Average noise floor in dBFS/Hz (burst_detect.c:363-380)."""
        p = self.p
        avg = float(np.asarray(jnp.sum(self.state.baseline_sum))) \
            / (p.fft_size * p.history_size)
        bin_width = p.sample_rate / p.fft_size
        if avg > 0 and bin_width > 0:
            return 10.0 * np.log10(avg / bin_width)
        return -120.0

    def peak_signal_db(self) -> float:
        return float(np.asarray(self.state.peak_signal_db))

    def _save_bursts(self, dm, dd, g, i0, m) -> None:
        """--save-bursts: per-burst cf32 + metadata dumps
        (reference qpsk_demod.c:339-389)."""
        import os
        try:
            os.makedirs(self.save_bursts_dir, exist_ok=True)
        except OSError as e:
            # warn-and-continue like the reference (qpsk_demod.c:346-350)
            print(f"Warning: failed to create burst save directory: {e}",
                  file=sys.stderr)
            self.save_bursts_dir = None
            return
        p, dmp = self.p, self.dmp
        # complex64 cannot be transferred by this backend: split on device
        reim = np.asarray(jnp.stack([jnp.real(dm.samples),
                                     jnp.imag(dm.samples)], axis=-1))
        samples = reim.view(np.complex64)[..., 0]
        n_samp = np.asarray(dm.n_samples)
        dm_ok = np.asarray(dm.ok).astype(bool)
        dd_ok = np.asarray(dd.ok).astype(bool)
        direc = np.asarray(dd.direction)
        sdec = np.asarray(dm.start_dec)
        uw_corr = np.asarray(dm.uw_corr)
        for j in range(m):
            if not dm_ok[j]:
                continue
            gi = i0 + j
            abs_start = max(int(g["start"][gi]) + self.base_index, 0)
            ts = (self.start_time_ns
                  + int(abs_start / p.sample_rate * 1e9)
                  + (self.in_ntaps // 2) * 1_000_000_000 // p.sample_rate
                  + int(int(sdec[j]) / dmp.output_sample_rate * 1e9))
            k = int(g["bin"][gi]) - p.fft_size // 2
            cf = p.center_frequency + k / p.fft_size * p.sample_rate
            dir_str = ("DL" if int(direc[j]) == 0 else "UL") \
                if dd_ok[j] else "UN"
            base = os.path.join(
                self.save_bursts_dir,
                f"{ts:020d}_{cf:011.0f}_{int(g['id'][gi])}_{dir_str}")
            n = int(n_samp[j])
            samples[j, :n].astype(np.complex64).tofile(base + ".cf32")
            with open(base + ".meta", "w") as f:
                f.write(f"burst_id: {int(g['id'][gi])}\n"
                        f"timestamp_ns: {ts}\n"
                        f"center_freq_hz: {cf:.0f}\n"
                        f"sample_rate_hz: {dmp.output_sample_rate}\n"
                        f"samples_per_symbol: "
                        f"{dmp.samples_per_symbol:.2f}\n"
                        f"direction: {dir_str}\n"
                        f"magnitude_db: {float(g['mag'][gi]):.2f}\n"
                        f"noise_dbfs_hz: {float(g['noise'][gi]):.2f}\n"
                        f"num_samples: {n}\n"
                        f"uw_start_offset: {float(uw_corr[j]):.2f}\n")

    # ---- file driver ----

    def run_file(self, path: str, fmt: str | None = None) -> Iterator[dict]:
        from ..io import native
        bs = self.p.block_samples
        for block, n_valid in native.read_blocks(path, bs, fmt):
            yield from self.process_block(block, n_valid)

    def run_array(self, samples: np.ndarray) -> Iterator[dict]:
        bs = self.p.block_samples
        n = len(samples)
        for i0 in range(0, n, bs):
            chunk = samples[i0:i0 + bs]
            n_valid = len(chunk)
            if n_valid < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros(bs - n_valid, np.complex64)])
            yield from self.process_block(chunk, n_valid)
