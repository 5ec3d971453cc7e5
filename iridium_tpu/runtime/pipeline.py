"""Single-chip block pipeline: host orchestration of the jitted stages.

Replaces the reference's 7-thread architecture (`main.c:666-734`,
`ARCHITECTURE.md:138-146`) with a block-synchronous, FULLY
DEVICE-ROUTED design:

  reader -> [device] detect block (batched FFT + per-bin state scan)
         -> [device] fused group program: on-device burst routing +
            gather/downmix/demod batches, chained on the in-order queue
         -> host: ONE fetch per group of [tables | meta | packed rows],
            vectorized frame building, RAW lines

No host decision sits between detection and demodulation — the gone
table never crosses to the host before its bursts are processed (the
TPU analogue of the reference's zero-copy thread handoff).

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
import threading
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .. import iridium
from ..config import DetectorConfig, DetectorParams, DownmixConfig, DownmixParams
from ..dsp import demod as demod_mod
from ..dsp import detect, downmix


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# The packed output row. The host<->device link in this environment is a
# high-latency, low-bandwidth tunnel (~65 ms/RPC, ~45 MB/s measured by
# tools/tunnel_probe.py), so every byte a burst sends to the host is on
# the critical path. Layout (all int32 words):
#   [bits: ceil(2S/32) words, bit j of word w = bit 32w+j]
#   [llr (optional): 1 word bitcast-f32 scale, then ceil(2S/2) words of
#    two u16 llr quanta each (lo = element 2i); llr = q * scale / 65535]
#   [4 words bitcast-f32: fine_offset, level, total_phase, uw_corr]
#   [7 words i32: dm_ok, dd_ok, n_symbols, confidence, direction,
#    start_dec, n_samples]
# vs the round-2 all-f32 layout this is 6.9x smaller without llr and
# 1.9x smaller with llr (u16 quantization; step ~1.5e-5 of the per-burst
# max, the same order as cross-implementation FP divergence, so Chase
# flip ordering is preserved — tests/test_differential_matrix.py).
_META_WORDS = 11

_BIT_W = (np.uint32(1) << np.arange(32, dtype=np.uint32)).astype(np.int32)


def packed_width(max_symbols: int, want_llr: bool) -> int:
    s2 = 2 * max_symbols
    nw = (s2 + 31) // 32
    nl = 1 + (s2 + 1) // 2 if want_llr else 0
    return nw + nl + _META_WORDS


def pack_outputs(dm, dd, want_llr: bool = True, s2_pad: int | None = None):
    """Pack one burst batch's host-bound fields into a (B, W) int32
    matrix (see layout above). Shared by the single-chip and sharded
    burst processors; `unpack_outputs` is the host-side inverse.
    `s2_pad` pads the bits/llr regions as if the batch had that many
    2*max_symbols columns, so processors with different symbol caps
    produce rows of one common width."""
    B, S2 = dd.bits.shape
    if s2_pad is None:
        s2_pad = S2
    assert s2_pad >= S2
    NW = (s2_pad + 31) // 32
    bits = jnp.pad(dd.bits.astype(jnp.int32),
                   ((0, 0), (0, NW * 32 - S2)))
    # disjoint powers of two: the wrapping int32 sum is bit-exact
    words = jnp.sum(bits.reshape(B, NW, 32) * _BIT_W[None, None, :],
                    axis=-1, dtype=jnp.int32)
    cols = [words]
    if want_llr:
        NL = (s2_pad + 1) // 2
        scale = jnp.max(dd.llr, axis=1)
        denom = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(dd.llr * (65535.0 / denom[:, None])),
                     0, 65535).astype(jnp.int32)
        q = jnp.pad(q, ((0, 0), (0, NL * 2 - S2))).reshape(B, NL, 2)
        lw = q[:, :, 0] | (q[:, :, 1] << 16)
        cols += [jax.lax.bitcast_convert_type(scale, jnp.int32)[:, None],
                 lw]
    floats = jnp.stack([dm.fine_offset, dd.level,
                        dd.total_phase, dm.uw_corr], axis=1)
    ints = jnp.stack(
        [dm.ok.astype(jnp.int32), dd.ok.astype(jnp.int32),
         dd.n_symbols, dd.confidence, dd.direction,
         dm.start_dec, dm.n_samples], axis=1)
    cols += [jax.lax.bitcast_convert_type(floats, jnp.int32), ints]
    return jnp.concatenate(cols, axis=1)


def unpack_outputs(pi: np.ndarray, max_symbols: int,
                   want_llr: bool = True) -> dict:
    """Host-side inverse of pack_outputs on a fetched (B, W) i32 matrix."""
    pi = np.ascontiguousarray(pi)
    B = pi.shape[0]
    S2 = 2 * max_symbols
    NW = (S2 + 31) // 32
    pu = pi.view(np.uint32)
    bw = pu[:, :NW]
    bits = ((bw[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1) \
        .reshape(B, NW * 32)[:, :S2].astype(np.int32)
    off = NW
    if want_llr:
        NL = (S2 + 1) // 2
        scale = np.ascontiguousarray(pi[:, off]).view(np.float32)
        lw = pu[:, off + 1:off + 1 + NL]
        q = np.stack([lw & 0xFFFF, lw >> 16], axis=-1).reshape(B, NL * 2)
        llr = q[:, :S2].astype(np.float32) * (scale[:, None]
                                              / np.float32(65535.0))
        off += 1 + NL
    else:
        llr = np.zeros((B, S2), np.float32)
    fl = np.ascontiguousarray(pi[:, off:off + 4]).view(np.float32)
    ii = pi[:, off + 4:off + _META_WORDS]
    return dict(
        dm_ok=ii[:, 0].astype(bool), dd_ok=ii[:, 1].astype(bool),
        n_sym=ii[:, 2], conf=ii[:, 3], direc=ii[:, 4],
        sdec=ii[:, 5].astype(np.int64),
        bits=bits, llr=llr,
        fine=fl[:, 0].astype(np.float64), level=fl[:, 1],
        total=fl[:, 2].astype(np.float64))


def build_frames_np(p, dmp, in_ntaps: int, start_time_ns: int,
                    ids, bins, mags, noises, abs_starts, u,
                    js) -> list[dict]:
    """Vectorized build_frame over row indices `js` (numpy throughout;
    ~10x faster than the per-row loop at bench densities — the loop
    measured ~0.25 ms/frame of pure Python dict/int overhead). The
    timestamp/frequency arithmetic is element-for-element identical to
    build_frame."""
    F = p.fft_size
    js = np.asarray(js)
    ids = np.asarray(ids, np.int64)
    bins = np.asarray(bins, np.int64)
    k = bins - F // 2
    ns = u["n_sym"][js].astype(np.int64)
    cf = (p.center_frequency + k / F * p.sample_rate
          + u["fine"][js] * dmp.output_sample_rate)
    nz = ns > 0
    cf = cf + np.where(
        nz,
        u["total"][js] / (np.maximum(ns, 1) / iridium.SYMBOLS_PER_SECOND)
        / np.pi / 2.0,
        0.0)
    abs_starts = np.asarray(abs_starts, np.int64)
    ts = (start_time_ns
          + (abs_starts / p.sample_rate * 1e9).astype(np.int64)
          + (in_ntaps // 2) * 1_000_000_000 // p.sample_rate
          + (u["sdec"][js] / dmp.output_sample_rate * 1e9)
          .astype(np.int64))
    conf = u["conf"][js].tolist()
    level = u["level"][js].tolist()
    direc = u["direc"][js].tolist()
    ns_l = ns.tolist()
    return [dict(
        id=int(ids[i]), timestamp_ns=int(ts[i]), frequency=float(cf[i]),
        magnitude=float(mags[i]), noise=float(noises[i]),
        confidence=int(conf[i]), level=float(level[i]),
        n_symbols=ns_l[i],
        direction="UL" if direc[i] else "DL",
        bits=u["bits"][js[i], :2 * ns_l[i]],
        llr=u["llr"][js[i], :2 * ns_l[i]])
        for i in range(len(js))]


def build_frame(p, dmp, in_ntaps: int, start_time_ns: int,
                burst_id: int, bin_: int, mag: float, noise: float,
                abs_start: int, u: dict, j: int) -> dict:
    """One demod-frame dict from unpacked row j. Timestamp/frequency
    arithmetic matches the reference exactly (burst_downmix.c:659-660,
    :430-434, :783; PLL residual refinement qpsk_demod.c:521-527)."""
    F = p.fft_size
    k = bin_ - F // 2
    cf = (p.center_frequency + k / F * p.sample_rate
          + u["fine"][j] * dmp.output_sample_rate)
    ns = int(u["n_sym"][j])
    if ns > 0:
        cf += u["total"][j] / (ns / iridium.SYMBOLS_PER_SECOND) \
            / np.pi / 2.0
    ts = (start_time_ns
          + int(abs_start / p.sample_rate * 1e9)
          + (in_ntaps // 2) * 1_000_000_000 // p.sample_rate
          + int(int(u["sdec"][j]) / dmp.output_sample_rate * 1e9))
    return dict(
        id=burst_id, timestamp_ns=ts, frequency=cf,
        magnitude=mag, noise=noise,
        confidence=int(u["conf"][j]), level=float(u["level"][j]),
        n_symbols=ns,
        direction="UL" if int(u["direc"][j]) else "DL",
        bits=u["bits"][j, :2 * ns], llr=u["llr"][j, :2 * ns])


class DeviceLostError(RuntimeError):
    """The TPU backend lost state (worker crash / restart): device buffers
    are gone, so in-process retry cannot recover. Callers should restart
    the run from host-retained inputs (cf. the reference's approach to
    unrecoverable SDR faults: exit and let the operator restart,
    soapysdr.c:343-344 — here we make the restart automatic)."""


# Error-text classes for fault handling. Transient faults are retried in
# place (the RPC is a pure function of live device buffers); device-lost
# faults invalidate every buffer in the process, so they escalate to
# DeviceLostError after a couple of hopeful retries (the tunnel sometimes
# reconnects to the same, still-alive worker).
_TRANSIENT = ("UNIMPLEMENTED", "DEADLINE_EXCEEDED", "ABORTED")
_DEVICE_LOST = ("UNAVAILABLE", "worker process crashed", "DATA_LOSS")


def _retry(fn, attempts: int = 4, tag: str = ""):
    """Re-issue a pure device call on transient backend faults.

    The axon TPU tunnel in this environment sporadically returns
    UNIMPLEMENTED / stalls on individual RPCs; every call here is a pure
    function of its inputs, so retrying is safe. UNAVAILABLE (worker
    crash) is retried with a longer backoff, then surfaced as
    DeviceLostError for the caller to handle."""
    import jax

    for k in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:   # pragma: no cover
            msg = str(e)
            transient = any(t in msg for t in _TRANSIENT)
            lost = any(t in msg for t in _DEVICE_LOST)
            if k == attempts - 1 or not (transient or lost):
                if lost:
                    raise DeviceLostError(f"{tag}: {msg}") from e
                raise
            print(f"warning: {'transient' if transient else 'device'} TPU "
                  f"fault in {tag}, retrying ({k + 1}/{attempts}): "
                  f"{msg.splitlines()[-1][:100]}", file=sys.stderr)
            time.sleep(1.0 + k if transient else 5.0 * (k + 1))
    raise RuntimeError("unreachable")


@dataclasses.dataclass
class PipelineStats:
    """Counters matching the reference's stats line inputs (main.c:181-187),
    plus n_faults: blocks whose results were lost to an unrecoverable
    backend fault (no reference equivalent — its failure mode is queue
    drops, main.c:198-205)."""
    n_samples: int = 0
    n_detected: int = 0
    n_handled: int = 0
    n_ok: int = 0
    n_dropped: int = 0
    n_faults: int = 0
    # Scan capacity-divergence diagnostics (cumulative, from the
    # detect-step head row): bursts dropped at the per-frame emission
    # caps, and frames whose creation budget deferred a peak
    # (detect_fast/detect_pallas docstrings; subset of n_dropped).
    n_em_dropped: int = 0
    n_create_waits: int = 0
    # Peak in-flight block depth since last take_q_peak() — the analogue
    # of the reference's samples_queue depth feeding `q_max:`
    # (main.c:428-432): how far ingest runs ahead of the consumer.
    q_peak: int = 0


class Pipeline:
    def __init__(self,
                 det_cfg: DetectorConfig | None = None,
                 dm_cfg: DownmixConfig | None = None,
                 burst_batch: int = 128,
                 use_gardner: bool = True,
                 start_time_ns: int | None = None,
                 save_bursts_dir: str | None = None,
                 fir_mode: str = "mxu",
                 want_llr: bool = True,
                 agg_blocks: int = 4,
                 group_jobs: int = 8,
                 detect_impl: str = "auto",
                 gather_mode: str = "auto"):
        det_cfg = det_cfg or DetectorConfig()
        dm_cfg = dm_cfg or DownmixConfig()
        self.fir_mode = fir_mode
        # gather_mode: "auto" = Pallas window-gather kernel on TPU, XLA
        # fallback elsewhere; "pallas"/"xla" force one implementation —
        # the --no-simd-style A/B seam (reference ARCHITECTURE.md:638)
        # so the kernel can be verified against the XLA gather on real
        # hardware, not just in interpret mode.
        assert gather_mode in ("auto", "pallas", "xla"), gather_mode
        self.gather_mode = gather_mode
        # want_llr: whether packed rows carry per-bit LLRs. The RAW-line
        # output (the reference's headline benchmark mode,
        # README.md:215-224) does not need them; the protocol decoders
        # (--parsed/--gsmtap/--acars/web) do. Dropping them shrinks the
        # per-burst host transfer ~3.6x through the tunnel.
        self.want_llr = want_llr
        # agg_blocks: how many blocks share one gone-table fetch RPC and
        # one packed-row fetch RPC (the tunnel's ~65 ms latency is the
        # single-chip pipeline's dominant cost; amortize it). Raises
        # output latency by agg_blocks * block seconds — keep 1 for live.
        self.agg_blocks = max(agg_blocks, 1)
        # group_jobs: burst batches per group-processor dispatch (a
        # STATIC shape — groups with more bursts run multiple rounds,
        # groups with fewer pad; padded batches are masked out on
        # device). 8 x 128 covers ~2x the reference's live 10 MHz
        # detection density for a 4-block group.
        self.group_jobs = max(group_jobs, 1)
        # detect_impl: "pallas" = single-Mosaic-kernel scan
        # (dsp/detect_pallas.py, the TPU production path); "fast" =
        # XLA branchless chunked scan (dsp/detect_fast.py, the
        # sharded/CPU path and the on-hardware A/B twin); "exact" =
        # the reference-faithful per-frame scan (dsp/detect.py, the
        # test oracle's twin); "auto" resolves per backend/shape
        self.p: DetectorParams = det_cfg.derived()
        from ..dsp import detect_pallas
        self.detect_impl = detect_pallas.resolve_impl(self.p,
                                                      detect_impl)
        self.dmp: DownmixParams = dm_cfg.derived(self.p)
        p, dmp = self.p, self.dmp

        self.in_ntaps = len(downmix.make_consts(dmp).input_taps)
        # Extraction window capacity: covers the longest possible
        # [start, stop+pre) window AND enough input for dec_cap outputs,
        # rounded to the gather kernel's block granularity plus one
        # block of alignment lead (ops/window_gather.py).
        from ..ops import window_gather as wg
        self._wg = wg
        self.l_ext = _round_up(
            max(p.max_extract,
                (dmp.dec_cap - 1) * dmp.decimation + self.in_ntaps)
            + wg.ALIGN,
            wg.ALIGN)
        self.burst_batch = burst_batch
        self.use_gardner = use_gardner
        self.start_time_ns = start_time_ns

        # per-block device stream length: [tail | block | zero pad]
        self.stream_len = p.block_samples + 2 * self.l_ext

        self._build_step()
        self._build_burst_processor()
        # variadic packed-output concat / gone-table stack (one compile
        # per arity+shape, cached; arities are bounded by agg_blocks and
        # the round count, both fixed in steady state)
        self._concat_fn = jax.jit(lambda *xs: jnp.concatenate(xs, axis=0))
        self._stack_fn = jax.jit(lambda *xs: jnp.stack(xs))
        self._flatcat = jax.jit(lambda *xs: jnp.concatenate(
            [x.reshape(-1, x.shape[-1]) for x in xs], axis=0))
        # 1-D variant: concatenates packed rows of DIFFERENT class
        # widths into one fetch buffer (host splits by static sizes)
        self._flatcat1d = jax.jit(lambda *xs: jnp.concatenate(
            [x.reshape(-1) for x in xs]))
        self._lock = threading.Lock()
        self.reset()
        self.start_time_ns = start_time_ns
        self.save_bursts_dir = save_bursts_dir

    def reset(self, start_time_ns: int | None = None) -> None:
        """Fresh stream state; compiled executables are reused."""
        import collections
        if self.detect_impl in ("fast", "pallas"):
            from ..dsp import detect_fast
            self.state = detect_fast.init_state(self.p)
        else:
            self.state = detect.init_state(self.p)
        self.tail = self._zeros_ext()
        self._rebase = 0
        self.base_index = 0          # absolute sample index of block start
        self.prev_tagged = 0
        self.stats = PipelineStats()
        self.start_time_ns = start_time_ns
        # Cumulative wall seconds per stage (threads overlap, so stages can
        # sum to more than elapsed wall time; ratios still localize the
        # bottleneck — the `jax.profiler` analogue of the reference's
        # external profiling, ARCHITECTURE.md:630-634).
        self.timing = collections.Counter()

    def _build_step(self):
        """One fused jitted dispatch per block.

        The axon TPU tunnel rejects complex64 host<->device transfers and
        eager c64 allocations (c64 buffers produced and consumed by jitted
        programs are fine), and each dispatch/fetch RPC costs ~10 ms. So the
        block boundary is crossed exactly twice: one upload of interleaved
        f32 I/Q pairs (the cf32 wire format) + fused step dispatch, and one
        download of the packed (G+1, 6) i32 gone-burst table. The complex
        stream, rolling tail, and detector state stay device-resident.
        """
        p = self.p
        if self.detect_impl == "pallas":
            from ..dsp import detect_pallas
            detect_fn = detect_pallas.make_detect_block_pallas(p)
        elif self.detect_impl == "fast":
            from ..dsp import detect_fast
            detect_fn = detect_fast.make_detect_block_fast(p)
        else:
            detect_fn = detect.make_detect_block(p)
        l_ext, bs = self.l_ext, p.block_samples

        def bc_i32(v):
            return jax.lax.bitcast_convert_type(v, jnp.int32)

        def step(pairs, tail, state, n_valid, do_rebase):
            # rebase the carried state (detect.rebase_state, fused in)
            shift = do_rebase * bs
            state = state._replace(
                a_start=state.a_start - shift,
                a_last=state.a_last - shift,
                g_count=state.g_count * 0)
            block = jax.lax.complex(pairs[:, 0], pairs[:, 1])
            st = detect_fn(block, state, n_valid)
            stream = jnp.concatenate(
                [tail, block, jnp.zeros((l_ext,), jnp.complex64)])
            new_tail = stream[bs:bs + l_ext]
            z = jnp.zeros((), jnp.int32)
            # head row: [g_count, n_tagged, burst_dropped, create_waits]
            # (the last two are the fast/pallas scans' cumulative
            # capacity-divergence diagnostics; the exact scan has none)
            head = jnp.stack([st.g_count, st.n_tagged,
                              getattr(st, "burst_dropped", z),
                              getattr(st, "create_waits", z), z, z])
            rows = jnp.stack(
                [st.g_id, st.g_start, st.g_stop, st.g_bin,
                 bc_i32(st.g_mag), bc_i32(st.g_noise)], axis=1)
            packed = jnp.concatenate([head[None, :], rows], axis=0)
            return st, stream, new_tail, packed

        self.step_fn = jax.jit(step)
        self._zeros_ext = jax.jit(
            lambda: jnp.zeros((l_ext,), jnp.complex64))

    def _max_symbols_for(self, frame_cap: int) -> int:
        sps = self.dmp.samples_per_symbol
        return int(frame_cap / (sps - 0.5)) + 4

    def _build_burst_processor(self):
        """Two window-size buckets: the full window covers the longest
        legal burst (~90 ms, reference iridium.h:49-52) but typical
        Iridium bursts + pre/post padding fit in ~1/4 of it, and the
        coarse-rotate + 801-tap decimating FIR cost is proportional to
        the window. Bursts are routed by extraction length.

        Each bucket exists in two forms: a per-batch processor (the
        save-bursts/debug path, exposing the DownmixOut/DemodOut device
        handles) and a GROUP processor — a lax.map over a fixed number
        of batch jobs against the group's concatenated streams, so a
        whole group of blocks costs ONE params upload, a fixed set of
        dispatches, and one packed fetch, with every shape static (no
        per-density recompiles)."""
        p, dmp = self.p, self.dmp
        self.l_small = min(self.l_ext, _round_up(
            p.burst_pre_len + p.burst_post_len + 120_000 + self.in_ntaps
            + self._wg.ALIGN,
            self._wg.ALIGN))
        dec_cap_small = (self.l_small - self.in_ntaps) \
            // dmp.decimation + 1
        dec_cap_large = (self.l_ext - self.in_ntaps) \
            // dmp.decimation + 1
        # Large bursts (> l_small extraction) are rare; give them a
        # smaller batch so a padded large job costs ~1/8 of a small one.
        self.batch_large = max(8, self.burst_batch // 8)
        self.process_fn = self._make_processor(self.l_ext, dec_cap_large)
        if self.l_small < self.l_ext:
            self.process_small = self._make_processor(
                self.l_small, dec_cap_small)
        else:
            self.process_small = self.process_fn

        # Demod-length buckets: only the simplex band (ring alert /
        # paging, above SIMPLEX_FREQUENCY_MIN) can carry the long 444-
        # symbol frames (iridium.h MAX_FRAME_LENGTH_*); everything else
        # is capped at 191 symbols, which halves the demod scan and the
        # extraction shapes for ~95% of traffic. Routing is by detector
        # bin with a margin that over-covers the largest possible fine-
        # CFO correction, so a burst the device could classify simplex
        # ALWAYS takes the simplex processor (exactness preserved).
        p_ = self.p
        margin_hz = 150e3
        self.simplex_bin_min = int(np.floor(
            (iridium.SIMPLEX_FREQUENCY_MIN - margin_hz
             - p_.center_frequency) * p_.fft_size / p_.sample_rate)
        ) + p_.fft_size // 2
        cap_n = int(iridium.MAX_FRAME_LENGTH_NORMAL
                    * dmp.samples_per_symbol) + 8
        # Round-5 re-shape (tools/traces/group_r05_pre.txt): per-JOB
        # fixed cost dominated the class processors (12x128 normal jobs
        # = 77.5 ms, 6x16 simplex = 18.4 ms, 3x16 large = 9.8 ms on a
        # dense group), so each class now runs FEWER, FULLER jobs at
        # the same total capacity — the lax.map trip count halves and
        # the 16-burst micro-batches (~4x the per-burst cost of a full
        # batch) disappear.
        self.group_small_n = self._make_group_processor(
            self.l_small, dec_cap_small, max(self.group_jobs // 2, 1),
            2 * self.burst_batch, frame_cap=cap_n)
        # simplex capacity: the simplex band is ~10% of a centered
        # 10 MHz capture and bursty (ring-alert blasts); ~3/16 of the
        # normal capacity keeps a dense group to one round (the bench's
        # 24-40 dB group measured ~114 simplex bursts vs the round-5
        # initial 96-slot cap — one avoidable ~70 ms overflow round)
        self.group_small_s = self._make_group_processor(
            self.l_small, dec_cap_small, max(self.group_jobs // 4, 1),
            3 * self.batch_large)
        self.group_large = self._make_group_processor(
            self.l_ext, dec_cap_large, max(self.group_jobs // 12, 1),
            3 * self.batch_large)
        for cls, proc in enumerate((self.group_small_n,
                                    self.group_small_s,
                                    self.group_large)):
            proc.cls = cls
        self._class_procs = [self.group_small_n, self.group_small_s,
                             self.group_large]
        self._fused_cache = {}

    @staticmethod
    def _planes_fn():
        from ..ops import fused_frontend as ff
        from ..ops import window_gather as _wg

        def make_planes(flat_stream):
            pr, pi = _wg.stream_planes(flat_stream)
            return (pr, pi, ff.stack_planes(pr, pi))

        return make_planes

    def _make_group_processor(self, l_win: int, dec_cap: int,
                              J: int, Bb: int,
                              frame_cap: int | None = None):
        """jit((flat_stream, params (J, 5, Bb) i32) -> (J, Bb, W) i32):
        J burst batches of Bb bursts each, gathered from the group's
        concatenated block streams by the Pallas window-gather kernel
        (XLA fallback off-TPU), downmixed, demodulated, packed.

        params rows: [start_tile, fine_shift_r, ext_len, bin, shift_dec]
        (see ops/window_gather.py for the start decomposition).
        `frame_cap` caps the extracted frame / demod symbol count (the
        normal-band bucket; packed rows stay at the global width)."""
        import jax as _jax
        p, dmp = self.p, self.dmp
        wg = self._wg
        _make_planes = self._planes_fn()
        if frame_cap is None:
            frame_cap = dmp.max_frame_samples
        dm_one = downmix.make_downmix_one(p, dmp, l_win,
                                          frame_cap,
                                          dec_cap=dec_cap,
                                          fir_mode=self.fir_mode)
        demod_one = demod_mod.make_demod(self._max_symbols_for(frame_cap),
                                         dmp.samples_per_symbol,
                                         self.use_gardner)
        want_llr = self.want_llr
        # Per-CLASS packed width (round 5): the normal-band bucket's
        # frame cap (191 symbols) needs ~1/2 the bit words of the
        # simplex cap, and the class's rows dominate the group fetch
        # through the ~45 MB/s tunnel — pad only to the class's own
        # symbol cap and let the host parse each class segment at its
        # own width.
        ms_cls = self._max_symbols_for(frame_cap)
        s2_pad = 2 * ms_cls
        on_tpu = _jax.default_backend() == "tpu"
        use_pallas = (self.gather_mode == "pallas"
                      or (self.gather_mode == "auto" and on_tpu))
        from ..ops import fused_frontend as ff
        use_fused = use_pallas and ff.supports(p.fft_size,
                                               dmp.decimation, l_win)
        if use_fused:
            # fused gather+rotate+decimate: never materializes the
            # (B, l_win) windows (ops/fused_frontend.py)
            fused_fn = ff.make_fused_frontend(
                l_win, p.fft_size, dmp.decimation,
                np.asarray(dm_one.input_taps))
            ramp_fn = ff.make_ramp_table(p.fft_size)
            gfn = None
        else:
            fused_fn = None
            gfn = wg.make_window_gather(l_win) if use_pallas else None

        W = packed_width(ms_cls, want_llr)

        def one_live(flat_stream, planes, pr):
            starts2 = jnp.stack([pr[0], pr[1]], axis=1)
            if fused_fn is not None:
                ramp = ramp_fn(pr[3] - p.fft_size // 2)
                dre, dim = fused_fn(planes[2], starts2, ramp)
                dec_full = jax.lax.complex(dre, dim)[:, :dec_cap]
                dm = dm_one.from_dec(dec_full, pr[2], pr[3], pr[4])
            else:
                if gfn is not None:
                    xs_re, xs_im = gfn(planes[0], planes[1], starts2)
                else:
                    xs_re, xs_im = wg.gather_windows_xla(
                        flat_stream, starts2, l_win)
                dm = dm_one.windows(xs_re, xs_im, pr[2], pr[3], pr[4])
            dd = jax.vmap(demod_one)(dm.samples, dm.n_samples,
                                     dm.direction)
            return pack_outputs(dm, dd, want_llr=want_llr, s2_pad=s2_pad)

        def one(flat_stream, planes, pr):
            # skip fully-padded jobs (classes are capacity-sized for the
            # dense case; sparse groups shouldn't pay full batch cost)
            return jax.lax.cond(
                jnp.any(pr[2] > 0),
                lambda: one_live(flat_stream, planes, pr),
                lambda: jnp.zeros((Bb, W), jnp.int32))

        def process_group_planes(flat_stream, planes, params):
            return jax.lax.map(
                lambda pr: one(flat_stream, planes, pr), params)

        def process_group(flat_stream, params):
            planes = _make_planes(flat_stream)
            return process_group_planes(flat_stream, planes, params)

        fn = jax.jit(process_group)
        fn.W = W
        fn.max_symbols = ms_cls
        fn.raw = process_group_planes   # for the fused group program
        fn.n_jobs = J
        fn.batch = Bb
        return fn

    def _make_processor(self, l_win: int, dec_cap: int):
        p, dmp = self.p, self.dmp
        dm_one = downmix.make_downmix_one(p, dmp, l_win,
                                          dmp.max_frame_samples,
                                          dec_cap=dec_cap,
                                          fir_mode=self.fir_mode)
        demod_one = demod_mod.make_demod(dmp.max_symbols,
                                         dmp.samples_per_symbol,
                                         self.use_gardner)
        want_llr = self.want_llr

        def process(stream, starts, ext_lens, bins):
            dm = dm_one.batch(stream, starts, ext_lens, bins)
            dd = jax.vmap(demod_one)(dm.samples, dm.n_samples, dm.direction)
            packed = pack_outputs(dm, dd, want_llr=want_llr,
                                  s2_pad=2 * dmp.max_symbols)
            dm = dm._replace(ok=dm.ok.astype(jnp.int32))
            dd = dd._replace(ok=dd.ok.astype(jnp.int32))
            return dm, dd, packed

        return jax.jit(process)

    # ---- block processing ----
    #
    # FULLY DEVICE-ROUTED and GROUP-AGGREGATED: _dispatch_step enqueues
    # block k's fused detect step and returns immediately with device
    # handles; groups of `agg_blocks` blocks are then finished by ONE
    # fused dispatch (on-device burst routing + every burst batch) and
    # ONE result-fetch RPC carrying [gone tables | routing meta | packed
    # demod rows] for the whole group. No host decision sits between
    # detect and demod: the gone table never crosses to the host before
    # its bursts are processed. The driver keeps dispatching later
    # blocks while a group's fetch is in flight, so the in-order device
    # queue never drains. Rationale: measured device compute is ~0.4 ms
    # of detect per 1.68 s block plus ~30 us per burst
    # (tools/microbench.py), while ONE fetch RPC through this
    # environment's TPU tunnel costs ~65 ms (tools/tunnel_probe.py) —
    # the tunnel, not the TPU, sets the block rate, so blocking RPCs per
    # group is THE number to minimize (now exactly 1). This is the
    # TPU-native analogue of the reference's zero-copy detector->
    # downmix->demod thread handoff (main.c:666-734), with the queue
    # depth re-tuned for a high-latency device link.

    def _dispatch_step(self, samples, n_valid: int):
        p = self.p
        if self.start_time_ns is None:
            self.start_time_ns = time.time_ns()
        # Boundary format: interleaved f32 I/Q pairs (the cf32 wire
        # format) — the axon TPU tunnel rejects complex64 transfers.
        # Device-resident (block_samples, 2) f32 arrays pass through.
        if isinstance(samples, np.ndarray) and samples.dtype != np.float32:
            samples = np.ascontiguousarray(
                samples, np.complex64).view(np.float32).reshape(-1, 2)
        assert samples.shape == (p.block_samples, 2), samples.shape
        prev_state, prev_tail, rebase = self.state, self.tail, self._rebase

        def dispatch():
            return self.step_fn(jnp.asarray(samples), prev_tail, prev_state,
                                jnp.int32(n_valid), jnp.int32(rebase))

        t0 = time.perf_counter()
        self.state, stream, self.tail, packed = _retry(dispatch, tag="step")
        with self._lock:
            self.timing["step_dispatch"] += time.perf_counter() - t0
            self.timing["n_blocks"] += 1
        self._rebase = 1
        self.stats.n_samples += n_valid
        ctx = (stream, packed, self.base_index, dispatch)
        self.base_index += p.block_samples
        return ctx

    def _fused_for(self, nb: int):
        """Build (cached per group arity) the fused group program:

          fused(streams, tables, floor, skips) -> 1-D i32 buffer

        Routing (`_route_group`'s math) runs ON DEVICE over the stacked
        gone tables: start decomposition for the gather kernel, length
        clamp, small-normal/small-simplex/large class split, rank-
        compaction into each class's fixed (J, 5, Bb) params via one
        sort, then the three group processors — all inside one jitted
        program chained directly after the detect steps on the in-order
        device queue. The returned buffer concatenates
          [gone tables (nb*(G+1)*6)] [class counts (3)]
          [meta: flat burst index per packed row, -1 pad (sum caps)]
          [packed demod rows (sum caps * W)]
        so ONE fetch RPC finishes the whole group. `skips` supports the
        rare overflow round: a class with more bursts than its J*Bb
        capacity is re-dispatched with skip advanced by cap (same sort
        order, next window) until drained."""
        fn = self._fused_cache.get(nb)
        if fn is not None:
            return fn
        p, wg = self.p, self._wg
        G, bs, sl = p.gone_capacity, p.block_samples, self.stream_len
        procs = self._class_procs
        caps = [pr.n_jobs * pr.batch for pr in procs]
        decim = self.dmp.decimation
        ALIGN = wg.ALIGN
        l_ext, l_small = self.l_ext, self.l_small
        pre = p.burst_pre_len
        simplex_min = self.simplex_bin_min
        iota_G = np.arange(G, dtype=np.int32)
        N = nb * G
        iota_N = np.arange(N, dtype=np.int32)
        off = (np.arange(nb, dtype=np.int32) * bs)[:, None]
        soff = (np.arange(nb, dtype=np.int32) * (sl - bs))[:, None]
        BIG = np.int32(2**31 - 1)

        def fused(streams, tables, floor, skips):
            flat = jnp.concatenate(streams)
            tabs = jnp.stack(tables)                 # (nb, G+1, 6)
            rows = tabs[:, 1:, :]
            valid = iota_G[None, :] < tabs[:, 0, 0][:, None]
            start, stop, bins = rows[..., 1], rows[..., 2], rows[..., 3]
            # group-relative start, run-start clamp (floor = -base0)
            t_cl = jnp.maximum(start + off, floor)
            el = jnp.minimum(stop + off + pre - t_cl,
                             np.int32(l_ext - ALIGN))
            flats = t_cl + soff + np.int32(l_ext)
            r = jnp.mod(flats, decim)
            tile = (flats - r) // ALIGN
            lead = flats - (tile * ALIGN + r)
            ext_infl = el + lead
            sd = lead // decim
            small = ext_infl <= l_small
            sim = bins >= simplex_min
            cols = [x.reshape(N).astype(jnp.int32)
                    for x in (tile, r, ext_infl, bins, sd)]
            # per-class table-row columns ride the SAME sort, so the
            # host fetch carries only the cap-window table rows each
            # class actually processed — not the nb*(G+1)*6 padded
            # tables (~197 KB/group at the bench G=2048, ~42% of the
            # round-4 fetch)
            trc = [rows[..., 0].reshape(N), start.reshape(N),
                   stop.reshape(N), rows[..., 4].reshape(N),
                   rows[..., 5].reshape(N)]
            members = [(valid & small & ~sim).reshape(N),
                       (valid & small & sim).reshape(N),
                       (valid & ~small).reshape(N)]
            planes = self._planes_fn()(flat)
            heads = tabs[:, 0, :].reshape(-1)
            parts, ncs, metas, tws, outs = [heads], [], [], [], []
            for proc, cap, member in zip(procs, caps, members):
                nk = jnp.sum(member.astype(jnp.int32))
                ncs.append(nk)
                skip = skips[proc.cls]
                J, Bb = proc.n_jobs, proc.batch

                def routed(member=member, cap=cap, skip=skip, nk=nk,
                           J=J, Bb=Bb):
                    key = jnp.where(member, iota_N, BIG)
                    srt = jax.lax.sort([key] + cols + trc, num_keys=1)
                    # pad so a skip window never clamps out of range
                    srt = [jnp.concatenate(
                        [s, jnp.full((cap,), BIG if i == 0 else 0,
                                     jnp.int32)])
                        for i, s in enumerate(srt)]
                    win = [jax.lax.dynamic_slice(s, (skip,), (cap,))
                           for s in srt]
                    in_cap = np.arange(cap, dtype=np.int32) \
                        < (nk - skip)
                    meta = jnp.where(in_cap, win[0], -1)
                    pr = jnp.stack([jnp.where(in_cap, w, 0)
                                    for w in win[1:6]])
                    params = pr.reshape(5, J, Bb).transpose(1, 0, 2)
                    # fetched table rows: [id, start, stop, bin, mag,
                    # noise] — win[4] is the routing bin column
                    tw = jnp.stack([win[6], win[7], win[8], win[4],
                                    win[9], win[10]])
                    return meta, jnp.where(in_cap[None, :], tw, 0), \
                        params

                def empty(cap=cap, J=J, Bb=Bb):
                    return (jnp.full((cap,), -1, jnp.int32),
                            jnp.zeros((6, cap), jnp.int32),
                            jnp.zeros((J, 5, Bb), jnp.int32))

                # an empty (or drained) class skips its 11-operand sort
                meta, tw, params = jax.lax.cond(nk > skip, routed,
                                                empty)
                metas.append(meta)
                tws.append(tw.reshape(-1))
                out = proc.raw(flat, planes, params)
                outs.append(out.reshape(-1))
            parts += [jnp.stack(ncs)] + metas + tws + outs
            return jnp.concatenate(parts)

        fn = jax.jit(fused)
        fn.caps = caps
        fn.Ws = [pr.W for pr in procs]
        fn.mss = [pr.max_symbols for pr in procs]
        self._fused_cache[nb] = fn
        return fn

    def _dispatch_group_fused(self, ctxs, skips: np.ndarray):
        """Enqueue the fused routing+processing program for a group
        (non-blocking; returns the device buffer handle)."""
        fused = self._fused_for(len(ctxs))
        streams = [c[0] for c in ctxs]
        tables = [c[1] for c in ctxs]
        floor = np.int32(max(-ctxs[0][2], -(2**31 - 1)))
        t0 = time.perf_counter()
        buf = _retry(lambda: fused(streams, tables, jnp.int32(floor),
                                   jnp.asarray(skips.astype(np.int32))),
                     tag="group dispatch")
        with self._lock:
            self.timing["group_dispatch"] += time.perf_counter() - t0
        return buf

    def _parse_group_buf(self, buf: np.ndarray, ctxs, skips: np.ndarray,
                         out: list[list[dict]], first_round: bool):
        """Host-side parse of one fetched group buffer. Returns
        (new_skips, done): done=False means a class overflowed its
        capacity and the group must be re-dispatched with new_skips."""
        p, dmp = self.p, self.dmp
        nb, G = len(ctxs), p.gone_capacity
        fused = self._fused_for(nb)
        caps, Ws, mss = fused.caps, fused.Ws, fused.mss
        o = nb * 6
        heads = buf[:o].reshape(nb, 6)
        ncs = buf[o:o + 3].astype(np.int64)
        o += 3
        metas, tws, rows_l = [], [], []
        for cap in caps:
            metas.append(buf[o:o + cap])
            o += cap
        for cap in caps:
            tws.append(buf[o:o + 6 * cap].reshape(6, cap))
            o += 6 * cap
        for cap, W in zip(caps, Ws):
            rows_l.append(buf[o:o + cap * W].reshape(cap, W))
            o += cap * W

        if first_round:
            with self._lock:
                for bi in range(nb):
                    self.prev_tagged = max(self.prev_tagged,
                                           int(heads[bi, 1]))
                    self.stats.n_detected += int(heads[bi, 0])
                self.stats.n_dropped = (self.prev_tagged
                                        - self.stats.n_detected)
                # cumulative scan diagnostics (head slots 2/3)
                self.stats.n_em_dropped = max(self.stats.n_em_dropped,
                                              int(heads[:, 2].max()))
                self.stats.n_create_waits = max(
                    self.stats.n_create_waits, int(heads[:, 3].max()))

        base0 = ctxs[0][2]
        for meta, tw, rows, ms in zip(metas, tws, rows_l, mss):
            sel = meta >= 0
            if not sel.any():
                continue
            u = unpack_outputs(rows, ms, self.want_llr)
            with self._lock:
                self.stats.n_handled += int((u["dm_ok"] & sel).sum())
            ok = u["dm_ok"] & u["dd_ok"] & sel
            with self._lock:
                self.stats.n_ok += int(ok.sum())
            if not ok.any():
                continue
            t1 = time.perf_counter()
            jsel = np.nonzero(ok)[0]
            bi_a = meta[jsel].astype(np.int64) // G
            # reconstruct the alignment lead for timestamps (same
            # math as the device routing, in int64)
            s = tw[1, jsel].astype(np.int64)
            absm = base0 + bi_a * p.block_samples + s
            cl = np.maximum(absm, 0)
            fpos = (cl - base0 - bi_a * p.block_samples
                    + self.l_ext + bi_a * self.stream_len)
            lead = (fpos % self._wg.ALIGN) - fpos % dmp.decimation
            abs_al = cl - lead
            mags = np.ascontiguousarray(tw[4, jsel]).view(np.float32)
            noises = np.ascontiguousarray(tw[5, jsel]).view(np.float32)
            frames = build_frames_np(
                p, dmp, self.in_ntaps, self.start_time_ns,
                tw[0, jsel], tw[3, jsel], mags, noises,
                abs_al, u, jsel)
            for f, bi in zip(frames, bi_a.tolist()):
                out[bi].append(f)
            with self._lock:
                self.timing["host_format"] += time.perf_counter() - t1
        new_skips = np.minimum(skips + np.asarray(caps, np.int64), ncs)
        done = bool(np.all(ncs <= skips + np.asarray(caps, np.int64)))
        return new_skips, done

    def _finish_group(self, ctxs) -> list[list[dict]]:
        """Finish `agg_blocks` dispatched blocks: one fused on-device
        routing+processing dispatch + ONE result-fetch RPC (plus rare
        overflow rounds). Returns per-block frame lists, in block order.
        The save-bursts debug path takes the host-routed two-RPC flow
        (_finish_group_host) because it needs live DownmixOut handles."""
        if self.save_bursts_dir:
            return self._finish_group_host(ctxs)
        out: list[list[dict]] = [[] for _ in ctxs]
        skips = np.zeros(3, np.int64)
        buf_dev = self._dispatch_group_fused(ctxs, skips)
        first = True
        while True:
            t0 = time.perf_counter()
            try:
                buf = np.asarray(buf_dev)
            except jax.errors.JaxRuntimeError:   # pragma: no cover
                # transient tunnel fault: re-issue the steps from their
                # inputs, then the fused program
                redone = []
                for ctx in ctxs:
                    _, stream2, _, packed2 = _retry(ctx[3],
                                                    tag="step redo")
                    redone.append((stream2, packed2, ctx[2], ctx[3]))
                ctxs = redone
                buf_dev = self._dispatch_group_fused(ctxs, skips)
                buf = np.asarray(buf_dev)
            with self._lock:
                self.timing["result_fetch_wait"] += \
                    time.perf_counter() - t0
                if first:
                    self.timing["n_groups"] += 1
                else:
                    self.timing["n_overflow_rounds"] += 1
            t1 = time.perf_counter()
            skips, done = self._parse_group_buf(buf, ctxs, skips, out,
                                                first)
            with self._lock:
                self.timing["host_parse"] += time.perf_counter() - t1
            first = False
            if done:
                break
            buf_dev = self._dispatch_group_fused(ctxs, skips)
        for frames in out:
            frames.sort(key=lambda f: f["id"])
        return out

    def _finish_group_host(self, ctxs) -> list[list[dict]]:
        """Host-routed flow (save-bursts/debug): one stacked gone-table
        fetch, Python routing, one concatenated packed-row fetch."""
        t0 = time.perf_counter()

        def fetch_tables():
            if len(ctxs) == 1:
                return np.asarray(ctxs[0][1])[None]
            return np.asarray(self._stack_fn(*[c[1] for c in ctxs]))

        try:
            pk = fetch_tables()
        except jax.errors.JaxRuntimeError:   # pragma: no cover
            # transient tunnel fault: re-issue the steps from their inputs
            redone = []
            for ctx in ctxs:
                _, stream2, _, packed2 = _retry(ctx[3], tag="step redo")
                redone.append((stream2, packed2, ctx[2], ctx[3]))
            ctxs = redone
            pk = fetch_tables()
        with self._lock:
            self.timing["gone_fetch_wait"] += time.perf_counter() - t0
            self.timing["n_groups"] += 1

        blocks_g = []
        for bi, ctx in enumerate(ctxs):
            tab = pk[bi]
            g_count = int(tab[0, 0])
            n_tagged = int(tab[0, 1])
            with self._lock:
                # order-independent accounting (groups may finish
                # concurrently): n_tagged is monotonic; dropped = tagged
                # - emitted-to-table
                self.prev_tagged = max(self.prev_tagged, n_tagged)
                self.stats.n_detected += g_count
                self.stats.n_dropped = (self.prev_tagged
                                        - self.stats.n_detected)
            if g_count <= 0:
                continue
            rows = tab[1:1 + g_count]
            g = dict(id=rows[:, 0], start=rows[:, 1], stop=rows[:, 2],
                     bin=rows[:, 3], mag=rows[:, 4].view(np.float32),
                     noise=rows[:, 5].view(np.float32))
            blocks_g.append((bi, g, ctx[2]))

        out: list[list[dict]] = [[] for _ in ctxs]
        if not blocks_g:
            return out
        if self.save_bursts_dir:
            # debug path: per-batch processors keep the DownmixOut /
            # DemodOut device handles the IQ dumps need
            return self._finish_group_legacy(ctxs, blocks_g)

        ginfo = self._route_group(blocks_g)
        small = ginfo["small"]
        sim = ginfo["bin"][small] >= self.simplex_bin_min
        rounds = []       # (proc, params (J,5,Bb) np, meta (J,Bb) np)
        for proc, idx in ((self.group_small_n, small[~sim]),
                          (self.group_small_s, small[sim]),
                          (self.group_large, ginfo["large"])):
            J, Bb = proc.n_jobs, proc.batch
            per_round = J * Bb
            for r0 in range(0, len(idx), per_round):
                sel = idx[r0:r0 + per_round]
                params = np.zeros((J, 5, Bb), np.int32)
                meta = np.full((J, Bb), -1, np.int64)
                for j0 in range(0, len(sel), Bb):
                    j = j0 // Bb
                    s = sel[j0:j0 + Bb]
                    params[j, 0, :len(s)] = ginfo["tile"][s]
                    params[j, 1, :len(s)] = ginfo["r"][s]
                    params[j, 2, :len(s)] = ginfo["ext_len"][s]
                    params[j, 3, :len(s)] = ginfo["bin"][s]
                    params[j, 4, :len(s)] = ginfo["shift_dec"][s]
                    meta[j, :len(s)] = s
                rounds.append((proc, params, meta))

        def dispatch_all():
            flat = ctxs[0][0] if len(ctxs) == 1 \
                else self._concat_fn(*[c[0] for c in ctxs])
            outs = [proc(flat, jnp.asarray(params))
                    for proc, params, _ in rounds]
            pf = self._flatcat1d(*outs)
            return np.asarray(pf)

        t0 = time.perf_counter()
        pf_all = _retry(dispatch_all, tag="burst batches")
        with self._lock:
            self.timing["burst_fetch_wait"] += time.perf_counter() - t0
            self.timing["n_burst_batches"] += sum(
                r[0].n_jobs for r in rounds)

        # per-round parse: classes pack at their own widths
        o = 0
        for proc, params, meta in rounds:
            sz = proc.n_jobs * proc.batch * proc.W
            rows = pf_all[o:o + sz].reshape(-1, proc.W)
            o += sz
            self._format_group(rows, meta.reshape(-1), ginfo,
                               blocks_g, out, proc.max_symbols)
        for frames in out:
            frames.sort(key=lambda f: f["id"])
        return out

    def _route_group(self, blocks_g) -> dict:
        """Group-wide burst routing: flatten every block's gone bursts
        into one table with starts offset into the group's concatenated
        stream, decompose each start for the gather kernel
        (tile * ALIGN + r + lead; ops/window_gather.py), and bucket by
        lead-inflated extraction length."""
        p = self.p
        sl = self.stream_len
        ALIGN = self._wg.ALIGN
        decim = self.dmp.decimation
        flat_start, ext_len, bins = [], [], []
        blk, gi_l, abs_cl = [], [], []
        for bi, g, base_index in blocks_g:
            abs_start = g["start"].astype(np.int64) + base_index
            cl = np.maximum(abs_start, 0)
            el = (g["stop"].astype(np.int64) + p.burst_pre_len
                  + base_index - cl)
            el = np.minimum(el, self.l_ext - ALIGN).astype(np.int64)
            rel = (cl - base_index + self.l_ext).astype(np.int64)
            flat_start.append(rel + bi * sl)
            ext_len.append(el)
            bins.append(g["bin"])
            blk.append(np.full(len(el), bi, np.int64))
            gi_l.append(np.arange(len(el), dtype=np.int64))
            abs_cl.append(cl)
        flat_start = np.concatenate(flat_start)
        ext_len = np.concatenate(ext_len)
        bins = np.concatenate(bins).astype(np.int32)
        r = (flat_start % decim).astype(np.int64)
        tile = (flat_start - r) // ALIGN
        lead = flat_start - (tile * ALIGN + r)
        ext_infl = (ext_len + lead).astype(np.int32)
        small = ext_infl <= self.l_small
        return dict(
            tile=tile.astype(np.int32), r=r.astype(np.int32),
            ext_len=ext_infl, bin=bins,
            shift_dec=(lead // decim).astype(np.int32),
            blk=np.concatenate(blk), gi=np.concatenate(gi_l),
            abs_al=np.concatenate(abs_cl) - lead,
            small=np.nonzero(small)[0], large=np.nonzero(~small)[0])

    def _format_group(self, pf_all, meta_all, ginfo, blocks_g, out,
                      max_symbols=None):
        p, dmp = self.p, self.dmp
        u = unpack_outputs(pf_all, max_symbols or dmp.max_symbols,
                           self.want_llr)
        valid = meta_all >= 0
        with self._lock:
            self.stats.n_handled += int((u["dm_ok"] & valid).sum())
        ok = u["dm_ok"] & u["dd_ok"] & valid
        with self._lock:
            self.stats.n_ok += int(ok.sum())
        if not ok.any():
            return
        t1 = time.perf_counter()
        gmap = {bi: (g, base) for bi, g, base in blocks_g}
        for j in np.nonzero(ok)[0]:
            e = int(meta_all[j])
            bi = int(ginfo["blk"][e])
            gi = int(ginfo["gi"][e])
            g, _ = gmap[bi]
            out[bi].append(build_frame(
                p, dmp, self.in_ntaps, self.start_time_ns,
                int(g["id"][gi]), int(g["bin"][gi]),
                float(g["mag"][gi]), float(g["noise"][gi]),
                int(ginfo["abs_al"][e]), u, j))
        with self._lock:
            self.timing["host_format"] += time.perf_counter() - t1

    def _finish_group_legacy(self, ctxs, blocks_g) -> list[list[dict]]:
        """Per-batch-processor path (save-bursts mode): same results,
        but each batch is its own dispatch with host-built operands, and
        the DownmixOut/DemodOut handles stay available for IQ dumps."""
        jobs = []
        for bi, g, base_index in blocks_g:
            jobs += self._route_bursts(bi, ctxs[bi][0], g, base_index)
        out: list[list[dict]] = [[] for _ in ctxs]
        if not jobs:
            return out

        def dispatch_all():
            outs = [proc(stream, jnp.asarray(starts), jnp.asarray(lens),
                         jnp.asarray(bins))
                    for (_, _, _, _, stream, proc, starts, lens, bins)
                    in jobs]
            pf_all = outs[0][2] if len(outs) == 1 \
                else self._concat_fn(*[o[2] for o in outs])
            return outs, np.asarray(pf_all)

        t0 = time.perf_counter()
        outs, pf_all = _retry(dispatch_all, tag="burst batches")
        with self._lock:
            self.timing["burst_fetch_wait"] += time.perf_counter() - t0
            self.timing["n_burst_batches"] += len(jobs)

        B = self.burst_batch
        for row, (job, (dm, dd, _)) in enumerate(zip(jobs, outs)):
            bi, g, abs_start_cl, sel = job[0], job[1], job[2], job[3]
            base_index = ctxs[bi][2]
            out[bi] += self._format_batch(
                pf_all[row * B:(row + 1) * B], dm, dd, g, sel,
                base_index, abs_start_cl)
        for frames in out:
            frames.sort(key=lambda f: f["id"])
        return out

    def _finish_block(self, ctx) -> list[dict]:
        return self._finish_group([ctx])[0]

    def process_block(self, samples, n_valid: int) -> list[dict]:
        """Feed one block (padded to block_samples); returns demod frames."""
        return self._finish_block(self._dispatch_step(samples, n_valid))

    def run_blocks(self, blocks, depth: int = 3) -> Iterator[list[dict]]:
        """Pipelined driver: `blocks` yields (samples, n_valid) tuples;
        yields the demod-frame list per block, in order.

        Step dispatches stay on the calling thread (the detector state
        chains block to block); groups of `agg_blocks` blocks are
        finished on a small thread pool so their two ~65 ms tunnel RPCs
        overlap other groups' RPCs and the device compute. `depth`
        bounds in-flight groups (device memory: one stream buffer per
        block)."""
        import concurrent.futures as cf
        from collections import deque

        agg = self.agg_blocks
        with cf.ThreadPoolExecutor(max_workers=depth) as pool:
            fut = deque()
            pend: list = []

            def flush():
                if pend:
                    fut.append((pool.submit(self._finish_group, list(pend)),
                                len(pend)))
                    pend.clear()

            def take():
                """Salvage policy: a group whose finish still fails after
                _finish_group's internal redo loses only that group's
                frames (counted in n_faults), mirroring the reference's
                drop-on-overload semantics. DeviceLostError is not
                salvageable (all in-flight buffers are gone): cancel the
                rest and escalate to the caller."""
                f, n = fut.popleft()
                try:
                    return f.result()
                except DeviceLostError:
                    for g, _ in fut:
                        g.cancel()
                    raise
                except jax.errors.JaxRuntimeError as e:  # pragma: no cover
                    with self._lock:
                        self.stats.n_faults += 1
                    print("warning: lost one block group to a TPU fault: "
                          f"{str(e).splitlines()[-1][:120]}", file=sys.stderr)
                    return [[] for _ in range(n)]

            for samples, n_valid in blocks:
                pend.append(self._dispatch_step(samples, n_valid))
                if len(pend) >= agg:
                    flush()
                with self._lock:
                    self.stats.q_peak = max(self.stats.q_peak,
                                            len(fut) * agg + len(pend))
                while len(fut) > depth:
                    yield from take()
            flush()
            while fut:
                yield from take()

    def take_q_peak(self) -> int:
        """Read-and-reset the peak in-flight depth (q_max semantics,
        main.c:428-432,524: reset each stats interval)."""
        with self._lock:
            v = self.stats.q_peak
            self.stats.q_peak = 0
        return v

    def _route_bursts(self, bi: int, stream, g, base_index: int) -> list:
        """Build the burst-batch job records for one block (no device
        work; dispatch happens group-wide in _finish_group)."""
        p = self.p
        # Absolute sample indices & ring-buffer clamp at stream start
        abs_start = g["start"].astype(np.int64) + base_index
        abs_start_cl = np.maximum(abs_start, 0)
        ext_len = (g["stop"].astype(np.int64) + p.burst_pre_len
                   + base_index - abs_start_cl)
        ext_len = np.minimum(ext_len, self.l_ext).astype(np.int32)
        rel_start = (abs_start_cl - base_index + self.l_ext
                     ).astype(np.int32)

        # Bucket by extraction length: typical bursts go through the small
        # window (≈4x less rotate+FIR work); only long bursts pay for the
        # full 90 ms window. Frames are re-sorted by burst id afterwards,
        # which is exactly the gone-table emission order.
        small_sel = ext_len <= self.l_small
        buckets = [(np.nonzero(small_sel)[0], self.process_small),
                   (np.nonzero(~small_sel)[0], self.process_fn)]

        B = self.burst_batch
        jobs = []
        for idxs, proc in buckets:
            for j0 in range(0, len(idxs), B):
                sel = idxs[j0:j0 + B]
                m = len(sel)
                starts = np.zeros(B, np.int32)
                lens = np.zeros(B, np.int32)
                bins = np.zeros(B, np.int32)
                starts[:m] = rel_start[sel]
                lens[:m] = ext_len[sel]
                bins[:m] = g["bin"][sel]
                jobs.append((bi, g, abs_start_cl, sel,
                             stream, proc, starts, lens, bins))
        return jobs

    def _format_batch(self, pf, dm, dd, g, sel, base_index,
                      abs_start_cl) -> list[dict]:
        p, dmp = self.p, self.dmp
        m = len(sel)
        u = unpack_outputs(pf, dmp.max_symbols, self.want_llr)
        if self.save_bursts_dir:
            self._save_bursts(dm, dd, g, sel, base_index)
        with self._lock:
            self.stats.n_handled += int(u["dm_ok"][:m].sum())
        ok = u["dm_ok"] & u["dd_ok"]
        ok[m:] = False
        if not ok.any():
            return []
        t1 = time.perf_counter()
        frames = []
        for j in np.nonzero(ok)[0]:
            gi = int(sel[j])
            frames.append(build_frame(
                p, dmp, self.in_ntaps, self.start_time_ns,
                int(g["id"][gi]), int(g["bin"][gi]),
                float(g["mag"][gi]), float(g["noise"][gi]),
                int(abs_start_cl[gi]), u, j))
        with self._lock:
            self.stats.n_ok += int(ok[:m].sum())
            self.timing["host_format"] += time.perf_counter() - t1
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

    def _save_bursts(self, dm, dd, g, sel, base_index) -> None:
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
        for j in range(len(sel)):
            if not dm_ok[j]:
                continue
            gi = int(sel[j])
            abs_start = max(int(g["start"][gi]) + base_index, 0)
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
        for frames in self.run_blocks(native.read_blocks(path, bs, fmt)):
            yield from frames

    def run_array(self, samples: np.ndarray) -> Iterator[dict]:
        bs = self.p.block_samples

        def blocks():
            n = len(samples)
            for i0 in range(0, n, bs):
                chunk = samples[i0:i0 + bs]
                n_valid = len(chunk)
                if n_valid < bs:
                    chunk = np.concatenate(
                        [chunk, np.zeros(bs - n_valid, np.complex64)])
                yield chunk, n_valid

        for frames in self.run_blocks(blocks()):
            yield from frames
