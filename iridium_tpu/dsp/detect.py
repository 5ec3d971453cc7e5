"""Burst detector: batched windowed FFT + on-device burst state machine.

TPU-first re-derivation of the reference detector (`burst_detect.c`):
the reference processes one FFT frame at a time on a dedicated thread with
heap-allocated burst lists; here a whole block of frames is FFT'd as one
batched XLA FFT and the sequential per-frame state machine (noise floor,
active-burst tracking, peak extraction, squelch) runs as a `lax.scan` with
fixed-capacity tables, so the entire detector is one compiled device program.

Behavior parity sources (reference file:line):
  - window + FFT + fftshift|.|^2:     burst_detect.c:679-699
  - relative magnitude (pre filter):  burst_detect.c:426-434
  - baseline running-sum update:      burst_detect.c:438-454
  - active-burst extension:           burst_detect.c:458-469
  - burst mask over +-width/2:        burst_detect.c:473-486
  - gone-burst deletion (+forced
    noise update on long bursts):     burst_detect.c:490-518
  - peak extraction w/ DC notch and
    edge exclusion, sorted desc:      burst_detect.c:529-552
  - greedy burst creation, magnitude/
    noise estimates, squelch + noise
    reset:                            burst_detect.c:556-632

The sorted-descending peak iteration with incremental masking is reproduced
exactly by an argmax loop over the masked relative-magnitude vector.
Emission order (active-list order == creation order) is reproduced by
sorting each frame's deleted bursts by burst id before appending to the
gone table.

Multi-chip: the state machine shards over FREQUENCY BINS (each shard owns
a contiguous global bin range plus a +-halo of burst-mask width); the only
global couplings in the reference are the active-burst count (noise-update
gate + squelch, burst_detect.c:438-454/594-631), reproduced with a psum
over the mesh axis. Bursts whose center falls in the halo are tracked (so
their mask reaches into the owned range) but emitted only by their owning
shard. This mirrors the reference's own GPU-vs-CPU tolerance: behavior is
identical except for greedy creation races exactly at shard borders.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorParams
from ..ops import windows

INT32_MAX = np.int32(2**31 - 1)


class DetectorState(NamedTuple):
    """Scan carry + cross-block state. All sample indices are relative to
    the current block's first sample (shifted by -block_samples between
    blocks so they stay small). Per-bin arrays cover the local bin range
    (full fft_size on a single chip; owned range + halo when sharded)."""

    # Noise floor estimation
    baseline_hist: jax.Array    # (history_size, F_loc) f32
    baseline_sum: jax.Array     # (F_loc,) f32
    hist_idx: jax.Array         # i32 scalar
    primed: jax.Array           # i32 scalar (0/1)

    # Active burst table (fixed capacity); bins are LOCAL indices
    a_valid: jax.Array          # (B,) bool
    a_id: jax.Array             # (B,) i32
    a_start: jax.Array          # (B,) i32  (samples, rel. block start)
    a_last: jax.Array           # (B,) i32  (last_active)
    a_bin: jax.Array            # (B,) i32
    a_mag: jax.Array            # (B,) f32
    a_noise: jax.Array          # (B,) f32

    # Burst frequency mask: count of active bursts covering each bin
    mask_count: jax.Array       # (F_loc,) i32

    # Gone (emitted) burst table for the current block; bins are GLOBAL
    g_count: jax.Array          # i32 scalar
    g_id: jax.Array             # (G,) i32
    g_start: jax.Array          # (G,) i32
    g_stop: jax.Array           # (G,) i32
    g_last: jax.Array           # (G,) i32
    g_bin: jax.Array            # (G,) i32
    g_mag: jax.Array            # (G,) f32
    g_noise: jax.Array          # (G,) f32

    # Counters / misc
    burst_id: jax.Array         # i32 scalar (increments by 10*stride)
    squelch_count: jax.Array    # i32 scalar
    n_tagged: jax.Array         # i32 scalar (total emitted bursts)
    peak_signal_db: jax.Array   # f32 scalar (diagnostic)


def init_state(p: DetectorParams, n_bins: int | None = None,
               id_offset: int = 0) -> DetectorState:
    F = n_bins if n_bins is not None else p.fft_size
    H, B, G = p.history_size, p.burst_capacity, p.gone_capacity
    z32 = jnp.zeros((), jnp.int32)
    return DetectorState(
        baseline_hist=jnp.zeros((H, F), jnp.float32),
        baseline_sum=jnp.zeros((F,), jnp.float32),
        hist_idx=z32,
        primed=z32,
        a_valid=jnp.zeros((B,), bool),
        a_id=jnp.zeros((B,), jnp.int32),
        a_start=jnp.zeros((B,), jnp.int32),
        a_last=jnp.zeros((B,), jnp.int32),
        a_bin=jnp.zeros((B,), jnp.int32),
        a_mag=jnp.zeros((B,), jnp.float32),
        a_noise=jnp.zeros((B,), jnp.float32),
        mask_count=jnp.zeros((F,), jnp.int32),
        g_count=z32,
        g_id=jnp.zeros((G,), jnp.int32),
        g_start=jnp.zeros((G,), jnp.int32),
        g_stop=jnp.zeros((G,), jnp.int32),
        g_last=jnp.zeros((G,), jnp.int32),
        g_bin=jnp.zeros((G,), jnp.int32),
        g_mag=jnp.zeros((G,), jnp.float32),
        g_noise=jnp.zeros((G,), jnp.float32),
        burst_id=jnp.full((), id_offset * 10, jnp.int32),
        squelch_count=z32,
        n_tagged=z32,
        peak_signal_db=jnp.zeros((), jnp.float32),
    )


def spectrogram(samples: jax.Array, window: jax.Array, fft_size: int) -> jax.Array:
    """Non-overlapping windowed FFT -> fftshifted magnitude^2.

    One batched FFT over all frames in the block (the reference's per-frame
    FFTW call / 16-frame GPU batch, burst_detect.c:679-699, done in one shot).
    """
    n_frames = samples.shape[0] // fft_size
    frames = samples[: n_frames * fft_size].reshape(n_frames, fft_size)
    spec = jnp.fft.fft(frames * window[None, :])
    mag2 = jnp.abs(spec) ** 2
    return jnp.fft.fftshift(mag2, axes=-1)


def _coverage_delta(bins: jax.Array, weight: jax.Array, half_bw: int,
                    n_bins: int) -> jax.Array:
    """Sum of +-half_bw coverage indicators for a set of bursts, computed as
    a scatter of interval endpoints + cumsum (O(B + F), no (B, F) matrix)."""
    lo = jnp.clip(bins - half_bw, 0, n_bins - 1)
    hi = jnp.clip(bins + half_bw, 0, n_bins - 1)
    # zero vector derived from a traced value: keeps tracing free of
    # eager device allocations (the axon tunnel stalls on them)
    diff = jnp.broadcast_to(weight[0] * 0, (n_bins + 1,))
    diff = diff.at[lo].add(weight)
    diff = diff.at[hi + 1].add(-weight)
    return jnp.cumsum(diff)[:-1]


def make_frame_step(p: DetectorParams, *,
                    axis_name: str | None = None,
                    bin_lo: int = 0,
                    n_bins: int | None = None,
                    own_lo: int | None = None,
                    own_hi: int | None = None,
                    id_stride: int = 1):
    """Build the per-FFT-frame state machine body for lax.scan.

    Single-chip: defaults (local bins == all global bins, everything owned).
    Sharded: local bins are global [bin_lo, bin_lo+n_bins); emission is
    restricted to centers in global [own_lo, own_hi); the active-burst
    count used for noise gating and squelch is psum'd over `axis_name`.
    """
    F = p.fft_size                       # global fft size (for DC/edges)
    FL = n_bins if n_bins is not None else F
    if own_lo is None:
        own_lo = bin_lo
    if own_hi is None:
        own_hi = (bin_lo + FL if isinstance(bin_lo, int) else bin_lo + FL)
    B = p.burst_capacity
    G = p.gone_capacity
    half_bw = p.burst_width_bins // 2
    threshold = np.float32(p.threshold)
    hist_f = np.float32(p.history_size)
    enbw = np.float32(windows.BLACKMAN_ENBW)
    bin_width = np.float32(p.sample_rate) / np.float32(F)
    f2 = np.float32(F) * np.float32(F)

    # Peak-eligibility template in GLOBAL bin coordinates: edge + DC-notch
    # exclusion (burst_detect.c:529-552). bin_lo/own_lo/own_hi may be traced
    # values (shard index) so this is built with jnp.
    static_shard = all(isinstance(v, (int, np.integer))
                       for v in (bin_lo, own_lo, own_hi))
    gbins = bin_lo + (np.arange(FL, dtype=np.int32) if static_shard
                      else jnp.arange(FL, dtype=jnp.int32))
    dc = F // 2
    eligible_t = ((gbins >= half_bw) & (gbins < F - half_bw)
                  & ~((gbins >= dc - 3) & (gbins <= dc + 3)))
    # local indices whose global bin is owned by this shard
    owned_bin = (gbins >= own_lo) & (gbins < own_hi)

    # numpy closure constants embed directly at lowering (device-array
    # constants would need a device->host copy the axon backend lacks)
    iota_b = np.arange(B, dtype=np.int32)
    iota_f = np.arange(FL, dtype=np.int32)

    def global_sum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    H = p.history_size

    def update_baseline(s: DetectorState, mag: jax.Array, do: jax.Array,
                        evict_row: jax.Array):
        """Conditional running-sum noise update (burst_detect.c:438-454)
        — WITHOUT touching the (history_size, F) buffer.

        The frame body runs under lax.cond branches, and a cond that
        carries the 16 MB history buffer copies it on every frame (~40 us
        x 2048 frames — measured as the dominant detect cost). So the
        branches update only the O(F) fields here; `evict_row` is the
        history row this update would evict, PRE-READ outside the cond,
        and the returned write slot (p.history_size = no write) is
        applied to the buffer outside the cond by frame_step.

        Rows older than the last noise-estimate reset are masked out via
        `primed` instead of being zeroed (they are always overwritten
        before `primed` flips back to 1, so masking the read is exactly
        equivalent to the reference's memset, burst_detect.c:618-627)."""
        old = evict_row * s.primed.astype(jnp.float32)
        new_sum = jnp.where(do, s.baseline_sum - old + mag, s.baseline_sum)
        wslot = jnp.where(do, s.hist_idx, H)
        nxt = s.hist_idx + 1
        wrapped = do & (nxt == H)
        new_idx = jnp.where(do, jnp.where(nxt == H, 0, nxt), s.hist_idx)
        new_primed = jnp.where(wrapped, 1, s.primed)
        return s._replace(
            baseline_sum=new_sum,
            hist_idx=new_idx,
            primed=new_primed,
        ), wslot

    def append_gone(s: DetectorState, flags: jax.Array, stop: jax.Array):
        """Remove flagged active bursts; append the OWNED ones to the gone
        table ordered by id (reference emits in creation order:
        burst_detect.c:703-742)."""
        if isinstance(owned_bin, np.ndarray) and owned_bin.all():
            emit = flags                      # single chip: all bins owned
        else:
            emit = flags & owned_bin[jnp.clip(s.a_bin, 0, FL - 1)]
        key = jnp.where(emit, s.a_id, INT32_MAX)
        order = jnp.argsort(key)
        n_gone = jnp.sum(emit.astype(jnp.int32))
        dst = s.g_count + iota_b
        write = (iota_b < n_gone) & (dst < G)
        dst = jnp.where(write, dst, G)  # out-of-range writes drop
        src = order

        def scat(tab, vals):
            return tab.at[dst].set(vals[src], mode="drop")

        stop_vec = jnp.broadcast_to(stop, (B,))
        return s._replace(
            g_id=scat(s.g_id, s.a_id),
            g_start=scat(s.g_start, s.a_start),
            g_stop=scat(s.g_stop, stop_vec),
            g_last=scat(s.g_last, s.a_last),
            g_bin=scat(s.g_bin, s.a_bin + bin_lo),
            g_mag=scat(s.g_mag, s.a_mag),
            g_noise=scat(s.g_noise, s.a_noise),
            g_count=jnp.minimum(s.g_count + n_gone, G),
            n_tagged=s.n_tagged + n_gone,
            a_valid=s.a_valid & ~flags,
        )

    def count_active(s: DetectorState):
        """Global active count: each burst counted once, by its owner."""
        if isinstance(owned_bin, np.ndarray) and owned_bin.all():
            return global_sum(jnp.sum(s.a_valid.astype(jnp.int32)))
        owned = owned_bin[jnp.clip(s.a_bin, 0, FL - 1)]
        return global_sum(jnp.sum((s.a_valid & owned).astype(jnp.int32)))

    def full_step(s: DetectorState, mag, idx, act, row0, row1):
        # mag: (FL,) f32; idx: i32 frame-start index; act: bool — frame is
        # within the valid sample range (EOF gating, burst_detect.c:821).
        # `act` is folded into every state write at field granularity.
        # row0/row1: pre-read history rows (see update_baseline); returns
        # (state, wslot_force, wslot_idle) history-row write slots.
        primed = (s.primed > 0) & act

        # relative magnitude (burst_detect.c:426-434, simd_generic.c:137-144:
        # bins with zero baseline get rel = 0, not inf)
        rel = jnp.where(s.baseline_sum > 0, mag / s.baseline_sum, 0.0)

        # --- update_bursts: extend last_active (burst_detect.c:458-469) ---
        cb = s.a_bin
        glob_cb = cb + bin_lo
        r_m1 = rel[jnp.clip(cb - 1, 0, FL - 1)]
        r_0 = rel[jnp.clip(cb, 0, FL - 1)]
        r_p1 = rel[jnp.clip(cb + 1, 0, FL - 1)]
        hit = ((jnp.where(glob_cb > 0, r_m1, 0) > threshold)
               | (r_0 > threshold)
               | (jnp.where(glob_cb < F - 1, r_p1, 0) > threshold))
        a_last = jnp.where(s.a_valid & hit & primed, idx, s.a_last)
        s = s._replace(a_last=a_last)

        # --- remove_peaks_around_bursts: mask carried from frame end ---
        relm = rel * (s.mask_count == 0) * eligible_t
        relm = jnp.where(relm > threshold, relm, 0.0)  # extract_peaks threshold

        # --- delete_gone_bursts (burst_detect.c:490-518) ---
        long_burst = s.a_valid & ((a_last - s.a_start) > p.max_burst_len)
        gone = s.a_valid & (((a_last + p.burst_post_len) <= idx) | long_burst)
        force_noise = global_sum(jnp.any(long_burst).astype(jnp.int32)) > 0
        force_noise = force_noise & primed
        flags = gone & primed
        # append_gone(s, all-False) is the identity, so the whole emit path
        # (incl. its argsort) is skipped on the common no-gone frame.
        s = jax.lax.cond(jnp.any(flags),
                         lambda s: append_gone(s, flags, idx),
                         lambda s: s, s)

        # forced noise update inside delete_gone (burst_detect.c:516-517)
        s, w_force = update_baseline(s, mag, force_noise, row0)

        # --- update_burst_mask: recompute from remaining actives ---
        new_mask_count = _coverage_delta(
            s.a_bin, s.a_valid.astype(jnp.int32), half_bw, FL)
        s = s._replace(mask_count=jnp.where(primed, new_mask_count,
                                            s.mask_count))

        # --- create_new_bursts: greedy argmax loop (burst_detect.c:556-632).
        # Equivalent to iterating the desc-sorted peak list and skipping
        # currently-masked bins: argmax over the masked vector picks the
        # same sequence of peaks. Early-exits via while_loop: once a pick
        # fails (below threshold, or no free slot) every later iteration
        # would fail too — relm is fixed, the mask only grows and slots
        # only fill — so most frames cost ONE argmax, not max_new_per_frame.
        def create_cond(val):
            k, cont = val[0], val[1]
            return cont & (k < p.max_new_per_frame)

        def create_body(val):
            (k, _cont, a_valid, a_id, a_start, a_last, a_bin, a_mag,
             a_noise, mask_count, burst_id, created_frame, peak_db) = val
            cand = relm * (mask_count == 0)
            pk = jnp.argmax(cand).astype(jnp.int32)
            pv = cand[pk]
            # first free slot
            slot = jnp.argmin(a_valid.astype(jnp.int32)).astype(jnp.int32)
            have_slot = ~a_valid[slot]
            ok = primed & (pv > threshold) & have_slot
            mag_db = 10.0 * jnp.log10(jnp.maximum(pv * hist_f * enbw, 1e-30))
            noise_db = 10.0 * jnp.log10(jnp.maximum(
                s.baseline_sum[pk] / hist_f / f2 / enbw / bin_width, 1e-30))
            start = idx - p.burst_pre_len

            def upd(tab, v):
                return tab.at[slot].set(jnp.where(ok, v, tab[slot]))

            a_valid = a_valid.at[slot].set(jnp.where(ok, True, a_valid[slot]))
            a_id = upd(a_id, burst_id)
            a_start = upd(a_start, start)
            a_last = upd(a_last, start)
            a_bin = upd(a_bin, pk)
            a_mag = upd(a_mag, mag_db)
            a_noise = upd(a_noise, noise_db)
            created_frame = created_frame.at[slot].set(
                jnp.where(ok, True, created_frame[slot]))
            mask_count = jnp.where(
                ok,
                mask_count + ((iota_f >= jnp.maximum(pk - half_bw, 0))
                              & (iota_f <= jnp.minimum(pk + half_bw, FL - 1))
                              ).astype(jnp.int32),
                mask_count)
            burst_id = jnp.where(ok, burst_id + 10 * id_stride, burst_id)
            peak_db = jnp.where(ok, jnp.maximum(peak_db, mag_db), peak_db)
            return (k + 1, ok, a_valid, a_id, a_start, a_last, a_bin, a_mag,
                    a_noise, mask_count, burst_id, created_frame, peak_db)

        created_frame0 = s.a_valid & False
        (_, _, a_valid, a_id, a_start, a_last, a_bin, a_mag, a_noise,
         mask_count, burst_id, created_frame, peak_db) = jax.lax.while_loop(
            create_cond, create_body,
            (jnp.int32(0), primed, s.a_valid, s.a_id, s.a_start, s.a_last,
             s.a_bin, s.a_mag, s.a_noise, s.mask_count, s.burst_id,
             created_frame0, s.peak_signal_db))
        s = s._replace(a_valid=a_valid, a_id=a_id, a_start=a_start,
                       a_last=a_last, a_bin=a_bin, a_mag=a_mag,
                       a_noise=a_noise, mask_count=mask_count,
                       burst_id=burst_id, peak_signal_db=peak_db)

        # --- squelch (burst_detect.c:594-631); global count over shards ---
        n_active = count_active(s)
        squelch = primed & (p.max_bursts > 0) & (n_active > p.max_bursts)

        def do_squelch(s: DetectorState) -> DetectorState:
            old = s.a_valid & ~created_frame
            s = append_gone(s, old, idx)
            return s._replace(
                a_valid=s.a_valid & False,
                mask_count=s.mask_count * 0,
                squelch_count=s.squelch_count + 3,
            )

        def no_squelch(s: DetectorState) -> DetectorState:
            return s._replace(
                squelch_count=jnp.where(
                    act, jnp.maximum(s.squelch_count - 1, 0),
                    s.squelch_count))

        s = jax.lax.cond(squelch, do_squelch, no_squelch, s)

        # noise estimate reset after repeated squelch (burst_detect.c:618-627).
        # The history buffer itself is NOT zeroed: stale rows are masked out
        # of every read by `primed` (see update_baseline) until they have
        # been overwritten, which is exactly when `primed` flips back to 1.
        reset = act & (s.squelch_count >= 10)
        s = s._replace(
            baseline_sum=jnp.where(reset, 0.0, s.baseline_sum),
            hist_idx=jnp.where(reset, 0, s.hist_idx),
            primed=jnp.where(reset, 0, s.primed),
            squelch_count=jnp.where(reset, 0, s.squelch_count),
        )

        # --- final noise update if no active bursts (burst_detect.c:698) ---
        n_active = count_active(s)
        evict = jnp.where(w_force != H, row1, row0)
        s, w_idle = update_baseline(s, mag, act & (n_active == 0), evict)
        return s, w_force, w_idle

    eligible_f = (eligible_t.astype(np.float32)
                  if isinstance(eligible_t, np.ndarray)
                  else eligible_t.astype(jnp.float32))

    def quiet_step(s: DetectorState, mag, act, row0):
        """Fast path for frames with no active bursts and no peaks above
        threshold — the overwhelmingly common case. Exactly equivalent to
        full_step then: no hits, no gone bursts, no creations, no squelch
        (so squelch_count decays, burst_detect.c:629), and the final
        unconditional-when-idle noise update (burst_detect.c:698)."""
        s = s._replace(squelch_count=jnp.where(
            act, jnp.maximum(s.squelch_count - 1, 0), s.squelch_count))
        s, w_idle = update_baseline(s, mag, act, row0)
        return s, jnp.int32(H), w_idle

    def frame_step(s: DetectorState, xs):
        # Gate the full burst machinery behind a per-frame branch. The
        # gate is conservative-exact: with no active bursts the carried
        # mask_count is all-zero (it is recomputed whenever a burst is
        # deleted and zeroed by squelch), so rel*eligible equals the
        # masked peak vector the full path would threshold.
        #
        # CRITICAL for speed: the 16 MB history buffer must NOT flow
        # through the cond (each branch switch would copy it, ~40 us x
        # 2048 frames). The branches see a dummy scalar in its place;
        # the <=2 evicted rows are pre-read here and the <=2 row writes
        # are applied here, branchlessly (slot H = dropped write).
        mag, idx, act = xs
        hist = s.baseline_hist
        idx0 = s.hist_idx
        row0 = hist[idx0]
        row1 = hist[jnp.where(idx0 + 1 == H, 0, idx0 + 1)]
        s_nh = s._replace(baseline_hist=mag[0] * 0.0)

        rel = jnp.where(s.baseline_sum > 0, mag / s.baseline_sum, 0.0)
        cand = (jnp.max(rel * eligible_f) > threshold) & (s.primed > 0)
        have = jnp.any(s.a_valid) | cand
        if axis_name:
            # all shards must take the same branch: full_step contains
            # collectives (count_active / force_noise psums)
            have = jax.lax.psum(have.astype(jnp.int32), axis_name) > 0
        s_nh, w0, w1 = jax.lax.cond(
            have,
            lambda o: full_step(o[0], o[1], o[2], o[3], o[4], o[5]),
            lambda o: quiet_step(o[0], o[1], o[3], o[4]),
            (s_nh, mag, idx, act, row0, row1))
        hist = hist.at[w0].set(mag, mode="drop")
        hist = hist.at[w1].set(mag, mode="drop")
        return s_nh._replace(baseline_hist=hist), None

    return frame_step


def make_detect_block(p: DetectorParams, **shard_kw):
    """Returns detect(samples, state, n_valid) -> new_state.

    samples: (block_samples,) complex64 — one block of the stream.
    n_valid: i32 count of real (non-padding) samples; frames past EOF are
      skipped exactly like the reference's feed loop (burst_detect.c:821).
    """
    window = windows.blackman(p.fft_size) / np.float32(0.42)
    frame_step = make_frame_step(p, **shard_kw)

    def detect(samples: jax.Array, state: DetectorState,
               n_valid: jax.Array) -> DetectorState:
        mag2 = spectrogram(samples, window, p.fft_size)
        n_frames = mag2.shape[0]
        # The reference processes frame k with d->index == k * fft_size
        # (index advanced after processing; feed loop burst_detect.c:821-835).
        idxs = np.arange(n_frames, dtype=np.int32) * p.fft_size
        active = (idxs + p.fft_size) <= n_valid
        # unroll: the common quiet-path body is a ~100 kB history-row
        # update; amortize the compiled while-loop overhead over 8 frames
        state, _ = jax.lax.scan(frame_step, state, (mag2, idxs, active),
                                unroll=8)
        return state

    return detect


def run_state_machine(mag2: jax.Array, idxs: jax.Array, active: jax.Array,
                      state: DetectorState, frame_step) -> DetectorState:
    """Scan a prebuilt frame_step over per-frame magnitudes (used by the
    sharded path, where the spectrogram is computed separately)."""
    state, _ = jax.lax.scan(frame_step, state, (mag2, idxs, active))
    return state


def rebase_state(state: DetectorState, block_samples: int) -> DetectorState:
    """Shift per-burst sample indices by -block_samples and clear the gone
    table, preparing the carry for the next block."""
    return state._replace(
        a_start=state.a_start - block_samples,
        a_last=state.a_last - block_samples,
        g_count=state.g_count * 0,
    )
