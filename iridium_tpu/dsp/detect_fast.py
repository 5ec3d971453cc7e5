"""Branchless chunked burst detector (single-chip fast path).

Functionally the reference detector state machine (burst_detect.c:
426-699; see dsp/detect.py for the faithful per-frame formulation this
is derived from), restructured for a TPU runtime that charges ~20-50 us
of fixed cost per lax.cond region and per dynamic-address memory op:
the exact scan in detect.py costs ~150 ms per 2048-frame block, almost
entirely in per-frame conds, history-row dynamic reads/writes and
scatter emissions.

This implementation makes the per-frame body FULLY BRANCHLESS with ZERO
dynamic-address memory ops:

  * noise-history machinery is CHUNKED: frames scan in chunks of C; the
    <=2C history rows the chunk's updates could evict are pre-read with
    ONE dynamic slice, evictions inside the chunk select from that
    buffer with where-sums (the eviction sequence is contiguous because
    hist_idx only advances), and the chunk's row writes are applied
    with ordered scatters at chunk end (ring wrap handled by a 2C-row
    mirror; noise-reset slot restarts by a pre/post-reset scatter
    pair);
  * gone-burst emission writes fixed-capacity per-frame rows (compacted
    by rank where-sums) into scan OUTPUTS; the block's gone table is
    assembled from them once, post-scan;
  * burst creation is the greedy argmax loop unrolled K_CREATE times,
    branchless (preserving the reference's descending-magnitude id
    order and incremental masking);
  * squelch/noise-reset are where-folded; the burst mask is carried and
    recomputed from the active table after deletions (exactly the
    reference's update_burst_mask placement).

Bounded-capacity divergences from the reference (the same class as the
reference's own drop-on-full queues, burst_detect.c:929-937; counted):
  * > K_CREATE eligible creations in one frame: the excess peaks create
    on a later frame while still above threshold (P ~ 1e-7/frame at the
    reference's live 10 MHz density);
  * > E_DEL natural deletions or > E_SQ squelch emissions in one frame:
    the excess bursts are dropped and counted into n_tagged-without-
    emission (the host's d: counter); the burst-mask subtraction uses
    the FULL deletion flags (not the capped emission rows), so dropped
    emissions never leave stale coverage behind;
  * two noise-resets inside one 64-frame chunk may keep a stale history
    row (the affected rows are fully rewritten before `primed` re-arms,
    so at most one evicted value H updates later is off).

The exact per-frame implementation (detect.py) remains the oracle for
tests and the sharded (collective-coupled) path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorParams
from ..ops import windows
from .detect import DetectorState

E_DEL = 8          # natural-deletion emissions per frame
E_SQ = 16          # squelch emissions per frame
E_TOT = E_DEL + E_SQ

_warned_clamp = False


def _warn_clamp_once(configured: int, used: int) -> None:
    """Runtime-visible note that the branchless unroll clamps the
    configured per-frame creation budget (the excess creates on later
    frames while still above threshold; see the divergence list in the
    module docstring)."""
    global _warned_clamp
    if not _warned_clamp:
        _warned_clamp = True
        import sys
        print(f"detect_fast: clamping burst creations to {used}/frame "
              f"(max_new_per_frame={configured}); excess peaks create "
              "on later frames", file=sys.stderr)


def make_detect_block_fast(p: DetectorParams):
    """Returns detect(samples, state, n_valid) -> new DetectorState, with
    the same carry structure/semantics as detect.make_detect_block."""
    F = p.fft_size
    B = p.burst_capacity
    G = p.gone_capacity
    H = p.history_size
    half_bw = p.burst_width_bins // 2
    threshold = np.float32(p.threshold)
    hist_f = np.float32(p.history_size)
    enbw = np.float32(windows.BLACKMAN_ENBW)
    bin_width = np.float32(p.sample_rate) / np.float32(F)
    f2 = np.float32(F) * np.float32(F)
    K_CREATE = max(1, min(4, p.max_new_per_frame))
    if p.max_new_per_frame > K_CREATE:
        _warn_clamp_once(p.max_new_per_frame, K_CREATE)
    window = windows.blackman(F) / np.float32(0.42)

    n_frames = p.frames_per_block
    # <=2 updates/frame, and an eviction must never reach a row written
    # earlier in the SAME chunk (the pre-read would be stale), so the
    # chunk may hold at most H/2 frames. 32 balances the per-frame
    # eviction-select read (2C rows re-read each frame) against the
    # per-chunk fixed costs (pre-read slice + write scatters).
    CHUNK = max(min(32, H // 2), 1)
    while n_frames % CHUNK:
        CHUNK //= 2
    n_chunks = n_frames // CHUNK
    C2 = 2 * CHUNK
    assert G <= n_frames * E_TOT, (G, n_frames)

    dc = F // 2
    gbins = np.arange(F, dtype=np.int32)
    eligible_f = (((gbins >= half_bw) & (gbins < F - half_bw)
                   & ~((gbins >= dc - 3) & (gbins <= dc + 3)))
                  .astype(np.float32))
    iota_b = np.arange(B, dtype=np.int32)
    iota_f = np.arange(F, dtype=np.int32)
    iota_2c = np.arange(C2, dtype=np.int32)

    def compact(flags, vals8, cap):
        """Rank-compact flagged rows of the (B, 8) i32 table into
        (cap, 8), branchlessly; rows beyond cap drop."""
        fi = flags.astype(jnp.int32)
        rank = jnp.cumsum(fi) - fi
        keep = flags & (rank < cap)
        sel = (jnp.arange(cap, dtype=jnp.int32)[:, None]
               == jnp.where(keep, rank, -1)[None, :])
        out = jnp.sum(jnp.where(sel[:, :, None], vals8[None, :, :], 0),
                      axis=1)
        n = jnp.sum(fi)
        return out, jnp.minimum(n, cap), n

    def bc(v):
        return jax.lax.bitcast_convert_type(v, jnp.int32)

    # ---- per-frame branchless body (no conds, no dynamic addressing) --
    def frame_body(st, xs):
        (pre, a_valid, a_id, a_start, a_last, a_bin, a_mag, a_noise,
         mask_count, baseline_sum, hidx, primed_i, upd_k, burst_id,
         squelch_count, n_tagged, burst_dropped, peak_db) = st
        mag, idx, act = xs
        # primed_i is a saturating update counter: primed once >= H
        # updates have happened since the last noise reset. (The exact
        # impl rewinds hist_idx to 0 on reset; keeping the slot sequence
        # CONTIGUOUS and re-arming via the counter fills the ring with
        # the same last-H update magnitudes — identical semantics — and
        # lets the whole chunk's row writes land as one contiguous
        # window.)
        primed = (primed_i >= H) & act

        # both candidate eviction rows (updates k and k+1 of this
        # chunk), selected in ONE pass over the pre-read buffer
        sel_a = (iota_2c == upd_k)[:, None]
        sel_b = (iota_2c == upd_k + 1)[:, None]
        evict_a = jnp.sum(jnp.where(sel_a, pre, 0.0), axis=0)
        evict_b = jnp.sum(jnp.where(sel_b, pre, 0.0), axis=0)

        def upd_base(bsum, hx, prim, k, do, evict):
            """Running-sum noise update (burst_detect.c:438-454)."""
            old = evict * (prim >= H)
            bsum = jnp.where(do, bsum - old + mag, bsum)
            hx = jnp.where(do, hx + 1, hx)
            prim = jnp.minimum(prim + do.astype(jnp.int32), H)
            k = k + do.astype(jnp.int32)
            return bsum, hx, prim, k

        rel = jnp.where(baseline_sum > 0, mag / baseline_sum, 0.0)

        # update_bursts: extend last_active (burst_detect.c:458-469).
        # NOTE: every per-element pick in this body is a branchless
        # mask-sum — a dynamic-address gather costs ~20-40 us of fixed
        # latency on this runtime, and the body runs 2048x per block.
        th = rel > threshold
        ff = np.zeros((1,), bool)
        dilated = (th
                   | jnp.concatenate([th[1:], ff])      # rel[bin+1]
                   | jnp.concatenate([ff, th[:-1]]))    # rel[bin-1]
        hit = jnp.sum(((iota_f[None, :] == a_bin[:, None])
                       & dilated[None, :]).astype(jnp.int32), axis=1) > 0
        a_last = jnp.where(a_valid & hit & primed, idx, a_last)

        # peaks masked by the CARRIED mask (remove_peaks_around_bursts)
        relm = rel * (mask_count == 0) * eligible_f
        relm = jnp.where(relm > threshold, relm, 0.0)

        # delete_gone_bursts -> compacted emission rows
        long_burst = a_valid & ((a_last - a_start) > p.max_burst_len)
        gone = a_valid & (((a_last + p.burst_post_len) <= idx)
                          | long_burst)
        flags = gone & primed
        force_noise = jnp.any(long_burst) & primed
        vals8 = jnp.stack(
            [a_id, a_start, jnp.broadcast_to(idx, (B,)), a_last, a_bin,
             bc(a_mag), bc(a_noise),
             jnp.ones((B,), jnp.int32)], axis=1)
        em_del, n_del, n_del_want = compact(flags, vals8, E_DEL)
        a_valid = a_valid & ~flags
        n_tagged = n_tagged + n_del_want
        burst_dropped = burst_dropped + (n_del_want - n_del)

        # forced noise update (long-burst deletion, burst_detect.c:516)
        did0 = force_noise
        k0 = upd_k
        baseline_sum, hidx, primed_i, upd_k = upd_base(
            baseline_sum, hidx, primed_i, upd_k, force_noise,
            evict_a)

        # update_burst_mask after deletions: subtract EVERY deleted
        # burst's interval via edge one-hots + cumsum, built from the
        # full (B,) deletion flags — not from the E_DEL-capped emission
        # rows, so emission-capacity drops never leave stale coverage
        # suppressing creation (exactly the reference's full recompute;
        # the (B, F) edge matrix costs the same class of op as the
        # `hit` mask-sum above)
        lo = jnp.clip(a_bin - half_bw, 0, F - 1)
        hi = jnp.clip(a_bin + half_bw, 0, F - 1)
        edges = jnp.sum(
            jnp.where(flags[:, None],
                      (iota_f[None, :] == lo[:, None]).astype(jnp.int32)
                      - (iota_f[None, :] == hi[:, None] + 1)
                      .astype(jnp.int32),
                      0), axis=0)
        mask_count = mask_count - jnp.cumsum(edges)

        # create_new_bursts: greedy argmax unrolled K_CREATE times
        created = a_valid & False
        cont = primed
        for _ in range(K_CREATE):
            cand = relm * (mask_count == 0)
            pk = jnp.argmax(cand).astype(jnp.int32)
            pv = jnp.max(cand)
            slot = jnp.argmin(a_valid.astype(jnp.int32)).astype(jnp.int32)
            have_slot = jnp.any(~a_valid)
            ok = cont & (pv > threshold) & have_slot
            base_at_pk = jnp.sum(
                jnp.where(iota_f == pk, baseline_sum, 0.0))
            mag_db = 10.0 * jnp.log10(
                jnp.maximum(pv * hist_f * enbw, 1e-30))
            noise_db = 10.0 * jnp.log10(jnp.maximum(
                base_at_pk / hist_f / f2 / enbw / bin_width,
                1e-30))
            start = idx - p.burst_pre_len
            at = ok & (iota_b == slot)
            a_valid = a_valid | at
            a_id = jnp.where(at, burst_id, a_id)
            a_start = jnp.where(at, start, a_start)
            a_last = jnp.where(at, start, a_last)
            a_bin = jnp.where(at, pk, a_bin)
            a_mag = jnp.where(at, mag_db, a_mag)
            a_noise = jnp.where(at, noise_db, a_noise)
            created = created | at
            mask_count = jnp.where(
                ok,
                mask_count + ((iota_f >= jnp.maximum(pk - half_bw, 0))
                              & (iota_f <= jnp.minimum(pk + half_bw,
                                                       F - 1))
                              ).astype(jnp.int32),
                mask_count)
            burst_id = jnp.where(ok, burst_id + 10, burst_id)
            peak_db = jnp.where(ok, jnp.maximum(peak_db, mag_db), peak_db)
            cont = ok
        # creations beyond K_CREATE retry next frame; count occurrences
        more = cont & (jnp.max(relm * (mask_count == 0)) > threshold)

        # squelch (burst_detect.c:594-631), branchless
        n_active = jnp.sum(a_valid.astype(jnp.int32))
        squelch = primed & (p.max_bursts > 0) & (n_active > p.max_bursts)
        sq_flags = squelch & a_valid & ~created
        vals8 = jnp.stack(
            [a_id, a_start, jnp.broadcast_to(idx, (B,)), a_last, a_bin,
             bc(a_mag), bc(a_noise),
             jnp.ones((B,), jnp.int32)], axis=1)
        em_sq, n_sq, n_sq_want = compact(sq_flags, vals8, E_SQ)
        n_tagged = n_tagged + n_sq_want
        burst_dropped = burst_dropped + (n_sq_want - n_sq)
        a_valid = a_valid & ~squelch
        mask_count = jnp.where(squelch, 0, mask_count)
        squelch_count = jnp.where(
            squelch, squelch_count + 3,
            jnp.where(act, jnp.maximum(squelch_count - 1, 0),
                      squelch_count))

        # noise-estimate reset after repeated squelch: the counter
        # disarms; slots continue contiguously (see `primed` note above)
        reset = act & (squelch_count >= 10)
        baseline_sum = jnp.where(reset, 0.0, baseline_sum)
        primed_i = jnp.where(reset, 0, primed_i)
        squelch_count = jnp.where(reset, 0, squelch_count)

        # final noise update if no active bursts (burst_detect.c:698)
        n_active = jnp.sum(a_valid.astype(jnp.int32))
        evict2 = jnp.where(did0, evict_b, evict_a)
        k1 = upd_k
        do1 = act & (n_active == 0)
        baseline_sum, hidx, primed_i, upd_k = upd_base(
            baseline_sum, hidx, primed_i, upd_k, do1, evict2)

        st = (pre, a_valid, a_id, a_start, a_last, a_bin, a_mag,
              a_noise, mask_count, baseline_sum, hidx, primed_i, upd_k,
              burst_id, squelch_count, n_tagged, burst_dropped, peak_db)
        em = jnp.concatenate([em_del, em_sq], axis=0)   # (E_TOT, 8)
        return st, (em, k0, did0, k1, do1, more)

    # ---- chunk body: history pre-read + inner scan + window write --
    def chunk_body(carry, xs_chunk):
        (hist, a_valid, a_id, a_start, a_last, a_bin, a_mag, a_noise,
         mask_count, baseline_sum, hidx_mod, primed_i, burst_id,
         squelch_count, n_tagged, burst_dropped, create_waits,
         peak_db) = carry
        mags, idxs, acts = xs_chunk

        # pre-read the <=2C rows this chunk's updates evict, through a
        # doubled view so the ring wrap needs no second slice
        hist2 = jnp.concatenate([hist, hist[:C2]], axis=0)
        pre = jax.lax.dynamic_slice(hist2, (hidx_mod, 0), (C2, F))

        st0 = (pre, a_valid, a_id, a_start, a_last, a_bin, a_mag,
               a_noise, mask_count, baseline_sum, hidx_mod, primed_i,
               jnp.int32(0), burst_id, squelch_count, n_tagged,
               burst_dropped, peak_db)
        st, (ems, k0s, d0s, k1s, d1s, mores) = jax.lax.scan(
            frame_body, st0, (mags, idxs, acts), unroll=8)
        (_, a_valid, a_id, a_start, a_last, a_bin, a_mag, a_noise,
         mask_count, baseline_sum, hidx_abs, primed_i, n_upd, burst_id,
         squelch_count, n_tagged, burst_dropped, peak_db) = st
        create_waits = create_waits + jnp.sum(mores.astype(jnp.int32))

        # rebuild the chunk's written rows: update k's value is the mag
        # of the frame that performed it (an EXACT i32 one-hot matmul —
        # each update index matches exactly one frame)
        sel = (((iota_2c[:, None] == k0s[None, :]) & d0s[None, :])
               | ((iota_2c[:, None] == k1s[None, :]) & d1s[None, :]))
        w_upd = jax.lax.dot_general(
            sel.astype(jnp.int32), bc(mags),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        w_upd = jax.lax.bitcast_convert_type(w_upd, jnp.float32)
        window_rows = jnp.where((iota_2c < n_upd)[:, None], w_upd, pre)

        # ONE contiguous dynamic write at the chunk's start slot; the
        # wrap is folded back by a branchless freshness merge of the
        # doubled region
        t = jax.lax.dynamic_update_slice(hist2, window_rows,
                                         (hidx_mod, 0))
        head = jnp.where((iota_2c < hidx_mod + C2 - H)[:, None],
                         t[H:H + C2], t[:C2])
        hist = jax.lax.dynamic_update_slice(t[:H], head, (0, 0))

        carry = (hist, a_valid, a_id, a_start, a_last, a_bin, a_mag,
                 a_noise, mask_count, baseline_sum,
                 jnp.mod(hidx_abs, H), primed_i, burst_id,
                 squelch_count, n_tagged, burst_dropped, create_waits,
                 peak_db)
        return carry, ems

    def detect(samples: jax.Array, state: DetectorState,
               n_valid: jax.Array) -> DetectorState:
        frames = samples[: n_frames * F].reshape(n_frames, F)
        spec = jnp.fft.fft(frames * jnp.asarray(window)[None, :])
        mag2 = jnp.fft.fftshift(
            (jnp.abs(spec) ** 2).astype(jnp.float32), axes=-1)
        idxs = np.arange(n_frames, dtype=np.int32) * F
        acts = (idxs + F) <= n_valid

        carry = (state.baseline_hist, state.a_valid, state.a_id,
                 state.a_start, state.a_last, state.a_bin, state.a_mag,
                 state.a_noise, state.mask_count, state.baseline_sum,
                 state.hist_idx, state.primed, state.burst_id,
                 state.squelch_count, state.n_tagged, jnp.int32(0),
                 jnp.int32(0), state.peak_signal_db)
        carry, ems = jax.lax.scan(
            chunk_body, carry,
            (mag2.reshape(n_chunks, CHUNK, F),
             idxs.reshape(n_chunks, CHUNK),
             acts.reshape(n_chunks, CHUNK)))
        (hist, a_valid, a_id, a_start, a_last, a_bin, a_mag, a_noise,
         mask_count, baseline_sum, hidx_mod, primed_i, burst_id,
         squelch_count, n_tagged, burst_dropped, create_waits,
         peak_db) = carry

        # assemble the gone table from the per-frame emission rows via
        # ONE multi-operand sort (frame-major emission order; hosts
        # sort output frames by burst id, so only capacity matters).
        # A scatter here would serialize ~50k dynamic-address updates.
        em = ems.reshape(n_frames * E_TOT, 8)
        valid_i = (em[:, 7] > 0)
        key = jnp.where(valid_i,
                        jnp.arange(em.shape[0], dtype=jnp.int32),
                        np.int32(2**31 - 1))
        cols = jax.lax.sort(
            [key] + [em[:, c] for c in range(7)], num_keys=1)
        n_emitted = jnp.sum(valid_i.astype(jnp.int32))
        in_table = jnp.arange(G, dtype=jnp.int32) < n_emitted

        def col(i):
            return jnp.where(in_table, cols[1 + i][:G], 0)

        return state._replace(
            baseline_hist=hist,
            baseline_sum=baseline_sum,
            hist_idx=hidx_mod,
            primed=primed_i,
            a_valid=a_valid, a_id=a_id, a_start=a_start, a_last=a_last,
            a_bin=a_bin, a_mag=a_mag, a_noise=a_noise,
            mask_count=mask_count,
            g_count=jnp.minimum(n_emitted, G),
            g_id=col(0), g_start=col(1), g_stop=col(2), g_last=col(3),
            g_bin=col(4),
            g_mag=jax.lax.bitcast_convert_type(col(5), jnp.float32),
            g_noise=jax.lax.bitcast_convert_type(col(6), jnp.float32),
            burst_id=burst_id,
            squelch_count=squelch_count,
            # n_tagged counts every flagged burst (including emission-
            # capacity drops), so the host's dropped = tagged - detected
            # stays truthful
            n_tagged=n_tagged,
            peak_signal_db=peak_db,
        )

    return detect
