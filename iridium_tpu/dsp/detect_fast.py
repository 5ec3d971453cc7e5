"""Branchless chunked burst detector with PER-BIN state (the production
fast path, single-chip and sharded).

Functionally the reference detector state machine (burst_detect.c:
426-699; see dsp/detect.py for the faithful per-frame formulation this
is derived from), restructured twice for the hardware:

1. BRANCHLESS + CHUNKED (round 3): the per-frame body has no lax.cond
   regions and no dynamic-address memory ops (each costs ~20-50 us of
   fixed latency on this TPU runtime); noise-history reads/writes are
   chunked so each chunk costs ONE dynamic slice + ONE contiguous
   window write.

2. PER-BIN BURST TABLES (round 4): the round-3 body carried a (B,)
   burst table whose every interaction with the (F,) spectrum needed a
   (B, F) mask-sum (~2M elements x 3 per frame — measured ~110 ms per
   2048-frame block, the single largest device cost). Active bursts
   can NEVER share a center bin (a burst masks +-half_bw around
   itself, and creation only fires on unmasked peaks —
   burst_detect.c:556-632), so the burst table is re-keyed BY BIN:
   a_valid/a_id/a_start/a_last/a_mag/a_noise become (F,) vectors and
   every table<->spectrum interaction is an O(F) elementwise op:
     - extension: a_last = where(a_valid & dilated & primed, idx, .)
     - deletion mask release: interval edges via two static shifts of
       the (F,) deletion indicator + cumsum
     - emission: rank-compaction of the (F,) indicator with an exact
       i32 one-hot matmul
   A side effect is that the active-burst capacity becomes F (the
   reference's list is heap-bound; the round-3 (B,) table could
   saturate) — strictly closer to the reference.

Bounded-capacity divergences from the reference (the same class as the
reference's own drop-on-full queues, burst_detect.c:929-937; counted):
  * > K_CREATE eligible creations in one frame: the excess peaks create
    on a later frame while still above threshold (P ~ 1e-7/frame at the
    reference's live 10 MHz density); a one-time stderr note reports
    the clamp when max_new_per_frame is configured higher;
  * > E_DEL natural deletions or > E_SQ squelch emissions in one frame:
    the excess bursts are dropped and counted into n_tagged-without-
    emission (the host's d: counter); the burst-mask subtraction uses
    the FULL deletion indicator (not the capped emission rows), so
    dropped emissions never leave stale coverage behind;
  * two noise-resets inside one 64-frame chunk may keep a stale history
    row (the affected rows are fully rewritten before `primed` re-arms,
    so at most one evicted value H updates later is off).

SHARDED MODE (parallel/stream.py): the same body runs over a local bin
range [bin_lo, bin_lo + FL) with a +-halo; the reference's only global
couplings — the active-burst count gating the noise update and the
squelch (burst_detect.c:438-454, 594-631) and the forced noise update
on long-burst deletion (:516) — collapse into ONE two-element psum
per frame: creation ACCEPTANCE needs no baseline (the forced update
re-orders past the psum with an FP-order-preserving fixup at the peak
bin), and `primed`/`squelch_count` evolve from globally-identical
inputs, so the squelch decision and the post-squelch count are
shard-uniform with no further collectives. (The exact sharded scan
pays four psums per frame plus the per-frame cond/dynamic-address
costs this formulation removes.) Bursts centered
in the halo are tracked (their mask reaches into the owned range) but
only the owning shard emits them.

The exact per-frame implementation (detect.py) remains the oracle for
tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorParams
from ..ops import windows

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


class FastState(NamedTuple):
    """Per-bin detector state. Field names mirror detect.DetectorState
    (so detect.rebase_state and the pipeline's fused rebase work
    unchanged), but the active-burst table is keyed by FFT bin: entry i
    describes the active burst centered at local bin i (a_valid[i]
    False = no burst there). The gone table is identical to the exact
    implementation's."""

    baseline_hist: jax.Array    # (H, FL) f32
    baseline_sum: jax.Array     # (FL,) f32
    hist_idx: jax.Array         # i32 scalar (ring slot, mod H)
    primed: jax.Array           # i32 saturating update counter (>=H =
    #                             primed; detect.py uses 0/1 — the two
    #                             impls' states are not interchangeable)

    a_valid: jax.Array          # (FL,) bool
    a_id: jax.Array             # (FL,) i32
    a_start: jax.Array          # (FL,) i32 (samples, rel. block start)
    a_last: jax.Array           # (FL,) i32
    a_mag: jax.Array            # (FL,) f32
    a_noise: jax.Array          # (FL,) f32

    mask_count: jax.Array       # (FL,) i32

    g_count: jax.Array          # i32 scalar
    g_id: jax.Array             # (G,) i32
    g_start: jax.Array          # (G,) i32
    g_stop: jax.Array           # (G,) i32
    g_last: jax.Array           # (G,) i32
    g_bin: jax.Array            # (G,) i32 (GLOBAL bins)
    g_mag: jax.Array            # (G,) f32
    g_noise: jax.Array          # (G,) f32

    burst_id: jax.Array         # i32 scalar
    squelch_count: jax.Array    # i32 scalar
    n_tagged: jax.Array         # i32 scalar
    peak_signal_db: jax.Array   # f32 scalar
    # cumulative diagnostics (surfaced to the host stats line):
    # emission-capacity drops and creation-budget deferrals
    burst_dropped: jax.Array    # i32 scalar
    create_waits: jax.Array     # i32 scalar


def init_state(p: DetectorParams, n_bins: int | None = None,
               id_offset: int = 0) -> FastState:
    FL = n_bins if n_bins is not None else p.fft_size
    H, G = p.history_size, p.gone_capacity
    z32 = jnp.zeros((), jnp.int32)
    zf = jnp.zeros((FL,), jnp.float32)
    zi = jnp.zeros((FL,), jnp.int32)
    return FastState(
        baseline_hist=jnp.zeros((H, FL), jnp.float32),
        baseline_sum=zf, hist_idx=z32, primed=z32,
        a_valid=jnp.zeros((FL,), bool),
        a_id=zi, a_start=zi, a_last=zi, a_mag=zf, a_noise=zf,
        mask_count=zi,
        g_count=z32,
        g_id=jnp.zeros((G,), jnp.int32),
        g_start=jnp.zeros((G,), jnp.int32),
        g_stop=jnp.zeros((G,), jnp.int32),
        g_last=jnp.zeros((G,), jnp.int32),
        g_bin=jnp.zeros((G,), jnp.int32),
        g_mag=jnp.zeros((G,), jnp.float32),
        g_noise=jnp.zeros((G,), jnp.float32),
        burst_id=jnp.full((), id_offset * 10, jnp.int32),
        squelch_count=z32, n_tagged=z32,
        peak_signal_db=jnp.zeros((), jnp.float32),
        burst_dropped=z32, create_waits=z32,
    )


def make_scan_fast(p: DetectorParams, n_bins: int | None = None,
                   axis_name: str | None = None, id_stride: int = 1):
    """Build run(mag2, state, n_valid, bin_lo, own_lo, own_hi) ->
    FastState: the chunked branchless state machine over per-frame
    fftshifted magnitude^2 rows.

    Single chip: n_bins=None, bin_lo=own_lo=0, own_hi=fft_size.
    Sharded: n_bins = owned + 2*halo local bins; bin_lo/own_lo/own_hi
    are traced (axis-index-derived) GLOBAL bin bounds; `axis_name`
    enables the per-frame coupling psum."""
    F = p.fft_size
    FL = n_bins if n_bins is not None else F
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
    # candidate pool for the creation walk: must exceed K_CREATE by the
    # worst realistic same-frame mutual-suppression count
    K_TOP = 2 * K_CREATE

    n_frames = p.frames_per_block
    # <=2 noise updates/frame, and an eviction must never reach a row
    # written earlier in the SAME chunk, so the chunk may hold at most
    # H/2 frames. 32 balances the per-frame eviction-select read
    # against the per-chunk fixed costs (pre-read slice + window write).
    CHUNK = max(min(32, H // 2), 1)
    while n_frames % CHUNK:
        CHUNK //= 2
    n_chunks = n_frames // CHUNK
    C2 = 2 * CHUNK
    assert G <= n_frames * E_TOT, (G, n_frames)

    iota_f = np.arange(FL, dtype=np.int32)
    iota_2c = np.arange(C2, dtype=np.int32)

    def gsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # Segmented top-K_TOP: a full top_k lowers to an (FL,) sort (~7 us
    # per frame, the largest single in-loop op). With segments no wider
    # than half_bw, at most one candidate per segment can ever be
    # ACCEPTED (a second is within half_bw of the segment max, which
    # greedy either accepts — suppressing it — or itself loses to an
    # accepted neighbor, a geometry needing a third same-frame
    # candidate: the documented capacity-divergence class). So the
    # segment maxima are a faithful candidate pool at 1/SEG the sort.
    SEG = 1
    while SEG * 2 <= min(max(half_bw, 1), 16) and FL % (SEG * 2) == 0:
        SEG *= 2
    NS = FL // SEG
    iota_ns = np.arange(NS, dtype=np.int32)

    if SEG >= 4:
        def _top_k(cand):
            seg = cand.reshape(NS, SEG)
            segmax = jnp.max(seg, axis=1)
            segarg = jnp.argmax(seg, axis=1).astype(jnp.int32)
            v, si = jax.lax.top_k(segmax, K_TOP)
            oh = (iota_ns[None, :] == si[:, None]).astype(jnp.int32)
            sub = jax.lax.dot_general(
                oh, segarg[:, None], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)[:, 0]
            return v, si * SEG + sub
    else:
        def _top_k(cand):
            return jax.lax.top_k(cand, K_TOP)

    def compact_bins(flags, vals8, cap):
        """Rank-compact flagged rows of the (FL, 8) i32 per-bin table
        into (cap, 8) via an exact i32 one-hot matmul; rows beyond cap
        drop (counted by the caller)."""
        fi = flags.astype(jnp.int32)
        rank = jnp.cumsum(fi) - fi
        keep = flags & (rank < cap)
        sel = (jnp.arange(cap, dtype=jnp.int32)[:, None]
               == jnp.where(keep, rank, -1)[None, :])
        out = jax.lax.dot_general(
            sel.astype(jnp.int32), vals8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        n = jnp.sum(fi)
        return out, n

    def bc(v):
        return jax.lax.bitcast_convert_type(v, jnp.int32)

    def del_edges(flags):
        """Interval-release edge vector for a (FL,) deletion indicator:
        e[i] = #intervals opening at i minus #closing after i-1, with
        the reference's clip-at-boundary semantics
        (burst_detect.c:473-486). Two static shifts — no (B, F) op."""
        fi = flags.astype(jnp.int32)
        head = jnp.sum(fi[:half_bw + 1])
        e_lo = jnp.concatenate(
            [head[None], fi[half_bw + 1:],
             jnp.zeros((half_bw,), jnp.int32)])
        e_hi = jnp.concatenate(
            [jnp.zeros((half_bw + 1,), jnp.int32),
             fi[:FL - half_bw - 1]])
        return e_lo - e_hi

    # ---- per-frame branchless body (no conds, no dynamic addressing,
    # all burst<->spectrum interactions O(FL)) ----
    def make_frame_body(eligible_f, owned_f, gbin_f):
        def frame_body(st, xs):
            (pre, a_valid, a_id, a_start, a_last, a_mag, a_noise,
             mask_count, baseline_sum, hidx, primed_i, upd_k, burst_id,
             squelch_count, n_tagged, burst_dropped, peak_db) = st
            mag, idx, act = xs
            # primed_i is a saturating update counter: primed once >= H
            # updates have happened since the last noise reset (identical
            # semantics to the exact impl's rewind — the ring refills
            # with the same last-H update magnitudes).
            primed = (primed_i >= H) & act

            # both candidate eviction rows (updates k and k+1 of this
            # chunk) via an exact i32 one-hot matmul over the pre-read
            sel2 = jnp.stack([(iota_2c == upd_k),
                              (iota_2c == upd_k + 1)]).astype(jnp.int32)
            ev = jax.lax.dot_general(
                sel2, bc(pre), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            ev = jax.lax.bitcast_convert_type(ev, jnp.float32)
            evict_a, evict_b = ev[0], ev[1]

            def upd_base(bsum, hx, prim, k, do, evict):
                """Running-sum noise update (burst_detect.c:438-454)."""
                old = evict * (prim >= H)
                bsum = jnp.where(do, bsum - old + mag, bsum)
                hx = jnp.where(do, hx + 1, hx)
                prim = jnp.minimum(prim + do.astype(jnp.int32), H)
                k = k + do.astype(jnp.int32)
                return bsum, hx, prim, k

            rel = jnp.where(baseline_sum > 0, mag / baseline_sum, 0.0)

            # update_bursts: extend last_active (burst_detect.c:458-469)
            th = rel > threshold
            ff = np.zeros((1,), bool)
            dilated = (th
                       | jnp.concatenate([th[1:], ff])    # rel[bin+1]
                       | jnp.concatenate([ff, th[:-1]]))  # rel[bin-1]
            a_last = jnp.where(a_valid & dilated & primed, idx, a_last)

            # peaks masked by the CARRIED mask (remove_peaks_around_bursts)
            relm = rel * (mask_count == 0) * eligible_f
            relm = jnp.where(relm > threshold, relm, 0.0)

            # delete_gone_bursts -> compacted emission rows
            long_burst = a_valid & ((a_last - a_start) > p.max_burst_len)
            gone = a_valid & (((a_last + p.burst_post_len) <= idx)
                              | long_burst)
            flags = gone & primed
            any_long = jnp.any(long_burst).astype(jnp.int32)
            emit = flags & owned_f
            vals8 = jnp.stack(
                [a_id, a_start, jnp.broadcast_to(idx, (FL,)), a_last,
                 gbin_f, bc(a_mag), bc(a_noise),
                 jnp.ones((FL,), jnp.int32)], axis=1)
            a_valid = a_valid & ~flags

            # create_new_bursts (burst_detect.c:556-632): the greedy
            # argmax-and-mask loop is equivalent to walking the
            # descending-magnitude candidate list and skipping any
            # candidate within +-half_bw of an ALREADY-ACCEPTED one.
            # The post-deletion mask check is a no-op on candidates:
            # relm already baked the frame-start mask, and deletions
            # only RELEASE coverage — a bin with relm > 0 was unmasked
            # and stays unmasked (reference extract_peaks runs before
            # delete_gone too, burst_detect.c:679-699) — so candidates
            # come straight from relm and the deletion release is
            # DEFERRED into one merged mask-edge cumsum below.
            cand = relm
            topv, topi = _top_k(cand)                    # desc, tie->low
            above = primed & (topv > threshold)
            # suppress candidate j if an earlier accepted k is within
            # half_bw; accepted = above & not suppressed, first K_CREATE
            dist_ok = jnp.abs(topi[:, None] - topi[None, :]) > half_bw
            tri = np.tril(np.ones((K_TOP, K_TOP), bool), -1)  # k < j
            acc = jnp.zeros((K_TOP,), bool)
            for j in range(K_TOP):
                sup = jnp.any(acc & tri[j] & ~dist_ok[j])
                acc = acc.at[j].set(above[j] & ~sup)
            rank = jnp.cumsum(acc.astype(jnp.int32)) - acc.astype(jnp.int32)
            take = acc & (rank < K_CREATE)
            n_acc = jnp.sum(take.astype(jnp.int32))
            # per-accepted-candidate values
            ids_k = burst_id + 10 * id_stride * rank
            onehot = ((iota_f[None, :] == topi[:, None])
                      & take[:, None])                    # (K', FL)
            oh_i = onehot.astype(jnp.int32)
            at_any = jnp.sum(oh_i, axis=0) > 0            # (FL,)

            # THE global coupling (one psum per frame): [any long-burst
            # deletion (forced noise update, burst_detect.c:516),
            # post-creation active count (squelch + noise gate,
            # :438-454/:594-631)]. Candidate ACCEPTANCE needs no
            # baseline, so the forced update legally moves after the
            # psum; the created bursts' noise reads then pre-apply it
            # at the peak bin in matching FP order. `primed` and
            # `squelch_count` evolve from globally-identical inputs, so
            # the squelch decision and the post-squelch count (0 if
            # squelched) are shard-uniform — no second/third psum.
            n_own_post = jnp.sum(((a_valid | at_any) & owned_f)
                                 .astype(jnp.int32))
            cpl = gsum(jnp.stack([any_long, n_own_post]))
            force_noise = (cpl[0] > 0) & primed
            n_active = cpl[1]

            # exact one-hot selects via ONE i32 matmul (a float dot may
            # round through bf16 passes on the MXU)
            sel3 = jax.lax.dot_general(
                oh_i,
                jnp.stack([bc(baseline_sum), bc(mag), bc(evict_a)],
                          axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            sel3 = jax.lax.bitcast_convert_type(sel3, jnp.float32)
            base_at, mag_at, ev_at = sel3[:, 0], sel3[:, 1], sel3[:, 2]
            old_at = ev_at * (primed_i >= H)
            base_eff = jnp.where(force_noise,
                                 (base_at - old_at) + mag_at, base_at)
            mag_db_k = 10.0 * jnp.log10(
                jnp.maximum(topv * hist_f * enbw, 1e-30))
            noise_db_k = 10.0 * jnp.log10(jnp.maximum(
                base_eff / hist_f / f2 / enbw / bin_width, 1e-30))

            # forced noise update (long-burst deletion)
            did0 = force_noise
            k0 = upd_k
            baseline_sum, hidx, primed_i, upd_k = upd_base(
                baseline_sum, hidx, primed_i, upd_k, force_noise,
                evict_a)

            def dot_vals(vals):
                return jax.lax.dot_general(
                    vals[None, :], oh_i,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)[0]

            start = idx - p.burst_pre_len
            a_valid = a_valid | at_any
            a_id = jnp.where(at_any, dot_vals(ids_k), a_id)
            a_start = jnp.where(at_any, start, a_start)
            a_last = jnp.where(at_any, start, a_last)
            a_mag = jnp.where(at_any,
                              jax.lax.bitcast_convert_type(
                                  dot_vals(bc(mag_db_k)), jnp.float32),
                              a_mag)
            a_noise = jnp.where(at_any,
                                jax.lax.bitcast_convert_type(
                                    dot_vals(bc(noise_db_k)),
                                    jnp.float32),
                                a_noise)
            created = at_any
            # ONE merged mask update: add the accepted creation
            # intervals, release the deleted ones (both edge one-hots,
            # one cumsum; order-free because the sets touch disjoint
            # coverage deltas)
            mask_count = mask_count + jnp.cumsum(
                del_edges(at_any) - del_edges(flags))
            burst_id = burst_id + 10 * id_stride * n_acc
            peak_db = jnp.maximum(
                peak_db, jnp.max(jnp.where(take, mag_db_k, -jnp.inf)))
            # candidates beyond the creation budget retry next frame;
            # count the occurrences (diagnostic)
            more = (n_acc == K_CREATE) & jnp.any(acc & (rank >= K_CREATE))

            # squelch (burst_detect.c:594-631): uses the psum'd
            # post-creation global count
            squelch = primed & (p.max_bursts > 0) \
                & (n_active > p.max_bursts)
            # vals8 from the deletion step is still valid: creation only
            # wrote bins excluded by ~created, extension ran before it
            sq_flags = squelch & a_valid & ~created

            # ONE combined emission compaction for the frame: deletion
            # rows first (frame-emission order), then squelch rows; the
            # two flag sets are disjoint (deleted bursts left a_valid
            # before squelch flagged the remainder). Capacity split
            # E_DEL/E_SQ is preserved by ranking within each set.
            fi_d = emit.astype(jnp.int32)
            fi_s = (sq_flags & owned_f).astype(jnp.int32)
            # both ranks from ONE cumsum (two 16-bit counters packed in
            # one i32; FL < 2^15 keeps them from touching)
            cs = jnp.cumsum(fi_d + (fi_s << 16))
            rank_d = (cs & 0xFFFF) - fi_d
            rank_s = (cs >> 16) - fi_s + E_DEL
            n_del_want = cs[-1] & 0xFFFF
            n_sq_want = cs[-1] >> 16
            rank = jnp.where(emit, rank_d, rank_s)
            keep = ((emit & (rank_d < E_DEL))
                    | ((fi_s > 0) & (rank_s < E_TOT)))
            sel = (jnp.arange(E_TOT, dtype=jnp.int32)[:, None]
                   == jnp.where(keep, rank, -1)[None, :])
            em = jax.lax.dot_general(
                sel.astype(jnp.int32), vals8,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            n_tagged = n_tagged + n_del_want + n_sq_want
            burst_dropped = (burst_dropped
                             + jnp.maximum(n_del_want - E_DEL, 0)
                             + jnp.maximum(n_sq_want - E_SQ, 0))

            a_valid = a_valid & ~squelch
            mask_count = jnp.where(squelch, 0, mask_count)
            squelch_count = jnp.where(
                squelch, squelch_count + 3,
                jnp.where(act, jnp.maximum(squelch_count - 1, 0),
                          squelch_count))

            # noise-estimate reset after repeated squelch: the counter
            # disarms; history slots continue contiguously
            reset = act & (squelch_count >= 10)
            baseline_sum = jnp.where(reset, 0.0, baseline_sum)
            primed_i = jnp.where(reset, 0, primed_i)
            squelch_count = jnp.where(reset, 0, squelch_count)

            # final noise update if no active bursts (burst_detect.c:
            # 698); squelch empties every shard's table exactly (the
            # decision is shard-uniform, see the coupling note above)
            n_active2 = jnp.where(squelch, 0, n_active)
            evict2 = jnp.where(did0, evict_b, evict_a)
            k1 = upd_k
            do1 = act & (n_active2 == 0)
            baseline_sum, hidx, primed_i, upd_k = upd_base(
                baseline_sum, hidx, primed_i, upd_k, do1, evict2)

            st = (pre, a_valid, a_id, a_start, a_last, a_mag, a_noise,
                  mask_count, baseline_sum, hidx, primed_i, upd_k,
                  burst_id, squelch_count, n_tagged, burst_dropped,
                  peak_db)
            return st, (em, k0, did0, k1, do1, more)

        return frame_body

    # ---- chunk body: history pre-read + inner scan + window write ----
    def make_chunk_body(frame_body):
        def chunk_body(carry, xs_chunk):
            (hist2, a_valid, a_id, a_start, a_last, a_mag, a_noise,
             mask_count, baseline_sum, hidx_mod, primed_i, burst_id,
             squelch_count, n_tagged, burst_dropped, create_waits,
             peak_db) = carry
            mags, idxs, acts = xs_chunk

            # the carry holds the DOUBLED history (rows [H:H+C2] mirror
            # [0:C2]), so the ring-wrap pre-read is one dynamic slice
            # with no per-chunk (H+C2, FL) concat
            pre = jax.lax.dynamic_slice(hist2, (hidx_mod, 0), (C2, FL))

            st0 = (pre, a_valid, a_id, a_start, a_last, a_mag, a_noise,
                   mask_count, baseline_sum, hidx_mod, primed_i,
                   jnp.int32(0), burst_id, squelch_count, n_tagged,
                   burst_dropped, peak_db)
            st, (ems, k0s, d0s, k1s, d1s, mores) = jax.lax.scan(
                frame_body, st0, (mags, idxs, acts), unroll=16)
            (_, a_valid, a_id, a_start, a_last, a_mag, a_noise,
             mask_count, baseline_sum, hidx_abs, primed_i, n_upd,
             burst_id, squelch_count, n_tagged, burst_dropped,
             peak_db) = st
            create_waits = create_waits + jnp.sum(mores.astype(jnp.int32))

            # rebuild the chunk's written rows: update k's value is the
            # mag of the frame that performed it (exact i32 one-hot
            # matmul — each update index matches exactly one frame)
            sel = (((iota_2c[:, None] == k0s[None, :]) & d0s[None, :])
                   | ((iota_2c[:, None] == k1s[None, :]) & d1s[None, :]))
            w_upd = jax.lax.dot_general(
                sel.astype(jnp.int32), bc(mags),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            w_upd = jax.lax.bitcast_convert_type(w_upd, jnp.float32)
            window_rows = jnp.where((iota_2c < n_upd)[:, None], w_upd,
                                    pre)

            # ONE contiguous dynamic write at the chunk's start slot;
            # then restore the mirror invariant by writing the merged
            # head rows to BOTH copies (two (C2, FL) updates instead of
            # rebuilding the doubled buffer)
            t = jax.lax.dynamic_update_slice(hist2, window_rows,
                                             (hidx_mod, 0))
            head = jnp.where((iota_2c < hidx_mod + C2 - H)[:, None],
                             t[H:H + C2], t[:C2])
            t = jax.lax.dynamic_update_slice(t, head, (0, 0))
            hist2 = jax.lax.dynamic_update_slice(t, head, (H, 0))

            carry = (hist2, a_valid, a_id, a_start, a_last, a_mag,
                     a_noise, mask_count, baseline_sum,
                     jnp.mod(hidx_abs, H), primed_i, burst_id,
                     squelch_count, n_tagged, burst_dropped,
                     create_waits, peak_db)
            return carry, ems

        return chunk_body

    dc = F // 2

    def run(mag2, state: FastState, n_valid, bin_lo=0, own_lo=0,
            own_hi=None):
        if own_hi is None:
            own_hi = F
        # eligibility + ownership in GLOBAL bin coordinates (edge + DC
        # notch exclusion, burst_detect.c:529-552); bin_lo may be a
        # traced shard quantity
        if isinstance(bin_lo, (int, np.integer)):
            gbins = bin_lo + iota_f
        else:
            gbins = bin_lo + jnp.asarray(iota_f)
        eligible_f = (((gbins >= half_bw) & (gbins < F - half_bw)
                       & ~((gbins >= dc - 3) & (gbins <= dc + 3)))
                      ).astype(jnp.float32)
        owned_f = (gbins >= own_lo) & (gbins < own_hi)
        gbin_f = gbins.astype(jnp.int32)

        frame_body = make_frame_body(eligible_f, owned_f, gbin_f)
        chunk_body = make_chunk_body(frame_body)

        idxs = np.arange(n_frames, dtype=np.int32) * F
        acts = (idxs + F) <= n_valid

        hist2_0 = jnp.concatenate(
            [state.baseline_hist, state.baseline_hist[:C2]], axis=0)
        carry = (hist2_0, state.a_valid, state.a_id,
                 state.a_start, state.a_last, state.a_mag,
                 state.a_noise, state.mask_count, state.baseline_sum,
                 state.hist_idx, state.primed, state.burst_id,
                 state.squelch_count, state.n_tagged, jnp.int32(0),
                 jnp.int32(0), state.peak_signal_db)
        carry, ems = jax.lax.scan(
            chunk_body, carry,
            (mag2.reshape(n_chunks, CHUNK, FL),
             idxs.reshape(n_chunks, CHUNK),
             acts.reshape(n_chunks, CHUNK)))
        (hist2, a_valid, a_id, a_start, a_last, a_mag, a_noise,
         mask_count, baseline_sum, hidx_mod, primed_i, burst_id,
         squelch_count, n_tagged, burst_dropped, create_waits,
         peak_db) = carry

        # assemble the gone table from the per-frame emission rows via
        # ONE multi-operand sort (frame-major emission order; hosts
        # sort output frames by burst id, so only capacity matters).
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
            baseline_hist=hist2[:H],
            baseline_sum=baseline_sum,
            hist_idx=hidx_mod,
            primed=primed_i,
            a_valid=a_valid, a_id=a_id, a_start=a_start, a_last=a_last,
            a_mag=a_mag, a_noise=a_noise,
            mask_count=mask_count,
            g_count=jnp.minimum(n_emitted, G),
            g_id=col(0), g_start=col(1), g_stop=col(2), g_last=col(3),
            g_bin=col(4),
            g_mag=jax.lax.bitcast_convert_type(col(5), jnp.float32),
            g_noise=jax.lax.bitcast_convert_type(col(6), jnp.float32),
            burst_id=burst_id,
            squelch_count=squelch_count,
            # n_tagged counts every flagged burst (including emission-
            # capacity drops), so the host's dropped = tagged -
            # detected stays truthful
            n_tagged=n_tagged,
            peak_signal_db=peak_db,
            burst_dropped=state.burst_dropped + burst_dropped,
            create_waits=state.create_waits + create_waits,
        )

    return run


def make_detect_block_fast(p: DetectorParams):
    """Returns detect(samples, state, n_valid) -> new FastState
    (single-chip entry: batched spectrogram + the per-bin scan)."""
    F = p.fft_size
    n_frames = p.frames_per_block
    window = windows.blackman(F) / np.float32(0.42)
    run = make_scan_fast(p)

    def detect(samples: jax.Array, state: FastState,
               n_valid: jax.Array) -> FastState:
        frames = samples[: n_frames * F].reshape(n_frames, F)
        spec = jnp.fft.fft(frames * jnp.asarray(window)[None, :])
        mag2 = jnp.fft.fftshift(
            (jnp.abs(spec) ** 2).astype(jnp.float32), axes=-1)
        return run(mag2, state, n_valid)

    return detect
