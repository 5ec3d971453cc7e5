#!/usr/bin/env python
"""Microbenchmark of the host decode layer (--parsed path cost per frame).

VERDICT r01 target: >= 10k frames/s through frame_decode + ida_decode so
the host decoders can't become the serial bottleneck at >=100x realtime
(which implies tens of thousands of frames/s).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_decode.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from iridium_tpu.decode import frame as frame_mod          # noqa: E402
from iridium_tpu.decode import ida as ida_mod              # noqa: E402
from iridium_tpu.io import synth_frames as sf              # noqa: E402


def make_frames(n: int, seed: int = 0) -> list[dict]:
    rng = np.random.default_rng(seed)
    frames = []
    ira_bits = sf.with_access(sf.ira_payload_bits(
        sat_id=23, beam_id=11, xyz=(1000, -500, 1200),
        pages=[(0x12345678, 3)]))
    ida_bits = sf.with_access(sf.ida_payload_bits(
        b"BENCHMARK-PAYLOAD", cont=0, ctr=0,
        lcw_ft=0, lcw_code=6, lcw3_val=0x1ABCD))
    for i in range(n):
        bits = (ira_bits if i % 2 == 0 else ida_bits).copy()
        # flip up to 2 random payload bits so the Chase path gets exercised
        llr = rng.uniform(0.5, 4.0, len(bits)).astype(np.float32)
        nerr = int(rng.integers(0, 3))
        for p in rng.choice(np.arange(24, len(bits)), nerr, replace=False):
            bits[p] ^= 1
            llr[p] = 0.01
        frames.append(dict(bits=bits, llr=llr, timestamp_ns=10 ** 18 + i,
                           frequency=1.6221e9, direction="DL",
                           magnitude=-20.0, noise=-100.0, level=0.01,
                           confidence=95, n_symbols=len(bits) // 2))
    return frames


def main():
    from iridium_tpu.decode import batch

    n = 4000
    frames = make_frames(n)
    # warmup (table construction etc.)
    for f in frames[:50]:
        frame_mod.frame_decode(f)
        ida_mod.ida_decode(f)

    t0 = time.perf_counter()
    n_ira = n_ida = 0
    for f in frames:
        if frame_mod.frame_decode(f) is not None:
            n_ira += 1
        if ida_mod.ida_decode(f) is not None:
            n_ida += 1
    dt_scalar = time.perf_counter() - t0

    batch.decode_block(frames[:50])   # warmup
    t0 = time.perf_counter()
    nb_ira = nb_ida = 0
    for i0 in range(0, n, 512):       # realistic per-block batch size
        for bres, bida in batch.decode_block(frames[i0:i0 + 512]):
            if bres is not None:
                nb_ira += 1
            if bida is not None:
                nb_ida += 1
    dt_batch = time.perf_counter() - t0

    assert (nb_ira, nb_ida) == (n_ira, n_ida), "batch/scalar divergence"
    print(f"scalar: {n} frames in {dt_scalar:.3f} s -> "
          f"{n / dt_scalar:,.0f} frames/s")
    print(f"batch:  {n} frames in {dt_batch:.3f} s -> "
          f"{n / dt_batch:,.0f} frames/s "
          f"(IRA/IBC: {nb_ira}, IDA: {nb_ida})")
    assert nb_ira > 0 and nb_ida > 0, "decoders must actually decode"
    return n / dt_batch


if __name__ == "__main__":
    main()
