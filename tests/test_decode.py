"""Decoder-layer tests: BCH/Chase, IRA/IBC/IDA bit-level roundtrip via the
synthetic frame encoders, CRC behavior, and reassembly."""

import numpy as np
import pytest

from iridium_tpu.decode import bch, frame, ida
from iridium_tpu.io import synth_frames as sf


def ones_llr(n):
    return np.ones(n, np.float32)


def test_gf2_and_syndrome_roundtrip():
    # any systematic codeword has zero syndrome
    for poly, syn in ((1207, 10), (3545, 11), (29, 4), (41, 5)):
        for d in (0, 1, 5, 1000):
            cw = sf.bch_encode(d, poly, syn)
            assert bch.gf2_remainder(poly, cw) == 0


def test_bch_corrects_two_errors():
    cw = sf.bch_encode(12345, 1207, 10)
    bits = bch.uint_to_bits(cw, 31)
    bits[3] ^= 1
    bits[17] ^= 1
    data, check, e, fixed = bch.chase_decode(bits, None, bch.TBL_RA, 10, 21)
    assert e == 2 and fixed == 1
    assert bch.bits_to_uint(data) == 12345


def test_chase_rescues_with_llr():
    cw = sf.bch_encode(777, 1207, 10)
    # find a 3-error pattern whose syndrome is NOT hard-correctable (a
    # correctable syndrome would miscorrect to a nearer codeword — the
    # reference does the same); then Chase's first flip candidate is the
    # single least-reliable position (= one of the errors), leaving 2
    # errors for hard BCH -> deterministic true codeword.
    import itertools
    triple = None
    for t in itertools.combinations(range(31), 3):
        pat = 0
        for p in t:
            pat |= 1 << (30 - p)
        syn = bch.gf2_remainder(1207, cw ^ pat)
        if bch.TBL_RA.errs[syn] < 0:
            triple = t
            break
    assert triple is not None
    bits = bch.uint_to_bits(cw, 31)
    llr = np.ones(31, np.float32)
    for l, p in zip((0.01, 0.02, 0.03), triple):
        bits[p] ^= 1
        llr[p] = l
    data, _, e, fixed = bch.chase_decode(bits, llr, bch.TBL_RA, 10, 21)
    assert e >= 0 and fixed == 1
    assert bch.bits_to_uint(data) == 777
    # without soft info it fails
    _, _, e2, _ = bch.chase_decode(bits, None, bch.TBL_RA, 10, 21)
    assert e2 == -1


def make_frame(bits):
    return dict(bits=bits, llr=ones_llr(len(bits)),
                timestamp_ns=0, frequency=1.627e9, magnitude=20.0,
                noise=-100.0, level=0.5, confidence=99,
                n_symbols=(len(bits) // 2) + 12, direction="DL")


def test_ira_roundtrip():
    pages = [(0xDEADBEEF, 7), (0x01020304, 3)]
    payload = sf.ira_payload_bits(55, 21, (100, -200, 1500), pages)
    out = frame.frame_decode(make_frame(sf.with_access(payload)))
    assert out is not None and out[0] == "IRA"
    ira = out[1]
    assert ira.sat_id == 55 and ira.beam_id == 21
    assert ira.pos_xyz == (100, -200, 1500)
    assert ira.pages == pages


def test_ira_survives_bit_errors():
    payload = sf.ira_payload_bits(12, 3, (500, 600, -700))
    bits = sf.with_access(payload)
    llr = ones_llr(len(bits))
    rng = np.random.default_rng(0)
    # 2 errors in each of the three header blocks region
    for p in rng.choice(np.arange(24, 24 + 96), 4, replace=False):
        bits[p] ^= 1
        llr[p] = 0.05
    f = make_frame(bits)
    f["llr"] = llr
    out = frame.frame_decode(f)
    assert out is not None and out[0] == "IRA"
    assert out[1].sat_id == 12


def test_ibc_roundtrip():
    payload = sf.ibc_payload_bits(33, 9, timeslot=1, iri_time=123456789)
    out = frame.frame_decode(make_frame(sf.with_access(payload)))
    assert out is not None and out[0] == "IBC"
    ibc = out[1]
    assert ibc.sat_id == 33 and ibc.beam_id == 9
    assert ibc.timeslot == 1
    assert ibc.iri_time == 123456789


def test_ida_roundtrip_with_crc():
    payload = b"HELLO-IRIDIUM"
    bits = sf.ida_payload_bits(payload, cont=0, ctr=0,
                               lcw_ft=0, lcw_code=6, lcw3_val=0x12345)
    f = make_frame(sf.with_access(bits))
    burst = ida.ida_decode(f)
    assert burst is not None
    assert burst.da_len == len(payload)
    assert burst.payload[:len(payload)] == payload
    assert burst.crc_ok, (burst.stored_crc, burst.computed_crc)
    assert burst.lcw.ft == 2
    assert burst.lcw.lcw_code == 6
    assert burst.lcw.lcw3_val == 0x12345
    assert "geoloc" in burst.lcw_header


def test_ida_crc_detects_corruption():
    bits = sf.ida_payload_bits(b"PAYLOAD", lcw_code=6)
    f = make_frame(sf.with_access(bits))
    good = ida.ida_decode(f)
    assert good is not None and good.crc_ok
    # corrupt a payload byte region heavily (beyond BCH correction) would
    # kill the decode; instead flip bits post-BCH is impossible from
    # outside, so check the CRC math directly on a tampered stream
    stream = list(good.bch_stream)
    stream[25] ^= 1
    tampered = ida.IdaBurst(**{**good.__dict__,
                               "bch_stream": stream})
    # recompute via the same path ida_decode used
    from iridium_tpu.decode.ida import crc_ccitt
    sb = list(stream[:20]) + [0] * 12 + list(stream[20:len(stream) - 4])
    buf = bytearray((len(sb) + 7) // 8)
    for i, b in enumerate(sb):
        if b:
            buf[i // 8] |= 1 << (7 - (i % 8))
    assert crc_ccitt(bytes(buf)) != 0


def test_ida_reassembly():
    got = []

    def cb(data, ts, freq, direction, mag):
        got.append(bytes(data))

    r = ida.IdaReassembler()
    mk = lambda ctr, cont, pl, ts: ida.IdaBurst(
        timestamp_ns=ts, frequency=1.6201e9, direction="DL",
        magnitude=20.0, noise=-100.0, level=0.5, confidence=99,
        n_symbols=179, cont=cont, da_ctr=ctr, da_len=len(pl),
        crc_ok=True, stored_crc=0, computed_crc=0, fixederrs=0,
        payload=pl, bch_stream=[], lcw=ida.Lcw(),
        lcw_header="")
    # single-burst message
    r.push(mk(0, 0, b"ONE", 1_000_000_000), cb)
    assert got == [b"ONE"]
    # three-part message
    r.push(mk(0, 1, b"AAA", 2_000_000_000), cb)
    r.push(mk(1, 1, b"BBB", 2_100_000_000), cb)
    r.push(mk(2, 0, b"CCC", 2_200_000_000), cb)
    assert got[-1] == b"AAABBBCCC"
    # timeout drops stale slot
    r.push(mk(0, 1, b"XX", 3_000_000_000), cb)
    r.flush(4_000_000_000)
    r.push(mk(1, 0, b"YY", 4_100_000_000), cb)
    assert got[-1] == b"AAABBBCCC"   # orphan fragment discarded


def test_batch_decode_parity():
    """decode_block must agree with the scalar frame_decode/ida_decode on
    every frame, across clean, correctable, and corrupt inputs."""
    import dataclasses

    from iridium_tpu.decode import batch
    from iridium_tpu.decode import frame as fm
    from iridium_tpu.io import synth_frames as sf

    rng = np.random.default_rng(7)
    frames = []
    ira_bits = sf.with_access(sf.ira_payload_bits(
        sat_id=23, beam_id=11, xyz=(1000, -500, 1200),
        pages=[(0x12345678, 3)]))
    ida_bits = sf.with_access(sf.ida_payload_bits(
        b"PARITY-CHECK", cont=0, ctr=0,
        lcw_ft=0, lcw_code=6, lcw3_val=0x1ABCD))
    for i in range(120):
        base = ira_bits if i % 2 == 0 else ida_bits
        bits = np.asarray(base, np.uint8).copy()
        llr = rng.uniform(0.5, 4.0, len(bits)).astype(np.float32)
        nerr = int(rng.integers(0, 7))        # up to heavy corruption
        for p in rng.choice(np.arange(24, len(bits)), nerr, replace=False):
            bits[p] ^= 1
            llr[p] = 0.01
        if i % 17 == 0:                        # truncated frames
            bits = bits[:int(rng.integers(10, len(bits)))]
            llr = llr[:len(bits)]
        frames.append(dict(bits=bits, llr=llr, timestamp_ns=10 ** 18 + i,
                           frequency=1.6221e9, direction="DL",
                           magnitude=-20.0, noise=-100.0, level=0.01,
                           confidence=95, n_symbols=len(bits) // 2))

    results = batch.decode_block(frames)
    n_fr = n_ida = 0
    for f, (bres, bida) in zip(frames, results):
        sres = fm.frame_decode(f)
        sida = ida.ida_decode(f)
        assert (bres is None) == (sres is None)
        if sres is not None:
            assert bres[0] == sres[0]
            assert dataclasses.asdict(bres[1]) == dataclasses.asdict(sres[1])
            n_fr += 1
        assert (bida is None) == (sida is None)
        if sida is not None:
            d1 = dataclasses.asdict(bida)
            d2 = dataclasses.asdict(sida)
            bs1 = d1.pop("bch_stream")
            bs2 = d2.pop("bch_stream")
            lcw1 = d1.pop("lcw")
            lcw2 = d2.pop("lcw")
            assert np.array_equal(bs1, bs2)
            assert lcw1 == lcw2
            assert d1 == d2
            n_ida += 1
    assert n_fr > 20 and n_ida > 20
