"""IRA (ring alert) / IBC (broadcast) frame decoder.

Parity sources (reference file:line):
  - access codes:             frame_decode.c:51-56
  - 2/3-way de-interleave
    (pair-swap cancellation): frame_decode.c:156-199
  - parity-32 gate:           frame_decode.c:399-407
  - IBC detection + decode:   frame_decode.c:441-514
  - IRA detection + decode:   frame_decode.c:522-595
  - IRA field extraction:     frame_decode.c:317-366
  - IBC field extraction:     frame_decode.c:368-393
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from . import bch

ACCESS_DL = np.array([0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 1,
                      0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1], np.uint8)
ACCESS_UL = np.array([1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1,
                      1, 1, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0], np.uint8)

BCH_RA_DATA = 21


def de_interleave(x):
    """64 values -> (32, 32): odd symbols reversed, even symbols reversed
    (net permutation after the cancelled pair-swaps,
    frame_decode.c:156-176)."""
    out1 = []
    out2 = []
    for s in range(31, 0, -2):
        out1 += [x[2 * s], x[2 * s + 1]]
    for s in range(30, -1, -2):
        out2 += [x[2 * s], x[2 * s + 1]]
    return out1, out2


def de_interleave3(x):
    """96 values -> 3 x 32 via reverse stride-3 (frame_decode.c:178-199):
    symbols [47,44,...,2] / [46,43,...,1] / [45,42,...,0]."""
    outs = []
    for start in (47, 46, 45):
        o = []
        for s in range(start, -1, -3):
            o += [x[2 * s], x[2 * s + 1]]
        outs.append(o)
    return outs[0], outs[1], outs[2]


def _extract_uint(bits, n):
    v = 0
    for i in range(n):
        v = (v << 1) | int(bits[i])
    return v


def _extract_signed12(bits):
    sign = int(bits[0])
    mag = _extract_uint(bits[1:12], 11)
    return mag - (1 << 11) if sign else mag


def _check_parity32(block32, data_bits, check_bits):
    ones = int(np.sum(data_bits)) + int(np.sum(check_bits)) + int(block32[31])
    return ones % 2 == 0


def _chase_ra(block32, llr32):
    data, check, e, _ = bch.chase_decode(
        block32[:31], None if llr32 is None else llr32[:31],
        bch.TBL_RA, 10, BCH_RA_DATA)
    if e < 0:
        return None
    if not _check_parity32(block32, data, check):
        return None
    return data


@dataclasses.dataclass
class IraData:
    sat_id: int
    beam_id: int
    pos_xyz: tuple
    lat: float
    lon: float
    alt: int
    pages: list            # [(tmsi, msc_id)]


@dataclasses.dataclass
class IbcData:
    bc_type: int
    sat_id: int = 0
    beam_id: int = 0
    timeslot: int = 0
    sv_blocking: int = 0
    iri_time: int = 0


def _parse_ira(bs):
    n = len(bs)
    if n < 63:
        return IraData(0, 0, (0, 0, 0), 0.0, 0.0, 0, [])
    sat = _extract_uint(bs[0:7], 7)
    beam = _extract_uint(bs[7:13], 6)
    x = _extract_signed12(bs[13:25])
    y = _extract_signed12(bs[25:37])
    z = _extract_signed12(bs[37:49])
    xy = math.sqrt(float(x) * x + float(y) * y)
    lat = math.atan2(float(z), xy) * 180.0 / math.pi
    lon = math.atan2(float(y), float(x)) * 180.0 / math.pi
    alt = int(math.sqrt(float(x) * x + float(y) * y + float(z) * z)
              * 4.0) - 6378 + 23
    pages = []
    off = 63
    while off + 42 <= n and len(pages) < 12:
        page = bs[off:off + 42]
        if all(int(b) for b in page):
            break
        tmsi = _extract_uint(page[0:32], 32)
        msc = _extract_uint(page[34:39], 5)
        pages.append((tmsi, msc))
        off += 42
    return IraData(sat, beam, (x, y, z), lat, lon, alt, pages)


def _parse_ibc(bs, hdr_type):
    ibc = IbcData(bc_type=hdr_type)
    n = len(bs)
    if n < 42:
        return ibc
    ibc.sat_id = _extract_uint(bs[0:7], 7)
    ibc.beam_id = _extract_uint(bs[7:13], 6)
    ibc.timeslot = int(bs[14])
    ibc.sv_blocking = int(bs[15])
    if n >= 84:
        type2 = _extract_uint(bs[42:48], 6)
        if type2 == 1:
            ibc.iri_time = _extract_uint(bs[52:84], 32)
    return ibc


def frame_decode(frame: dict):
    """frame: dict with 'bits', 'llr', 'timestamp_ns', 'frequency'.

    Returns ('IRA', IraData) / ('IBC', IbcData) / None, mirroring the
    reference detection flow (frame_decode.c:414-598): IBC tried first,
    then IRA; each gated by Chase-BCH success + parity on the leading
    blocks."""
    bits = np.asarray(frame["bits"], np.uint8)
    llr = frame.get("llr")
    if len(bits) < 24:
        return None
    if not (np.array_equal(bits[:24], ACCESS_DL)
            or np.array_equal(bits[:24], ACCESS_UL)):
        return None

    data = bits[24:]
    dllr = None if llr is None else np.asarray(llr)[24:]
    n = len(data)

    # ---- IBC ----
    if n >= 6 + 64:
        hdr = bch.bits_to_uint(data[:6])
        v, e = bch.TBL_HDR.correct(hdr)
        if e >= 0:
            di1, di2 = de_interleave(data[6:6 + 64])
            li = de_interleave(dllr[6:6 + 64]) if dllr is not None else (None, None)
            d1 = _chase_ra(di1, li[0])
            d2 = _chase_ra(di2, li[1])
            if d1 is not None and d2 is not None:
                bc_type = (v >> 4) & 0x7
                stream = list(d1) + list(d2)
                ibc_max = min(262, n)
                off = 6 + 64
                while off + 64 <= ibc_max and len(stream) + 42 <= 256:
                    di1, di2 = de_interleave(data[off:off + 64])
                    li = (de_interleave(dllr[off:off + 64])
                          if dllr is not None and off + 64 <= n
                          else (None, None))
                    a = _chase_ra(di1, li[0])
                    b = _chase_ra(di2, li[1])
                    if a is None or b is None:
                        break
                    stream += list(a) + list(b)
                    off += 64
                return "IBC", _parse_ibc(stream, bc_type)

    # ---- IRA ----
    if n >= 96:
        ra1, ra2, ra3 = de_interleave3(data[:96])
        if dllr is not None:
            la1, la2, la3 = de_interleave3(dllr[:96])
        else:
            la1 = la2 = la3 = None
        d1 = _chase_ra(ra1, la1)
        d2 = _chase_ra(ra2, la2)
        d3 = _chase_ra(ra3, la3)
        if d1 is not None and d2 is not None and d3 is not None:
            stream = list(d1) + list(d2) + list(d3)
            off = 96
            while off + 64 <= n and len(stream) + 42 <= 512:
                di1, di2 = de_interleave(data[off:off + 64])
                li = (de_interleave(dllr[off:off + 64])
                      if dllr is not None else (None, None))
                a = _chase_ra(di1, li[0])
                b = _chase_ra(di2, li[1])
                if a is None or b is None:
                    break
                stream += list(a) + list(b)
                off += 64
            return "IRA", _parse_ira(stream)

    return None
