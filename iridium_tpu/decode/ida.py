"""IDA (Iridium Data) frame decoder: LCW extraction, payload descramble
with Chase BCH(31,20), CRC-CCITT verification, LCW pretty-printing and
multi-burst reassembly.

Parity sources (reference file:line):
  - LCW permutation + 3-component BCH:  ida_decode.c:53-60, 193-253
  - payload descramble (124-bit blocks,
    2-way de-interleave, chunk reorder
    [3,1,2,0], partial-tail handling):  ida_decode.c:259-377
  - CRC-CCITT-FALSE w/ 12-bit splice:   ida_decode.c:379-394, 604-634
  - field extraction / gates:           ida_decode.c:543-664
  - LCW pretty-printer:                 ida_decode.c:396-539
  - 16-slot reassembly (dir match,
    |df|<=260 Hz, dt<=280 ms,
    ctr=(prev+1)%8):                    ida_decode.c:667-748
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import bch

LCW_PERM = [40, 39, 36, 35, 32, 31, 28, 27, 24, 23,
            20, 19, 16, 15, 12, 11, 8, 7, 4, 3,
            41, 38, 37, 34, 33, 30, 29, 26, 25, 22,
            21, 18, 17, 14, 13, 10, 9, 6, 5, 2,
            1, 46, 45, 44, 43, 42]

BCH_DA_SYN = 11
BCH_DA_DATA = 20
IDA_MAX_REASSEMBLY = 16


@dataclasses.dataclass
class Lcw:
    ft: int = 0
    lcw_ok: int = 0
    lcw_ft: int = 0
    lcw_code: int = 0
    lcw3_val: int = 0
    ec_lcw: int = 0


def decode_lcw(data) -> Lcw | None:
    """ida_decode.c:193-253: pair-swap, permute, 3-component BCH."""
    if len(data) < 46:
        return None
    swapped = [0] * 46
    for i in range(0, 46, 2):
        swapped[i] = int(data[i + 1])
        swapped[i + 1] = int(data[i])
    lcw_bits = [swapped[LCW_PERM[i] - 1] for i in range(46)]

    v1 = bch.bits_to_uint(lcw_bits[:7])
    s1 = bch.gf2_remainder(29, v1)
    if s1 != 0:
        if s1 >= 16 or bch.TBL_LCW1.errs[s1] < 0:
            return None
        v1 ^= int(bch.TBL_LCW1.locator[s1])
    ft = (v1 >> 4) & 0x7

    v2 = bch.bits_to_uint(lcw_bits[7:20]) << 1
    s2 = bch.gf2_remainder(465, v2)
    if s2 != 0:
        if s2 >= 256 or bch.TBL_LCW2.errs[s2] < 0:
            return None
        v2 ^= int(bch.TBL_LCW2.locator[s2])

    v3 = bch.bits_to_uint(lcw_bits[20:46])
    s3 = bch.gf2_remainder(41, v3)
    if s3 != 0:
        if s3 >= 32 or bch.TBL_LCW3.errs[s3] < 0:
            return None
        v3 ^= int(bch.TBL_LCW3.locator[s3])

    lcw2_data = (v2 >> 8) & 0x3F
    lcw3_data = v3 >> 5
    return Lcw(ft=ft, lcw_ok=1,
               lcw_ft=(lcw2_data >> 4) & 0x3,
               lcw_code=lcw2_data & 0xF,
               lcw3_val=lcw3_data,
               ec_lcw=(s1 != 0) + (s2 != 0) + (s3 != 0))


def de_interleave_n(x, n_sym):
    """2*n_sym values -> two n_sym-length halves (ida_decode.c:259-272)."""
    out1 = []
    out2 = []
    for s in range(n_sym - 1, 0, -2):
        out1 += [x[2 * s], x[2 * s + 1]]
    for s in range(n_sym - 2, -1, -2):
        out2 += [x[2 * s], x[2 * s + 1]]
    return out1, out2


def descramble_payload(data, llr, max_bch=512):
    """ida_decode.c:276-377 -> (bch_stream list, fixederrs)."""
    bch_stream: list[int] = []
    fixederrs = 0
    data_len = len(data)
    n_full = data_len // 124
    remain = data_len % 124
    order = [3, 1, 2, 0]

    for blk in range(n_full):
        block = data[blk * 124:(blk + 1) * 124]
        bllr = None if llr is None else llr[blk * 124:(blk + 1) * 124]
        h1, h2 = de_interleave_n(block, 62)
        combined = list(h1) + list(h2)
        if bllr is not None:
            l1, l2 = de_interleave_n(bllr, 62)
            lcombined = list(l1) + list(l2)
        for c in range(4):
            if len(bch_stream) + BCH_DA_DATA > max_bch:
                break
            off = order[c] * 31
            cl = None if bllr is None else lcombined[off:off + 31]
            out, _, errs, fixed = bch.chase_decode(
                combined[off:off + 31], cl, bch.TBL_DA,
                BCH_DA_SYN, BCH_DA_DATA)
            if errs < 0:
                return bch_stream, fixederrs
            fixederrs += fixed
            bch_stream += list(out)

    if remain >= 4 and len(bch_stream) + 2 * (remain // 2 - 1) <= max_bch:
        n_sym_last = remain // 2
        tail = data[n_full * 124:]
        h1, h2 = de_interleave_n(tail, n_sym_last)
        if llr is not None:
            lt = llr[n_full * 124:]
            lh1, lh2 = de_interleave_n(lt, n_sym_last)
        half_len = n_sym_last
        if half_len > 1 and len(bch_stream) + BCH_DA_DATA <= max_bch:
            combined = list(h2[1:half_len]) + list(h1[1:half_len])
            lcombined = (list(lh2[1:half_len]) + list(lh1[1:half_len])
                         if llr is not None else None)
            pos = 0
            while (pos + 31 <= len(combined)
                   and len(bch_stream) + BCH_DA_DATA <= max_bch):
                cl = None if lcombined is None else lcombined[pos:pos + 31]
                out, _, errs, fixed = bch.chase_decode(
                    combined[pos:pos + 31], cl, bch.TBL_DA,
                    BCH_DA_SYN, BCH_DA_DATA)
                if errs < 0:
                    break
                fixederrs += fixed
                bch_stream += list(out)
                pos += 31
    return bch_stream, fixederrs


def crc_ccitt(data: bytes) -> int:
    crc = 0xFFFF
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def format_lcw_header(ft: int, lcw: Lcw) -> str:
    """ida_decode.c:405-539 — byte-format-compatible with bitsparser.py."""
    b = format(lcw.lcw3_val, "021b")

    def u(s):
        return int(s, 2) if s else 0

    if lcw.lcw_ft == 0:
        ty = "maint"
        if lcw.lcw_code == 0:
            code = (f"sync[status:{int(b[1])},dtoa:{u(b[3:13])},"
                    f"dfoa:{u(b[13:21])}]")
            remain = f"{b[0]}|{b[2]}"
        elif lcw.lcw_code == 1:
            code = f"switch[dtoa:{u(b[3:13])},dfoa:{u(b[13:21])}]"
            remain = b[:3]
        elif lcw.lcw_code == 3:
            code = (f"maint[2][lqi:{u(b[1:3])},power:{u(b[3:6])},"
                    f"f_dtoa:{u(b[6:13])},f_dfoa:{u(b[13:20])}]")
            remain = f"{b[0]}|{b[20]}"
        elif lcw.lcw_code == 6:
            code = "geoloc"
            remain = b
        elif lcw.lcw_code == 12:
            code = f"maint[1][lqi:{u(b[19:21])},power:{u(b[16:19])}]"
            remain = b[:16]
        elif lcw.lcw_code == 15:
            code = "<silent>"
            remain = b
        else:
            code = f"rsrvd({lcw.lcw_code})"
            remain = b
    elif lcw.lcw_ft == 1:
        ty = "acchl"
        if lcw.lcw_code == 1:
            code = (f"acchl[msg_type:{u(b[1:4]):01x},"
                    f"bloc_num:{int(b[4]):01x},"
                    f"sapi_code:{u(b[5:8]):01x},segm_list:{b[8:16]}]")
            remain = f"{b[0]},{u(b[16:21]):02x}"
        else:
            code = f"rsrvd({lcw.lcw_code})"
            remain = b
    elif lcw.lcw_ft == 2:
        ty = "hndof"
        if lcw.lcw_code == 3:
            cand = "P" if b[2] == "0" else "S"
            slot = 1 + int(b[6]) * 2 + int(b[7])
            code = (f"handoff_resp[cand:{cand},denied:{int(b[3])},"
                    f"ref:{int(b[4])},slot:{slot},sband_up:{u(b[8:13])},"
                    f"sband_dn:{u(b[13:18])},access:{u(b[18:21]) + 1}]")
            remain = f"{b[:2]},{b[5]}"
        elif lcw.lcw_code == 12:
            code = "handoff_cand"
            remain = f"{b[:11]},{b[11:21]}"
        elif lcw.lcw_code == 15:
            code = "<silent>"
            remain = b
        else:
            code = f"rsrvd({lcw.lcw_code})"
            remain = b
    else:
        ty = "rsrvd"
        code = f"<{lcw.lcw_code}>"
        remain = b

    raw = f"LCW({ft},T:{ty},C:{code},{remain})"
    return f"{raw:<110} "


@dataclasses.dataclass
class IdaBurst:
    timestamp_ns: int
    frequency: float
    direction: str
    magnitude: float
    noise: float
    level: float
    confidence: int
    n_symbols: int
    cont: int
    da_ctr: int
    da_len: int
    crc_ok: bool
    stored_crc: int
    computed_crc: int
    fixederrs: int
    payload: bytes
    bch_stream: list
    lcw: Lcw
    lcw_header: str


def ida_decode(frame: dict) -> IdaBurst | None:
    """ida_decode.c:543-664. frame: demod output dict (bits/llr/...)."""
    bits = np.asarray(frame["bits"], np.uint8)
    if len(bits) < 24 + 46 + 124:
        return None
    if frame.get("direction") not in ("DL", "UL"):
        return None
    data = bits[24:]
    llr = frame.get("llr")
    dllr = None if llr is None else np.asarray(llr)[24:]

    lcw = decode_lcw(data)
    if lcw is None or lcw.ft != 2:
        return None

    payload_data = data[46:]
    payload_llr = None if dllr is None else dllr[46:]
    if len(payload_data) < 124:
        return None

    stream, fixederrs = descramble_payload(payload_data, payload_llr)
    if len(stream) < 196:
        return None

    bs = stream
    cont = int(bs[3])
    da_ctr = (bs[5] << 2) | (bs[6] << 1) | bs[7]
    da_len = ((bs[11] << 4) | (bs[12] << 3) | (bs[13] << 2)
              | (bs[14] << 1) | bs[15])
    zero1 = (bs[17] << 2) | (bs[18] << 1) | bs[19]
    if zero1 != 0 or da_len > 20:
        return None

    payload = bytes(
        int("".join(str(int(b)) for b in bs[20 + i * 8:28 + i * 8]), 2)
        for i in range(20))

    crc_ok = False
    stored_crc = 0
    computed = 0
    if da_len > 0:
        stored_crc = bch.bits_to_uint(bs[180:196])
        # CRC input: bits 0-19, 12 zero bits, bits 20..len-4
        stream_bits = list(bs[:20]) + [0] * 12 + list(bs[20:len(bs) - 4])
        nbytes = (len(stream_bits) + 7) // 8
        buf = bytearray(nbytes)
        for i, bit in enumerate(stream_bits):
            if bit:
                buf[i // 8] |= 1 << (7 - (i % 8))
        computed = crc_ccitt(bytes(buf))
        crc_ok = computed == 0

    return IdaBurst(
        timestamp_ns=frame["timestamp_ns"],
        frequency=frame["frequency"],
        direction=frame["direction"],
        magnitude=frame["magnitude"],
        noise=frame["noise"],
        level=frame["level"],
        confidence=frame["confidence"],
        n_symbols=max(frame["n_symbols"] - 12, 0),
        cont=cont, da_ctr=da_ctr, da_len=da_len,
        crc_ok=crc_ok, stored_crc=stored_crc, computed_crc=computed,
        fixederrs=fixederrs,
        payload=payload[:da_len] if da_len > 0 else payload,
        bch_stream=bs, lcw=lcw,
        lcw_header=format_lcw_header(lcw.ft, lcw))


# ---- Multi-burst reassembly (ida_decode.c:667-748) ----

@dataclasses.dataclass
class _Slot:
    active: bool = False
    direction: str = "DL"
    frequency: float = 0.0
    last_timestamp: int = 0
    last_ctr: int = 0
    data: bytes = b""


class IdaReassembler:
    def __init__(self):
        self.slots = [_Slot() for _ in range(IDA_MAX_REASSEMBLY)]

    def push(self, burst: IdaBurst, cb):
        """cb(data: bytes, timestamp_ns, frequency, direction, magnitude)"""
        if not burst.crc_ok or burst.da_len == 0:
            return False
        for s in self.slots:
            if not s.active or s.direction != burst.direction:
                continue
            if abs(s.frequency - burst.frequency) > 260.0:
                continue
            if burst.timestamp_ns < s.last_timestamp:
                continue
            if burst.timestamp_ns - s.last_timestamp > 280_000_000:
                continue
            if (s.last_ctr + 1) % 8 != burst.da_ctr:
                continue
            if len(s.data) + burst.da_len <= 1024:
                s.data += burst.payload[:burst.da_len]
            s.last_timestamp = burst.timestamp_ns
            s.last_ctr = burst.da_ctr
            if not burst.cont:
                cb(s.data, burst.timestamp_ns, s.frequency,
                   s.direction, burst.magnitude)
                s.active = False
                return True
            return False

        if burst.da_ctr == 0 and not burst.cont:
            cb(burst.payload[:burst.da_len], burst.timestamp_ns,
               burst.frequency, burst.direction, burst.magnitude)
            return True

        if burst.da_ctr == 0 and burst.cont:
            idx = None
            oldest = None
            for i, s in enumerate(self.slots):
                if not s.active:
                    idx = i
                    break
                if oldest is None or s.last_timestamp < oldest:
                    oldest = s.last_timestamp
                    idx = i
            s = self.slots[idx]
            s.active = True
            s.direction = burst.direction
            s.frequency = burst.frequency
            s.last_timestamp = burst.timestamp_ns
            s.last_ctr = burst.da_ctr
            s.data = burst.payload[:burst.da_len]
            return False
        return False

    def flush(self, now_ns: int):
        for s in self.slots:
            if s.active and now_ns > s.last_timestamp + 280_000_000:
                s.active = False
