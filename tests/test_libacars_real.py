"""Opt-in test against a REAL libacars-2 shared library (VERDICT r2
item 8): exercises the actual ctypes binding — symbol signatures,
la_vstring layout, JSON tree shape — rather than the mock used by
test_decode. Skips when the library is absent (it is not baked into
this image); runs automatically wherever libacars-2 is installed.

Reference behavior: sbd_acars.c:410-601 (libacars primary path)."""

import pytest

from iridium_tpu.decode import libacars as la_mod


def _build_acars_frame(mode, reg, label, blk_id, msg_text):
    """Raw ACARS frame bytes as found inside an SBD payload (after the
    0x01 SOH marker; parity bits clear): mode, registration(7),
    TAK, label(2), blk id, STX, text, ETX."""
    body = bytes([ord(mode)]) + reg.encode().ljust(7, b".")
    body += b"\x15"                       # NAK (no ack)
    body += label.encode()
    body += bytes([ord(blk_id)])
    body += b"\x02" + msg_text.encode() + b"\x03"
    return body


@pytest.mark.slow
def test_real_libacars_roundtrip():
    lib = la_mod.load()
    if lib is None:
        pytest.skip("libacars-2 shared library not installed")

    frame = _build_acars_frame("2", ".N12345", "H1", "1",
                               "#M1BPOS/TS123456,001122/")
    parsed = lib.parse(frame, ul=True)
    assert parsed is not None
    acars = parsed.acars
    assert acars.get("reg", "").lstrip(".") == "N12345"
    assert acars.get("label") == "H1"
    assert "msg_text" in acars or "media-adv" in acars \
        or "arinc622" in acars
    assert isinstance(parsed.text, str) and parsed.text
