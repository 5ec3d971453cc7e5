"""CLI surface tests: flags, ZMQ fan-out, diagnostic mode, save-bursts."""

import io
import json
import os
import sys
import threading
import time

import numpy as np
import pytest

from iridium_tpu import cli
from iridium_tpu.io import synth


@pytest.fixture(scope="module")
def capture_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cap") / "one.cf32"
    bits = np.random.default_rng(3).integers(0, 2, 240).astype(np.uint8)
    cap = synth.make_capture(bits, sample_rate=10_000_000,
                             freq_offset_hz=150_000.0, snr_db=28.0)
    inter = np.empty(2 * len(cap), np.float32)
    inter[0::2], inter[1::2] = cap.real, cap.imag
    inter.tofile(str(path))
    return str(path)


def run_cli(args, capsys=None):
    out = io.StringIO()
    err = io.StringIO()
    so, se = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = out, err
    try:
        rc = cli.main(args)
    finally:
        sys.stdout, sys.stderr = so, se
    return rc, out.getvalue(), err.getvalue()


def test_cli_raw_output(capture_file):
    rc, out, err = run_cli(["-f", capture_file])
    assert rc == 0
    assert any(l.startswith("RAW:") for l in out.splitlines())
    assert "tagged" in err


def test_cli_zmq_fanout(capture_file):
    import zmq
    ctx = zmq.Context()
    sub = ctx.socket(zmq.SUB)
    port = sub.bind_to_random_port("tcp://127.0.0.1")
    sub.setsockopt_string(zmq.SUBSCRIBE, "")
    # CLI binds PUB; use connect-side sub via a PUB bound by CLI instead:
    sub.close()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt_string(zmq.SUBSCRIBE, "")
    sub.connect(f"tcp://127.0.0.1:{port}")
    got = []

    def listen():
        poller = zmq.Poller()
        poller.register(sub, zmq.POLLIN)
        end = time.time() + 90
        while time.time() < end:
            if poller.poll(500):
                got.append(sub.recv_string())
                if got:
                    return

    t = threading.Thread(target=listen, daemon=True)
    t.start()
    rc, out, err = run_cli(["-f", capture_file,
                            "--zmq", f"tcp://127.0.0.1:{port}"])
    t.join(timeout=5)
    assert rc == 0
    assert got and got[0].startswith("RAW:")


def test_cli_diagnostic_mode(capture_file):
    rc, out, err = run_cli(["--diagnostic", "-f", capture_file])
    assert rc == 0
    # RAW suppressed; guided display on stderr
    assert not any(l.startswith("RAW:") for l in out.splitlines())
    assert "Runtime:" in err and "Noise:" in err


def test_cli_save_bursts(capture_file, tmp_path):
    d = str(tmp_path / "bursts")
    rc, out, err = run_cli(["-f", capture_file, "--save-bursts", d])
    assert rc == 0
    files = os.listdir(d)
    cf32 = [f for f in files if f.endswith(".cf32")]
    meta = [f for f in files if f.endswith(".meta")]
    assert cf32 and meta
    body = open(os.path.join(d, meta[0])).read()
    assert "center_freq_hz" in body and "direction: DL" in body
    iq = np.fromfile(os.path.join(d, cf32[0]), np.complex64)
    assert len(iq) > 500
