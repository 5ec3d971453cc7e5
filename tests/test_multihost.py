"""REAL 2-process jax.distributed test on localhost CPU (4 virtual
devices per process, 8 global). Oracle: the single-process 8-device
sharded pipeline on the same capture — RAW lines and stats must match
exactly (the multi-host split changes process topology, not math).

Covers the paths no single-process test can execute:
distributed.initialize, process_allgather of the gone-table occupied
prefix and of the packed rows, and host-0-only emission.
(SURVEY.md §2.5 / VERDICT round-2 item 4.)"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _strip_id(line: str) -> str:
    return re.sub(r"I:\d{11}", "I:-----------", line)


@pytest.mark.slow
def test_two_process_raw_parity(tmp_path):
    from iridium_tpu.io import synth

    # capture with two bursts in different blocks (block = 64*512 samples)
    bs = 64 * 512
    rng = np.random.default_rng(3)
    total = 2 * bs
    cap = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
           ).astype(np.complex64) * np.float32(0.01 / np.sqrt(2))
    from scipy.signal import resample_poly
    rate = 2_000_000
    for start, freq, seed in ((12_000, 120_000.0, 1),
                              (bs + 9_000, -260_000.0, 2)):
        bits = np.random.default_rng(seed).integers(0, 2, 160) \
            .astype(np.uint8)
        bb = synth.modulate(synth.burst_symbols(bits, "DL"))
        x = resample_poly(bb, up=rate // 250_000, down=1) \
            .astype(np.complex64)
        nr = max(4 * rate // 25_000, 8)
        ramp = (0.5 - 0.5 * np.cos(np.pi * np.arange(nr) / nr)) \
            .astype(np.float32)
        x[:nr] *= ramp
        x[-nr:] *= ramp[::-1]
        n = np.arange(len(x), dtype=np.float64)
        x = (x * np.exp(2j * np.pi * freq / rate * n)) \
            .astype(np.complex64)
        cap[start:start + len(x)] += np.float32(0.01 * 10 ** (35 / 20)) * x
    cap_path = tmp_path / "cap.cf32"
    cap.tofile(cap_path)

    # oracle: single-process, 8 virtual devices (this test process)
    from jax.sharding import Mesh
    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.output.raw import RawPrinter
    from iridium_tpu.parallel.stream import ShardedPipeline
    cfg = DetectorConfig(
        sample_rate=2_000_000, fft_size=512, history_size=8,
        frames_per_block=64, burst_capacity=64, gone_capacity=64,
        max_new_per_frame=32, max_burst_len=18_000, burst_post_len=4_000,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    sp = ShardedPipeline(cfg, mesh=mesh, burst_batch=4,
                         start_time_ns=1_700_000_000_000_000_000)
    printer = RawPrinter("t1")
    want_lines = sorted(printer.format(f) for f in sp.run_array(cap))
    assert len(want_lines) >= 2, "oracle missed the synthetic bursts"

    # 2-process run
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out_path = tmp_path / "mh.out"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "mh_worker.py"),
         coord, str(pid), "2", str(cap_path), str(out_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err.decode(errors="replace")[-3000:]

    got = out_path.read_text().splitlines()
    stats_line = got[-1]
    got_lines = got[:-1]
    assert [_strip_id(x) for x in got_lines] \
        == [_strip_id(x) for x in want_lines]
    assert stats_line == (f"STATS detected={sp.stats.n_detected} "
                          f"ok={sp.stats.n_ok}")
