"""Multi-chip sharded pipeline tests on the virtual 8-device CPU mesh.

Oracle: the single-chip pipeline on the same capture. The sharded
multi-block driver must detect the same bursts and produce the same RAW
frames (timestamps, frequencies, bits); burst ids differ by the
documented per-shard offset+stride scheme, so parity is checked with
the `I:` id field masked — the same oracle class as the reference's
timestamp-stripped sorted-MD5 (test-configurations.sh:149-151)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from iridium_tpu.config import DetectorConfig
from iridium_tpu.dsp import detect
from iridium_tpu.io import synth
from iridium_tpu.output.raw import RawPrinter
from iridium_tpu.parallel.stream import ShardedPipeline
from iridium_tpu.runtime.pipeline import Pipeline


def tiny_cfg(**kw):
    # max_new_per_frame must not bind: it is a capacity knob (the
    # reference creates a burst for EVERY unmasked peak); when it binds
    # the single-chip budget is global while the sharded budget is
    # per-shard, which would diverge.
    # 2 MHz: the smallest rate at which the reference's FIXED 10 MHz
    # anti-alias design (burst_downmix.c:254-258) still passes the 35 kHz
    # signal (its effective cutoff scales with the actual input rate).
    cfg = dict(
        sample_rate=2_000_000, fft_size=512, history_size=8,
        frames_per_block=64, burst_capacity=64, gone_capacity=64,
        max_new_per_frame=32, max_burst_len=18_000, burst_post_len=4_000,
    )
    cfg.update(kw)
    return DetectorConfig(**cfg)


def make_burst_capture(payload_bits, start=12_000, freq=120_000.0,
                       n=None, seed=0):
    cap = synth.make_capture(
        payload_bits, sample_rate=2_000_000, freq_offset_hz=freq,
        burst_start_sample=start, total_samples=n, snr_db=35.0, seed=seed)
    return cap


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), ("shards",))


@pytest.mark.parametrize("mode", ["binshard", "replicated"])
def test_sharded_detect_matches_single_chip(mesh8, mode):
    cfg = tiny_cfg()
    p = cfg.derived()
    bits = np.random.default_rng(5).integers(0, 2, 200).astype(np.uint8)
    cap = make_burst_capture(bits, n=p.block_samples)

    # single-chip oracle
    det1 = jax.jit(detect.make_detect_block(p))
    s1 = detect.init_state(p)
    s1 = det1(jnp.asarray(cap), s1, jnp.int32(len(cap)))
    n1 = int(s1.g_count)
    single = sorted(
        (int(s1.g_start[i]), int(s1.g_stop[i]), int(s1.g_bin[i]),
         round(float(s1.g_mag[i]), 3), round(float(s1.g_noise[i]), 3))
        for i in range(n1))
    single_ids = sorted(int(s1.g_id[i]) for i in range(n1))

    # sharded detect step
    sp = ShardedPipeline(cfg, mesh=mesh8, burst_batch=2,
                         start_time_ns=0, detect_mode=mode)
    ctx = sp._dispatch_step(cap, len(cap))
    pk = sp._fetch_gone(ctx[2])
    sharded = []
    ids = []
    for sh in range(pk.shape[0]):
        for i in range(int(pk[sh, 0, 0])):
            r = pk[sh, 1 + i]
            sharded.append((int(r[1]), int(r[2]), int(r[3]),
                            round(float(r[4:5].view(np.float32)[0]), 3),
                            round(float(r[5:6].view(np.float32)[0]), 3)))
            ids.append(int(r[0]))
    assert n1 >= 1
    assert sorted(sharded) == single
    assert len(set(ids)) == len(ids)          # globally unique burst ids
    if mode == "replicated":
        # the replicated scan reproduces single-chip ids exactly
        assert sorted(ids) == single_ids


def _strip_id(line: str) -> str:
    return re.sub(r"I:\d{11}", "I:-----------", line)


@pytest.mark.parametrize("mode", ["binshard", "replicated"])
def test_sharded_multiblock_raw_parity(mesh8, mode):
    """4-block capture with bursts inside blocks AND straddling block
    boundaries: the sharded driver's RAW lines must equal the single-chip
    pipeline's (id field masked)."""
    cfg = tiny_cfg()
    p = cfg.derived()
    bs = p.block_samples
    rng = np.random.default_rng(7)
    total = 4 * bs
    cap = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
           ).astype(np.complex64) * np.float32(0.01 / np.sqrt(2))

    placements = [
        (12_000, 120_000.0, 1),          # block 0, after priming
        (bs - 6_000, -350_000.0, 2),     # straddles block 0/1 boundary
        (bs + 40_000, 480_000.0, 3),     # block 1
        (2 * bs + 5_000, -120_000.0, 4), # block 2, near boundary
        (3 * bs + 10_000, 240_000.0, 5), # block 3
    ]
    rate = 2_000_000
    for start, freq, seed in placements:
        bits = np.random.default_rng(seed).integers(0, 2, 160).astype(np.uint8)
        from scipy.signal import resample_poly
        bb = synth.modulate(synth.burst_symbols(bits, "DL"))
        x = resample_poly(bb, up=rate // 250_000, down=1).astype(np.complex64)
        ramp = (0.5 - 0.5 * np.cos(
            np.pi * np.arange(max(4 * rate // 25_000, 8))
            / max(4 * rate // 25_000, 8))).astype(np.float32)
        x[:len(ramp)] *= ramp
        x[-len(ramp):] *= ramp[::-1]
        n = np.arange(len(x), dtype=np.float64)
        x = (x * np.exp(2j * np.pi * freq / rate * n)).astype(np.complex64)
        # 35 dB over the 0.01 noise floor, like make_capture's scaling
        cap[start:start + len(x)] += np.float32(0.01 * 10 ** (35 / 20)) * x

    printer = RawPrinter("t1")
    t0 = 1_700_000_000_000_000_000

    pipe1 = Pipeline(det_cfg=cfg, burst_batch=4, start_time_ns=t0)
    single = sorted(_strip_id(printer.format(f))
                    for f in pipe1.run_array(cap))
    assert len(single) >= 4, "oracle pipeline missed synthetic bursts"

    sp = ShardedPipeline(cfg, mesh=mesh8, burst_batch=4,
                         start_time_ns=t0, detect_mode=mode)
    sharded = sorted(_strip_id(printer.format(f))
                     for f in sp.run_array(cap))
    assert sharded == single
    assert sp.stats.n_detected == pipe1.stats.n_detected
    assert sp.stats.n_ok == pipe1.stats.n_ok
    # round-5 group aggregation: 4 blocks at the default agg_blocks=4
    # -> ONE stacked result fetch for the whole capture
    assert sp.agg_blocks == 4
    assert sp.timing["n_blocks"] == 4
    assert sp.timing["n_groups"] == 1
    if mode == "replicated":
        # replicated scan: even the burst-ID field matches single-chip
        # (same scan, same inputs) — compare WITHOUT the id mask
        sp.reset(start_time_ns=t0)
        pipe1.reset(start_time_ns=t0)
        full_sh = sorted(printer.format(f) for f in sp.run_array(cap))
        full_1 = sorted(printer.format(f) for f in pipe1.run_array(cap))
        assert full_sh == full_1

    # agg=1 (the live-latency setting) must emit identical output with
    # per-block fetches
    sp1 = ShardedPipeline(cfg, mesh=mesh8, burst_batch=4,
                          start_time_ns=t0, agg_blocks=1,
                          detect_mode=mode)
    sharded1 = sorted(_strip_id(printer.format(f))
                      for f in sp1.run_array(cap))
    assert sharded1 == single
    assert sp1.timing["n_groups"] == 4


def test_dryrun_entrypoints():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jax.eval_shape(fn, *args)       # traces without running the full block
    ge.dryrun_multichip(8)
