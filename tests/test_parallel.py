"""Multi-chip sharded pipeline tests on the virtual 8-device CPU mesh.

Oracle: the single-chip detector scan on the same capture. The sharded
detector must find the same bursts (same start/stop/bin/mag/noise; ids
differ by the documented per-shard offset+stride scheme)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from iridium_tpu.config import DetectorConfig
from iridium_tpu.dsp import detect
from iridium_tpu.io import synth
from iridium_tpu.parallel.stream import ShardedPipeline


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


def test_sharded_detect_matches_single_chip(mesh8):
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

    # sharded
    sp = ShardedPipeline(cfg, mesh=mesh8, burst_batch=2)
    st = sp.init_state()
    tail = jnp.zeros((sp.l_ext,), jnp.complex64)
    st, dm, dd = sp.step(jnp.asarray(cap), st, jnp.int32(len(cap)),
                         tail, jnp.int32(0))
    counts = np.asarray(st.g_count)
    sharded = []
    for sh in range(8):
        for i in range(int(counts[sh])):
            sharded.append((
                int(st.g_start[sh, i]), int(st.g_stop[sh, i]),
                int(st.g_bin[sh, i]),
                round(float(st.g_mag[sh, i]), 3),
                round(float(st.g_noise[sh, i]), 3)))
    assert n1 >= 1
    assert sorted(sharded) == single

    # burst ids globally unique
    ids = [int(st.g_id[sh, i]) for sh in range(8)
           for i in range(int(counts[sh]))]
    assert len(set(ids)) == len(ids)


def test_sharded_demod_bits(mesh8):
    cfg = tiny_cfg()
    p = cfg.derived()
    bits = np.random.default_rng(6).integers(0, 2, 200).astype(np.uint8)
    cap = make_burst_capture(bits, n=p.block_samples, seed=2)

    sp = ShardedPipeline(cfg, mesh=mesh8, burst_batch=6)
    st = sp.init_state()
    tail = jnp.zeros((sp.l_ext,), jnp.complex64)
    st, dm, dd = sp.step(jnp.asarray(cap), st, jnp.int32(len(cap)),
                         tail, jnp.int32(0))
    ok = np.asarray(dd.ok)
    assert ok.any(), "no burst demodulated in sharded step"
    expected = synth.expected_bits(bits, "DL")
    got_rows = np.asarray(dd.bits)[ok]
    match = any(
        np.array_equal(row[:len(expected)], expected) for row in got_rows)
    assert match, "demodulated bits differ from synthetic payload"


def test_dryrun_entrypoints():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jax.eval_shape(fn, *args)       # traces without running the full block
    ge.dryrun_multichip(8)
