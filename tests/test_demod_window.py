"""Parity: the static-window Gardner/PLL demod (production default) vs
the dynamic-gather reference formulation. Valid symbols must be
BIT-identical (same math, same clamping; only masked post-EOF symbols
may differ — they read zeros instead of clamped samples)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from iridium_tpu.dsp import demod as demod_mod  # noqa: E402


def _mk_signal(B, L, seed=0):
    rng = np.random.default_rng(seed)
    # noisy QPSK-ish signal at ~10 sps with timing/CFO jitter
    t = np.arange(L)
    sym = rng.integers(0, 4, L // 10 + 2)
    phases = np.pi / 4 + sym * np.pi / 2
    x = np.zeros((B, L), np.complex64)
    for b in range(B):
        idx = np.clip((t / 10.02 + rng.uniform(0, 1)).astype(int), 0,
                      len(phases) - 1)
        x[b] = (np.exp(1j * (phases[idx] + 0.002 * t))
                + 0.05 * (rng.standard_normal(L)
                          + 1j * rng.standard_normal(L))
                ).astype(np.complex64)
    return x


@pytest.mark.parametrize("n_frac", [1.0, 0.43])
def test_window_matches_gather(n_frac):
    S = 96
    sps = 10.0
    L = 1000
    B = 4
    x = _mk_signal(B, L)
    n = np.full(B, int(L * n_frac), np.int32)
    dirs = np.zeros(B, np.int32)

    outs = {}
    for mode in ("window", "gather"):
        d1 = demod_mod.make_demod(S, sps, True, gather_mode=mode)
        outs[mode] = jax.jit(jax.vmap(d1))(
            jnp.asarray(x), jnp.asarray(n), jnp.asarray(dirs))

    w, g = outs["window"], outs["gather"]
    assert np.array_equal(np.asarray(w.ok), np.asarray(g.ok))
    assert np.array_equal(np.asarray(w.n_symbols), np.asarray(g.n_symbols))
    assert np.array_equal(np.asarray(w.confidence),
                          np.asarray(g.confidence))
    np.testing.assert_array_equal(np.asarray(w.level), np.asarray(g.level))
    np.testing.assert_array_equal(np.asarray(w.total_phase),
                                  np.asarray(g.total_phase))
    # bits/llr: equal wherever the symbol is valid (masked regions are
    # zeroed identically in both)
    np.testing.assert_array_equal(np.asarray(w.bits), np.asarray(g.bits))
    np.testing.assert_array_equal(np.asarray(w.llr), np.asarray(g.llr))
