#!/usr/bin/env python
"""Experiments: window-gather and cubic-interp formulations on TPU.

Times (chained, real dispatches):
  1. vmap(dynamic_slice) window gather        (current production)
  2. lax.map dynamic_slice gather
  3. aligned tile-row gather via jnp.take     (starts 640-aligned)
  4. demod scan with dynamic_slice cubic4     (current)
  5. demod scan with take_along_axis cubic4
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain(step, x0, reps=5):
    import jax
    x = step(x0)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    print(f"devices: {jax.devices()}", flush=True)

    B, L = 128, 297216
    M = 38_000_000
    TILE = 640
    rng = np.random.default_rng(0)
    starts_np = rng.integers(0, M - L - TILE, B).astype(np.int32)
    stream = jax.jit(lambda: jnp.zeros((M,), jnp.float32) + 1.0)()
    jax.block_until_ready(stream)

    # 1. vmap(dynamic_slice)
    @jax.jit
    def g1(st):
        xs = jax.vmap(lambda s: jax.lax.dynamic_slice(
            stream, (s,), (L,)))(st)
        return st + (xs[0, 0] * 0).astype(jnp.int32), jnp.sum(xs)

    t = chain(lambda x: g1(x[0]), (jnp.asarray(starts_np), None))
    print(f"vmap dynamic_slice:   {t*1e3:8.2f} ms", flush=True)

    # 2. lax.map dynamic_slice
    @jax.jit
    def g2(st):
        xs = jax.lax.map(lambda s: jax.lax.dynamic_slice(
            stream, (s,), (L,)), st)
        return st + (xs[0, 0] * 0).astype(jnp.int32), jnp.sum(xs)

    t = chain(lambda x: g2(x[0]), (jnp.asarray(starts_np), None))
    print(f"lax.map dynamic_slice:{t*1e3:8.2f} ms", flush=True)

    # 3. aligned tile gather: starts multiple of TILE
    st_al_np = (starts_np // TILE).astype(np.int32)
    n_tiles = L // TILE + 1
    tiles_shape_m = M // TILE

    @jax.jit
    def g3(tidx):
        tl = stream[: tiles_shape_m * TILE].reshape(tiles_shape_m, TILE)
        idx = tidx[:, None] + np.arange(n_tiles, dtype=np.int32)[None, :]
        xs = jnp.take(tl, idx, axis=0)          # (B, n_tiles, TILE)
        xs = xs.reshape(B, n_tiles * TILE)
        return tidx + (xs[0, 0] * 0).astype(jnp.int32), jnp.sum(xs)

    t = chain(lambda x: g3(x[0]), (jnp.asarray(st_al_np), None))
    print(f"aligned tile take:    {t*1e3:8.2f} ms", flush=True)

    # 4/5. cubic4 variants inside a 59-iter scan (S=471 unroll 8)
    S = 471
    Lf = 4440
    x_d = jax.jit(lambda: jnp.zeros((B, Lf), jnp.float32) + 0.5)()
    jax.block_until_ready(x_d)
    iota_b = np.arange(B, dtype=np.int32)

    def mk_demod(use_take):
        def body(carry, t):
            pos = carry
            idx = jnp.clip(pos.astype(jnp.int32), 1, Lf - 3)
            if use_take:
                ii = idx[:, None] + np.arange(-1, 3, dtype=np.int32)[None]
                w = jnp.take_along_axis(x_d, ii, axis=1)
            else:
                w = jax.vmap(lambda xx, i: jax.lax.dynamic_slice(
                    xx, (i - 1,), (4,)))(x_d, idx)
            mu = pos - idx.astype(jnp.float32)
            val = (w[:, 0] * 0.5 + w[:, 1] * mu + w[:, 2] * mu * mu
                   + w[:, 3])
            pos2 = pos + 9.9 + val * 1e-9
            return pos2, val

        @jax.jit
        def run(p0):
            pf, vals = jax.lax.scan(body, p0, np.arange(S, dtype=np.int32),
                                    unroll=8)
            return pf, jnp.sum(vals)
        return run

    p0 = jnp.asarray(np.zeros(B, np.float32))
    for name, use_take in (("scan cubic ds  ", False),
                           ("scan cubic take", True)):
        run = mk_demod(use_take)

        def step(x, run=run):
            pf, sv = run(x[0])
            return (pf * 0 + sv * 1e-12, None)
        t = chain(step, (p0, None))
        print(f"{name}:      {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
