#!/usr/bin/env python
"""Probe the host<->device link: dispatch latency, fetch latency vs size,
fetch bandwidth, and whether concurrent fetches pipeline or serialize.

The production pipeline's block rate is bounded by this link (device
compute is ~1 ms/block; see tools/microbench.py), so these numbers set
the dispatch/fetch budget per block.
"""

import concurrent.futures as cf
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    # fetch latency/bandwidth vs size (device->host)
    sizes = [1_536, 98_304, 786_432]
    mk = jax.jit(lambda x, n: jnp.zeros((n,), jnp.float32) + x,
                 static_argnums=1)
    for n in sizes:
        bufs = [mk(jnp.float32(i), n) for i in range(4)]
        jax.block_until_ready(bufs)
        t0 = time.perf_counter()
        for b in bufs:
            np.asarray(b)
        dt = (time.perf_counter() - t0) / len(bufs)
        mb = n * 4 / 1e6
        print(f"fetch {mb:8.2f} MB: {dt * 1e3:8.2f} ms "
              f"({mb / dt:7.1f} MB/s)", flush=True)

    # concurrent fetches: do 4 parallel fetches pipeline?
    n = 786_432
    bufs = [mk(jnp.float32(10 + i), n) for i in range(4)]
    jax.block_until_ready(bufs)
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(4) as ex:
        list(ex.map(lambda b: np.asarray(b), bufs))
    dt = time.perf_counter() - t0
    print(f"4x concurrent 3MB fetches: {dt * 1e3:.2f} ms total "
          f"(serial would be ~4x single)", flush=True)

    # dispatch latency (host side, async)
    f = jax.jit(lambda x: x + 1.0)
    x = mk(jnp.float32(0), 1024)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    ys = []
    for _ in range(20):
        ys.append(f(x))
    dt = (time.perf_counter() - t0) / 20
    jax.block_until_ready(ys)
    print(f"dispatch (async host cost): {dt * 1e3:.2f} ms", flush=True)

    # upload bandwidth (host->device)
    for n in (786_432,):
        arrs = [np.full((n,), i, np.float32) for i in range(3)]
        jax.block_until_ready(jnp.asarray(arrs[0]))
        t0 = time.perf_counter()
        for a in arrs:
            jax.block_until_ready(jnp.asarray(a))
        dt = (time.perf_counter() - t0) / len(arrs)
        mb = n * 4 / 1e6
        print(f"upload {mb:8.2f} MB: {dt * 1e3:8.2f} ms "
              f"({mb / dt:7.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
