import numpy as np, jax, jax.numpy as jnp, time
from iridium_tpu.ops import pallas_fir, filters
taps = filters.lpf_taps(1.0, 10_000_000.0, 100_000.0, 50_000.0)
B, l_ext, dec_cap, decim, F = 8, 262144, 6400, 40, 8192
rd = pallas_fir.make_rotate_decimate(l_ext, dec_cap, decim, taps, F)
rng = np.random.default_rng(0)
x = rng.standard_normal((B, l_ext)).astype(np.float32)
y = rng.standard_normal((B, l_ext)).astype(np.float32)
k = jnp.arange(B, dtype=jnp.int32) * 100 - 400
f = jax.jit(rd)
o = f(jnp.asarray(x), jnp.asarray(y), k)
jax.block_until_ready(o)
t0=time.perf_counter()
for _ in range(10):
    o = f(jnp.asarray(x), jnp.asarray(y), k)
jax.block_until_ready(o)
print("batched pallas ok", o[0].shape, (time.perf_counter()-t0)/10*1e3, "ms/call")
# correctness vs xla
nm = (np.arange(l_ext, dtype=np.int64) % F).astype(np.int32)
kk = np.asarray(k)
m = np.mod(kk[:,None].astype(np.int64) * nm[None,:], F)
ang = (-2.0*np.pi/F) * m.astype(np.float64)
rot = (x + 1j*y) * np.exp(1j*ang)
want = np.zeros((B, dec_cap), np.complex128)
t64 = taps.astype(np.float64)
padrot = np.pad(rot, ((0,0),(0, 801+dec_cap*decim)))
for i in range(dec_cap):
    want[:, i] = padrot[:, i*decim:i*decim+801] @ t64
got = np.asarray(o[0]) + 1j*np.asarray(o[1])
err = np.max(np.abs(got - want)) / np.max(np.abs(want))
print("rel err", err)
