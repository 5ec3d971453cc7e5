import numpy as np, jax, jax.numpy as jnp
from iridium_tpu.ops import pallas_fir, filters
taps = filters.lpf_taps(1.0, 10_000_000.0, 100_000.0, 50_000.0)
B, dec_cap, decim, F = 2, 1280, 40, 8192
l_ext = dec_cap*decim + 900
rd = pallas_fir.make_rotate_decimate(l_ext, dec_cap, decim, taps, F)
rng = np.random.default_rng(0)
x = rng.standard_normal((B, l_ext)).astype(np.float32)
y = rng.standard_normal((B, l_ext)).astype(np.float32)
k = jnp.asarray(np.array([137, -211], np.int32))
o = jax.jit(rd)(jnp.asarray(x), jnp.asarray(y), k)
got = np.asarray(o[0]) + 1j*np.asarray(o[1])
print("fetched", got.shape)
nm = (np.arange(l_ext, dtype=np.int64) % F).astype(np.int32)
kk = np.asarray(k)
m = np.mod(kk[:,None].astype(np.int64) * nm[None,:], F)
rot = (x + 1j*y) * np.exp(1j*(-2.0*np.pi/F) * m.astype(np.float64))
want = np.zeros((B, dec_cap), np.complex128)
padrot = np.pad(rot, ((0,0),(0, 801+dec_cap*decim)))
t64 = taps.astype(np.float64)
for i in range(dec_cap):
    want[:, i] = padrot[:, i*decim:i*decim+801] @ t64
err = np.max(np.abs(got - want)) / np.max(np.abs(want))
print("rel err", err)
