import math, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, pad_rows, LANES, tile, n_tiles = 2, 1557, 128, 512, 3
in_rows = tile + 21
out_len = n_tiles * tile

def kernel(k_ref, xr_hbm, ore_hbm, sr, obr, sems):
    b = pl.program_id(0); t = pl.program_id(1)
    k = k_ref[b]
    row0 = b * pad_rows + t * tile
    cp = pltpu.make_async_copy(xr_hbm.at[pl.ds(row0, in_rows), :], sr, sems.at[0])
    cp.start(); cp.wait()
    acc = jnp.zeros((tile, LANES), jnp.float32)
    for j in range(3):
        acc = acc + sr[j:j+tile, :] * k.astype(jnp.float32)
    obr[...] = jnp.sum(acc, axis=1).reshape(tile//128, 128)
    out_row0 = (b * out_len + t * tile) // 128
    co = pltpu.make_async_copy(obr, ore_hbm.at[pl.ds(out_row0, tile//128), :], sems.at[1])
    co.start(); co.wait()

call = pl.pallas_call(
    kernel, grid=(B, n_tiles),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_shape=[jax.ShapeDtypeStruct((B*out_len//128, 128), jnp.float32)],
    scratch_shapes=[pltpu.VMEM((in_rows, LANES), jnp.float32),
                    pltpu.VMEM((tile//128, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))])
x = jnp.ones((B*pad_rows, LANES), jnp.float32)
k = jnp.asarray(np.array([1, 2], np.int32))
o = jax.jit(lambda k, x: call(k, x))(k, x)
print("res", np.asarray(o[0])[:2, :3], np.asarray(o[0]).shape)
