"""Capability probe: what does Mosaic support on this jax version?

1. batched dot_general (3D) inside a kernel
2. jnp.take_along_axis along sublane axis (2D/3D)
3. jnp.take (dynamic gather) of rows from a 2D VMEM array
4. 3D arrays + elementwise in kernel
"""
import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

results = {}


def try_case(name, fn):
    try:
        out = fn()
        results[name] = ("OK", out)
        print(f"{name}: OK")
    except Exception as e:
        results[name] = ("FAIL", str(e).split("\n")[0][:300])
        print(f"{name}: FAIL: {str(e).splitlines()[0][:300]}")


# 1. batched dot_general
def batched_dot():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    a = jnp.ones((8, 64, 128), jnp.float32)
    b = jnp.ones((8, 128, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    return np.asarray(out[0, 0, :2])


try_case("batched_dot_general", batched_dot)


# 2. take rows from 2D table by flat index vector (dynamic gather on sublanes)
def take_rows():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:].reshape(-1), axis=0)
    t = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    i = jnp.array([[5, 17, 3, 400] * 32], jnp.int32).reshape(128, 1)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)
    return np.asarray(out[:2, 0])


try_case("take_rows_2d", take_rows)


# 2b. take_along_axis on sublane axis of 2D
def taa_sublane():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
    t = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    i = jnp.ones((64, 128), jnp.int32) * 3
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)
    return np.asarray(out[0, :2])


try_case("take_along_axis_sublane_2d", taa_sublane)


# 2c. take_along_axis along LANE axis of 2D (per-row lane gather)
def taa_lane():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    t = jnp.arange(128 * 512, dtype=jnp.float32).reshape(128, 512)
    i = (jnp.arange(128, dtype=jnp.int32)[:, None] % 7) * jnp.ones((1, 128), jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)
    return np.asarray(out[:2, 0])


try_case("take_along_axis_lane_2d", taa_lane)


# 3. 3D elementwise + reduce
def elem3d():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.sum(a_ref[:] * 2.0, axis=1)
    a = jnp.ones((16, 32, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    return np.asarray(out[0, :2])


try_case("elementwise_3d_reduce", elem3d)


# 4. reshape (M, N) -> (M, nc, C) inside kernel
def reshape3d():
    def k(a_ref, o_ref):
        h = a_ref[:].reshape(64, 4, 128)
        o_ref[:] = jnp.sum(h, axis=2)
    a = jnp.ones((64, 512), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    return np.asarray(out[0])


try_case("reshape_2d_to_3d", reshape3d)

print("\nsummary:")
for k, v in results.items():
    print(f"  {k}: {v[0]}")
