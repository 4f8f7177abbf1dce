"""Capability probe #2: building blocks for the VMEM ball-query kernel."""
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np


def try_case(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {out}", flush=True)
    except Exception as e:
        msg = str(e).strip().splitlines()
        print(f"{name}: FAIL: {msg[0][:240] if msg else type(e).__name__}", flush=True)


# a. 3D broadcast elementwise: (Mt,1,1) vs (1,nc,128)
def bcast3d():
    def k(q_ref, p_ref, o_ref):
        q = q_ref[0]  # (Mt, 1, 1)
        p = p_ref[:]  # (1, 16, 128)
        d = (q - p) ** 2
        o_ref[:] = d
    q = jnp.arange(64, dtype=jnp.float32).reshape(1, 64, 1, 1)
    p = jnp.ones((1, 16, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, p)
    return np.asarray(out)[5, 3, 7]  # (5-1)^2 = 16


try_case("bcast_3d", bcast3d)


# b. 3D scratch slice store + later full read
def scratch3d():
    def k(p_ref, o_ref, h_ref):
        def body(c, _):
            h_ref[:, pl.ds(c * 4, 4), :] = p_ref[:] * (c + 1.0)
            return 0
        lax.fori_loop(0, 4, body, 0)
        o_ref[:] = jnp.sum(h_ref[:], axis=1)
    p = jnp.ones((8, 4, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 16, 128), jnp.float32)],
    )(p)
    return np.asarray(out)[0, 0]  # 4*(1+2+3+4)=40


try_case("scratch_3d_slice_store", scratch3d)


# c. batched dot_general, unaligned middle dims, bf16 in / f32 out
def bdot_unaligned():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    a = jnp.ones((64, 64, 160), jnp.bfloat16)
    b = jnp.ones((64, 160, 128), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    return np.asarray(out)[0, 0, 0]  # 160


try_case("batched_dot_unaligned_bf16", bdot_unaligned)


# d. 3D reduce to 2D and 2D slice store of the result
def reduce3d_store():
    def k(p_ref, o_ref, cnt_ref):
        def body(c, _):
            cnt_ref[:, pl.ds(c * 4, 4)] = jnp.sum(p_ref[:], axis=2) * (c + 1.0)
            return 0
        lax.fori_loop(0, 4, body, 0)
        o_ref[:] = cnt_ref[:]
    p = jnp.ones((8, 4, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 16), jnp.float32)],
    )(p)
    return np.asarray(out)[0, :5]


try_case("reduce3d_and_2d_slice_store", reduce3d_store)


# e. one-hot build in 3D from 2D operands: oh(m,s,c) = (c_s(m,s) == c)
def onehot3d():
    def k(cs_ref, o_ref):
        cs = cs_ref[:]  # (8, 64)
        c_iota = lax.broadcasted_iota(jnp.int32, (8, 64, 160), 2)
        o_ref[:] = jnp.where(cs[:, :, None] == c_iota, 1.0, 0.0).astype(jnp.bfloat16)
    cs = jnp.tile(jnp.arange(64, dtype=jnp.int32)[None] % 160, (8, 1))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 64, 160), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cs)
    return np.asarray(out.astype(jnp.float32)).sum()  # 8*64 = 512


try_case("onehot_2d_to_3d", onehot3d)


# f. cumsum along lanes via jnp.cumsum (does Mosaic lower it?)
def cumsum_lane():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.cumsum(a_ref[:], axis=1)
    a = jnp.ones((8, 160), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 160), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    return np.asarray(out)[0, :4]


try_case("cumsum_lane_axis", cumsum_lane)


# g. take_along_axis FULL-SHAPE on lane axis (permutation gather)
def taa_full():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    t = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    i = jnp.flip(jnp.tile(jnp.arange(128, dtype=jnp.int32)[None], (8, 1)), axis=1)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)
    return np.asarray(out)[0, 0]  # 127


try_case("taa_fullshape_lane", taa_full)


# h. take_along_axis FULL-SHAPE on SUBLANE axis
def taa_full_sub():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
    t = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    i = jnp.full((64, 128), 3, jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)
    return np.asarray(out)[10, 0]  # 3*128 = 384


try_case("taa_fullshape_sublane", taa_full_sub)
