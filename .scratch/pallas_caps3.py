"""Capability probe #3: remaining ball-query kernel building blocks."""
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


# a. minor-axis reduce of 3D to 2D (full array, f32)
def sum3d_minor():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.sum(a_ref[:], axis=2)
    a = jnp.ones((64, 160, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 160), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    return np.asarray(out)[0, 0]  # 128


try_case("sum3d_minor_axis", sum3d_minor)


# b. max along minor axis of 3D
def max3d_minor():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.max(a_ref[:], axis=2)
    a = jnp.arange(64 * 20 * 128, dtype=jnp.float32).reshape(64, 20, 128)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 20), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    return np.asarray(out)[0, 0]  # 127


try_case("max3d_minor_axis", max3d_minor)


# c. 3D @ 2D dot_general (no batch dims): (Mt,S,128) @ (128,128)
def dot_3d_2d():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    a = jnp.ones((64, 64, 128), jnp.bfloat16)
    b = jnp.ones((128, 128), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    return np.asarray(out)[0, 0, 0]  # 128


try_case("dot_3d_by_2d", dot_3d_2d)


# d. collapse-leading-dims reshape 3D -> 2D
def collapse3d():
    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].reshape(64 * 8, 128) * 2.0
    a = jnp.ones((64, 8, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    return np.asarray(out)[0, 0]


try_case("collapse_leading_dims", collapse3d)


# e. the full extraction dance on tiny shapes, vs numpy oracle
def mini_extraction():
    Mt, nc, C, S = 8, 4, 128, 8
    N = nc * C
    rng = np.random.RandomState(0)
    hit_np = (rng.rand(Mt, N) < 0.02)

    def k(hit_ref, tri_nc_ref, tri_c_ref, idx_ref, cnt_ref):
        hit3 = hit_ref[:]  # (Mt, nc, C) bf16
        counts = jnp.sum(hit3.astype(jnp.float32), axis=2)  # (Mt, nc)
        cum = lax.dot_general(
            counts.astype(jnp.bfloat16), tri_nc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # inclusive cumsum over chunks
        total = jnp.sum(counts, axis=1, keepdims=True)
        s_iota = lax.broadcasted_iota(jnp.float32, (1, S, 1), 1)
        mk = jnp.where(cum[:, None, :] <= s_iota, 1.0, 0.0)  # (Mt,S,nc)
        c_s = jnp.minimum(jnp.sum(mk, axis=2), nc - 1)  # (Mt,S)
        base_s = jnp.max(mk * cum[:, None, :], axis=2)  # (Mt,S)
        c_iota = lax.broadcasted_iota(jnp.float32, (Mt, S, nc), 2)
        oh = jnp.where(c_iota == c_s[:, :, None], 1.0, 0.0).astype(jnp.bfloat16)
        sel = lax.dot_general(
            oh, hit3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (Mt,S,C)
        t_s = s_iota[0] + 1.0 - base_s[:, :, None]  # (Mt,S,1)
        lr = lax.dot_general(
            sel, tri_c_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mt,S,C) inclusive in-chunk rank
        is_t = jnp.where((lr == t_s) & (sel > 0), 1.0, 0.0)
        lane_iota = lax.broadcasted_iota(jnp.float32, (Mt, S, C), 2)
        lane = jnp.sum(is_t * lane_iota, axis=2)  # (Mt,S)
        idx_ref[:] = (c_s * C + lane).astype(jnp.int32)
        cnt_ref[:] = jnp.minimum(total, S).astype(jnp.int32)

    hit3 = jnp.asarray(hit_np.reshape(Mt, nc, C), jnp.bfloat16)
    tri_nc = jnp.asarray(np.tril(np.ones((nc, nc))).T, jnp.bfloat16)  # inclusive
    tri_c = jnp.asarray(np.tril(np.ones((C, C))).T, jnp.bfloat16)
    idx, cnt = pl.pallas_call(
        k,
        out_shape=(
            jax.ShapeDtypeStruct((Mt, S), jnp.int32),
            jax.ShapeDtypeStruct((Mt, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(hit3, tri_nc, tri_c)
    idx, cnt = np.asarray(idx), np.asarray(cnt)

    # numpy oracle: first S set bits in order
    ok = True
    for m in range(Mt):
        hits = np.nonzero(hit_np[m])[0]
        k_take = min(len(hits), S)
        if cnt[m, 0] != k_take:
            ok = False
        if not np.array_equal(idx[m, :k_take], hits[:k_take]):
            ok = False
    return f"match={ok} cnt0={cnt[0,0]}"


try_case("mini_extraction_vs_oracle", mini_extraction)
