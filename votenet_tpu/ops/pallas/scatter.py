"""group_point backward (scatter-add) as a Pallas TPU kernel.

The XLA einsum formulation (:func:`votenet_tpu.ops.grouping.scatter_add_mxu`)
contracts an explicit one-hot of the destination indices against the update
values. XLA cannot fuse the one-hot producer into a dot operand, so every
scan chunk materializes a (B, chunk, N) one-hot to HBM and reads it back —
at the live SA backward shapes that round-trip dwarfs the update bytes
(benchmarks/scatter_bench.py: 24.8 ms exact / 13.9 ms bf16 across
sa2..proposal at B=8, nearly all of it one-hot traffic).

This kernel keeps the whole (N, C) accumulator resident in VMEM per batch
row, streams update chunks through the grid pipeline, and builds each
chunk's one-hot IN VMEM with a broadcasted-iota compare — the one-hot never
touches HBM. Exactness is a compile-time choice:

- ``passes=3`` (exact): the f32 updates are split hi/mid/lo into three bf16
  operands covering the full 24-bit mantissa (the same decomposition
  ``lax.Precision.HIGHEST`` performs); the one-hot is 0/1, bf16-exact, so
  every product is the exact f32 update value. Matches the reference's f32
  atomicAdd products (tf_grouping_g.cu:61-78) with a fixed, deterministic
  summation order.
- ``passes=1`` (fast): single bf16 pass, update values rounded before the
  multiply (~1e-3 relative on the gradient) — the ``fast_bf16`` mode.

(A round-1 ``ops/pallas/scatter.py`` was an unrelated RMW-loop design,
measured 2.5x slower than XLA scatter and deleted; this one replaces the
einsum's HBM traffic, not its MXU formulation.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _scatter_kernel(passes: int, idx_ref, g_ref, o_ref):
    """One grid step: o[n, c] += sum_k 1[idx_k == n] * g[k, c].

    idx_ref: (B, K_total) int32 destination rows — the WHOLE index array
             stays resident (a couple of MB); batch row and chunk are
             sliced here, because any (1, Kt) sub-block shape would violate
             the (8, 128) block-tiling rule.
    g_ref:   (1, Kt, C) float32 update values for this chunk.
    o_ref:   (1, N, C) float32 accumulator (same block across all chunks
             of a batch row; zeroed on the first chunk).
    """
    b = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    n_rows = o_ref.shape[1]
    kt = g_ref.shape[1]
    g = g_ref[0]  # (Kt, C)
    idxc = idx_ref[pl.ds(b, 1), pl.ds(pl.multiple_of(k * kt, _LANES), kt)]  # (1, Kt)
    # transposed one-hot built directly in (N, Kt) layout: rows = iota over
    # destinations, columns broadcast the chunk's indices — no relayout
    rows = lax.broadcasted_iota(jnp.int32, (n_rows, kt), 0)
    oht = (rows == idxc).astype(jnp.bfloat16)  # (N, Kt)

    if passes == 1:
        terms = (g.astype(jnp.bfloat16),)
    else:
        hi = g.astype(jnp.bfloat16)
        r1 = g - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        terms = (hi, mid, lo)

    acc = o_ref[0]
    for t in terms:
        acc = acc + jnp.dot(oht, t, preferred_element_type=jnp.float32)
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def scatter_add_pallas(
    g: jnp.ndarray,
    idx: jnp.ndarray,
    num_rows: int,
    passes: int = 3,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_{m,s} 1[idx==n]·g over the MXU with VMEM-resident one-hots.

    Args:
      g: (B, M, S, C) or (B, K, C) float32 update values.
      idx: (B, M, S) or (B, K) int32 destination rows in [0, num_rows).
      num_rows: N, the destination-axis size.
      passes: 3 = exact f32 products (hi/mid/lo bf16 split), 1 = bf16 fast.
      chunk: updates per grid step (padded up; zero-updates are no-ops).
      interpret: run in Pallas interpret mode (CPU testing).

    Returns:
      (B, num_rows, C) float32 accumulated gradient.
    """
    B = g.shape[0]
    C = g.shape[-1]
    gf = g.reshape(B, -1, C).astype(jnp.float32)
    idxf = idx.reshape(B, -1).astype(jnp.int32)
    K = gf.shape[1]

    kt = min(chunk, -(-K // _LANES) * _LANES)
    pad_k = (-K) % kt
    if pad_k:
        # zero updates scatter nothing (0/1-weighted zeros), idx pad = row 0
        gf = jnp.pad(gf, ((0, 0), (0, pad_k), (0, 0)))
        idxf = jnp.pad(idxf, ((0, 0), (0, pad_k)))
    n_pad = -(-num_rows // _LANES) * _LANES  # sublane dim of the (N, Kt) one-hot

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, passes),
        grid=(B, (K + pad_k) // kt),
        in_specs=[
            pl.BlockSpec(
                (B, K + pad_k), lambda b, k: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, kt, C), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, C), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(idxf, gf)
    return out[:, :num_rows]
