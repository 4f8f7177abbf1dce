"""Row scatter-add as a Pallas TPU kernel.

The VJP of the flat row-gather (group_point/gather_point backward) is a
scatter-add of R gathered-row gradients into an (N, C) table. XLA's scatter
lowering measured 23.5 ms for the sa1-sized case on v5e (~3x the gather's
forward cost); this kernel keeps a 128-lane column group of the destination
table resident in VMEM and streams gradient rows through it, doing
dynamic-sublane read-modify-writes.

Correctness twin: ``jnp.zeros((N, C)).at[idx].add(grad)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROW_CHUNK = 2048


def _scatter_kernel(n_rows: int, g_ref, idx_ref, out_ref):
    """grid: (B, C_groups, R_chunks); out block = (1, N, 128) column group.

    idx block spans the whole batch dim (SMEM blocks must keep compliant
    trailing dims); each program reads its own batch row.
    """
    b = pl.program_id(0)
    chunk = pl.program_id(2)

    @pl.when(chunk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = g_ref.shape[1]
    base = chunk * rows

    def body(r, _):
        @pl.when(base + r < n_rows)
        def _():
            dst = idx_ref[b, r]
            out_ref[0, pl.ds(dst, 1), :] = (
                out_ref[0, pl.ds(dst, 1), :] + g_ref[0, pl.ds(r, 1), :]
            )
        return 0

    lax.fori_loop(0, rows, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def scatter_add_rows_pallas(
    grad: jnp.ndarray, idx: jnp.ndarray, n: int, interpret: bool = False
) -> jnp.ndarray:
    """(B, R, C) grads + (B, R) int32 row ids -> (B, n, C) summed table."""
    B, R, C = grad.shape
    Cp = -(-C // _LANES) * _LANES
    Rp = -(-R // _ROW_CHUNK) * _ROW_CHUNK
    g = jnp.pad(grad.astype(jnp.float32), ((0, 0), (0, Rp - R), (0, Cp - C)))
    ix = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, Rp - R)))

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, R),
        grid=(B, Cp // _LANES, Rp // _ROW_CHUNK),
        in_specs=[
            pl.BlockSpec(
                (1, _ROW_CHUNK, _LANES),
                lambda b, c, r: (b, r, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, _ROW_CHUNK), lambda b, c, r: (0, r), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, _LANES), lambda b, c, r: (b, 0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, Cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(g, ix)
    return out[:, :, :C]
