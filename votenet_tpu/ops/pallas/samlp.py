"""Fused SA-layer grouped-MLP + max-pool as one Pallas TPU kernel.

The set-abstraction layer's eval-time tail — per-slot affine (folded eval
BatchNorm + CenteredDense bias/center-correction), ReLU, the dense{1..L-1}
matmuls with their folded BN affines, and the max-pool over the ball — is
a chain whose every XLA stage round-trips the (B, M, S, w) grouped tensor
through HBM (dense1 in/out, dense2 in/out, pool in: ~940 MB at sa1 B=8 vs
a 1 MB pooled result). This kernel runs the whole chain per (batch row,
center tile) with the grouped tensor resident in VMEM: HBM sees the
gathered (B, M, S, w0) activations ONCE in and the (B, M, w_last) pooled
features out. This is the SURVEY §7 step 3(a) fusion target (reference
chain tf_grouping_g.cu:40-57 -> utils.py:125-146): the ball-query side is
:mod:`votenet_tpu.ops.pallas.ballquery`; this kernel owns the MLP/pool
side downstream of the gather.

Math folded into the kernel (exact algebra; see PointNetSAModule wiring):

- layer 0 (CenteredDense + eval BN + ReLU):
    relu(bn0(h0 - corr + b0)) == relu(h0 * s0 + sh0)
  with s0 = gamma0/sqrt(var0+eps) per channel and
  sh0[b, m, :] = (b0 - corr[b, m, :]) * s0 + (beta0 - mean0 * s0) computed
  OUTSIDE on the small (B, M, w0) center tensor;
- layer i >= 1 (Dense + eval BN + ReLU):
    relu(bn_i(x @ W_i + b_i)) == relu((x @ W_i) * s_i + t_i)
  with t_i = b_i * s_i + (beta_i - mean_i * s_i);
- max over the ball slots (utils.py:131-132). Underfull/empty-ball slot
  duplication (finalize_first_k) is max-invariant, so pooled outputs keep
  the reference's semantics exactly.

Matmuls run on the MXU in the requested precision ("f32" reproduces the
XLA chain's float32 dots; "bf16" casts the activations/weights to bf16
with f32 accumulation — the mixed-precision serving mode). Training keeps
the XLA path (train-mode BN needs whole-batch statistics, which a per-tile
kernel cannot see).

MEASURED OUTCOME (round 4, v5e): 0.91-0.96x — consistently SLOWER than the
XLA chain at every live SA shape (benchmarks/samlp_layer_ab.py per layer,
benchmarks/fused_decomp.py end-to-end: -1.1 ms of a 16.9 ms B=8 forward).
XLA pipelines the grouped chain's HBM streams against MXU work well enough
that removing the round trips does not pay for this kernel's serialized
per-tile grid. Default is therefore OFF (config.samlp); the kernel stays
as an equivalence-tested opt-in and the documented negative result.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# usable scoped VMEM headroom (see ballquery.py)
_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel_bytes(Mt: int, S: int, widths: Sequence[int]) -> int:
    """Peak-VMEM model: the h0 tile is resident; per matmul the in/out
    activation pair is live (f32 even in bf16 mode: the bf16 cast halves
    operand reads, not the liveness bound)."""
    h0 = Mt * S * widths[0] * 4
    pairs = max(
        Mt * S * (widths[i] + widths[i + 1]) * 4 for i in range(len(widths) - 1)
    ) if len(widths) > 1 else 0
    return h0 + pairs + Mt * widths[-1] * 4


def pick_tile(M: int, S: int, widths: Sequence[int]) -> int:
    mt = 256
    while mt > 8 and _kernel_bytes(mt, S, widths) > _VMEM_BUDGET:
        mt //= 2
    return max(8, min(mt, -(-M // 8) * 8))


def _samlp_kernel(n_layers: int, precision: str, *refs):
    # refs: h0, sh0, s0, (W_i, st_i) * (n_layers-1), out
    h0_ref, sh0_ref, s0_ref = refs[0], refs[1], refs[2]
    out_ref = refs[-1]
    x = h0_ref[0]  # (Mt, S, w0) f32
    x = jnp.maximum(x * s0_ref[:] + sh0_ref[0][:, None, :], 0.0)
    for i in range(n_layers - 1):
        w_ref, st_ref = refs[3 + 2 * i], refs[4 + 2 * i]
        w = w_ref[:]
        if precision == "bf16":
            x = x.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        y = lax.dot_general(
            x, w,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mt, S, w_{i+1}) f32 accumulation
        st = st_ref[:]  # (1, 1, 2, w): [scale, shift] stacked
        x = jnp.maximum(y * st[..., 0, :] + st[..., 1, :], 0.0)
    out_ref[0] = jnp.max(x, axis=1)  # (Mt, w_last)


def fused_sa_mlp_pool(
    h0: jnp.ndarray,
    sh0: jnp.ndarray,
    scale0: jnp.ndarray,
    layers: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    precision: str = "f32",
    interpret: bool = False,
) -> jnp.ndarray:
    """relu-affine chain + max-pool over ball slots, one Pallas kernel.

    Args:
      h0: (B, M, S, w0) gathered post-dense0 activations (no bias/center).
      sh0: (B, M, w0) layer-0 shift — ``(b0 - corr)*s0 + t0``.
      scale0: (w0,) layer-0 scale ``s0``.
      layers: per subsequent dense layer ``(W (w_in, w_out), scale (w_out,),
        shift (w_out,))`` with eval-BN and bias already folded into
        scale/shift.
      precision: "f32" | "bf16" matmul operand precision (f32 accumulate).
      interpret: run in Pallas interpret mode (CPU tests).

    Returns:
      (B, M, w_last) pooled features.
    """
    B, M, S, w0 = h0.shape
    widths = [w0] + [w.shape[1] for (w, _, _) in layers]
    n_layers = len(widths)
    Mt = pick_tile(M, S, widths)
    Mp = -(-M // Mt) * Mt
    if Mp != M:
        h0 = jnp.pad(h0, ((0, 0), (0, Mp - M), (0, 0), (0, 0)))
        sh0 = jnp.pad(sh0, ((0, 0), (0, Mp - M), (0, 0)))

    h0 = h0.astype(jnp.float32)
    sh0 = sh0.astype(jnp.float32)
    s0 = scale0.astype(jnp.float32).reshape(1, 1, w0)

    operands = [h0, sh0, s0]
    in_specs = [
        pl.BlockSpec(
            (1, Mt, S, w0), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, Mt, w0), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w0), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    for (w, s, t) in layers:
        w_in, w_out = w.shape
        st = jnp.stack(
            [s.astype(jnp.float32), t.astype(jnp.float32)], axis=0
        ).reshape(1, 1, 2, w_out)
        operands += [w.astype(jnp.float32), st]
        in_specs += [
            pl.BlockSpec((w_in, w_out), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 2, w_out), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]

    out = pl.pallas_call(
        functools.partial(_samlp_kernel, n_layers, precision),
        grid=(B, Mp // Mt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Mt, widths[-1]), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Mp, widths[-1]), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:, :M]


def samlp_supported(M: int, S: int, widths: Sequence[int]) -> bool:
    """True iff the chain fits VMEM at the minimum tile and the channel
    widths are lane-friendly (multiples of 8; the model's are 64-256)."""
    if len(widths) < 2:
        return False
    if any(w % 8 != 0 for w in widths):
        return False
    return _kernel_bytes(8, S, widths) <= _VMEM_BUDGET
