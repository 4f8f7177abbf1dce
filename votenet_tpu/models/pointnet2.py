"""PointNet++ set-abstraction / feature-propagation modules, TPU-native.

Rebuilds the reference layer library (``/root/reference/utils.py``) on top of
the fixed-shape ops in :mod:`votenet_tpu.ops`. The reference's 1x1
``Conv2D`` + tensorpack ``BNReLU`` stacks become Dense layers on the channel
axis (identical math; a 1x1 NHWC conv is a per-position matmul that XLA runs
on the MXU) with flax BatchNorm configured to tensorpack defaults
(momentum 0.9, eps 1e-5).

Reference mapping:
- :func:`sample_and_group`      <- utils.py:25-61 (incl. the ``sample_xyz``
  cross-cloud FPS used by the proposal module, utils.py:42-43)
- :func:`sample_and_group_all`  <- utils.py:64-90
- :class:`PointNetSAModule`     <- utils.py:93-158
- :class:`PointNetSAModuleMSG`  <- utils.py:161-201 (unused by the model,
  kept for API completeness — SURVEY §2 "known reference quirks")
- :class:`PointNetFPModule`     <- utils.py:266-294
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from votenet_tpu import ops

BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# tensorpack Conv2D/FullyConnected default to variance_scaling(2.0) (He)
# kernel init; flax's default is lecun_normal — match the reference.
KERNEL_INIT = nn.initializers.he_normal()


class CenteredDense(nn.Module):
    """Dense layer with the grouped-xyz center-subtract folded in.

    ``(g - pad(center)) @ W + b == g @ W - center @ W[:3] + b`` — moving the
    subtract after the matmul keeps the narrow (..., 3)-shaped centered
    tensor from ever materializing (a measured 1.7-2x win on the SA-layer
    gather+MLP chain, benchmarks/fused_sa_bench.py). The identity is exact
    real math but reassociates the float computation: outputs differ from
    the explicit centered path by matmul rounding (equivalence tests use
    rtol≈2e-2 at meter-scale inputs) — do not expect bitwise-equal evals
    between fused and non-fused checkpoints. Parameter names/shapes match
    ``nn.Dense`` exactly, so checkpoints are interchangeable.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        g_raw,
        center: jnp.ndarray,
        idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Without ``idx``: g_raw is the grouped (B, M, S, Cin) tensor.

        With ``idx`` (B, M, S): g_raw is the UNGROUPED per-point (B, N, Cin)
        tensor — the layer projects all N points first and gathers the wide
        (features,)-rows afterwards. ``gather ∘ dense == dense ∘ gather``
        (the dense is per-point linear), so the gather/dense commute is
        per-element identical — note the CenteredDense fold itself
        (either order) reassociates ``(g - pad(c)) @ W`` into
        ``g @ W - c @ W[:3]``, which is exact math up to float
        reassociation/matmul rounding, NOT bitwise equal to an explicit
        centered-then-matmul path. The gather meanwhile moves from
        Cin-float rows (12 bytes at sa1 — far
        below the HBM sector size) to `features`-float rows, and the matmul
        runs over N unique points instead of M*S grouped duplicates.

        Mixed precision: ``g_raw`` may instead be an ``(xyz_src, feat_src)``
        TUPLE (the split path, Config.mixed_precision). Coordinates travel
        f32 end-to-end — the kernel's first 3 rows contract against f32 xyz
        and the f32 center, and the cancellation-sensitive
        ``g_xyz@W3 - c@W3`` subtraction happens in f32 BEFORE any cast —
        while the wide feature operand runs in ``self.dtype`` (bf16):
        feature gathers/matmuls move half the HBM bytes, which is the
        binding resource (bench.py roofline: the model runs at the HBM
        bandwidth peak). The absolute-coordinate quantization that broke
        bf16-everywhere training (DESIGN.md bf16 post-mortem) cannot occur
        here by construction.
        """
        if isinstance(g_raw, tuple):
            return self._split_call(g_raw, center, idx)
        kernel = self.param(
            "kernel", KERNEL_INIT, (g_raw.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        g_raw, center, kernel, bias = nn.dtypes.promote_dtype(
            g_raw, center, kernel, bias, dtype=self.dtype
        )
        h = g_raw @ kernel
        if idx is not None:
            h = ops.group_point(h, idx)  # (B, M, S, features)
        corr = center @ kernel[:3]  # (B, M, features)
        return h - corr[:, :, None, :] + bias

    def _split_call(self, srcs, center, idx):
        """Mixed-precision path: f32 coordinates, self.dtype (bf16) features.

        srcs = (xyz_src, feat_src). With ``idx``: per-point (B, N, 3)/(B, N,
        Cf) sources, features projected before the gather. Without: already
        grouped (B, M, S, 3)/(B, M, S, Cf). Same parameters as the fused
        path (one (3+Cf, features) kernel), so checkpoints stay
        interchangeable across modes.
        """
        xyz_src, feat_src = srcs
        cin = 3 + feat_src.shape[-1]
        kernel = self.param("kernel", KERNEL_INIT, (cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        k_xyz = kernel[:3]  # f32
        k_feat = kernel[3:].astype(self.dtype)
        feat_src = feat_src.astype(self.dtype)
        if idx is not None:
            h_feat = ops.group_point(feat_src @ k_feat, idx)  # wide, bf16
            g_xyz = ops.group_point(xyz_src, idx)  # narrow, f32
        else:
            h_feat = feat_src @ k_feat
            g_xyz = xyz_src
        # exact f32 geometry: (g_xyz - c) @ W3, folded; cast only AFTER the
        # subtraction (the centered offsets are small-scale — bf16-safe)
        h_xyz = g_xyz @ k_xyz - (center @ k_xyz)[:, :, None, :]
        return h_xyz.astype(self.dtype) + h_feat + bias.astype(self.dtype)


class MLPStack(nn.Module):
    """Shared per-point MLP: Dense + BN + ReLU per width.

    ``final_activation=False`` leaves the last layer linear (the reference's
    mlp2 stacks end with ``activation=None``, utils.py:153). When ``center``
    is passed, the first layer is a :class:`CenteredDense` consuming the
    *uncentered* grouped tensor (same math as centering first, post-matmul).
    """

    widths: Sequence[int]
    final_activation: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(
        self,
        x,
        train: bool,
        center: Optional[jnp.ndarray] = None,
        idx: Optional[jnp.ndarray] = None,
    ):
        for i, w in enumerate(self.widths):
            last = i == len(self.widths) - 1
            if i == 0 and center is not None:
                x = CenteredDense(w, dtype=self.dtype, name="dense0")(x, center, idx)
            else:
                x = nn.Dense(
                    w, dtype=self.dtype, kernel_init=KERNEL_INIT, name=f"dense{i}"
                )(x)
            if self.final_activation or not last:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=self.bn_momentum,
                        epsilon=self.bn_eps,
                        dtype=self.dtype,
                        name=f"bn{i}",
                    )(x)
                x = nn.relu(x)
        return x


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: Optional[jnp.ndarray],
    knn: bool = False,
    use_xyz: bool = True,
    sample_xyz: Optional[jnp.ndarray] = None,
):
    """FPS -> gather -> ball query (or kNN) -> group -> center-subtract.

    Mirrors reference utils.py:25-61. When ``sample_xyz`` is given, FPS runs
    on that cloud while gathering from ``xyz`` (the proposal module samples
    votes at seed-FPS locations, utils.py:42-43).

    Returns (new_xyz (B,npoint,3), new_points (B,npoint,nsample,C'),
    idx (B,npoint,nsample), grouped_xyz).
    """
    fps_src = sample_xyz if sample_xyz is not None else xyz
    new_xyz = ops.gather_point(xyz, ops.farthest_point_sample(npoint, fps_src))
    if knn:
        _, idx = ops.knn_point(nsample, xyz, new_xyz)
    else:
        idx, _ = ops.query_ball_point(radius, nsample, xyz, new_xyz)
    if points is not None:
        # single fused gather of [xyz ‖ features] (gathers are the dominant
        # cost of the SA layer on TPU; one wide gather beats two)
        both = ops.group_point(jnp.concatenate([xyz, points], axis=-1), idx)
        grouped_xyz = both[..., :3] - new_xyz[:, :, None, :]
        grouped_points = both[..., 3:]
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        grouped_xyz = ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: jnp.ndarray, points: Optional[jnp.ndarray], use_xyz: bool = True):
    """Single group of all points centered at the origin (utils.py:64-90)."""
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), dtype=xyz.dtype)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, 1, N))
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        new_points = jnp.concatenate([xyz, points], axis=-1) if use_xyz else points
        new_points = new_points[:, None, :, :]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


class PointNetSAModule(nn.Module):
    """PointNet Set Abstraction (reference utils.py:93-158).

    group -> shared MLP -> pool -> optional post-MLP (last layer linear).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    mlp2: Optional[Sequence[int]] = None
    group_all: bool = False
    pooling: str = "max"
    knn: bool = False
    use_xyz: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM
    bn_eps: float = BN_EPS
    # mixed precision (Config.mixed_precision): gather/contract the wide
    # feature operand in self.dtype (bf16) while coordinates stay f32 —
    # see CenteredDense._split_call. Requires the fused path.
    split_coords: bool = False
    # coord_grad=False declares the xyz inputs non-differentiable (they are
    # stop_gradient'd): true for the backbone SA layers, whose coordinates
    # derive only from the param-free input cloud. The fused gather's
    # backward then scatters only the feature block — MXU-lane-aligned
    # widths (131->128, 259->256), measured 19.4 -> 10.4 ms across
    # sa2..sa4 at B=8. Must stay True for the proposal layer (its "xyz"
    # are votes, which carry gradient to the voting MLP).
    coord_grad: bool = True
    # Point-axis (SP) sharding: when set, the layer's O(N) grouping stage
    # (FPS, ball query, gathers) runs point-sharded over this mesh's
    # ``sp_axis`` via parallel/point_sharded.py — bit-identical results,
    # shard-local O(N/devices) working sets, collectives over ICI. The
    # MLP/pool (O(npoint), no N dependence) stay replicated over sp_axis.
    # ``sp_batch_axis`` additionally shards the batch (dp x sp). Only the
    # ball-query grouping modes are supported (no knn/group_all).
    sp_mesh: Optional[Mesh] = None
    sp_axis: str = "points"
    sp_batch_axis: Optional[str] = None

    def _mlp_stack(self, widths, name, final_activation=True):
        return MLPStack(
            widths, final_activation=final_activation, use_bn=self.use_bn,
            dtype=self.dtype, bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            name=name,
        )

    def _fused_eval_mlp_pool(self, both, new_xyz, idx):
        """Eval fast path: dense0 over the N unique points (project-before-
        gather), ONE gather, then the whole affine/BN/ReLU/dense/max-pool
        chain as a single Pallas kernel with the grouped tensor resident in
        VMEM (ops/pallas/samlp.py — the SURVEY §7 step 3(a) fusion). Returns
        the POOLED (B, M, w_last) features, or None when the kernel does not
        apply (training BN needs whole-batch statistics; init must create
        params; non-max pooling; bf16 module dtype uses the split path).

        Numerics: dense0/gather/corr are the exact same ops as the XLA
        chain; the in-kernel dense1+ matmuls run at the same f32 operand
        precision — outputs match the XLA chain to float-fusion rounding
        (~1e-6 relative, tested), not bitwise.
        """
        from votenet_tpu.ops.dispatch import (
            samlp_enabled,
            samlp_interpret,
            samlp_precision,
            use_pallas,
        )

        interpret = samlp_interpret()
        if (
            self.is_initializing()
            or not samlp_enabled()
            or not (use_pallas() or interpret)
            or self.pooling != "max"
            or not self.use_bn
            or self.dtype != jnp.float32
            or len(self.mlp) < 2
        ):
            return None
        from votenet_tpu.ops.pallas.samlp import fused_sa_mlp_pool, samlp_supported

        M, S = idx.shape[1], idx.shape[2]
        widths = list(self.mlp)
        if not samlp_supported(M, S, widths):
            return None
        params = self.get_variable("params", "mlp", None)
        stats = self.get_variable("batch_stats", "mlp", None)
        if params is None or stats is None:
            return None

        def bn_fold(i):
            # flax eval BatchNorm: (x - mean) * rsqrt(var + eps) * gamma
            # + beta — fold to per-channel scale/shift with its exact ops
            g = params[f"bn{i}"]["scale"].astype(jnp.float32)
            beta = params[f"bn{i}"]["bias"].astype(jnp.float32)
            mean = stats[f"bn{i}"]["mean"].astype(jnp.float32)
            var = stats[f"bn{i}"]["var"].astype(jnp.float32)
            s = lax.rsqrt(var + self.bn_eps) * g
            return s, beta - mean * s

        W0 = params["dense0"]["kernel"].astype(jnp.float32)
        b0 = params["dense0"]["bias"].astype(jnp.float32)
        h_all = both.astype(jnp.float32) @ W0  # (B, N, w0) unique points
        h0 = ops.group_point(h_all, idx)  # the ONE grouped-tensor gather
        corr = new_xyz.astype(jnp.float32) @ W0[:3]  # (B, M, w0)
        s0, t0 = bn_fold(0)
        sh0 = (b0 - corr) * s0 + t0  # (B, M, w0)
        layers = []
        for i in range(1, len(widths)):
            Wi = params[f"dense{i}"]["kernel"].astype(jnp.float32)
            bi = params[f"dense{i}"]["bias"].astype(jnp.float32)
            si, ti = bn_fold(i)
            layers.append((Wi, si, bi * si + ti))
        return fused_sa_mlp_pool(
            h0, sh0, s0, layers, precision=samlp_precision(), interpret=interpret
        )

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: Optional[jnp.ndarray],
        train: bool,
        sample_xyz: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        # Fused fast path: gather the *uncentered* [xyz ‖ feat] group and fold
        # the center-subtract into the first MLP matmul (CenteredDense). Only
        # the weighted_avg pooling needs the centered grouped_xyz explicitly.
        fused = (
            not self.group_all
            and self.use_xyz
            and self.pooling != "weighted_avg"
            and len(self.mlp) > 0
        )
        already_pooled = False  # True when the Pallas kernel pooled in VMEM
        if self.sp_mesh is not None:
            if self.group_all or self.knn:
                raise ValueError(
                    "sp_mesh supports ball-query grouping only (no knn/group_all)"
                )
            if self.split_coords:
                raise ValueError(
                    "sp_mesh + split_coords (mixed precision) is not wired; "
                    "run SP in f32 (mixed precision measured negative anyway, "
                    "DESIGN.md)"
                )
            from votenet_tpu.parallel.point_sharded import (
                farthest_point_sample_sharded,
                gather_point_sharded,
                group_point_sharded,
                query_ball_point_sharded,
                sample_and_group_sharded,
            )

            mesh, ax, bax = self.sp_mesh, self.sp_axis, self.sp_batch_axis
            if fused:
                fps_src = sample_xyz if sample_xyz is not None else xyz
                fps_idx = farthest_point_sample_sharded(
                    self.npoint, fps_src, mesh, ax, bax
                )
                new_xyz = gather_point_sharded(xyz, fps_idx, mesh, ax, bax)
                idx, _ = query_ball_point_sharded(
                    self.radius, self.nsample, xyz, new_xyz, mesh, ax, bax
                )
                gather_xyz = xyz if self.coord_grad else lax.stop_gradient(xyz)
                both = (
                    jnp.concatenate([gather_xyz, points], axis=-1)
                    if points is not None
                    else gather_xyz
                )
                # gather-first at train AND infer: project-before-gather
                # would run dense0 over the sharded N axis (cheap) but its
                # single-chip win rode the replicated gather's byte savings
                # — unmeasured on a real pod, so SP keeps the one exact
                # formulation. Forward numerics match the single-device
                # train path bit-for-bit (same gathers, same matmuls).
                g_raw = group_point_sharded(both, idx, mesh, ax, bax)
                new_points = self._mlp_stack(self.mlp, "mlp")(
                    g_raw, train, center=new_xyz
                )
                grouped_xyz = None
            else:
                new_xyz, new_points, idx, grouped_xyz = sample_and_group_sharded(
                    self.npoint, self.radius, self.nsample, xyz, points,
                    mesh, ax, use_xyz=self.use_xyz, batch_axis=bax,
                )
                new_points = self._mlp_stack(self.mlp, "mlp")(new_points, train)
        elif fused:
            fps_src = sample_xyz if sample_xyz is not None else xyz
            new_xyz = ops.gather_point(
                xyz, ops.farthest_point_sample(self.npoint, fps_src)
            )
            if self.knn:
                _, idx = ops.knn_point(self.nsample, xyz, new_xyz)
            else:
                idx, _ = ops.query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            gather_xyz = xyz if self.coord_grad else lax.stop_gradient(xyz)
            both = (
                jnp.concatenate([gather_xyz, points], axis=-1)
                if points is not None
                else gather_xyz
            )
            # Inference: project-before-gather — dense0 runs over the N
            # unique points and the gather moves after it (CenteredDense
            # docstring; +9.5% end-to-end, measured). Training keeps
            # gather-first: project-first's backward must scatter the wide
            # dense0 output gradient back to (B, N, w0) at EVERY SA layer —
            # including sa1, which otherwise has no backward scatter at all
            # (xyz carries no gradient) — measured 20% slower train step.
            # The gather/dense commute is per-element identical forward
            # (dense is per-point linear), so the train/infer switch does
            # not itself change numerics. (Both paths share the
            # CenteredDense fold, whose reassociation of the center
            # subtract is exact math but not bitwise vs an explicit
            # centered path — see CenteredDense docstring.)
            # (project-first at sa2+ only in training also measured ~96
            # scenes/s — the backward cost is not sa1-specific: the dW
            # chain serializes behind the dh scatter — so training is
            # gather-first at every layer)
            if self.split_coords and points is not None:
                # mixed precision: separate narrow-f32 xyz and wide-bf16
                # feature gathers (the fused wide gather would force one
                # common dtype — f32 coords with bf16 features need two)
                feat_src = points.astype(self.dtype)
                if train:
                    g = (ops.group_point(xyz, idx), ops.group_point(feat_src, idx))
                    new_points = self._mlp_stack(self.mlp, "mlp")(
                        g, train, center=new_xyz
                    )
                else:
                    new_points = self._mlp_stack(self.mlp, "mlp")(
                        (xyz, feat_src), train, center=new_xyz, idx=idx
                    )
            elif train:
                from votenet_tpu.ops.dispatch import gather_packing

                if (
                    gather_packing() == "bf16_hilo"
                    and points is not None
                    and not self.coord_grad
                ):
                    # Packed transport (opt-in, ops/dispatch.py): ONE bf16
                    # gather of [xyz_hi ‖ xyz_lo ‖ feat] — (6+C)*2 bytes/row
                    # vs (3+C)*4, halving the dominant sa2+ grouped-tensor
                    # HBM traffic — then f32 coordinate reconstruction
                    # (hi+lo, ~16 mantissa bits) feeding the same f32
                    # CenteredDense math via the split path. Backbone-only
                    # (coord_grad=False): the hi/lo channels are dead in
                    # backward (grad_skip_prefix=6 keeps the scatter at the
                    # MXU-aligned feature width) and the bf16 feature
                    # cotangent makes that scatter single-pass exact.
                    # the optimization barrier is LOAD-BEARING on TPU: XLA's
                    # bf16 propagation folds the f32->bf16->f32 round trip
                    # to identity, which would make lo all-zeros (silently
                    # degrading coords to plain bf16, ~0.4% instead of the
                    # hi+lo ~1e-4 m) — found via the round-5 emit-xyz
                    # prototype, where the same fold zeroed the split terms
                    hi = gather_xyz.astype(jnp.bfloat16)
                    lo = (
                        gather_xyz
                        - lax.optimization_barrier(hi).astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    table = jnp.concatenate(
                        [hi, lo, points.astype(jnp.bfloat16)], axis=-1
                    )
                    g = ops.group_point(table, idx, grad_skip_prefix=6)
                    g_xyz = g[..., :3].astype(jnp.float32) + g[
                        ..., 3:6
                    ].astype(jnp.float32)
                    new_points = self._mlp_stack(self.mlp, "mlp")(
                        (g_xyz, g[..., 6:]), train, center=new_xyz
                    )
                else:
                    g_raw = ops.group_point(
                        both,
                        idx,
                        grad_skip_prefix=0 if self.coord_grad else 3,
                    )
                    new_points = self._mlp_stack(self.mlp, "mlp")(
                        g_raw, train, center=new_xyz
                    )
            else:
                pooled = self._fused_eval_mlp_pool(both, new_xyz, idx)
                if pooled is not None:
                    new_points = pooled
                    already_pooled = True
                else:
                    new_points = self._mlp_stack(self.mlp, "mlp")(
                        both, train, center=new_xyz, idx=idx
                    )
            grouped_xyz = None  # never materialized on this path
        else:
            if self.group_all:
                new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                    xyz, points, self.use_xyz
                )
            else:
                new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                    self.npoint, self.radius, self.nsample, xyz, points,
                    self.knn, self.use_xyz, sample_xyz,
                )
            new_points = self._mlp_stack(self.mlp, "mlp")(new_points, train)

        if already_pooled:
            pass  # the fused kernel max-pooled over the ball slots in VMEM
        elif self.pooling == "max":
            new_points = jnp.max(new_points, axis=2)
        elif self.pooling == "avg":
            new_points = jnp.mean(new_points, axis=2)
        elif self.pooling == "weighted_avg":
            # exp(-5d) inverse-distance weights (utils.py:135-142)
            dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
            exp_dists = jnp.exp(-dists * 5)
            weights = exp_dists / jnp.sum(exp_dists, axis=2, keepdims=True)
            new_points = jnp.sum(new_points * weights, axis=2)
        elif self.pooling == "max_and_avg":
            new_points = jnp.concatenate(
                [jnp.mean(new_points, axis=2), jnp.max(new_points, axis=2)], axis=-1
            )
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")

        if self.mlp2 is not None:
            new_points = self._mlp_stack(
                self.mlp2, "mlp2", final_activation=False
            )(new_points, train)

        return new_xyz, new_points, idx


class PointNetSAModuleMSG(nn.Module):
    """Multi-scale-grouping SA module (reference utils.py:161-201).

    Present for API completeness; the VoteNet model never calls it (SURVEY
    §2 "known reference quirks").
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    use_xyz: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, xyz, points, train: bool):
        new_xyz = ops.gather_point(xyz, ops.farthest_point_sample(self.npoint, xyz))
        outs = []
        for i, (radius, nsample) in enumerate(zip(self.radius_list, self.nsample_list)):
            idx, _ = ops.query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = ops.group_point(points, idx)
                if self.use_xyz:
                    # note reversed concat order vs single-scale (utils.py:190)
                    grouped = jnp.concatenate([grouped, grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            grouped = MLPStack(
                self.mlp_list[i], use_bn=self.use_bn, dtype=self.dtype,
                bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                name=f"mlp_scale{i}",
            )(grouped, train)
            outs.append(jnp.max(grouped, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance upsampling + MLP
    (reference utils.py:266-294). Stays fully on device — the reference
    bounced to CPU here (its three_nn/three_interpolate are CPU-only ops).
    """

    mlp: Sequence[int]
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool):
        # three_nn + weights always run on f32 coordinates; under mixed
        # precision only the (wide) feature interpolation/concat runs in the
        # feature dtype — weights are O(1), bf16-safe
        dist, idx = ops.three_nn(xyz1, xyz2)
        dist = jnp.maximum(dist, 1e-10)  # squared dists (utils.py:279)
        inv = 1.0 / dist
        weight = inv / jnp.sum(inv, axis=2, keepdims=True)
        points2 = points2.astype(self.dtype)
        if points1 is not None:
            points1 = points1.astype(self.dtype)
        interpolated = ops.three_interpolate(points2, idx, weight.astype(self.dtype))
        if points1 is not None:
            new_points = jnp.concatenate([interpolated, points1], axis=2)
        else:
            new_points = interpolated
        return MLPStack(
            self.mlp, use_bn=self.use_bn, dtype=self.dtype,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps, name="mlp",
        )(new_points, train)
