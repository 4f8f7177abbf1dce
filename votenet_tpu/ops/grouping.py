"""Ball-query grouping, feature gather, kNN and partial selection.

TPU-native rebuild of the reference CUDA package ``tf_ops/grouping``
(`tf_grouping.py`, `tf_grouping_g.cu`), recast as fixed-shape masked ops.

Parity-critical semantics of ``query_ball_point`` (tf_grouping_g.cu:13-35):

- a dataset point k is a hit iff ``max(dist, 1e-20) < radius`` with *strict*
  comparison on euclidean distance (equivalent to ``dist2 < radius**2`` for
  any radius > 1e-20);
- the output takes the FIRST ``nsample`` hits in dataset index order;
- slots past the last hit are filled with the FIRST hit's index (the CUDA
  kernel pre-fills all slots on the first hit, tf_grouping_g.cu:26-29);
- ``pts_cnt`` counts hits but saturates at ``nsample`` (the scan breaks).

If a query ball is empty the reference leaves the row uninitialized (never
happens in the model: every query point is a member of the dataset cloud, so
it always hits itself). We define the empty case as index 0.

RADIUS-BOUNDARY PRECISION (the ONE authoritative statement; docstrings
elsewhere defer here). The mode is ``ops.dispatch.bq_precision()``:

- "exact" (the default): :func:`query_ball_point_dense` computes squared
  distances with the same difference-square form as the oracle
  (:func:`~votenet_tpu.ops.common.pairwise_sqdist`), so the hit mask —
  and therefore indices and counts — is BIT-IDENTICAL to the reference
  semantics by construction; verified on v5e at every live model shape on
  clustered clouds (benchmarks/tpu_kernel_checks.py). Cost ~+2.5 ms at
  sa1 vs the fast mode. (A ``Precision.HIGHEST`` matmul-expansion variant
  measured the same speed but still flips slots through its few-ulp
  reassociation band at the larger radii — rejected.)
- "fast_bf16": the MXU matmul expansion ``|a|^2+|b|^2-2ab`` at default
  TPU precision, which rounds the COORDINATE OPERANDS to bf16 (~0.4%
  relative — a centimeter-scale boundary band at room scale): measured
  35% of selected sa1 indices and 1% of counts flip vs the oracle on
  clustered clouds. Rounds 1-3 trained fine with it (held-out mAP 0.70,
  DESIGN.md — ball membership at the boundary is detection-neutral in
  practice), so it stays available as an opt-in speed mode, but it is
  NOT reference parity.

:func:`query_ball_point_topk` (the oracle) uses the exact difference form
unconditionally and is reference-identical bit-for-bit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from votenet_tpu.ops import common
from votenet_tpu.ops.common import pairwise_sqdist, pairwise_sqdist_mm


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point_topk(radius: float, nsample: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Reference XLA formulation via top_k over index keys.

    Simple and exact, but lax.top_k over the full N axis lowers to a sort on
    TPU (~hundreds of ms at SUN RGB-D sizes); kept as the readable oracle.
    Use :func:`query_ball_point` (hierarchical) in the model path.
    """
    d2 = pairwise_sqdist(xyz2.astype(jnp.float32), xyz1.astype(jnp.float32))
    N = xyz1.shape[1]
    hit = d2 < jnp.float32(radius) ** 2  # (B, M, N), strict
    # first-`nsample`-hits-in-index-order via top_k over negated index keys:
    # hits keep their index, misses get sentinel N; the nsample smallest keys
    # are the first nsample hits (ascending), padded with the sentinel.
    iota = lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    key = jnp.where(hit, iota, N)
    neg_sorted, _ = lax.top_k(-key, nsample)  # descending -key == ascending key
    idx_sorted = -neg_sorted  # (B, M, nsample), sentinel-padded
    first_hit = idx_sorted[..., :1]
    idx = jnp.where(idx_sorted >= N, first_hit, idx_sorted)
    idx = jnp.where(idx >= N, 0, idx)  # fully-empty ball -> 0 (see docstring)
    pts_cnt = jnp.minimum(jnp.sum(hit, axis=-1), nsample).astype(jnp.int32)
    return lax.stop_gradient(idx), lax.stop_gradient(pts_cnt)


_BQ_CHUNK = 128  # lane-width chunks for the hierarchical search

# HBM-footprint budget for the dense path's (B, M, N) intermediates; above
# it the query streams in blocks. Byte-based (not N-based) so small batches
# keep the ~9x-faster dense path at large point counts — see ops/common.py.
DENSE_BYTES_BUDGET = common.DENSE_BYTES_BUDGET


def query_ball_point(radius: float, nsample: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Fixed-radius neighborhood query (backend/size-dispatched).

    Routes to :func:`query_ball_point_streaming` when the dense (B, M, N)
    intermediates exceed ``DENSE_BYTES_BUDGET``, else the dense hierarchical
    query. Identical semantics either way (exact-equality tested).
    """
    B, N = xyz1.shape[0], xyz1.shape[1]
    M = xyz2.shape[1]
    if _pallas_bq_route(N, M, nsample):
        # the Pallas kernel has NO (B, M, N) HBM intermediates (the hit
        # mask lives in VMEM), so the dense-bytes budget doesn't apply
        from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas

        return query_ball_point_pallas(radius, nsample, xyz1, xyz2)
    if common.bq_dense_bytes(B, M, N) > DENSE_BYTES_BUDGET:
        return query_ball_point_streaming(radius, nsample, xyz1, xyz2)
    return query_ball_point_dense(radius, nsample, xyz1, xyz2)


def _pallas_bq_route(N: int, M: int, nsample: int) -> bool:
    """True iff the ball query should run as the Pallas VMEM kernel: Pallas
    enabled on TPU, exact mode (the kernel computes the exact difference-form
    hit test; "fast_bf16" keeps the XLA mm-expansion twin), and the kernel's
    VMEM state fits these shapes."""
    from votenet_tpu.ops.dispatch import bq_precision, use_pallas

    if not use_pallas() or bq_precision() != "exact":
        return False
    from votenet_tpu.ops.pallas.ballquery import pallas_bq_supported

    return pallas_bq_supported(N, M, nsample)


def query_ball_point_dense(radius: float, nsample: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Fixed-radius neighborhood query (hierarchical, TPU-fast).

    Thin wrapper that reads ``ops.dispatch`` state per call (so flipping the
    mode is never masked by a stale jit cache): on TPU in "exact" mode this
    routes to the Pallas VMEM kernel (bit-identical, no (B, M, N) HBM
    intermediates — ops/pallas/ballquery.py); otherwise the XLA twin
    :func:`_query_ball_point_dense` with the mode as a static argument.
    """
    from votenet_tpu.ops.dispatch import bq_precision

    if _pallas_bq_route(xyz1.shape[1], xyz2.shape[1], nsample):
        from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas

        return query_ball_point_pallas(radius, nsample, xyz1, xyz2)
    return _query_ball_point_dense(radius, nsample, bq_precision(), xyz1, xyz2)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _query_ball_point_dense(
    radius: float, nsample: int, mode: str, xyz1: jnp.ndarray, xyz2: jnp.ndarray
):
    """Fixed-radius neighborhood query (hierarchical, TPU-fast).

    Args:
      radius: ball radius (static).
      nsample: max points per ball (static).
      mode: "exact" | "fast_bf16" distance precision (static; see module
        docstring — "exact" is reference-identical on TPU).
      xyz1: (B, N, 3) dataset points.
      xyz2: (B, M, 3) query points.

    Returns:
      idx: (B, M, nsample) int32 indices into N.
      pts_cnt: (B, M) int32 number of hits (saturated at nsample).

    Algorithm: "first nsample set bits" extracted with a two-level search
    instead of a top_k/sort over N. Split N into chunks of 128 lanes;
    per-chunk hit counts + exclusive cumsum locate, for every output slot s,
    the chunk containing the (s+1)-th hit; a gather of just those chunks'
    masks plus an in-chunk rank match yields the lane. O(M*N) for the mask +
    O(M*nsample*128) for the search — no sort anywhere. Selection semantics
    (index order, fill-with-first-hit, saturated counts) match the CUDA
    scan (tf_grouping_g.cu:13-35) exactly; the radius test's precision
    follows ``mode`` (module docstring).
    """
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    C = _BQ_CHUNK
    n_chunks = -(-N // C)
    Np = n_chunks * C

    # All integer-valued intermediates are carried in bf16 so the heavy
    # reductions run as MXU matmuls at full rate (every value here — hit
    # flags, per-chunk counts <= 128, chunk ids <= 160, ranks <= 128 — is an
    # integer <= 256, exactly representable in bf16); the earlier int/bool
    # formulation hit pathological S8 layouts on TPU.
    bf16 = jnp.bfloat16
    if mode == "exact":
        # the same difference-square form as the oracle — the hit mask is
        # bit-identical BY CONSTRUCTION (HIGHEST-precision mm was measured
        # near-exact but still flips slots through the few-ulp
        # reassociation band at the larger radii; the difference form costs
        # the same and removes the band entirely)
        d2 = pairwise_sqdist(xyz2, xyz1)
    else:
        d2 = pairwise_sqdist_mm(xyz2, xyz1)  # (B, M, N)
    hit = (d2 < jnp.float32(radius) ** 2).astype(bf16)
    if Np != N:
        hit = jnp.pad(hit, ((0, 0), (0, 0), (0, Np - N)))
    hit_c = hit.reshape(B, M, n_chunks, C)

    # per-chunk hit counts as a matmul against the block-segment matrix
    seg = jnp.repeat(jnp.eye(n_chunks, dtype=bf16), C, axis=0)  # (Np, nc)
    cnt_chunk = jnp.einsum(
        "bmn,nc->bmc", hit, seg, preferred_element_type=jnp.float32
    )  # (B, M, nc), exact ints
    cum = jnp.cumsum(cnt_chunk, axis=-1)  # inclusive
    base = cum - cnt_chunk  # exclusive
    total = cum[..., -1]  # (B, M)

    # chunk containing the (s+1)-th hit: #chunks whose cumulative count <= s
    s_iota = jnp.arange(nsample, dtype=jnp.float32)
    c_s = jnp.sum(cum[..., None, :] <= s_iota[:, None], axis=-1)  # (B, M, ns)
    c_s = jnp.minimum(c_s, n_chunks - 1).astype(jnp.int32)

    # one-hot over chunks drives batched-matmul "gathers" on the MXU.
    # Every (B, M, ns, C)-shaped extraction intermediate below is carried in
    # bf16 — all values are small exact integers (hit flags 0/1, in-chunk
    # ranks <= C=128, selected-chunk bases <= nsample-1 <= 63 because the
    # chunk holding the (s+1)-th hit has exclusive-cumulative base <= s,
    # lanes <= 127; bf16 is integer-exact through 256), and halving these
    # ~0.5 GB/layer of HBM traffic measures +4% train / +2% inference
    # end-to-end. Index outputs are bit-identical (oracle-equality tests).
    oh = jax.nn.one_hot(c_s, n_chunks, dtype=bf16)  # (B, M, ns, nc)
    sel_mask = jnp.einsum(
        "bmsc,bmck->bmsk", oh, hit_c, preferred_element_type=bf16
    )  # (B, M, ns, C); MXU accumulates f32, cast exact (values 0/1)
    base_s = jnp.einsum(
        "bmsc,bmc->bms", oh, base.astype(bf16), preferred_element_type=jnp.float32
    )  # base count of that chunk (selected bases <= 63: exact in bf16)
    t_s = s_iota + 1.0 - base_s  # wanted 1-based rank inside the chunk

    # in-chunk rank via matmul with an upper-triangular ones matrix
    tri = jnp.tril(jnp.ones((C, C), bf16)).T  # tri[k, j] = 1 for j >= k
    local_rank = jnp.einsum(
        "bmsk,kj->bmsj", sel_mask, tri,
        preferred_element_type=bf16,
    )  # inclusive cumsum; counts <= 128, bf16-exact
    is_target = jnp.where(
        (local_rank == t_s[..., None].astype(bf16)) & (sel_mask > 0),
        jnp.ones((), bf16), jnp.zeros((), bf16),
    )
    lane_iota = jnp.arange(C, dtype=jnp.float32).astype(bf16)
    lane = jnp.einsum(
        "bmsk,k->bms", is_target, lane_iota, preferred_element_type=jnp.float32
    )  # one-hot dot: exactly one 1 per row -> exact lane value
    idx_s = (c_s * C + lane.astype(jnp.int32)).astype(jnp.int32)

    # fill-with-first-hit semantics for slots past the last hit
    cnt = jnp.minimum(total, nsample).astype(jnp.int32)  # (B, M)
    first_hit = idx_s[..., :1]
    idx = jnp.where(s_iota.astype(jnp.int32) < cnt[..., None], idx_s, first_hit)
    idx = jnp.where(cnt[..., None] > 0, idx, 0)  # empty ball -> 0
    return lax.stop_gradient(idx), lax.stop_gradient(cnt)


def _group_point_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Flat row-gather from a (B*N, C) table — the embedding-lookup pattern
    XLA TPU optimizes best (~1.7x faster than batched take_along_axis)."""
    B, N, C = points.shape
    _, M, S = idx.shape
    table = points.reshape(B * N, C)
    off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    flat = (idx.astype(jnp.int32) + off).reshape(-1)
    return jnp.take(table, flat, axis=0).reshape(B, M, S, C)


def scatter_add_mxu(
    g: jnp.ndarray, idx: jnp.ndarray, num_rows: int, chunk: int = 2048
) -> jnp.ndarray:
    """Transpose of :func:`group_point`: Σ_{m,s} 1[idx==n]·g as MXU matmuls.

    Scans over update chunks and contracts a float32 one-hot of the
    destination indices against the update values on the MXU; summation
    order is fixed by the scan — fully deterministic, unlike the
    reference's atomicAdd (tf_grouping_g.cu:61-78). Product precision
    follows ``ops.dispatch.scatter_precision()``:

    - "exact" (default): the update operand runs at HIGHEST precision
      (split into bf16 passes covering the full f32 mantissa; the one-hot
      operand stays single-pass — 0/1 is bf16-exact), so every product is
      the exact f32 update value and the result matches XLA's native
      scatter-add up to summation order. Matches the reference's f32
      atomicAdd products. Measured cost ~24.8 ms over the live SA backward
      shapes at B=8 (same as XLA's native scatter).
    - "fast_bf16": single-pass TPU einsum — update values are bf16-rounded
      before the multiply (~1e-3 relative error on the gradient), 16.2 ms
      over the same shapes (~13% faster full train step). The round-2
      "MXU one-hot 2x over XLA scatter" result was this mode; the speedup
      comes from the truncation, not the formulation
      (benchmarks/scatter_bench.py).

    Args:
      g: (B, M, S, C) update values (cotangent of the gathered output).
      idx: (B, M, S) int32 destination rows.
      num_rows: N, the size of the destination axis.
      chunk: updates per matmul (scan step).

    Returns:
      (B, N, C) float32 accumulated gradient.
    """
    from votenet_tpu.ops.dispatch import scatter_precision

    # bf16 cotangents (gather_packing="bf16_hilo"): every update value is
    # exactly representable in one bf16 MXU pass, so DEFAULT precision IS
    # exact — HIGHEST would burn 3 passes recovering mantissa bits the
    # payload never had.
    upd_precision = (
        lax.Precision.HIGHEST
        if scatter_precision() == "exact" and g.dtype != jnp.bfloat16
        else lax.Precision.DEFAULT
    )
    B, M, S, C = g.shape
    K = M * S
    chunk = min(chunk, K)
    pad = (-K) % chunk
    gf = g.reshape(B, K, C).astype(jnp.float32)
    idxf = idx.reshape(B, K).astype(jnp.int32)
    if pad:
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))  # zero updates: no-op
        idxf = jnp.pad(idxf, ((0, 0), (0, pad)))
    n_chunks = (K + pad) // chunk

    def body(acc, args):
        ik, gk = args  # (B, chunk), (B, chunk, C)
        oh = jax.nn.one_hot(ik, num_rows, dtype=jnp.float32)
        return acc + jnp.einsum(
            "bkn,bkc->bnc", oh, gk,
            preferred_element_type=jnp.float32,
            precision=(lax.Precision.DEFAULT, upd_precision),
        ), None

    acc0 = jnp.zeros((B, num_rows, C), jnp.float32)
    ik = idxf.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    gk = gf.reshape(B, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    acc, _ = lax.scan(body, acc0, (ik, gk))
    return acc


def _pallas_scatter_chunk(B: int, K: int, N: int, C: int, passes: int):
    """Largest update-chunk for ops.pallas.scatter that fits scoped VMEM.

    The kernel keeps the (N, Kt) one-hot, the (N, C) accumulator, the
    double-buffered update block, the resident index array and the bf16
    split terms in VMEM; Mosaic's scoped limit is 16 MB. The byte model
    below reproduces the compiler's reported scoped sizes on the live
    shapes (e.g. 30.78 MB for the N=20480 sa1 case, which correctly
    falls back). Returns None when no chunk fits (→ scatter_add_mxu).
    """
    lanes = 128
    n_pad = -(-N // lanes) * lanes
    c_pad = -(-C // lanes) * lanes
    for kt in (2048, 1024, 512, 256, 128):
        k_pad = -(-max(K, 1) // kt) * kt
        bytes_est = (
            n_pad * kt * 2          # one-hot (bf16), built in VMEM
            + n_pad * c_pad * 4     # accumulator block
            + 2 * kt * c_pad * 4    # double-buffered update block
            + B * k_pad * 4         # whole index array stays resident
            + passes * kt * c_pad * 2  # bf16 split terms
        )
        if bytes_est <= 12 * 1024 * 1024:
            return kt
    return None


def scatter_add(g: jnp.ndarray, idx: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """group_point-VJP scatter: Pallas VMEM kernel when it fits, else the
    scanned MXU einsum. Both honor ``ops.dispatch.scatter_precision()``
    ("exact" = full-f32-mantissa products, "fast_bf16" = one bf16 pass);
    both are deterministic. Measured (benchmarks/scatter_bench.py chunk
    sweep, v5e, narrowed live shapes sa2n..prop at B=8): exact 13.9 → 12.8
    ms, fast 11.7 → 7.7 ms — the Pallas kernel builds the one-hot in VMEM
    instead of round-tripping it through HBM.
    """
    from votenet_tpu.ops.dispatch import scatter_precision, use_pallas

    # one bf16 pass is exact for bf16 cotangents (see scatter_add_mxu)
    exact_f32 = scatter_precision() == "exact" and g.dtype != jnp.bfloat16
    passes = 3 if exact_f32 else 1
    if use_pallas():
        B = g.shape[0]
        C = g.shape[-1]
        K = math.prod(g.shape[1:-1])
        kt = _pallas_scatter_chunk(B, K, num_rows, C, passes)
        if kt is not None:
            from votenet_tpu.ops.pallas.scatter import scatter_add_pallas

            return scatter_add_pallas(g, idx, num_rows, passes=passes, chunk=kt)
    return scatter_add_mxu(g, idx, num_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _group_point_tpu(
    N: int, grad_skip: int, points: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    return _group_point_gather(points, idx)


def _group_point_tpu_fwd(N, grad_skip, points, idx):
    return _group_point_gather(points, idx), idx


def _group_point_tpu_bwd(N, grad_skip, idx, g):
    # the cotangent dtype equals the primal dtype (gather preserves dtype)
    if grad_skip:
        # the caller asserted channels [:grad_skip] are stop_gradient'd —
        # scatter only the live feature block (MXU-lane-aligned: the model's
        # fused [xyz ‖ feat] widths 131/259 become 128/256, halving the
        # one-hot matmul tiles at sa2; measured 19.4 -> 10.4 ms across
        # sa2..sa4 at B=8) and zero-fill the dead coordinate columns
        d_feat = scatter_add(g[..., grad_skip:], idx, N)
        B = d_feat.shape[0]
        d = jnp.concatenate(
            [jnp.zeros((B, N, grad_skip), d_feat.dtype), d_feat], axis=-1
        )
    else:
        d = scatter_add(g, idx, N)
    return d.astype(g.dtype), None


_group_point_tpu.defvjp(_group_point_tpu_fwd, _group_point_tpu_bwd)


def group_point(
    points: jnp.ndarray, idx: jnp.ndarray, grad_skip_prefix: int = 0
) -> jnp.ndarray:
    """Gather grouped features: (B, N, C), (B, M, S) -> (B, M, S, C).

    Differentiable w.r.t. ``points``. On TPU the VJP is the MXU one-hot
    segment-sum (:func:`scatter_add_mxu`); elsewhere — or with the dispatch
    gate off (``use_pallas()`` False, the hand-optimized-twins escape
    hatch) — it is XLA's native scatter-add. Both are deterministic,
    replacing the reference's atomicAdd scatter (tf_grouping_g.cu:61-78).

    ``grad_skip_prefix=k`` declares that the cotangent of channels [:k] is
    discarded (returned as zeros): the caller must only pass k > 0 when
    those channels are non-differentiable — e.g. coordinate columns wrapped
    in ``stop_gradient`` (the SA layers' xyz derives from the param-free
    input cloud). The payoff is a narrower backward scatter whose width is
    MXU-lane-aligned (128/256 instead of 131/259). Only the TPU
    (``use_pallas()``) path narrows; the XLA fallback differentiates the
    plain gather, whose extra coordinate cotangent is dead by the same
    assertion (XLA DCEs it), so parameter gradients agree across backends.
    """
    from votenet_tpu.ops.dispatch import use_pallas

    if use_pallas():
        return _group_point_tpu(points.shape[1], grad_skip_prefix, points, idx)
    return _group_point_gather(points, idx)


def query_ball_point_streaming(
    radius: float,
    nsample: int,
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    block: int = 4096,
):
    """Ball query for large N (streaming). Reads ``bq_precision()`` per call
    (outside the jit cache) like :func:`query_ball_point_dense`; see
    :func:`_query_ball_point_streaming`."""
    from votenet_tpu.ops.dispatch import bq_precision

    return _query_ball_point_streaming(
        radius, nsample, bq_precision(), xyz1, xyz2, block
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _query_ball_point_streaming(
    radius: float,
    nsample: int,
    mode: str,
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    block: int = 4096,
):
    """Ball query for point counts too large for the (B, M, N) hit mask.

    The "long-context" axis of this model is the point count (SURVEY §5): at
    N >> 20480 the dense hierarchical query's (B, M, N) intermediates exceed
    HBM comfort. This variant scans dataset blocks of ``block`` points in
    ascending index order under a ``lax.scan`` — peak memory O(B·M·block) —
    and merges each block's first-k hits into the running per-query state.
    Because blocks are visited in index order and per-block hits come out in
    index order, the merge preserves the reference's
    first-``nsample``-in-index-order semantics exactly (tf_grouping_g.cu:
    13-35), including the fill-with-first-hit rule and saturated counts.

    Same signature/returns as :func:`query_ball_point` plus ``block``
    (static). Exact-equality tested against the dense twin.
    """
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    nb = -(-N // block)
    if nb * block != N:
        # pad with far-away points: never within radius of finite queries
        xyz1 = jnp.pad(
            xyz1, ((0, 0), (0, nb * block - N), (0, 0)), constant_values=1e9
        )
    blocks = xyz1.reshape(B, nb, block, 3).transpose(1, 0, 2, 3)  # (nb,B,blk,3)

    def body(carry, args):
        idx_st, cnt_st = carry  # (B,M,ns) int32, (B,M) int32
        j, blk = args
        bidx, bcnt = _query_ball_point_dense(radius, nsample, mode, blk, xyz2)
        return merge_first_k(idx_st, cnt_st, bidx + j * block, bcnt, nsample), None

    idx0 = jnp.zeros((B, M, nsample), jnp.int32)
    cnt0 = jnp.zeros((B, M), jnp.int32)
    (idx, cnt), _ = lax.scan(
        body, (idx0, cnt0), (jnp.arange(nb, dtype=jnp.int32), blocks)
    )
    idx, cnt = finalize_first_k(idx, cnt, nsample)
    return lax.stop_gradient(idx), lax.stop_gradient(cnt)


def merge_first_k(idx_st, cnt_st, bidx, bcnt, nsample: int):
    """Merge one partial first-k result into a running (idx, cnt) state.

    ``(idx_st, cnt_st)`` hold the first ``cnt_st`` hits found so far (in
    dataset index order); ``(bidx, bcnt)`` is a partial result over a LATER
    index range (all its indices exceed everything already stored —
    streaming blocks / mesh shards are visited in ascending index order).
    Slots ``>= bcnt`` of ``bidx`` are fill values and are masked off via the
    counts. Returns the merged (idx, cnt); counts saturate at ``nsample``.
    """
    s_iota = jnp.arange(nsample, dtype=jnp.int32)
    take = jnp.minimum(nsample - cnt_st, bcnt)  # (B, M)
    shift = jnp.clip(s_iota[None, None, :] - cnt_st[..., None], 0, nsample - 1)
    shifted = jnp.take_along_axis(bidx, shift, axis=-1)
    merged = jnp.where(s_iota[None, None, :] < cnt_st[..., None], idx_st, shifted)
    return merged, cnt_st + take


def finalize_first_k(idx, cnt, nsample: int):
    """Apply the reference padding semantics to a merged first-k state:
    slots past the last hit repeat the FIRST hit; fully-empty balls -> index
    0 (see the query_ball_point docstring)."""
    s_iota = jnp.arange(nsample, dtype=jnp.int32)
    first_hit = idx[..., :1]
    idx = jnp.where(s_iota[None, None, :] < cnt[..., None], idx, first_hit)
    idx = jnp.where(cnt[..., None] > 0, idx, 0)
    return idx, cnt


@functools.partial(jax.jit, static_argnums=0)
def select_top_k(k: int, dist: jnp.ndarray):
    """Partial selection sort of each row (reference tf_grouping.py:22-31).

    Returns (idx, dist_out) of the same (B, M, N) shape where the first k
    entries of each row are the k smallest distances in ascending order (the
    reference leaves the remaining N-k entries in unspecified order; we
    return a full ascending sort, a strict refinement).
    """
    order = jnp.argsort(dist, axis=-1, stable=True).astype(jnp.int32)
    return order, jnp.take_along_axis(dist, order, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def knn_point(k: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """k nearest neighbors by squared distance (reference tf_grouping.py:48-73).

    xyz1: (B, N, 3) dataset, xyz2: (B, M, 3) queries.
    Returns (dist2, idx) each (B, M, k), ascending. Unused by the VoteNet
    model (it always ball-queries) but part of the reference API surface.
    """
    d2 = pairwise_sqdist(xyz2, xyz1)  # (B, M, N)
    neg, idx = lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)
