#!/usr/bin/env python
"""Benchmark harness. Default: headline end-to-end SUN RGB-D inference
scenes/sec/chip on full-size VoteNet (20480 pts, backbone + voting +
proposal + decode + 3D NMS), printed as ONE JSON line.

Sub-benchmarks (for kernel tuning):
  python bench.py sa_layer     # fused SA-layer microbenchmark (µs)
  python bench.py fps          # farthest-point-sampling kernel (µs)
  python bench.py ball_query   # ball-query kernel (µs)
  python bench.py train_step   # full training step (steps/s)

vs_baseline: the reference publishes no speed numbers (BASELINE.md); the
driver-defined target is >=10x a CPU reference. We use our own XLA-CPU
throughput on this machine (recorded once in benchmarks/cpu_reference.json)
as the CPU-reference proxy, and report value / (10 * cpu_proxy) — i.e.
vs_baseline >= 1.0 means the 10x target is met.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CPU_REF_FILE = os.path.join(os.path.dirname(__file__), "benchmarks", "cpu_reference.json")


def _sync(out):
    """Force completion. block_until_ready returns early under the axon
    tunnel platform, so fetch one leaf to the host instead."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0])
    return out


def _timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


# bf16 dense peak FLOP/s per chip, by jax device_kind prefix (most specific
# first — "TPU v5" must not swallow "TPU v5 lite"). MFU here is the standard
# convention: achieved FLOP/s over the chip's bf16 MXU peak. The model runs
# f32 (bf16 measured convergence-negative, DESIGN.md), and XLA executes f32
# matmuls as multi-pass bf16 — so the f32-attainable ceiling is ~1/4 to 1/3
# of this peak; the roofline table in DESIGN.md carries that context.
_PEAK_BF16 = (
    ("TPU v6 lite", 918e12),  # Trillium / v6e
    ("TPU v6", 918e12),
    ("TPU v5 lite", 197e12),  # v5e
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),
    ("TPU v4", 275e12),
    ("TPU v3", 123e12),
)


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, peak in _PEAK_BF16:
        if kind.startswith(prefix):
            return peak, kind
    return None, kind


def _cost_analysis(jitted, *args):
    """(flops, bytes accessed) of a compiled jit per XLA's own accounting."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def _twin_cost_analysis(fn, *args):
    """Cost analysis of the pure-XLA twin of ``fn``.

    XLA's cost_analysis cannot see inside Pallas custom calls, so a compile
    of the production (fused-kernel) path under-reports FLOPs to near zero.
    The model FLOPs are a property of the math, not the kernelization, so we
    retrace ``fn`` with every Pallas kernel and the fused SA-layer kernel
    disabled (the bit-/numerics-equivalent XLA twins) and account that HLO.
    MFU below is therefore the standard model-FLOPs / time / peak. The bytes
    figure is the twin formulation's HBM traffic — an UPPER bound for the
    fused path (removing grouped-tensor round trips is the point of the
    fusion), so hbm_gbps/arith-intensity are roofline bounds, not measures.
    """
    import jax

    from votenet_tpu.ops.dispatch import pallas_disabled, samlp_enabled, set_samlp

    prev_samlp = "on" if samlp_enabled() else "off"
    set_samlp("off")
    try:
        with pallas_disabled():
            # fresh lambda: jax's pjit cache is keyed on the function object,
            # so jitting ``fn`` itself would reuse the fused-path trace
            return _cost_analysis(jax.jit(lambda *a: fn(*a)), *args)
    finally:
        set_samlp(prev_samlp)


def _build_predict(batch_size: int):
    import jax
    import jax.numpy as jnp

    from votenet_tpu.config import default_config
    from votenet_tpu.models.decode import predict_boxes
    from votenet_tpu.models.votenet import VoteNet

    cfg = default_config()
    model = VoteNet(cfg)
    pts0 = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        jax.random.PRNGKey(0), pts0
    )

    def predict_raw(points):
        end_points = model.apply(variables, points, train=False)
        pred = predict_boxes(end_points, cfg)
        return pred["bboxes"], pred["class_scores"], pred["keep"]

    predict = jax.jit(predict_raw)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-4, 4, (batch_size, cfg.point_num, 3)).astype(np.float32)
    return predict, pts, predict_raw


def _measure_inference():
    # The axon tunnel adds large, variable per-dispatch latency, so the
    # headline is measured as ONE dispatch of K serially-chained forward
    # passes inside a device-side fori_loop (each iteration's input depends
    # on the previous keep-mask, preventing CSE/overlap): pure chip
    # throughput, independent of host/tunnel congestion.
    import jax
    import jax.numpy as jnp
    from jax import lax

    predict, pts, predict_raw = _build_predict(BATCH)
    K = 10

    @jax.jit
    def chained(points):
        def body(i, carry):
            p, acc = carry
            _, _, keep = predict(p)
            acc = acc + jnp.sum(keep)
            p = p + acc.astype(jnp.float32) * 1e-30  # serialize iterations
            return p, acc

        return lax.fori_loop(0, K, body, (points, jnp.int32(0)))

    dt = min(_timeit(lambda: chained(pts), iters=3, warmup=2) for _ in range(3)) / K
    flops, nbytes = _twin_cost_analysis(predict_raw, pts)
    _, nbytes_fused = _cost_analysis(predict, pts)
    return BATCH / dt, dt, flops, nbytes, nbytes_fused


def _measure_train_step():
    """Train-step scenes/s, device-side chained like inference: one dispatch
    of K full optimizer steps (state naturally serializes iterations)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from votenet_tpu.config import default_config
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.loop import make_train_step
    from votenet_tpu.train.state import create_train_state

    # variant knobs for A/B runs: BENCH_SCATTER_PRECISION=fast_bf16,
    # BENCH_MIXED=1 (the scored default is the production default config)
    cfg = default_config().replace(
        batch_size=BATCH,
        scatter_precision=os.environ.get("BENCH_SCATTER_PRECISION", "exact"),
        bq_precision=os.environ.get("BENCH_BQ_PRECISION", "exact"),
        mixed_precision=bool(int(os.environ.get("BENCH_MIXED", "0"))),
        remat=bool(int(os.environ.get("BENCH_REMAT", "0"))),
    )
    from votenet_tpu.ops.dispatch import apply_config

    apply_config(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=100)
    model = VoteNet(cfg)
    step_fn = make_train_step(model, cfg)
    batch = next(iter(batch_scenes(
        iter(synthetic_scenes(0, cfg, cfg.batch_size)), cfg.batch_size, cfg.max_gt_boxes
    )))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    K = 8

    @jax.jit
    def chained(state, batch):
        def body(i, carry):
            st, acc = carry
            st, m = step_fn(st, batch)
            return st, acc + m["total_cost"]

        return lax.fori_loop(0, K, body, (state, jnp.float32(0.0)))

    dt = min(_timeit(lambda: chained(state, batch), iters=2, warmup=1)
             for _ in range(3)) / K
    flops, nbytes = _twin_cost_analysis(step_fn, state, batch)
    _, nbytes_fused = _cost_analysis(jax.jit(step_fn), state, batch)
    return BATCH / dt, dt, flops, nbytes, nbytes_fused


def bench_inference():
    scenes_per_sec, dt_inf, flops_inf, bytes_inf, fbytes_inf = _measure_inference()
    train_sps, dt_tr, flops_tr, bytes_tr, fbytes_tr = _measure_train_step()
    # supplementary: the fast_bf16 gradient-scatter mode (~1e-3 gradient
    # rounding, see ops/dispatch.py) — reported alongside, never as the
    # headline; the scored train number is the exact-precision default
    os.environ["BENCH_SCATTER_PRECISION"] = "fast_bf16"
    try:
        train_sps_fast = _measure_train_step()[0]
    finally:
        os.environ.pop("BENCH_SCATTER_PRECISION", None)
        from votenet_tpu.ops.dispatch import set_scatter_precision

        set_scatter_precision("exact")
    peak, device = _peak_flops()

    vs_baseline = None
    if os.path.exists(CPU_REF_FILE):
        with open(CPU_REF_FILE) as f:
            cpu_ref = json.load(f)["scenes_per_sec"]
        vs_baseline = scenes_per_sec / (10.0 * cpu_ref)

    def _roof(flops, nbytes, dt):
        """achieved TFLOP/s, MFU vs bf16 peak, arithmetic intensity."""
        if not flops or not dt:
            return None, None, None
        tf = flops / dt / 1e12
        mfu = tf * 1e12 / peak if peak else None
        ai = flops / nbytes if nbytes else None
        return round(tf, 3), round(mfu, 4) if mfu else None, round(ai, 2) if ai else None

    tf_inf, mfu_inf, ai_inf = _roof(flops_inf, bytes_inf, dt_inf)
    tf_tr, mfu_tr, ai_tr = _roof(flops_tr, bytes_tr, dt_tr)

    print(json.dumps({
        "metric": "sunrgbd_inference_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
        "train_step_scenes_per_sec": round(train_sps, 3),
        "train_step_scenes_per_sec_fast_bf16_scatter": round(train_sps_fast, 3),
        # roofline accounting: model FLOPs/bytes from the XLA-twin compile
        # (_twin_cost_analysis — Pallas kernels are opaque to cost_analysis),
        # over the FUSED path's measured time. MFU vs the chip's bf16 MXU
        # peak — the f32-attainable ceiling is ~1/4-1/3 of it; hbm_gbps is
        # an upper bound on the fused path's actual traffic.
        "device": device,
        "tflops": tf_inf,
        "mfu": mfu_inf,
        "arith_intensity_flops_per_byte": ai_inf,
        "train_tflops": tf_tr,
        "train_mfu": mfu_tr,
        "train_arith_intensity": ai_tr,
        # hbm_gbps: the FUSED path's own XLA byte accounting / time (actual
        # sustained traffic, pallas operands counted at the custom-call
        # boundary); twin_equiv_hbm_gbps: the XLA-twin formulation's bytes /
        # the fused path's time — where this EXCEEDS the chip's HBM peak
        # (~819 GB/s on v5e), the fusion provably removed bytes the
        # unfused formulation had to move.
        "hbm_gbps": round(fbytes_inf / dt_inf / 1e9, 1) if fbytes_inf and dt_inf else None,
        "train_hbm_gbps": round(fbytes_tr / dt_tr / 1e9, 1) if fbytes_tr and dt_tr else None,
        "twin_equiv_hbm_gbps": round(bytes_inf / dt_inf / 1e9, 1) if bytes_inf and dt_inf else None,
        "train_twin_equiv_hbm_gbps": round(bytes_tr / dt_tr / 1e9, 1) if bytes_tr and dt_tr else None,
    }))


def bench_cpu_reference():
    """Measure the CPU proxy once and record it (run manually on CPU)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    predict, pts, _ = _build_predict(1)
    dt = _timeit(lambda: predict(pts), iters=3, warmup=1)
    os.makedirs(os.path.dirname(CPU_REF_FILE), exist_ok=True)
    with open(CPU_REF_FILE, "w") as f:
        json.dump({"scenes_per_sec": 1.0 / dt, "batch": 1,
                   "note": "XLA-CPU full inference on the build machine"}, f, indent=1)
    print(json.dumps({"metric": "cpu_reference_scenes_per_sec",
                      "value": round(1.0 / dt, 4), "unit": "scenes/s",
                      "vs_baseline": None}))


def bench_sa_layer():
    """First SA layer (FPS 20480->2048, ball query r=0.2 K=64, MLP, pool),
    device-side chained like the headline measurement."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from votenet_tpu.config import default_config
    from votenet_tpu.models.pointnet2 import PointNetSAModule

    cfg = default_config()
    mod = PointNetSAModule(
        npoint=2048, radius=0.2, nsample=64, mlp=(64, 64, 128), name="sa1"
    )
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-4, 4, (BATCH, cfg.point_num, 3)), jnp.float32)
    variables = jax.jit(lambda r: mod.init(r, xyz, xyz, train=False))(jax.random.PRNGKey(0))
    K = 10

    @jax.jit
    def chained(xyz):
        def body(i, carry):
            x, acc = carry
            _, feats, _ = mod.apply(variables, x, x, train=False)
            s = jnp.sum(feats)
            return x + s * 1e-30, acc + s

        return lax.fori_loop(0, K, body, (xyz, jnp.float32(0.0)))

    dt = min(_timeit(lambda: chained(xyz), iters=3, warmup=2) for _ in range(3)) / K
    print(json.dumps({"metric": "fused_sa_layer_us", "value": round(dt * 1e6, 1),
                      "unit": "us", "vs_baseline": None}))


def bench_fps():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.ops import farthest_point_sample

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-4, 4, (BATCH, 20480, 3)), jnp.float32)
    fn = jax.jit(lambda x: farthest_point_sample(2048, x))
    dt = _timeit(lambda: fn(xyz), iters=10, warmup=2)
    print(json.dumps({"metric": "fps_20480_to_2048_us", "value": round(dt * 1e6, 1),
                      "unit": "us", "vs_baseline": None}))


def bench_ball_query():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.ops import query_ball_point

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-4, 4, (BATCH, 20480, 3)), jnp.float32)
    q = xyz[:, :2048]
    fn = jax.jit(lambda a, b: query_ball_point(0.2, 64, a, b))
    dt = _timeit(lambda: fn(xyz, q), iters=10, warmup=2)
    print(json.dumps({"metric": "ball_query_20480x2048_us", "value": round(dt * 1e6, 1),
                      "unit": "us", "vs_baseline": None}))


def bench_train_step():
    sps, dt, flops, nbytes, _ = _measure_train_step()
    peak, _ = _peak_flops()
    tf = round(flops / dt / 1e12, 3) if flops and dt else None
    print(json.dumps({"metric": "train_step_scenes_per_sec", "value": round(sps, 3),
                      "unit": "scenes/s", "vs_baseline": None,
                      "tflops": tf,
                      "mfu": round(tf * 1e12 / peak, 4) if tf and peak else None}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "inference"
    {
        "inference": bench_inference,
        "cpu_reference": bench_cpu_reference,
        "sa_layer": bench_sa_layer,
        "fps": bench_fps,
        "ball_query": bench_ball_query,
        "train_step": bench_train_step,
    }[which]()
