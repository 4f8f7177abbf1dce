"""Per-stage timing of the full VoteNet forward at B=8 on the real chip.

Each stage is measured as ONE dispatch of K device-side chained iterations
(a fori_loop whose input is perturbed by the previous output), so the axon
tunnel's multi-ms per-dispatch latency is amortized away — the same trick as
bench.py's headline measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(os.environ.get("BENCH_BATCH", "8"))
K = 20


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


# v5e roofline constants: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM. An op is
# compute-bound only above the ridge intensity peak/bw ≈ 240 flops/byte
# (f32 multi-pass matmuls ridge at ~60-80). Everything below is HBM-bound.
PEAK_BF16, HBM_BW = 197e12, 819e9


def cost(fn, *args):
    """(flops, bytes) of one un-chained application, per XLA cost analysis."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


STAGE_ROWS = []


def report(stage, t, fl, by):
    """Record + pretty-print one stage with its roofline classification."""
    ai = fl / by if by else 0.0
    bound = "MXU" if ai > 240 else ("mixed" if ai > 60 else "HBM")
    STAGE_ROWS.append((stage, t, fl, by, ai, bound))
    return (f"{t*1e3:6.2f}ms {fl/1e9:7.2f}GF {by/1e6:7.1f}MB "
            f"ai={ai:6.1f} [{bound}]")


def chained_time(fn, x0, *rest, iters=3, warmup=1):
    """Time fn(x, *rest) over K chained device-side iterations.

    ``x0`` must be a float array; each iteration's input is perturbed by a
    scalar derived from the previous output to serialize the loop.
    """

    @jax.jit
    def loop(x, rest):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *rest)
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
            return x + s * 1e-30, acc + s

        return lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))

    for _ in range(warmup):
        _sync(loop(x0, rest))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(x0, rest)
    _sync(out)
    return (time.perf_counter() - t0) / (iters * K)


def main():
    from votenet_tpu import ops

    rng = np.random.RandomState(0)
    total = 0.0

    layers = [
        ("sa1", 20480, 2048, 0.2, 64, 0, 128),
        ("sa2", 2048, 1024, 0.4, 64, 128, 256),
        ("sa3", 1024, 512, 0.8, 64, 256, 256),
        ("sa4", 512, 256, 1.2, 64, 256, 256),
        ("prop", 1024, 256, 0.3, 64, 256, 128),
    ]
    for name, N, M, r, S, Cin, Cout in layers:
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        feat = (jnp.asarray(rng.standard_normal((B, N, Cin)), jnp.float32)
                if Cin else None)

        fps_fn = lambda x: ops.farthest_point_sample(M, x)
        t_fps = chained_time(fps_fn, xyz)
        c_fps = cost(fps_fn, xyz)
        fps_idx = jax.jit(fps_fn)(xyz)
        new_xyz = jax.jit(ops.gather_point)(xyz, fps_idx)

        bq_fn = lambda x, q: ops.query_ball_point(r, S, x, q)
        t_bq = chained_time(bq_fn, xyz, new_xyz)
        c_bq = cost(bq_fn, xyz, new_xyz)
        idx, _ = jax.jit(bq_fn)(xyz, new_xyz)
        both = jnp.concatenate([xyz, feat], axis=-1) if feat is not None else xyz

        def group(both, idx, new_xyz):
            g = ops.group_point(both, idx)
            return g.at[..., :3].add(-new_xyz[:, :, None, :])

        t_group = chained_time(group, both, idx, new_xyz)
        c_group = cost(group, both, idx, new_xyz)
        grouped = jax.jit(group)(both, idx, new_xyz)

        Cg = grouped.shape[-1]
        W0 = jnp.asarray(rng.standard_normal((Cg, Cout)) * 0.05, jnp.float32)
        W1 = jnp.asarray(rng.standard_normal((Cout, Cout)) * 0.05, jnp.float32)

        def mlp(g, W0, W1):
            h = jax.nn.relu(g @ W0)
            h = jax.nn.relu(h @ W1)
            return jnp.max(h, axis=2)

        t_mlp = chained_time(mlp, grouped, W0, W1)
        c_mlp = cost(mlp, grouped, W0, W1)
        total += t_fps + t_bq + t_group + t_mlp
        print(f"{name:5s} fps  {report(f'{name}/fps', t_fps, *c_fps)}", flush=True)
        print(f"{name:5s} bq   {report(f'{name}/bq', t_bq, *c_bq)}", flush=True)
        print(f"{name:5s} grp  {report(f'{name}/group', t_group, *c_group)}", flush=True)
        print(f"{name:5s} mlp  {report(f'{name}/mlp', t_mlp, *c_mlp)}", flush=True)

    for name, n, m, C in [("fp1", 512, 1024, 256), ("fp2", 1024, 2048, 256)]:
        xyz1 = jnp.asarray(rng.uniform(-4, 4, (B, n, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.uniform(-4, 4, (B, m, 3)), jnp.float32)
        feat = jnp.asarray(rng.standard_normal((B, n, C)), jnp.float32)

        def fp(feat, xyz1, xyz2):
            dist, idx = ops.three_nn(xyz2, xyz1)
            w = 1.0 / jnp.maximum(dist, 1e-10)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            return ops.three_interpolate(feat, idx, w)

        t_fp = chained_time(fp, feat, xyz1, xyz2)
        c_fp = cost(fp, feat, xyz1, xyz2)
        total += t_fp
        print(f"{name:5s} 3nn  {report(f'{name}/3nn+interp', t_fp, *c_fp)}", flush=True)

    from votenet_tpu.config import default_config
    from votenet_tpu.models.decode import predict_boxes
    from votenet_tpu.models.votenet import VoteNet

    cfg = default_config()
    model = VoteNet(cfg)
    pts = jnp.asarray(rng.uniform(-4, 4, (B, cfg.point_num, 3)), jnp.float32)
    variables = jax.jit(lambda rr, p: model.init(rr, p, train=False))(
        jax.random.PRNGKey(0), pts
    )
    ep = jax.jit(lambda p: model.apply(variables, p, train=False))(pts)
    proposals = {k: ep[k] for k in ep if hasattr(ep[k], "dtype")}

    dec_fn = lambda out: predict_boxes(
        {**proposals, "proposals_output": out}, cfg
    )["bboxes"]
    t_dec = chained_time(dec_fn, proposals["proposals_output"])
    c_dec = cost(dec_fn, proposals["proposals_output"])
    print(f"dec   nms  {report('decode+nms', t_dec, *c_dec)}", flush=True)
    total += t_dec

    def full(p):
        return predict_boxes(model.apply(variables, p, train=False), cfg)["bboxes"]

    t_full = chained_time(full, pts)
    c_full = cost(full, pts)
    print(f"full  fwd  {report('FULL', t_full, *c_full)}", flush=True)
    print(f"sum-of-stages = {total*1e3:.2f}ms | full jitted fwd = {t_full*1e3:.2f}ms",
          flush=True)

    # top time sinks with their roofline classification (the VERDICT r3
    # deliverable: top-3 sinks, bytes-vs-flops)
    rows = [r for r in STAGE_ROWS if r[0] != "FULL"]
    rows.sort(key=lambda r: -r[1])
    print("\ntop time sinks (per stage, B=%d):" % B)
    for stage, t, fl, by, ai, bound in rows[:6]:
        print(f"  {stage:16s} {t*1e3:6.2f}ms  ai={ai:6.1f} flops/byte  "
              f"bound={bound}  ({fl/1e9:.2f} GF, {by/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
