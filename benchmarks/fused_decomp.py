"""Attribute the round-4 eval-path speedup: fused samlp kernel x Pallas BQ.

Measures the full inference forward (backbone + voting + proposal + decode +
NMS, B=8 by default) under the 2x2 grid of the two round-4 kernels:

    samlp  = on | off   (fused SA-layer MLP+max-pool, ops/pallas/samlp.py)
    pallas_bq = on | off (exact VMEM ball query, ops/pallas/ballquery.py)

All other Pallas kernels (FPS, scatter) stay at their production defaults in
every cell, so the deltas isolate the two new kernels. Timing is the
device-side chained protocol from bench.py (tunnel-latency independent).

Run on TPU:  python benchmarks/fused_decomp.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH = 8
K = 10


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _timeit(fn, iters=3, warmup=2):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from votenet_tpu.config import default_config
    from votenet_tpu.models.decode import predict_boxes
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.ops import grouping
    from votenet_tpu.ops.dispatch import set_samlp

    cfg = default_config()
    model = VoteNet(cfg)
    pts0 = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        jax.random.PRNGKey(0), pts0
    )
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-4, 4, (BATCH, cfg.point_num, 3)), jnp.float32)

    def forward(points):
        end_points = model.apply(variables, points, train=False)
        pred = predict_boxes(end_points, cfg)
        return pred["bboxes"], pred["class_scores"], pred["keep"]

    real_route = grouping._pallas_bq_route
    results = {}
    for samlp in ("on", "off"):
        for bq in ("pallas", "xla"):
            set_samlp(samlp)
            grouping._pallas_bq_route = (
                real_route if bq == "pallas" else (lambda *a, **k: False)
            )
            try:
                # fresh function object per cell: defeat the pjit cache so
                # each cell really retraces under its dispatch setting
                cell = jax.jit(lambda p, _s=samlp, _b=bq: forward(p))

                @jax.jit
                def chained(points, _s=samlp, _b=bq, _cell=cell):
                    def body(i, carry):
                        p, acc = carry
                        _, _, keep = _cell(p)
                        acc = acc + jnp.sum(keep)
                        return p + acc.astype(jnp.float32) * 1e-30, acc

                    return lax.fori_loop(0, K, body, (points, jnp.int32(0)))

                dt = min(_timeit(lambda: chained(pts)) for _ in range(3)) / K
            finally:
                set_samlp("on")
                grouping._pallas_bq_route = real_route
            ms = dt * 1e3
            results[f"samlp={samlp},bq={bq}"] = round(ms, 2)
            print(f"samlp={samlp:3s} bq={bq:6s}: {ms:6.2f} ms/fwd "
                  f"({BATCH / dt:7.1f} scenes/s)", flush=True)

    print(json.dumps({"metric": "fused_decomp_ms_per_fwd_B8", "value": results,
                      "unit": "ms", "vs_baseline": None}))


if __name__ == "__main__":
    main()
