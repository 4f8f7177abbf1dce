"""Per-SA-layer A/B of the fused samlp Pallas kernel vs the XLA chain.

The end-to-end decomposition (benchmarks/fused_decomp.py) measured the fused
MLP+pool kernel net-NEGATIVE in the full forward while the Pallas ball query
is a large win. This bench attributes that per layer: each VoteNet SA layer
(live shapes, eval mode, Pallas BQ active in both arms) timed with
dispatch.samlp on vs off. A layer-level win/loss table decides whether the
kernel should gate by shape rather than globally.

Run on TPU:  python benchmarks/samlp_layer_ab.py
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

B = 8
K = 10

# (name, N, C_in_features, npoint, radius, nsample, mlp)
LAYERS = [
    ("sa1", 20480, 0, 2048, 0.2, 64, (64, 64, 128)),
    ("sa2", 2048, 128, 1024, 0.4, 64, (128, 128, 256)),
    ("sa3", 1024, 256, 512, 0.8, 64, (128, 128, 256)),
    ("sa4", 512, 256, 256, 1.2, 64, (128, 128, 256)),
    ("prop", 1024, 256, 256, 0.3, 64, (128, 128, 128)),
]


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
    from votenet_tpu.models.pointnet2 import PointNetSAModule
    from votenet_tpu.ops.dispatch import set_samlp

    rng = np.random.RandomState(0)
    results = {}
    for name, N, Cf, M, r, S, mlp in LAYERS:
        mod = PointNetSAModule(npoint=M, radius=r, nsample=S, mlp=mlp, name=name)
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        feats = (jnp.asarray(rng.standard_normal((B, N, Cf)), jnp.float32)
                 if Cf else xyz)
        variables = jax.jit(lambda rr: mod.init(rr, xyz, feats, train=False))(
            jax.random.PRNGKey(0))

        row = {}
        for mode in ("on", "off"):
            set_samlp(mode)
            try:
                fwd = jax.jit(lambda x, f, _m=mode: mod.apply(
                    variables, x, f, train=False)[1])

                @jax.jit
                def chained(x, f, _m=mode, _fwd=fwd):
                    def body(i, carry):
                        xx, acc = carry
                        s = jnp.sum(_fwd(xx, f))
                        return xx + s * 1e-30, acc + s

                    return lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))

                dt = min(_timeit(lambda: chained(xyz, feats)) for _ in range(3)) / K
            finally:
                set_samlp("on")
            row[mode] = dt * 1e3
        results[name] = {k: round(v, 3) for k, v in row.items()}
        print(f"{name:4s} N={N:6d} M={M:5d} S={S} mlp={mlp}: "
              f"fused={row['on']:7.3f} ms  xla={row['off']:7.3f} ms  "
              f"({row['off'] / row['on']:4.2f}x)", flush=True)

    print(json.dumps({"metric": "samlp_layer_ab_ms", "value": results,
                      "unit": "ms", "vs_baseline": None}))


if __name__ == "__main__":
    main()
