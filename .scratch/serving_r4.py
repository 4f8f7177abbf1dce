"""Round-4 serving measurements under FINAL defaults (samlp off, Pallas BQ).

B=1 and B=8 full inference forward (model + decode + NMS), f32 vs bf16
compute_dtype — the verdict-#7 speed re-measure after the kernel changes.
Device-side chained timing (tunnel-independent). Run on TPU.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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

    results = {}
    rng = np.random.RandomState(0)
    for dtype in ("float32", "bfloat16"):
        cfg = default_config().replace(compute_dtype=dtype)
        model = VoteNet(cfg)
        pts0 = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
        variables = jax.jit(lambda r, p, _m=model: _m.init(r, p, train=False))(
            jax.random.PRNGKey(0), pts0
        )

        for B in (1, 8):
            pts = jnp.asarray(
                rng.uniform(-4, 4, (B, cfg.point_num, 3)), jnp.float32
            )

            cell = jax.jit(
                lambda p, _m=model, _v=variables, _c=cfg, _d=dtype, _b=B: (
                    lambda ep: (
                        predict_boxes(ep, _c)["bboxes"],
                        predict_boxes(ep, _c)["keep"],
                    )
                )(_m.apply(_v, p, train=False))
            )

            @jax.jit
            def chained(points, _cell=cell, _d=dtype, _b=B):
                def body(i, carry):
                    p, acc = carry
                    _, keep = _cell(p)
                    acc = acc + jnp.sum(keep)
                    return p + acc.astype(jnp.float32) * 1e-30, acc

                return lax.fori_loop(0, K, body, (points, jnp.int32(0)))

            dt = min(_timeit(lambda: chained(pts)) for _ in range(3)) / K
            ms = dt * 1e3
            results[f"B={B},{dtype}"] = round(ms, 2)
            print(
                f"B={B} {dtype:9s}: {ms:6.2f} ms/fwd ({B / dt:7.1f} scenes/s)",
                flush=True,
            )

    print(json.dumps({"metric": "serving_r4_ms_per_fwd", "value": results}))


if __name__ == "__main__":
    main()
