"""Batched vs row-wise Pallas FPS crossover measurement (sets ROWWISE_MAX_B).

The batched kernel rides batch rows on the 8 sublanes (idle at B<8); the
row-wise kernel folds points over (sublanes, lanes) with a grid over batch.
Device-side chained timing (one dispatch of K serialized calls), like
bench.py's headline.

  python benchmarks/fps_crossover.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, M, K = 20480, 2048, 20


def chained(fn, xyz):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            idx = fn(x)
            s = jnp.sum(idx)
            return x + s.astype(jnp.float32) * 1e-30, acc + s

        return lax.fori_loop(0, K, body, (x, jnp.int32(0)))

    def timeit():
        out = run(xyz)
        np.asarray(out[1])  # tunnel-safe sync
        t0 = time.perf_counter()
        out = run(xyz)
        np.asarray(out[1])
        return (time.perf_counter() - t0) / K

    return min(timeit() for _ in range(3))


def main():
    import jax.numpy as jnp

    from votenet_tpu.ops.pallas.fps import (
        farthest_point_sample_pallas,
        farthest_point_sample_pallas_rowwise,
    )

    rng = np.random.RandomState(0)
    print(f"{'B':>3} {'batched_ms':>11} {'rowwise_ms':>11} {'winner':>8}")
    for B in (1, 2, 4, 8, 16):
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        tb = chained(lambda x: farthest_point_sample_pallas(M, x), xyz)
        tr = chained(lambda x: farthest_point_sample_pallas_rowwise(M, x), xyz)
        print(f"{B:>3} {tb*1e3:>11.3f} {tr*1e3:>11.3f} "
              f"{'rowwise' if tr < tb else 'batched':>8}", flush=True)


if __name__ == "__main__":
    main()
