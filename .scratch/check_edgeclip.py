import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
from votenet_tpu.ops.iou3d import (
    convex_quad_intersection_area,
    convex_quad_intersection_area_edgeclip,
    convex_quad_intersection_area_sh,
)

rng = np.random.RandomState(0)

def rand_quad(n):
    ctr = rng.randn(n, 1, 2) * 2
    ang = rng.rand(n) * 2 * np.pi
    w = rng.uniform(0.2, 3, (n, 1))
    h = rng.uniform(0.2, 3, (n, 1))
    base = np.stack([
        np.stack([-w[:, 0], -h[:, 0]], -1), np.stack([w[:, 0], -h[:, 0]], -1),
        np.stack([w[:, 0], h[:, 0]], -1), np.stack([-w[:, 0], h[:, 0]], -1)], 1)
    R = np.stack([np.stack([np.cos(ang), -np.sin(ang)], -1),
                  np.stack([np.sin(ang), np.cos(ang)], -1)], -2)
    q = np.einsum("nij,nkj->nki", R, base) + ctr
    flip = rng.rand(n) < 0.5
    q[flip] = q[flip][:, ::-1, :]
    return q.astype(np.float32)

P = rand_quad(5000)
Q = rand_quad(5000)
Q[0] = (P[0] - P[0].mean(0)) * 0.3 + P[0].mean(0)  # Q strictly inside P
Q[1] = P[1]                                        # identical
Q[2] = P[2] + 100.0                                # disjoint
Q[3] = P[3] + (P[3][1] - P[3][0])                  # shares an edge (translated)

a_rank = np.asarray(convex_quad_intersection_area(jnp.asarray(P), jnp.asarray(Q)))
a_edge = np.asarray(convex_quad_intersection_area_edgeclip(jnp.asarray(P), jnp.asarray(Q)))
a_sh = np.asarray(convex_quad_intersection_area_sh(jnp.asarray(P), jnp.asarray(Q)))

for name, ref in [("rank", a_rank), ("sh", a_sh)]:
    diff = np.abs(a_edge - ref)
    rel = diff / np.maximum(np.maximum(np.abs(ref), np.abs(a_edge)), 1e-3)
    i = int(np.argmax(rel))
    print(f"vs {name}: max_abs={diff.max():.3e} max_rel={rel.max():.3e} "
          f"at {i}: edge={a_edge[i]:.6f} {name}={ref[i]:.6f}")
qa = abs(0.5 * np.sum(Q[0][:, 0] * np.roll(Q[0][:, 1], -1) - np.roll(Q[0][:, 0], -1) * Q[0][:, 1]))
print("containment:", a_edge[0], "expect", qa)
print("identical:", a_edge[1], a_rank[1])
print("disjoint:", a_edge[2])
print("edge-adjacent:", a_edge[3], a_rank[3])
