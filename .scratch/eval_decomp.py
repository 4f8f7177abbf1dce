"""Decompose eval-forward time: samlp kernel x pallas-BQ routing."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")

from votenet_tpu.config import default_config
from votenet_tpu.models.votenet import VoteNet
from votenet_tpu.ops import dispatch
from votenet_tpu.ops import grouping

B = 8
cfg = default_config()
model = VoteNet(cfg)
rng = np.random.RandomState(0)
centers = rng.randn(B, 16, 3).astype(np.float32) * 1.5
pts = jnp.asarray(
    centers[:, rng.randint(0, 16, cfg.point_num)]
    + rng.randn(B, cfg.point_num, 3).astype(np.float32) * 0.25)
vars_ = model.init(jax.random.PRNGKey(0), pts[:1], train=True)

def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters

orig_route = grouping._pallas_bq_route

for samlp in ("on", "off"):
    for bq in ("pallas", "xla"):
        dispatch.set_samlp(samlp)
        grouping._pallas_bq_route = orig_route if bq == "pallas" else (lambda *a: False)
        f = jax.jit(lambda p: model.apply(vars_, p, train=False, mutable=False))
        t = timeit(lambda: f(pts))
        print(f"samlp={samlp:3s} bq={bq:6s}  {t*1e3:7.2f} ms  ({B/t:6.1f} scenes/s)", flush=True)

grouping._pallas_bq_route = orig_route
dispatch.set_samlp("on")
# B=1 serving
p1 = pts[:1]
f1 = jax.jit(lambda p: model.apply(vars_, p, train=False, mutable=False))
t1 = timeit(lambda: f1(p1))
print(f"B=1 serving: {t1*1e3:.2f} ms ({1/t1:.1f} scenes/s)", flush=True)
