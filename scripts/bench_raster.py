"""Rasterizer micro-benchmark: jnp vs Pallas on the current backend.

Synthetic load: N random small triangles at a given resolution.
Run on TPU (default backend here is the axon chip):
    python scripts/bench_raster.py [ntris] [width] [height]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from render_engine_tpu.render.geometry import TriangleBatch
from render_engine_tpu.render.raster_jnp import (
    RasterConfig,
    rasterize_depth_winner,
)
from render_engine_tpu.render.raster_pallas import (
    rasterize_depth_winner_pallas,
)


def synthetic_batch(n, width, height, tri_px=18.0, seed=0):
    rng = np.random.default_rng(seed)
    anchor = rng.uniform([0, 0], [width, height], (n, 1, 2))
    offs = rng.uniform(-tri_px, tri_px, (n, 3, 2))
    xy = (anchor + offs).astype(np.float32)
    z = rng.uniform(-0.9, 0.9, (n, 1)).astype(np.float32).repeat(3, 1)
    return TriangleBatch(
        xy=jnp.asarray(xy),
        z=jnp.asarray(z),
        inv_w=jnp.ones((n, 3), jnp.float32),
        world_pos=jnp.zeros((n, 3, 3), jnp.float32),
        normal=jnp.zeros((n, 3, 3), jnp.float32),
        uv=jnp.zeros((n, 3, 2), jnp.float32),
        material=jnp.zeros(n, jnp.int32),
        entity=jnp.zeros(n, jnp.int32),
        valid=jnp.ones(n, bool),
        transparent=jnp.zeros(n, bool),
        total_requested=jnp.int32(n),
    )


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    print(f"backend={jax.default_backend()} n={n} {width}x{height}")
    cfg = RasterConfig()
    batch = synthetic_batch(n, width, height)

    f_jnp = jax.jit(lambda b: rasterize_depth_winner(b, height, width, cfg))
    f_pls = jax.jit(
        lambda b: rasterize_depth_winner_pallas(b, height, width, cfg))

    t_jnp, (d1, w1) = timeit(f_jnp, batch)
    print(f"jnp   : {t_jnp*1e3:8.2f} ms")
    t_pls, (d2, w2) = timeit(f_pls, batch)
    print(f"pallas: {t_pls*1e3:8.2f} ms  (speedup {t_jnp/t_pls:.2f}x)")

    same_w = np.array_equal(np.asarray(w1), np.asarray(w2))
    d1n, d2n = np.asarray(d1), np.asarray(d2)
    same_d = np.allclose(d1n, d2n, atol=1e-6)
    print(f"winner equal: {same_w}; depth close: {same_d}")
    if not same_w:
        diff = (np.asarray(w1) != np.asarray(w2)).mean()
        print(f"  winner mismatch fraction: {diff:.6f}")


if __name__ == "__main__":
    main()
