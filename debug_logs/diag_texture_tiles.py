"""Why does the TPU report ~2106 textured-candidate tiles (texture_tile_
overflow 1944) when the CPU reports ~0 on the same trajectory?

Steps the bench trajectory (render=False), then decomposes the
texture_tile_overflow diagnostic: textured triangle count, their screen
extents, per-tile candidate membership. Run on TPU (default) or --cpu."""
import sys

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.logic.types import InputState, KEY_S, KEY_W

eng = build_space_engine(width=1920, height=1080, capacity=1 << 14,
                         num_asteroids=10000, max_tris=16384)
eng.config.record_history = False
print("platform:", jax.devices()[0].platform, file=sys.stderr, flush=True)
for i in range(3):
    eng.frame(InputState.idle(i).with_keys(KEY_W), dt=1 / 60, render=False)
fidx = 100
for key in (KEY_W, KEY_S, KEY_S):
    for i in range(50):
        eng.frame(InputState.idle(fidx).with_keys(key), dt=1 / 60,
                  render=False)
        fidx += 1

from render_engine_tpu.render import raster_pallas as RP
from render_engine_tpu.render.geometry import build_triangle_batch, to_screen
from render_engine_tpu.render.raster_jnp import _bin_triangles

world, bank, cam = eng.world, eng.bank, eng.camera
settings = eng.config.render
systems = eng.compiled_systems
cfg = settings.raster

@jax.jit
def diag(world, camera):
    batch = build_triangle_batch(world, bank, camera,
                                 max_tris=settings.max_tris, systems=systems)
    batch = to_screen(batch, settings.width, settings.height)
    tiles_x = -(-settings.width // cfg.tile_w)
    tiles_y = -(-settings.height // cfg.tile_h)
    tri_class = jnp.where(batch.valid,
                          jnp.where(batch.transparent, 2.0, 1.0), 0.0)
    cand, counts = RP._candidate_table(batch, cfg, tiles_x, tiles_y,
                                       tri_class)
    tri_tex = (bank.mat_texture[jnp.clip(
        batch.material, 0, bank.mat_texture.shape[0] - 1)] >= 0) & batch.valid
    tex_cand = jnp.any((cand >= 0)
                       & tri_tex[jnp.clip(cand, 0, batch.budget - 1)], axis=1)
    n_tex_tri = jnp.sum(tri_tex.astype(jnp.int32))
    n_valid = jnp.sum(batch.valid.astype(jnp.int32))
    n_transp_tex = jnp.sum((tri_tex & batch.transparent).astype(jnp.int32))
    # screen extents of textured triangles
    sx = batch.xy[..., 0]
    sy = batch.xy[..., 1]
    big = jnp.where(tri_tex[:, None], sx, jnp.nan)
    return (jnp.sum(tex_cand.astype(jnp.int32)), n_tex_tri, n_valid,
            n_transp_tex, cand.shape[0],
            jnp.nanmin(big), jnp.nanmax(big),
            jnp.nanmin(jnp.where(tri_tex[:, None], sy, jnp.nan)),
            jnp.nanmax(jnp.where(tri_tex[:, None], sy, jnp.nan)),
            jnp.sum((tex_cand[:cand.shape[0] // 2]).astype(jnp.int32)),
            counts.max())

out = diag(eng.world, eng.camera)
names = ["tex_cand tiles", "textured tris", "valid tris",
         "textured transparent tris", "cand table rows (classes*NT)",
         "tex sx min", "tex sx max", "tex sy min", "tex sy max",
         "tex_cand tiles in first half", "max tile count"]
for n, v in zip(names, out):
    print(f"{n}: {np.asarray(v)}")
print("drop stats:", {k: v for k, v in eng.drop_stats().items() if v})
