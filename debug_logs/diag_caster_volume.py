"""Replicate the headline bench's step trajectory and diagnose any nonzero
shadow_caster_outside_volume (seen on TPU in bench_r4_defaults112.log:
133 at the final snapshot, while the same trajectory on CPU measures 0 —
chaotic FP divergence over 153 collisionful frames, or a TPU-specific
numeric issue in the fitted-camera frustum test; this dumps which).

Runs on the default platform (axon TPU here); pass --cpu to force CPU.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.ecs import registry as R
from render_engine_tpu.logic.types import InputState, KEY_S, KEY_W
from render_engine_tpu.math import transforms as T_
from render_engine_tpu.render import shadows as SHD
from render_engine_tpu.world import culling

eng = build_space_engine(width=1920, height=1080, capacity=1 << 14,
                         num_asteroids=10000, max_tris=16384)
eng.config.record_history = False

print("platform:", jax.devices()[0].platform, file=sys.stderr, flush=True)

@jax.jit
def count_both(world):
    out = []
    for ent in (0, 1):
        pv = SHD.light_proj_view(world, jnp.int32(ent))
        out.append(SHD.casters_outside_volume(world, jnp.int32(ent), pv))
    return jnp.stack(out)

for i in range(3):
    eng.frame(InputState.idle(i).with_keys(KEY_W), dt=1 / 60, render=False)
fidx = 100
for key in (KEY_W, KEY_S, KEY_W):
    for i in range(50):
        eng.frame(InputState.idle(fidx).with_keys(key), dt=1 / 60,
                  render=False)
        fidx += 1
print("final counts per light:", np.asarray(count_both(eng.world)))

world = eng.world
for ent in (0, 1):
    e = jnp.int32(ent)
    spv = SHD.light_proj_view(world, e)
    cap = world.capacity
    pos = world["position"][e]
    radius = world["light_radius"][e]
    radius = jnp.where(radius > 0.0, radius, jnp.float32(200.0))
    sortable = world["sortable"][e]
    mn, mx = world["aabb_min"], world["aabb_max"]
    caster = (world.alive & (world["model_id"] >= 0)
              & (jnp.arange(cap) != e))
    relevant = caster & culling.within_distance(pos, mn, mx, radius)
    is_spot = sortable == R.SORTABLE_SPOT
    direction = world["light_direction"][e]
    direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-6)
    cos_outer = world["light_cutoff"][e][1]
    center = 0.5 * (mn + mx)
    to_c = center - pos[None]
    dist = jnp.maximum(jnp.linalg.norm(to_c, axis=-1), 1e-6)
    cosang = jnp.sum(to_c * direction[None], axis=-1) / dist
    in_cone = cosang >= cos_outer
    relevant = relevant & jnp.where(is_spot & (cos_outer > 1e-3),
                                    in_cone, True)
    relevant = relevant & ~(sortable == R.SORTABLE_POINT)
    in_vol = culling.aabb_in_frustum(T_.frustum_planes(spv), mn, mx)
    bad = np.asarray(relevant & ~in_vol)
    idx = np.nonzero(bad)[0]
    print(f"light {ent}: counted {len(idx)} "
          f"(pos {np.asarray(pos)}, cos_outer {float(cos_outer):.3f}, "
          f"radius {float(radius):.0f})")
    c_np, d_np = np.asarray(center), np.asarray(dist)
    ca = np.asarray(cosang)
    mn_np, mx_np = np.asarray(mn), np.asarray(mx)
    dirn = np.asarray(direction)
    posn = np.asarray(pos)
    for i in idx[:10]:
        pts = np.array([[mn_np[i][0] if a == 0 else mx_np[i][0],
                         mn_np[i][1] if b == 0 else mx_np[i][1],
                         mn_np[i][2] if c == 0 else mx_np[i][2]]
                        for a in range(2) for b in range(2)
                        for c in range(2)])
        z = (pts - posn[None]) @ dirn
        print(f"  ent {i}: dist={d_np[i]:.2f} cos={ca[i]:.3f} "
              f"z_axis=[{z.min():.2f},{z.max():.2f}] "
              f"span={np.linalg.norm(mx_np[i] - mn_np[i]):.2f}")

print("drop stats:", eng.drop_stats())
