"""Near-plane clipping tests: triangles crossing the camera plane render
their in-front portion instead of vanishing."""

import jax.numpy as jnp
import numpy as np

from render_engine_tpu.ecs import world as W
from render_engine_tpu.logic import kinematics as K
from render_engine_tpu.math.camera import CameraBuilder
from render_engine_tpu.models import primitives
from render_engine_tpu.models.bank import ModelBankBuilder
from render_engine_tpu.render.geometry import build_triangle_batch, to_screen
from render_engine_tpu.render.raster_jnp import (
    RasterConfig,
    rasterize_depth_winner,
)

H, WIDTH = 32, 128
CFG = RasterConfig(tile_budget=32, max_tiles_per_tri=8, global_budget=16,
                   chunk=4)


def setup(pos_z, length):
    """A long box straddling the camera plane along z."""
    bb = ModelBankBuilder()
    m = bb.add_material(albedo=(1.0, 0.0, 0.0))
    v, n, uv, f = primitives.cube(1.0)
    v = v * np.array([2.0, 2.0, length], np.float32)  # stretch along z
    bb.add_model("beam", (v, n, uv, f), material=m)
    bank = bb.finalize()
    cfg = W.WorldConfig(capacity=4, world_length=256.0, section_length=32.0)
    w = W.create_world(cfg)
    w, _ = W.spawn_host(
        w, 1,
        position=np.array([[64.0, 64.0, pos_z]], np.float32),
        model_id=np.array([0], np.int32),
    )
    w = K.refresh_transforms(w, bank.aabb_min, bank.aabb_max,
                             jnp.asarray(w.alive))
    cam = (CameraBuilder().with_position(64.0, 64.0, 64.0)
           .with_yaw_pitch_degrees(-90.0, 0.0).with_fov_degrees(60.0)
           .with_aspect(WIDTH / H).with_near_far(0.5, 100.0)
           .with_draw_distance(100.0).build())
    return w, bank, cam


class TestNearClip:
    def test_straddling_geometry_still_renders(self):
        # beam from z=44 to z=84: the camera at z=64 is INSIDE it; without
        # clipping every side face would be dropped
        w, bank, cam = setup(pos_z=64.0, length=20.0)
        batch = to_screen(
            build_triangle_batch(w, bank, cam, max_tris=64), WIDTH, H)
        depth, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        covered = (np.asarray(winner) >= 0).mean()
        assert covered > 0.5, f"only {covered:.2%} covered"

    def test_fully_in_front_unaffected(self):
        w, bank, cam = setup(pos_z=55.0, length=3.0)  # z in [52, 58]
        batch = to_screen(
            build_triangle_batch(w, bank, cam, max_tris=64), WIDTH, H)
        d1, w1 = rasterize_depth_winner(batch, H, WIDTH, CFG)
        assert (np.asarray(w1) >= 0).any()
        # no clipping artifacts: all 12 tris remain valid
        assert int(batch.valid.sum()) == 12

    def test_fully_behind_dropped(self):
        w, bank, cam = setup(pos_z=80.0, length=3.0)  # behind the camera
        batch = build_triangle_batch(w, bank, cam, max_tris=64)
        assert int(batch.valid.sum()) == 0

    def test_clip_produces_valid_interpolation(self):
        """Clipped vertices sit exactly on the near plane; attributes stay
        finite and depth within [-1, 1]."""
        w, bank, cam = setup(pos_z=64.0, length=20.0)
        batch = to_screen(
            build_triangle_batch(w, bank, cam, max_tris=64), WIDTH, H)
        v = np.asarray(batch.valid)
        assert np.isfinite(np.asarray(batch.xy)[v]).all()
        assert np.isfinite(np.asarray(batch.world_pos)[v]).all()
        z = np.asarray(batch.z)[v]
        assert (z >= -1.0 - 1e-3).all() and (z <= 1.0 + 1e-3).all()
