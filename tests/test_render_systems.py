"""Render-system API tests: builder contract, multi-system G-buffer merge,
unlit emissive boost, per-system model routing."""

import jax.numpy as jnp
import numpy as np
import pytest

from render_engine_tpu.ecs import world as W
from render_engine_tpu.logic import kinematics as K
from render_engine_tpu.math.camera import CameraBuilder
from render_engine_tpu.models import primitives
from render_engine_tpu.models.bank import ModelBankBuilder
from render_engine_tpu.render.frame import RenderSettings
from render_engine_tpu.render.raster_jnp import RasterConfig
from render_engine_tpu.render.render_system import (
    RenderSystemBuilder,
    render_frame_systems,
)

H, WIDTH = 32, 128


def scene():
    bb = ModelBankBuilder()
    red = bb.add_material(albedo=(1.0, 0.0, 0.0))
    glow = bb.add_material(albedo=(0.5, 0.5, 0.5))
    cube = bb.add_model("cube", primitives.cube(1.5), material=red)
    star = bb.add_model("star", primitives.cube(1.5), material=glow)
    bank = bb.finalize()

    cfg = W.WorldConfig(capacity=8, world_length=128.0, section_length=16.0)
    w = W.create_world(cfg)
    w, _ = W.spawn_host(
        w, 2,
        position=np.array([[62.0, 64.0, 59.0], [66.0, 64.0, 59.0]],
                          np.float32),
        model_id=np.array([cube, star], np.int32),
    )
    w = K.refresh_transforms(w, bank.aabb_min, bank.aabb_max,
                             jnp.asarray(w.alive))
    cam = (CameraBuilder().with_position(64.0, 64.0, 64.0)
           .with_yaw_pitch_degrees(-90.0, 0.0).with_fov_degrees(60.0)
           .with_aspect(WIDTH / H).with_near_far(0.1, 100.0)
           .with_draw_distance(100.0).build())
    return w, bank, cam, cube, star


SETTINGS = RenderSettings(
    width=WIDTH, height=H, max_tris=64, backend="jnp",
    raster=RasterConfig(tile_budget=16, max_tiles_per_tri=8, global_budget=8,
                        chunk=4),
)


class TestBuilder:
    def test_requires_models(self):
        with pytest.raises(ValueError):
            RenderSystemBuilder("empty").build()

    def test_uniform_type_check(self):
        b = RenderSystemBuilder("x").with_models(0)
        with pytest.raises(TypeError):
            b.write_uniform("bad", object())
        b.write_uniform("brightness", 6.0)
        assert b.build().uniforms == (("brightness", 6.0),)

    def test_chain(self):
        rs = (RenderSystemBuilder("stars").with_models(1)
              .with_lighting(False).with_emissive_boost(6.0)
              .with_levels_of_view(False).build())
        assert rs.emissive_boost == 6.0 and not rs.lit and not rs.casts_lov


class TestMultiSystem:
    def test_two_systems_share_gbuffer(self):
        w, bank, cam, cube, star = scene()
        lit = RenderSystemBuilder("default").with_models(cube).build()
        stars = (RenderSystemBuilder("stars").with_models(star)
                 .with_lighting(False).with_emissive_boost(6.0).build())
        img = np.asarray(render_frame_systems(
            w, cam, bank, (lit, stars), SETTINGS))
        # cube center projects to ~px 53, star center to ~px 84
        left = img[H // 2, 50]
        assert left[0] > 0.0 and left[1] == 0.0  # red under diffuse floor
        # unlit boosted star — gray * 6 clipped to 1
        right = img[H // 2, 75]
        np.testing.assert_allclose(right, [1.0, 1.0, 1.0], atol=1e-5)

    def test_system_model_routing(self):
        """A system only draws its own models."""
        w, bank, cam, cube, star = scene()
        only_cube = RenderSystemBuilder("c").with_models(cube).build()
        img = np.asarray(render_frame_systems(
            w, cam, bank, (only_cube,), SETTINGS))
        right = img[H // 2, 75]
        assert right.sum() == 0.0  # star not drawn

    def test_single_system_matches_filter(self):
        w, bank, cam, cube, star = scene()
        both = RenderSystemBuilder("all").with_models(cube, star).build()
        img = np.asarray(render_frame_systems(
            w, cam, bank, (both,), SETTINGS))
        assert img[H // 2, 50].sum() > 0
        assert img[H // 2, 75].sum() > 0
