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


class TestCompiledSystems:
    """The Engine-integrated fast path: systems as data on one fused pass."""

    def _pallas_settings(self):
        return RenderSettings(
            width=WIDTH, height=H, max_tris=64, backend="pallas",
            raster=RasterConfig(tile_budget=16, max_tiles_per_tri=8,
                                global_budget=8, chunk=4),
        )

    def test_identity_systems_match_no_systems(self):
        from render_engine_tpu.render.frame import render_frame
        from render_engine_tpu.render.render_system import compile_systems

        w, bank, cam, cube, star = scene()
        ident = compile_systems(
            (RenderSystemBuilder("all")
             .with_models(*range(bank.num_models)).build(),), bank)
        s = self._pallas_settings()
        a = np.asarray(render_frame(w, cam, bank, s))
        b = np.asarray(render_frame(w, cam, bank, s, systems=ident))
        np.testing.assert_array_equal(a, b)

    def test_unrouted_models_not_drawn(self):
        from render_engine_tpu.render.frame import render_frame
        from render_engine_tpu.render.render_system import compile_systems

        w, bank, cam, cube, star = scene()
        only_star = compile_systems(
            (RenderSystemBuilder("s").with_models(star).build(),), bank)
        s = self._pallas_settings()
        img = np.asarray(render_frame(w, cam, bank, s, systems=only_star))
        # the red cube (left half) is not bound to any system -> background
        assert not (img[:, :WIDTH // 2, 0] > 0.3).any()
        # the star (right half) still draws (at the no-light diffuse
        # floor: 0.08 * albedo 0.5 = 0.04)
        assert (img[:, WIDTH // 2:, :] > 0.03).any()

    def test_unlit_boost_and_tint_uniform(self):
        from render_engine_tpu.render.frame import render_frame
        from render_engine_tpu.render.render_system import compile_systems

        w, bank, cam, cube, star = scene()
        systems = compile_systems((
            RenderSystemBuilder("lit").with_models(cube)
            .write_uniform("albedo_tint", (0.0, 0.0, 1.0)).build(),
            RenderSystemBuilder("glow").with_models(star)
            .with_lighting(False).with_emissive_boost(0.5).build(),
        ), bank)
        s = self._pallas_settings()
        img = np.asarray(render_frame(w, cam, bank, s, systems=systems))
        base = np.asarray(render_frame(w, cam, bank, s))
        # tint kills the cube's red channel
        assert (base[:, :WIDTH // 2, 0] > img[:, :WIDTH // 2, 0] + 0.01).any()
        # unlit star = albedo * 0.5 exactly where covered
        star_region = img[:, WIDTH // 2:, :]
        got = star_region[star_region[..., 0] > 0.1]
        if got.size:
            np.testing.assert_allclose(got[:, 0], 0.25, atol=1e-3)

    def test_unknown_uniform_rejected(self):
        from render_engine_tpu.render.render_system import compile_systems

        w, bank, cam, cube, star = scene()
        sys_ = (RenderSystemBuilder("x").with_models(cube)
                .write_uniform("brightness", 6.0).build())
        with pytest.raises(ValueError, match="unknown uniform"):
            compile_systems((sys_,), bank)

    def test_model_in_two_systems_rejected(self):
        from render_engine_tpu.render.render_system import compile_systems

        w, bank, cam, cube, star = scene()
        with pytest.raises(ValueError, match="two render systems"):
            compile_systems((
                RenderSystemBuilder("a").with_models(cube).build(),
                RenderSystemBuilder("b").with_models(cube).build(),
            ), bank)

    def test_engine_demo_uses_systems(self, engine_factory):
        from render_engine_tpu.logic.types import InputState

        eng = engine_factory(width=128, height=32, capacity=64,
                             num_asteroids=6, max_tris=2048)
        eng.config.record_history = False
        assert eng.compiled_systems is not None
        assert eng.compiled_systems.names == ("default", "light_sources")
        img = eng.frame(InputState.idle(0), render=True)
        assert np.isfinite(np.asarray(img)).all()
        # the star (unlit boost 6 on emissive-1 material) saturates
        assert float(np.asarray(img).max()) > 0.9
