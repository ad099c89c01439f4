"""Rasterizer + lighting golden tests (SURVEY.md section 4: golden-array
tests for the rasterizer and lighting kernels, runnable on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs import world as W
from render_engine_tpu.logic import kinematics as K
from render_engine_tpu.math.camera import CameraBuilder
from render_engine_tpu.models import primitives
from render_engine_tpu.models.bank import ModelBankBuilder, NUM_LOV_BANDS
from render_engine_tpu.render import lighting as L
from render_engine_tpu.render import skybox as SB
from render_engine_tpu.render.gbuffer import empty_gbuffer
from render_engine_tpu.render.geometry import (
    TriangleBatch,
    build_triangle_batch,
    to_screen,
)
from render_engine_tpu.render.raster_jnp import (
    RasterConfig,
    rasterize_depth_winner,
    render_gbuffer,
)

H, WIDTH = 32, 128  # one 8x128 tile column, 4 rows
CFG = RasterConfig(tile_budget=16, max_tiles_per_tri=8, global_budget=8,
                   chunk=4)


def manual_batch(tris, z=None, budget=8):
    """Build a TriangleBatch from raw pixel-space triangles (N, 3, 2)."""
    tris = np.asarray(tris, np.float32)
    n = len(tris)
    t = budget
    xy = np.zeros((t, 3, 2), np.float32)
    xy[:n] = tris
    zz = np.zeros((t, 3), np.float32)
    if z is not None:
        zz[:n] = z
    valid = np.zeros(t, bool)
    valid[:n] = True
    ones3 = np.ones((t, 3), np.float32)
    return TriangleBatch(
        xy=jnp.asarray(xy),
        z=jnp.asarray(zz),
        inv_w=jnp.asarray(ones3),
        world_pos=jnp.zeros((t, 3, 3), jnp.float32),
        normal=jnp.zeros((t, 3, 3), jnp.float32),
        uv=jnp.zeros((t, 3, 2), jnp.float32),
        material=jnp.zeros(t, jnp.int32),
        entity=jnp.zeros(t, jnp.int32),
        valid=jnp.asarray(valid),
        transparent=jnp.zeros(t, bool),
        total_requested=jnp.int32(n),
    )


class TestRasterizer:
    def test_single_triangle_coverage(self):
        # right triangle covering the top-left corner
        batch = manual_batch([[[0.0, 0.0], [16.0, 0.0], [0.0, 16.0]]])
        depth, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        winner = np.asarray(winner)
        assert winner[2, 2] == 0  # inside
        assert winner[14, 14] == -1  # outside the hypotenuse
        assert winner[2, 40] == -1  # right of the triangle
        # roughly half the 16x16 bbox is covered
        cov = (winner[:16, :16] >= 0).sum()
        assert 100 <= cov <= 156

    def test_depth_test_nearer_wins(self):
        tri = [[0.0, 0.0], [32.0, 0.0], [0.0, 32.0]]
        batch = manual_batch([tri, tri], z=[[0.5] * 3, [-0.5] * 3])
        depth, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        assert int(winner[4, 4]) == 1
        np.testing.assert_allclose(float(depth[4, 4]), -0.5, atol=1e-5)

    def test_winding_insensitive(self):
        cw = [[0.0, 0.0], [0.0, 16.0], [16.0, 0.0]]
        batch = manual_batch([cw])
        _, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        assert int(winner[2, 2]) == 0

    def test_big_triangle_global_list(self):
        # covers every tile -> overflows max_tiles_per_tri -> global list
        big = [[-10.0, -10.0], [300.0, -10.0], [-10.0, 80.0]]
        batch = manual_batch([big])
        _, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        w = np.asarray(winner)
        assert (w >= 0).mean() > 0.5  # most of the screen covered

    def test_depth_interpolation(self):
        # z varies across the triangle: check linear interpolation
        tri = [[0.0, 0.0], [64.0, 0.0], [0.0, 64.0]]
        batch = manual_batch([tri], z=[[0.0, 1.0, 0.0]])
        depth, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        # at x=32 (halfway to vertex 1) depth ~ 0.5
        assert abs(float(depth[0, 32]) - 0.5) < 0.02

    def test_empty_batch(self):
        batch = manual_batch(np.zeros((0, 3, 2)))
        depth, winner = rasterize_depth_winner(batch, H, WIDTH, CFG)
        assert (np.asarray(winner) == -1).all()
        assert (np.asarray(depth) == 1.0).all()

    def test_overflow_drops_farthest(self):
        """Budget overflow keeps NEAR triangles (near-first bin ordering):
        with budget 2, the two nearest of four stacked triangles survive."""
        tri = [[0.0, 0.0], [24.0, 0.0], [0.0, 24.0]]
        batch = manual_batch(
            [tri, tri, tri, tri],
            z=[[0.8] * 3, [-0.5] * 3, [0.3] * 3, [-0.9] * 3],
        )
        cfg = dataclasses.replace(CFG, tile_budget=2)
        depth, winner = rasterize_depth_winner(batch, H, WIDTH, cfg)
        # nearest (id 3, z=-0.9) must win despite overflow
        assert int(winner[2, 2]) == 3
        np.testing.assert_allclose(float(depth[2, 2]), -0.9, atol=1e-5)

    def test_determinism(self):
        rng = np.random.default_rng(5)
        tris = rng.uniform(0, 120, (6, 3, 2)).astype(np.float32)
        zs = rng.uniform(-0.9, 0.9, (6, 3)).astype(np.float32)
        batch = manual_batch(tris, z=zs)
        d1, w1 = rasterize_depth_winner(batch, H, WIDTH, CFG)
        d2, w2 = rasterize_depth_winner(batch, H, WIDTH, CFG)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def scene_world(model_id, bank, pos=(64.0, 64.0, 59.0), scale=1.0):
    cfg = W.WorldConfig(capacity=8, world_length=128.0, section_length=16.0)
    w = W.create_world(cfg)
    w, _ = W.spawn_host(
        w, 1,
        position=np.array([pos], np.float32),
        model_id=np.array([model_id], np.int32),
        scale=np.full((1, 3), scale, np.float32),
    )
    return K.refresh_transforms(w, bank.aabb_min, bank.aabb_max,
                                jnp.asarray(w.alive))


def front_camera():
    """At (64,64,64) looking -z toward the entity at z=59."""
    return (
        CameraBuilder()
        .with_position(64.0, 64.0, 64.0)
        .with_yaw_pitch_degrees(-90.0, 0.0)
        .with_fov_degrees(60.0)
        .with_aspect(WIDTH / H)
        .with_near_far(0.1, 100.0)
        .with_draw_distance(100.0)
        .build()
    )


class TestGeometryStage:
    def _bank(self):
        bb = ModelBankBuilder()
        m = bb.add_material(albedo=(1.0, 0.0, 0.0))
        bb.add_model("cube", primitives.cube(1.0), material=m)
        bb.add_model("quad", primitives.quad(1.0), material=m)
        return bb.finalize()

    def test_quad_projects_to_screen_center(self):
        bank = self._bank()
        w = scene_world(1, bank)  # quad faces +z toward the camera
        batch = build_triangle_batch(w, bank, front_camera(), max_tris=64)
        batch = to_screen(batch, WIDTH, H)
        assert int(batch.total_requested) == 2
        xy = np.asarray(batch.xy[:2])
        # quad center should land at the screen center
        assert abs(xy.mean(axis=(0, 1))[0] - WIDTH / 2) < 1.0
        assert abs(xy.mean(axis=(0, 1))[1] - H / 2) < 1.0

    def test_frustum_cull_drops_entity(self):
        bank = self._bank()
        w = scene_world(1, bank, pos=(64.0, 64.0, 80.0))  # behind camera
        batch = build_triangle_batch(w, bank, front_camera(), max_tris=64)
        assert int(batch.total_requested) == 0

    def test_budget_overflow_counts(self):
        bank = self._bank()
        w = scene_world(0, bank)  # cube: 12 tris
        batch = build_triangle_batch(w, bank, front_camera(), max_tris=4)
        assert int(batch.total_requested) == 12
        assert int(jnp.sum(batch.valid)) <= 4

    def test_lov_band_selection(self):
        bb = ModelBankBuilder()
        full = bb.add_model("rock", primitives.uv_sphere(0.5, 8, 12))
        coarse = bb.add_model("rock_lod", primitives.icosahedron(0.5))
        bb.set_levels_of_view(full, [full, full, coarse, coarse, coarse, coarse])
        bank = bb.finalize()
        mid = jnp.array([full, full], jnp.int32)
        near_far = jnp.array([5.0, 90.0], jnp.float32)
        got = np.asarray(bank.lov_model_id(mid, near_far, 100.0))
        assert got[0] == full  # 5% of draw distance -> band 0
        assert got[1] == coarse  # 90% -> beyond last band


class TestEndToEndRender:
    def test_cube_renders_red_lit_pixels(self):
        bb = ModelBankBuilder()
        m = bb.add_material(albedo=(1.0, 0.0, 0.0))
        bb.add_model("cube", primitives.cube(2.0), material=m)
        bank = bb.finalize()
        w = scene_world(0, bank)
        # directional light shining -z (onto the cube's +z face)
        w, _ = W.spawn_host(
            w, 1,
            position=np.array([[64.0, 64.0, 70.0]], np.float32),
            sortable=np.array([R.SORTABLE_DIRECTIONAL], np.int32),
            light_direction=np.array([[0.0, 0.0, -1.0]], np.float32),
            light_diffuse=np.full((1, 3), 0.9, np.float32),
            light_specular=np.zeros((1, 3), np.float32),
            light_ambient=np.full((1, 3), 0.1, np.float32),
        )
        cam = front_camera()
        batch = to_screen(
            build_triangle_batch(w, bank, cam, max_tris=64), WIDTH, H)
        gbuf = render_gbuffer(batch, bank, H, WIDTH, CFG)
        lights = L.extract_lights(w, max_dir=2, max_point=4, max_spot=2)
        img = L.shade(gbuf, lights, bank, cam.position)
        img = np.asarray(img)
        center = img[H // 2, WIDTH // 2]
        assert center[0] > 0.5  # lit red face (ambient .1 + diffuse .9)
        assert center[1] < 0.05 and center[2] < 0.05
        # background stays black
        assert img[0, 0].sum() == 0.0
        # gbuffer normal at center faces +z
        np.testing.assert_allclose(
            np.asarray(gbuf.normal)[H // 2, WIDTH // 2], [0, 0, 1], atol=1e-4)

    def test_point_light_attenuation(self):
        gb = empty_gbuffer(4, 128)
        gb = dataclasses.replace(
            gb,
            tri_id=jnp.zeros((4, 128), jnp.int32),
            material=jnp.zeros((4, 128), jnp.int32),
            normal=jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0]), (4, 128, 3)),
            albedo=jnp.ones((4, 128, 3), jnp.float32),
            position=jnp.stack(
                [jnp.broadcast_to(jnp.arange(128.0), (4, 128)),
                 jnp.zeros((4, 128)), jnp.zeros((4, 128))], axis=-1),
        )
        lights = L.LightArrays(
            dir_direction=jnp.zeros((0, 3)), dir_diffuse=jnp.zeros((0, 3)),
            dir_specular=jnp.zeros((0, 3)), dir_ambient=jnp.zeros((0, 3)),
            dir_count=jnp.int32(0), dir_entity=jnp.zeros(0, jnp.int32),
            pt_position=jnp.array([[0.0, 0.0, 5.0]]),
            pt_diffuse=jnp.ones((1, 3)),
            pt_specular=jnp.zeros((1, 3)),
            pt_ambient=jnp.zeros((1, 3)),
            pt_atten=jnp.array([[0.1, 0.01]]),
            pt_radius=jnp.zeros(1), pt_count=jnp.int32(1),  # 0 = unbounded
            pt_entity=jnp.zeros(1, jnp.int32),
            sp_position=jnp.zeros((0, 3)), sp_direction=jnp.zeros((0, 3)),
            sp_diffuse=jnp.zeros((0, 3)), sp_specular=jnp.zeros((0, 3)),
            sp_ambient=jnp.zeros((0, 3)), sp_atten=jnp.zeros((0, 2)),
            sp_cutoff=jnp.zeros((0, 2)), sp_count=jnp.int32(0),
            sp_entity=jnp.zeros(0, jnp.int32),
        )

        class FakeBank:
            mat_emissive = jnp.zeros(1)
            mat_alpha = jnp.ones(1)
            mat_specular = jnp.ones(1)
            mat_specular_eff = jnp.ones(1)

            def uniform_shininess(self):
                return 64.0

        img = np.asarray(L.shade(gb, lights, FakeBank(),
                                 jnp.array([0.0, 0.0, 10.0])))
        # brightness decreases with distance from x=0 (sample near pixels so
        # the attenuated value stays above the diffuse floor)
        assert img[0, 0, 0] > img[0, 4, 0] > img[0, 10, 0]
        # far pixels bottom out at the no-light diffuse floor
        np.testing.assert_allclose(img[0, 120, 0], L.DIFFUSE_FLOOR, atol=1e-6)

    def test_emissive_bypasses_lighting(self):
        bb = ModelBankBuilder()
        m = bb.add_material(albedo=(1.0, 0.8, 0.5), emissive=6.0)
        bb.add_model("star", primitives.cube(2.0), material=m)
        bank = bb.finalize()
        w = scene_world(0, bank)
        cam = front_camera()
        batch = to_screen(
            build_triangle_batch(w, bank, cam, max_tris=64), WIDTH, H)
        gbuf = render_gbuffer(batch, bank, H, WIDTH, CFG)
        lights = L.extract_lights(w, max_dir=1, max_point=1, max_spot=1)
        img = np.asarray(L.shade(gbuf, lights, bank, cam.position))
        # emissive = albedo * 6 regardless of zero lights
        np.testing.assert_allclose(
            img[H // 2, WIDTH // 2], [6.0, 4.8, 3.0], rtol=1e-5)


class TestSkybox:
    def test_face_selection_centers(self):
        cm = np.zeros((6, 8, 8, 3), np.float32)
        for f in range(6):
            cm[f, :, :, :] = (f + 1) / 6.0
        cm = jnp.asarray(cm)
        dirs = jnp.array([
            [1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0],
            [0, -1.0, 0], [0, 0, 1.0], [0, 0, -1.0],
        ])
        got = np.asarray(SB.sample_cubemap(cm, dirs))
        for f in range(6):
            np.testing.assert_allclose(got[f], (f + 1) / 6.0, atol=1e-5)

    def test_ray_directions(self):
        cam = front_camera()
        dirs = np.asarray(SB.pixel_ray_directions(cam, H, WIDTH))
        center = dirs[H // 2, WIDTH // 2]
        np.testing.assert_allclose(center, [0, 0, -1], atol=0.05)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   atol=1e-5)

    def test_cubemap_rows_matches_gather_sampler(self):
        """The row-gather cubemap sampler (one contiguous row per pixel)
        reproduces the 4-tap golden sampler exactly — same coordinate math,
        same edge clamp, same combine order."""
        rng = np.random.default_rng(3)
        cm = jnp.asarray(rng.uniform(0, 1, (6, 16, 16, 3)).astype(np.float32))
        d = rng.normal(size=(500, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs = jnp.asarray(d)
        golden = np.asarray(SB.sample_cubemap(cm, dirs))
        fast = np.asarray(SB.sample_cubemap_rows(SB.cubemap_rows(cm), dirs))
        np.testing.assert_allclose(fast, golden, atol=1e-6)

    def test_cubemap_rows_background_in_frame(self):
        """background_for dispatches a CubemapRows skybox through the full
        frame path."""
        cam = front_camera()
        cm = SB.cubemap_rows(SB.starfield_cubemap(size=32, stars_per_face=20))
        bg = np.asarray(SB.background_for(cam, cm, H, WIDTH))
        assert bg.shape == (H, WIDTH, 3)
        assert np.isfinite(bg).all()
        # deep-space base color everywhere stars are absent
        assert bg.min() >= 0.0 and bg.max() <= 1.0

    def test_starfield_splats(self):
        """A star straight ahead lands at the screen center; one behind the
        camera does not draw."""
        cam = front_camera()
        stars = SB.Starfield(
            dirs=jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]),
            colors=jnp.array([[1.0, 1.0, 1.0], [1.0, 0.0, 0.0]]),
        )
        bg = np.asarray(SB.starfield_background(cam, stars, H, WIDTH))
        assert bg.shape == (H, WIDTH, 3)
        center = bg[H // 2, WIDTH // 2]
        assert center.min() >= 0.99  # the forward star
        assert not (bg[:, :, 0] > 0.5).sum() > 8  # behind-star never drawn
        base = np.asarray(SB.SPACE_BASE_COLOR)
        np.testing.assert_allclose(bg[0, 0], base, atol=1e-6)

    def test_starfield_deterministic(self):
        a = SB.make_starfield(64, seed=3)
        b = SB.make_starfield(64, seed=3)
        np.testing.assert_array_equal(np.asarray(a.dirs), np.asarray(b.dirs))
