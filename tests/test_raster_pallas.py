"""Pallas rasterizer: bit-equivalence with the jnp reference (interpret mode
on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax.numpy as jnp

from render_engine_tpu.render.raster_jnp import (
    RasterConfig,
    rasterize_depth_winner,
)
from render_engine_tpu.render.raster_pallas import (
    rasterize_depth_winner_pallas,
    rasterize_two_pass_pallas,
)
from tests.test_render import manual_batch, H, WIDTH

CFG = RasterConfig(tile_budget=16, max_tiles_per_tri=8, global_budget=8,
                   chunk=4)


def both(batch, h=H, w=WIDTH, cfg=CFG):
    d1, w1 = rasterize_depth_winner(batch, h, w, cfg)
    d2, w2 = rasterize_depth_winner_pallas(batch, h, w, cfg, interpret=True)
    return (np.asarray(d1), np.asarray(w1)), (np.asarray(d2), np.asarray(w2))


class TestPallasEquivalence:
    def test_single_triangle(self):
        batch = manual_batch([[[0.0, 0.0], [16.0, 0.0], [0.0, 16.0]]])
        (d1, w1), (d2, w2) = both(batch)
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_allclose(d1, d2, atol=1e-6)

    def test_random_scene(self):
        rng = np.random.default_rng(11)
        tris = rng.uniform(-10, 140, (7, 3, 2)).astype(np.float32)
        zs = rng.uniform(-0.95, 0.95, (7, 3)).astype(np.float32)
        batch = manual_batch(tris, z=zs)
        (d1, w1), (d2, w2) = both(batch)
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_allclose(d1, d2, atol=1e-6)

    def test_overlapping_depth_order(self):
        tri = [[0.0, 0.0], [40.0, 0.0], [0.0, 40.0]]
        batch = manual_batch([tri, tri, tri],
                             z=[[0.3] * 3, [-0.7] * 3, [0.0] * 3])
        (d1, w1), (d2, w2) = both(batch)
        np.testing.assert_array_equal(w1, w2)
        assert int(w2[3, 3]) == 1

    def test_two_pass_matches_separate_calls(self):
        """Fused opaque+transparent launch == two masked rasterizations."""
        import dataclasses
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        tris = rng.uniform(0, 120, (6, 3, 2)).astype(np.float32)
        zs = rng.uniform(-0.9, 0.9, (6, 3)).astype(np.float32)
        batch = manual_batch(tris, z=zs)
        transparent = jnp.asarray(
            np.array([0, 1, 0, 1, 0, 0, 0, 0], bool))
        batch = dataclasses.replace(batch, transparent=transparent)

        d, w, td, tw_ = rasterize_two_pass_pallas(
            batch, H, WIDTH, CFG, interpret=True)
        d1, w1 = rasterize_depth_winner(batch, H, WIDTH, CFG,
                                        ~batch.transparent)
        d2, w2 = rasterize_depth_winner(batch, H, WIDTH, CFG,
                                        batch.transparent)
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(tw_), np.asarray(w2))
        np.testing.assert_allclose(np.asarray(d), np.asarray(d1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(td), np.asarray(d2), atol=1e-6)

    def test_global_list_big_triangle(self):
        big = [[-10.0, -10.0], [300.0, -10.0], [-10.0, 80.0]]
        small = [[4.0, 4.0], [12.0, 4.0], [4.0, 12.0]]
        batch = manual_batch([big, small], z=[[0.5] * 3, [-0.5] * 3])
        (d1, w1), (d2, w2) = both(batch)
        np.testing.assert_array_equal(w1, w2)
        assert int(w2[5, 5]) == 1  # small tri in front where they overlap
        assert int(w2[20, 60]) == 0  # big tri elsewhere
