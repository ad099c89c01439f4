"""Spatial grid + culling tests, golden-checked against brute force
(SURVEY.md section 7 build phase 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from render_engine_tpu.ecs import world as W
from render_engine_tpu.math.camera import CameraBuilder
from render_engine_tpu.world import culling
from render_engine_tpu.world import grid as G


def cfg(capacity=64, world=64.0, section=8.0):
    return W.WorldConfig(capacity=capacity, world_length=world,
                         section_length=section)


class TestSectionKeys:
    def test_key_packing_roundtrip(self):
        c = cfg()
        pos = jnp.array([[0.5, 0.5, 0.5], [9.0, 17.0, 33.0], [63.9, 63.9, 63.9]])
        keys = G.section_key(pos, c)
        coords = G.unpack_key(keys, c)
        np.testing.assert_array_equal(coords, [[0, 0, 0], [1, 2, 4], [7, 7, 7]])

    def test_out_of_bounds_clamps(self):
        c = cfg()
        pos = jnp.array([[-5.0, 0.0, 0.0], [100.0, 100.0, 100.0]])
        keys = G.section_key(pos, c)
        coords = np.asarray(G.unpack_key(keys, c))
        assert (coords >= 0).all() and (coords <= 7).all()

    def test_neighbor_cells(self):
        c = cfg()
        center = G.section_key(jnp.array([[12.0, 12.0, 12.0]]), c)  # cell(1,1,1)
        nk = np.asarray(G.neighbor_cell_keys(center, c))[0]
        assert len(set(nk.tolist())) == 27
        # corner cell: clamped neighbors collapse to 8 distinct
        corner = G.section_key(jnp.array([[0.0, 0.0, 0.0]]), c)
        nk2 = np.asarray(G.neighbor_cell_keys(corner, c))[0]
        assert len(set(nk2.tolist())) == 8


class TestGridIndex:
    def _world_with_positions(self, positions, c=None):
        c = c or cfg()
        w = W.create_world(c)
        pos = np.asarray(positions, np.float32)
        w, idx = W.spawn_host(w, len(pos), position=pos)
        # AABBs: small boxes around positions
        w = w.replace(
            aabb_min=w["position"] - 0.5,
            aabb_max=w["position"] + 0.5,
        )
        return w

    def test_build_sorts_dead_last(self):
        w = self._world_with_positions([[1, 1, 1], [60, 60, 60], [9, 9, 9]])
        g = G.build_grid(w)
        sk = np.asarray(g.sorted_keys)
        assert (np.diff(sk) >= 0).all()
        assert sk[3] == np.iinfo(np.int32).max  # dead slots at the end

    def test_neighbor_candidates_vs_brute_force(self):
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, 64, (40, 3)).astype(np.float32)
        c = cfg(capacity=64)
        w = self._world_with_positions(pos, c)
        g = G.build_grid(w)
        cand, valid = G.neighbor_candidates(g, g.keys, c, per_cell_budget=8)
        cand, valid = np.asarray(cand), np.asarray(valid)
        # brute force: every pair within one cell (8 units) in every axis
        # must appear in the candidate set of each member
        cell = np.floor(pos / 8.0).astype(int)
        for i in range(40):
            expected = {
                j for j in range(40)
                if j != i and np.all(np.abs(cell[j] - cell[i]) <= 1)
            }
            got = set(cand[i][valid[i]].tolist()) - {i}
            # got may include i's own-cell dupes but must cover expected
            assert expected <= got, f"entity {i}: missing {expected - got}"

    def test_occupied_section_count(self):
        w = self._world_with_positions([[1, 1, 1], [1.5, 1, 1], [60, 60, 60]])
        g = G.build_grid(w)
        assert int(G.occupied_section_count(g)) == 2


class TestCulling:
    def _camera(self):
        return (
            CameraBuilder()
            .with_position(0.0, 0.0, 0.0)
            .with_yaw_pitch_degrees(-90.0, 0.0)
            .with_fov_degrees(90.0)
            .with_aspect(1.0)
            .with_near_far(0.1, 50.0)
            .build()
        )

    def test_frustum_vs_bruteforce_corners(self):
        cam = self._camera()
        planes = cam.frustum_planes()
        rng = np.random.default_rng(1)
        centers = rng.uniform(-60, 60, (200, 3)).astype(np.float32)
        mn = jnp.asarray(centers - 1.0)
        mx = jnp.asarray(centers + 1.0)
        got = np.asarray(culling.aabb_in_frustum(planes, mn, mx))

        # brute force: sample the box densely; if any sample is inside all
        # planes the box must be reported visible (p-vertex test is exact
        # for AABBs so also check the converse via corner test)
        p = np.asarray(planes)
        from render_engine_tpu.math import aabb as A
        corners = np.asarray(A.corners(mn, mx))  # (200,8,3)
        d = corners @ p[:, :3].T + p[:, 3]  # (200,8,6)
        # exact p-vertex equivalent: box outside iff some plane has all
        # corners below it
        outside = (d < 0).all(axis=1).any(axis=-1)
        np.testing.assert_array_equal(got, ~outside)

    def test_distance_sphere(self):
        center = jnp.zeros(3)
        mn = jnp.array([[1.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
        mx = mn + 1.0
        got = culling.within_distance(center, mn, mx, 5.0)
        assert bool(got[0]) and not bool(got[1])

    def test_visible_mask_unions_sphere(self):
        cam = self._camera()
        c = cfg(world=256.0, section=16.0)
        w = W.create_world(c)
        # one entity behind the camera but near; one ahead; one far behind
        pos = np.array([[0, 0, 5], [0, 0, -10], [0, 0, 200]], np.float32)
        w, _ = W.spawn_host(w, 3, position=pos)
        w = w.replace(aabb_min=w["position"] - 0.5, aabb_max=w["position"] + 0.5)
        vis = np.asarray(culling.visible_mask(w, cam, logic_radius=8.0))
        assert vis[0]  # behind but within logic sphere
        assert vis[1]  # in frustum
        assert not vis[2]  # far and out of frustum
