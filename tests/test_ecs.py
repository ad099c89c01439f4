"""ECS tests: mirror the reference's 12 inline ECS tests (ecs.rs:953-1367):
register/write/read/remove, free-list reuse, bitset values, multi-component
queries, type markers, double-delete safety, serialize round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from render_engine_tpu.ecs import changes as C
from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs import world as W


def small_config(**kw):
    return W.WorldConfig(capacity=16, world_length=64.0, section_length=8.0, **kw)


class TestWorldBasics:
    def test_create_empty(self):
        w = W.create_world(small_config())
        assert int(w.count_alive()) == 0
        assert w.comps["position"].shape == (16, 3)
        assert w.comps["transform"].shape == (16, 4, 4)
        np.testing.assert_allclose(w.comps["transform"][0], np.eye(4))
        np.testing.assert_allclose(w.comps["orientation"][:, 0], 1.0)
        assert int(w.comps["model_id"][0]) == -1

    def test_spawn_and_read(self):
        w = W.create_world(small_config())
        w, idx = W.spawn_host(
            w, 3,
            position=np.array([[1, 0, 0], [2, 0, 0], [3, 0, 0]], np.float32),
            type_id=np.array([7, 7, 9], np.int32),
        )
        assert list(idx) == [0, 1, 2]
        assert int(w.count_alive()) == 3
        np.testing.assert_allclose(w["position"][1], [2, 0, 0])

    def test_component_bitset(self):
        w = W.create_world(small_config())
        w, idx = W.spawn_host(w, 1, position=np.zeros((1, 3), np.float32),
                              velocity=np.ones((1, 3), np.float32))
        reg = w.config.registry
        expected = reg.bit("position") | reg.bit("velocity")
        assert int(w.comp_mask[idx[0]]) == expected

    def test_query_intersection(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 2, position=np.zeros((2, 3), np.float32))
        w, _ = W.spawn_host(w, 2, position=np.zeros((2, 3), np.float32),
                            velocity=np.zeros((2, 3), np.float32))
        both = w.has_components("position", "velocity")
        assert int(jnp.sum(both)) == 2
        pos_only = w.has_components("position")
        assert int(jnp.sum(pos_only)) == 4

    def test_type_markers(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 3, type_id=np.array([1, 2, 1], np.int32))
        assert int(jnp.sum(w.of_type(1))) == 2
        assert int(jnp.sum(w.of_type(2))) == 1

    def test_free_list_reuse(self):
        """Despawned slots are reused first (ecs.rs free-list test analogue)."""
        w = W.create_world(small_config())
        w, idx = W.spawn_host(w, 4, type_id=np.full(4, 1, np.int32))
        kill = jnp.zeros(16, bool).at[1].set(True)
        w = W.despawn(w, kill)
        assert int(w.count_alive()) == 3
        w, idx2 = W.spawn_host(w, 1, type_id=np.full(1, 5, np.int32))
        assert idx2[0] == 1  # reused slot
        assert int(w["type_id"][1]) == 5

    def test_double_delete_safe(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 2, type_id=np.full(2, 1, np.int32))
        kill = jnp.zeros(16, bool).at[0].set(True)
        w = W.despawn(w, kill)
        w = W.despawn(w, kill)  # again — must be a no-op
        assert int(w.count_alive()) == 1

    def test_user_entity(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 2, flags=np.array(
            [0, int(R.FLAG_USER)], np.uint32))
        assert int(w.user_index()) == 1

    def test_sortable_buckets(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 3, sortable=np.array(
            [R.SORTABLE_DEFAULT, R.SORTABLE_POINT, R.SORTABLE_POINT], np.int32))
        assert int(jnp.sum(w.sortable_mask(R.SORTABLE_POINT))) == 2

    def test_snapshot_restore_roundtrip(self):
        """The load-bearing test for playback (cf. ecs.rs
        serialize_and_deserialize :1338)."""
        cfg = small_config()
        w = W.create_world(cfg)
        w, _ = W.spawn_host(
            w, 2,
            position=np.array([[1, 2, 3], [4, 5, 6]], np.float32),
            type_id=np.array([3, 4], np.int32),
        )
        snap = W.snapshot(w)
        w2 = W.restore(cfg, snap)
        for k in w.comps:
            np.testing.assert_array_equal(np.asarray(w.comps[k]),
                                          np.asarray(w2.comps[k]))
        np.testing.assert_array_equal(np.asarray(w.alive), np.asarray(w2.alive))
        np.testing.assert_array_equal(np.asarray(w.comp_mask),
                                      np.asarray(w2.comp_mask))

    def test_capacity_exhaustion_raises(self):
        w = W.create_world(small_config())
        with pytest.raises(ValueError):
            W.spawn_host(w, 17)

    def test_custom_component_registration(self):
        """Custom components (the AngleRelativeSun pattern, asteroid.rs:87)."""
        reg = R.ComponentRegistry(
            custom=(R.ComponentSpec("angle_relative_sun", (), "float32"),))
        cfg = small_config(registry=reg)
        w = W.create_world(cfg)
        w, _ = W.spawn_host(w, 1, angle_relative_sun=np.array([0.5], np.float32))
        assert float(w["angle_relative_sun"][0]) == 0.5
        assert int(jnp.sum(w.has_components("angle_relative_sun"))) == 1


class TestChangeSet:
    def test_masked_update(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 3, position=np.zeros((3, 3), np.float32))
        cs = C.empty_changeset(w)
        mask = jnp.zeros(16, bool).at[1].set(True)
        vals = jnp.broadcast_to(jnp.array([9.0, 9.0, 9.0]), (16, 3))
        cs = C.with_update(cs, "position", vals, mask)
        w2 = C.apply_changeset(w, cs)
        np.testing.assert_allclose(w2["position"][1], [9, 9, 9])
        np.testing.assert_allclose(w2["position"][0], [0, 0, 0])

    def test_update_merge_later_wins(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 1, position=np.zeros((1, 3), np.float32))
        cs = C.empty_changeset(w)
        m = jnp.zeros(16, bool).at[0].set(True)
        cs = C.with_update(cs, "position",
                           jnp.full((16, 3), 1.0), m)
        cs = C.with_update(cs, "position",
                           jnp.full((16, 3), 2.0), m)
        w2 = C.apply_changeset(w, cs)
        np.testing.assert_allclose(w2["position"][0], [2, 2, 2])

    def test_flags_set_clear(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 2, flags=np.zeros(2, np.uint32))
        cs = C.empty_changeset(w)
        m0 = jnp.zeros(16, bool).at[0].set(True)
        cs = C.with_flags(cs, set_mask=m0, set_bits=R.FLAG_STATIC)
        w2 = C.apply_changeset(w, cs)
        assert bool(w2.flag_set(R.FLAG_STATIC)[0])
        cs2 = C.with_flags(C.empty_changeset(w2), clear_mask=m0,
                           clear_bits=R.FLAG_STATIC)
        w3 = C.apply_changeset(w2, cs2)
        assert not bool(w3.flag_set(R.FLAG_STATIC)[0])

    def test_owned_entity_cascade(self):
        """Killing a parent kills its owned children (ecs.rs owned graph)."""
        w = W.create_world(small_config())
        w, pidx = W.spawn_host(w, 1, type_id=np.array([1], np.int32))
        w, cidx = W.spawn_host(
            w, 2,
            type_id=np.full(2, 2, np.int32),
            parent=np.full(2, pidx[0], np.int32),
        )
        cs = C.with_despawn(C.empty_changeset(w),
                            jnp.zeros(16, bool).at[pidx[0]].set(True))
        w2 = C.apply_changeset(w, cs)
        assert int(w2.count_alive()) == 0  # parent + both children

    def test_despawn_via_changeset(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 2)
        cs = C.with_despawn(C.empty_changeset(w),
                            jnp.zeros(16, bool).at[0].set(True))
        w2 = C.apply_changeset(w, cs)
        assert int(w2.count_alive()) == 1

    def test_spawn_batch_under_jit(self):
        """AddEntity inside the jitted step: fixed-budget spawn queue."""
        cfg = small_config()
        w = W.create_world(cfg)
        w, _ = W.spawn_host(w, 2, type_id=np.full(2, 1, np.int32))

        @jax.jit
        def step(world):
            cs = C.empty_changeset(world, spawn_budget=4)
            row_mask = jnp.array([True, True, False, False])
            cs = C.queue_spawn(
                cs, world.config.registry, row_mask,
                position=jnp.broadcast_to(jnp.array([5.0, 5.0, 5.0]), (4, 3)),
                type_id=jnp.full(4, 42, jnp.int32),
            )
            return C.apply_changeset(world, cs)

        w2 = step(w)
        assert int(w2.count_alive()) == 4
        spawned = np.asarray(w2.of_type(42))
        assert spawned.sum() == 2
        for i in np.flatnonzero(spawned):
            np.testing.assert_allclose(w2["position"][i], [5, 5, 5])
            reg = cfg.registry
            assert int(w2.comp_mask[i]) == reg.bits("position", "type_id")

    def test_spawn_non_prefix_rows(self):
        """Two queue_spawn calls into disjoint NON-prefix row sets: both
        requested spawns land (rows are compacted by validity rank, not
        drained as a scalar prefix count)."""
        cfg = small_config()
        w = W.create_world(cfg)
        cs = C.empty_changeset(w, spawn_budget=4)
        cs = C.queue_spawn(
            cs, cfg.registry, jnp.array([False, True, False, False]),
            type_id=jnp.full(4, 7, jnp.int32),
        )
        cs = C.queue_spawn(
            cs, cfg.registry, jnp.array([False, False, False, True]),
            type_id=jnp.full(4, 8, jnp.int32),
            position=jnp.broadcast_to(jnp.array([3.0, 2.0, 1.0]), (4, 3)),
        )
        w2 = C.apply_changeset(w, cs)
        assert int(w2.count_alive()) == 2
        assert int(jnp.sum(w2.of_type(7))) == 1
        assert int(jnp.sum(w2.of_type(8))) == 1
        i8 = int(np.flatnonzero(np.asarray(w2.of_type(8)))[0])
        np.testing.assert_allclose(w2["position"][i8], [3, 2, 1])

    def test_spawn_respects_capacity(self):
        cfg = small_config()
        w = W.create_world(cfg)
        w, _ = W.spawn_host(w, 15, type_id=np.full(15, 1, np.int32))
        cs = C.empty_changeset(w, spawn_budget=4)
        cs = C.queue_spawn(
            cs, cfg.registry, jnp.array([True, True, True, True]),
            type_id=jnp.full(4, 9, jnp.int32),
        )
        w2 = C.apply_changeset(w, cs)
        # only 1 free slot: exactly one spawn lands, none overwrite alive slots
        assert int(w2.count_alive()) == 16
        assert int(jnp.sum(w2.of_type(9))) == 1
        assert int(jnp.sum(w2.of_type(1))) == 15

    def test_world_is_jittable_pytree(self):
        w = W.create_world(small_config())
        w, _ = W.spawn_host(w, 3, position=np.ones((3, 3), np.float32))

        @jax.jit
        def bump(world: W.World):
            return world.replace(position=world["position"] + 1.0)

        w2 = bump(w)
        np.testing.assert_allclose(w2["position"][0], [2, 2, 2])

    def test_despawn_cascades_transitively_in_one_frame(self):
        """A 3-deep ownership chain dies in ONE frame (pointer-doubling
        cascade; the reference's owned graph, ecs.rs:145-181)."""
        w = W.create_world(small_config())
        w, a = W.spawn_host(w, 1)
        w, b = W.spawn_host(w, 1, parent=np.asarray(a, np.int32))
        w, c = W.spawn_host(w, 1, parent=np.asarray(b, np.int32))
        w, d = W.spawn_host(w, 1, parent=np.asarray(c, np.int32))
        kill = jnp.zeros(16, bool).at[a[0]].set(True)
        w2 = C.apply_changeset(w, C.with_despawn(C.empty_changeset(w), kill))
        assert int(w2.count_alive()) == 0, "4-deep chain must die in 1 frame"

    def test_referenced_edges_add_remove_no_cascade(self):
        """Referenced (non-owning) edges: set semantics, budget, and NO
        deletion cascade (ecs.rs:150-181)."""
        w = W.create_world(small_config())
        w, idx = W.spawn_host(w, 3)
        owner = int(idx[0])
        omask = jnp.zeros(16, bool).at[owner].set(True)
        other = jnp.full(16, int(idx[1]), jnp.int32)

        cs = C.with_add_reference(C.empty_changeset(w), w, omask, other)
        w2 = C.apply_changeset(w, cs)
        assert int(jnp.sum(w2["ref_edges"][owner] == idx[1])) == 1
        # duplicate add is a no-op
        cs = C.with_add_reference(C.empty_changeset(w2), w2, omask, other)
        w3 = C.apply_changeset(w2, cs)
        assert int(jnp.sum(w3["ref_edges"][owner] == idx[1])) == 1
        # referenced entity dying does NOT kill the owner
        kill = jnp.zeros(16, bool).at[int(idx[1])].set(True)
        w4 = C.apply_changeset(w3, C.with_despawn(C.empty_changeset(w3), kill))
        assert bool(w4.alive[owner])
        # remove edge
        cs = C.with_remove_reference(C.empty_changeset(w4), w4, omask, other)
        w5 = C.apply_changeset(w4, cs)
        assert int(jnp.sum(w5["ref_edges"][owner] == idx[1])) == 0
