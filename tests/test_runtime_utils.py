"""Engine utilities: scan-batched frames, input history, stage profiling."""

import jax.numpy as jnp
import numpy as np

from render_engine_tpu.logic.types import InputState, KEY_W, NUM_KEYS
from render_engine_tpu.runtime.profiling import StageTimer

# matches test_parallel.PAR_KW -> shares the session-cached engine build
ENGINE_KW = dict(width=128, height=64, capacity=64, num_asteroids=8,
                 max_tris=1024)


class TestPackedInputWire:
    """pack_with_dt/unpack_with_dt: the ONE-transfer dispatch vector must
    round-trip bit-exactly (keys, mouse, dt, and uint32 seeds above 2^24 —
    a float round-trip of the raw seed would silently diverge replay)."""

    def test_round_trip_exact(self):
        import jax

        inp = InputState.idle(seed=0xDEADBEEF).with_keys(KEY_W, 3)
        inp = InputState(
            keys=inp.keys,
            mouse_delta=np.array([0.1234567, -3.25], np.float32),
            rng_seed=np.uint32(0xDEADBEEF),
            prev_keys=np.arange(NUM_KEYS) % 2 == 0,
        )
        dt = np.float32(1 / 144)
        vec = inp.pack_with_dt(dt)
        out, dt2 = jax.jit(InputState.unpack_with_dt)(vec)
        assert np.array_equal(np.asarray(out.keys), inp.keys)
        assert np.array_equal(np.asarray(out.prev_keys), inp.prev_keys)
        assert np.array_equal(np.asarray(out.mouse_delta), inp.mouse_delta)
        assert int(out.rng_seed) == 0xDEADBEEF
        assert np.float32(dt2) == dt

    def test_seed_edge_values(self):
        for seed in (0, 1, 2**24 + 1, 2**31 - 1, 2**32 - 1):
            inp = InputState.idle(seed=seed)
            out, _ = InputState.unpack_with_dt(
                jnp.asarray(inp.pack_with_dt(1 / 60)))
            assert int(out.rng_seed) == seed, seed


class TestInputHistory:
    def test_pressed_held_released(self):
        prev = jnp.zeros(NUM_KEYS, bool).at[KEY_W].set(True)
        cur = InputState.idle(0).with_keys(KEY_W).with_prev(prev)
        assert bool(cur.held(KEY_W))
        assert not bool(cur.pressed(KEY_W))
        fresh = InputState.idle(0).with_keys(KEY_W)
        assert bool(fresh.pressed(KEY_W))
        up = InputState.idle(0).with_prev(prev)
        assert bool(up.released(KEY_W))

    def test_serialize_rng_seed_bit_exact(self):
        """uint32 seeds above 2^24 survive the history round-trip
        (bit-view, not float cast — replay divergence guard)."""
        import dataclasses

        for seed in (0, 1, 2**24 + 1, 2**31 + 12345, 2**32 - 1):
            s = dataclasses.replace(InputState.idle(0),
                                    rng_seed=np.uint32(seed))
            rt = InputState.deserialize(s.serialize())
            assert int(rt.rng_seed) == seed, (seed, int(rt.rng_seed))

    def test_engine_threads_prev_keys(self, engine_factory):
        eng = engine_factory(**ENGINE_KW)
        eng.config.record_history = False
        eng.frame(InputState.idle(0).with_keys(KEY_W), render=False)
        assert bool(eng._prev_keys[KEY_W])
        eng.frame(InputState.idle(1), render=False)
        assert not bool(eng._prev_keys[KEY_W])


class TestRunFrames:
    def test_scan_batch_advances(self, engine_factory):
        eng = engine_factory(**ENGINE_KW)
        eng.config.record_history = False
        before = np.asarray(eng.world["position"]).copy()
        inputs = [InputState.idle(i).with_keys(KEY_W) for i in range(4)]
        eng.run_frames(inputs, [1 / 30] * 4)
        after = np.asarray(eng.world["position"])
        assert not np.array_equal(before, after)
        assert eng.frame_index == 4

    def test_scan_matches_sequential(self, engine_factory):
        """Same math, one dispatch (allclose, not bitwise — different
        compiled program)."""
        a = engine_factory(**ENGINE_KW)
        a.config.record_history = False
        b = engine_factory(slot=1, **ENGINE_KW)
        b.config.record_history = False
        inputs = [InputState.idle(i) for i in range(3)]
        for inp in inputs:
            a.frame(inp, 1 / 30, render=False)
        b.run_frames(inputs, [1 / 30] * 3)
        np.testing.assert_allclose(
            np.asarray(a.world["position"]), np.asarray(b.world["position"]),
            rtol=1e-5, atol=1e-5,
        )


class TestPackedBoundaryState:
    """The camera/shadow boundary codecs (engine round-5b wire): lazily-
    unpacked properties must be bit-exact, a re-finalize must repack the
    CURRENT state (bench_lights rebuilds jit fns through finalize_scene),
    and a camera static-config change must rebuild the programs."""

    def test_shadow_state_codec_round_trip(self):
        import jax.numpy as jnp

        from render_engine_tpu.render import shadows as SH

        sh = SH.create_shadow_state(resolution=16, budget=3, pcf_scale=2)
        sh = SH.ShadowState(
            maps=sh.maps, maps_pcf=sh.maps_pcf,
            light_mats=jnp.arange(3 * 16, dtype=jnp.float32).reshape(3, 4, 4),
            slot_entity=jnp.array([5, -1, 2 ** 20], jnp.int32),
            slot_face=jnp.array([0, 3, 5], jnp.int32),
            cursor=jnp.int32(7), tick=jnp.int32(123456),
            resolution=16, pcf_scale=2)
        out = SH.unpack_shadow_state(*SH.pack_shadow_state(sh), sh)
        assert np.array_equal(np.asarray(out.light_mats),
                              np.asarray(sh.light_mats))
        assert np.array_equal(np.asarray(out.slot_entity),
                              np.asarray(sh.slot_entity))
        assert np.array_equal(np.asarray(out.slot_face),
                              np.asarray(sh.slot_face))
        assert int(out.cursor) == 7 and int(out.tick) == 123456
        assert out.resolution == 16 and out.pcf_scale == 2

    def test_refinalize_keeps_state(self, engine_factory):
        # dedicated slot: re-finalize rebuilds jits on the cached engine
        eng = engine_factory(slot=7, **ENGINE_KW)
        eng.config.record_history = False
        eng.frame(InputState.idle(0).with_keys(KEY_W), 1 / 30)
        pos = np.asarray(eng.world["position"]).copy()
        cam_pos = np.asarray(eng.camera.position).copy()
        eng.finalize_scene()  # the bench_lights rebuild pattern
        # NOTE: finalize re-runs refresh_transforms but position columns
        # are untouched; camera state must survive the repack bit-exactly
        assert np.array_equal(np.asarray(eng.camera.position), cam_pos)
        assert np.array_equal(np.asarray(eng.world["position"]), pos)
        img = eng.frame(InputState.idle(1), 1 / 30)
        assert img is not None

    def test_camera_meta_change_rebuilds_and_applies(self, engine_factory):
        # dedicated slot: draw_distance mutation is non-resettable config
        eng = engine_factory(slot=8, **ENGINE_KW)
        eng.config.record_history = False
        eng.frame(InputState.idle(0), 1 / 30)
        old_fused = eng._frame_fused
        eng.set_draw_distances(draw_distance=123.0)
        # static camera config is baked into the traces -> fresh programs
        assert eng._frame_fused is not old_fused
        assert float(eng.camera.draw_distance) == 123.0
        img = eng.frame(InputState.idle(1), 1 / 30)
        assert img is not None


class TestStageTimer:
    def test_ewma_report(self):
        t = StageTimer()
        for _ in range(3):
            with t.stage("logic"):
                pass
            with t.stage("render", sync=jnp.ones(4)):
                pass
        rep = t.report()
        assert set(rep) == {"logic", "render"}
        assert all(v >= 0 for v in rep.values())
        assert "logic=" in t.hud_line()


class TestDropCounters:
    def test_starved_budgets_report_nonzero(self, engine_factory):
        """Deliberately starved triangle budget reports drops; a healthy
        scene reports zero (the observable-truncation contract)."""
        eng = engine_factory(width=128, height=32, capacity=64,
                             num_asteroids=12, max_tris=64)
        eng.config.record_history = False
        eng.frame(InputState.idle(0), render=False)
        drops = eng.drop_stats()
        assert drops["triangle_budget_dropped"] > 0

        eng2 = engine_factory(width=128, height=32, capacity=64,
                              num_asteroids=4, max_tris=8192)
        eng2.config.record_history = False
        eng2.frame(InputState.idle(0), render=False)
        d2 = eng2.drop_stats()
        assert d2["triangle_budget_dropped"] == 0
        assert set(d2) >= {"collision_query_dropped",
                           "collision_cell_dropped", "spawn_dropped",
                           "oob_killed", "tile_candidate_dropped"}

    def test_fps_stats_includes_drops(self, engine_factory):
        eng = engine_factory(**ENGINE_KW)
        eng.config.record_history = False
        eng.frame(InputState.idle(0), render=False)
        stats = eng.fps_stats()
        assert "drops" in stats and isinstance(stats["drops"], dict)


class TestFpsLimiter:
    def test_cap_sleeps_to_budget(self):
        import time

        from render_engine_tpu.runtime.host_loop import FpsLimiter

        lim = FpsLimiter(50.0)  # 20 ms budget
        t0 = time.perf_counter()
        for _ in range(5):
            lim.wait()
        took = time.perf_counter() - t0
        assert took >= 0.08  # 5 frames at >=20ms when work is instant

    def test_over_budget_frames_do_not_sleep(self):
        import time

        from render_engine_tpu.runtime.host_loop import FpsLimiter

        lim = FpsLimiter(1000.0)
        time.sleep(0.01)  # frame took longer than the 1ms budget
        assert lim.wait() == 0.0

    def test_uncapped(self):
        from render_engine_tpu.runtime.host_loop import FpsLimiter

        assert FpsLimiter(None).wait() == 0.0
