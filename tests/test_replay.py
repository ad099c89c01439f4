"""Record/replay tests: disk roundtrip, bit-deterministic replay, 5-mode
playback state machine, detached camera, continue-past-end, crash flush.

The reference's de-facto integration test is its playback system
(SURVEY.md section 4); here it is an actual test suite."""

import numpy as np
import pytest

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.logic.types import (
    InputState,
    KEY_ESC,
    KEY_INSERT,
    KEY_RIGHT,
    KEY_UP,
    KEY_W,
)
from render_engine_tpu.runtime.history import HistoryLog
from render_engine_tpu.runtime.replay import PlaybackMode, Player
from render_engine_tpu.runtime.supervisor import Supervisor
from render_engine_tpu.utils.hashing import world_hash

ENGINE_KW = dict(width=128, height=32, capacity=128, num_asteroids=10,
                 max_tris=2048)


@pytest.fixture(scope="module")
def recorded(tmp_path_factory, engine_factory):
    """One live run of 5 frames, flushed to disk."""
    d = str(tmp_path_factory.mktemp("hist"))
    eng = engine_factory(**ENGINE_KW)
    eng.config.history_dir = d
    hashes = []
    for i in range(5):
        eng.frame(InputState.idle(i).with_keys(KEY_W), 1 / 30, render=False)
        hashes.append(world_hash(eng.world))
    eng.flush_history()
    return d, hashes


class TestHistoryDisk:
    def test_roundtrip(self, recorded):
        d, _ = recorded
        log = HistoryLog.load(d)
        assert log.num_frames == 5
        inputs, dt = log.frame(0)
        assert bool(inputs.keys[KEY_W])
        assert abs(dt - 1 / 30) < 1e-6
        assert log.baseline_world["alive"].sum() > 0


class TestDeterministicReplay:
    def test_bitwise_replay(self, recorded, engine_factory):
        d, live_hashes = recorded
        log = HistoryLog.load(d)
        eng2 = engine_factory(slot=1, **ENGINE_KW)
        eng2.config.record_history = False
        player = Player(eng2, log)
        replay_hashes = player.replay_all(render=False)
        assert replay_hashes == live_hashes

    def test_fused_recording_replays_bitwise(self, tmp_path,
                                             engine_factory):
        """Recorded RENDERED frames advance through the fused frame
        program at full speed; the history stores the per-frame advance
        choice and replay drives the identical program sequence — hashes
        match bit-for-bit even across a mix of rendered (fused) and
        headless (step) frames and a disk roundtrip."""
        d = str(tmp_path / "hist_fused")
        eng = engine_factory(slot=2, **ENGINE_KW)
        eng.config.history_dir = d
        hashes = []
        renders = [True, True, False, True, False]
        for i, r in enumerate(renders):
            eng.frame(InputState.idle(i).with_keys(KEY_W), 1 / 30, render=r)
            hashes.append(world_hash(eng.world))
        eng.flush_history()

        log = HistoryLog.load(d)
        assert [log.advance_fused(i) for i in range(5)] == renders
        eng2 = engine_factory(slot=3, **ENGINE_KW)
        eng2.config.record_history = False
        player = Player(eng2, log)
        replay_hashes = player.replay_all(render=False)
        assert replay_hashes == hashes

    def test_replay_reaches_end_state(self, recorded, engine_factory):
        d, live_hashes = recorded
        log = HistoryLog.load(d)
        eng2 = engine_factory(slot=1, **ENGINE_KW)
        player = Player(eng2, log)
        player.replay_all(render=False)
        assert player.mode == PlaybackMode.DEBUG
        _, at_end = player.step(render=False)
        assert at_end


class TestPlaybackModes:
    def test_detach_and_reattach_camera(self, recorded, engine_factory):
        d, _ = recorded
        log = HistoryLog.load(d)
        eng = engine_factory(slot=1, **ENGINE_KW)
        player = Player(eng, log)
        player.step(InputState.idle(0).with_keys(KEY_ESC), render=False)
        assert player.mode == PlaybackMode.DEBUG_CUSTOM_MOVEMENT
        assert player.detached_camera is not None
        player.step(InputState.idle(0).with_keys(KEY_INSERT), render=False)
        assert player.mode == PlaybackMode.DEBUG
        assert player.detached_camera is None

    def test_detached_camera_free_flight(self, recorded, engine_factory):
        """WASD flies the detached camera (DCustomMovement,
        render_thread.rs:357-372 + input_macros.rs:1-53) with
        float_position inertia, while the replayed WORLD stays bit-exact:
        the per-frame hashes match the recorded run frame for frame."""
        d, live_hashes = recorded
        log = HistoryLog.load(d)
        eng = engine_factory(slot=1, **ENGINE_KW)
        eng.config.record_history = False
        player = Player(eng, log)
        player.step(InputState.idle(0).with_keys(KEY_ESC), render=False)
        hashes = [world_hash(eng.world)]
        p0 = np.asarray(player.detached_camera.position).copy()
        fwd0 = np.asarray(player.detached_camera.direction()).copy()
        while player.cursor < log.num_frames:
            player.step(InputState.idle(0).with_keys(KEY_W), render=False)
            hashes.append(world_hash(eng.world))
        p1 = np.asarray(player.detached_camera.position)
        moved = p1 - p0
        assert np.linalg.norm(moved) > 0.01  # the camera flew
        # along the camera forward axis
        assert np.dot(moved / np.linalg.norm(moved), fwd0) > 0.99
        # inertia persists: one key-less frame still coasts... but the
        # recording is exhausted, so check velocity directly
        assert np.linalg.norm(
            np.asarray(player.detached_camera.velocity)) > 0.0
        # world state identical to the recorded run, frame for frame
        assert hashes == live_hashes

    def test_continue_past_end(self, recorded, engine_factory):
        """Up steps one live frame past the recording; Right resumes RUN
        (render_thread.rs:344-355, 445-474)."""
        d, _ = recorded
        log = HistoryLog.load(d)
        eng = engine_factory(slot=1, **ENGINE_KW)
        player = Player(eng, log)
        player.replay_all(render=False)
        player.step(render=False)  # hits the end marker
        assert player.mode == PlaybackMode.ONE_PAST_LAST_FRAME
        h_before = world_hash(eng.world)
        player.step(InputState.idle(9).with_keys(KEY_UP), render=False)
        assert player.mode == PlaybackMode.ONE_PAST_LAST_PAUSE
        assert world_hash(eng.world) != h_before  # simulated one live frame
        player.step(InputState.idle(10).with_keys(KEY_RIGHT), render=False)
        assert player.mode == PlaybackMode.RUN


class TestSupervisor:
    def test_flush_on_crash(self, tmp_path, engine_factory):
        eng = engine_factory(**ENGINE_KW)
        eng.config.history_dir = str(tmp_path)
        with pytest.raises(RuntimeError):
            with Supervisor(eng) as sup:
                sup.tick(InputState.idle(0), render=False)
                sup.tick(InputState.idle(1), render=False)
                raise RuntimeError("simulated crash")
        # the crash frame's inputs are on disk and replayable
        log = HistoryLog.load(str(tmp_path))
        assert log.num_frames == 2
        assert sup.failed and "simulated crash" in sup.failure_info

    def test_nan_fault_detection(self, engine_factory):
        """Fault injection (SURVEY.md section 5): poison a component, assert
        the supervisor catches it."""
        import jax.numpy as jnp

        eng = engine_factory(**ENGINE_KW)
        eng.config.record_history = False
        sup = Supervisor(eng, nan_check_every=1)
        sup.tick(InputState.idle(0), render=False)
        eng.world = eng.world.replace(
            velocity=eng.world["velocity"].at[0, 0].set(jnp.nan))
        with pytest.raises(FloatingPointError):
            sup.check_state_health()

    def test_heartbeat(self, engine_factory):
        eng = engine_factory(**ENGINE_KW)
        eng.config.record_history = False
        sup = Supervisor(eng)
        sup.tick(InputState.idle(0), render=False)
        assert sup.heartbeat == 1
        assert sup.seconds_since_heartbeat() < 60.0


class TestConfigChangeReplay:
    def test_mid_recording_draw_distance_and_seed_roundtrip(self, tmp_path,
                                                            engine_factory):
        """A mid-recording draw-distance change + a 2^32-1 rng seed replay
        bit-identically (VERDICT items: DrawDistancesChange analogue +
        uint32 seed serialization)."""
        import dataclasses as dc

        d = str(tmp_path)
        eng = engine_factory(**ENGINE_KW)
        eng.config.history_dir = d
        hashes = []
        for i in range(6):
            if i == 3:
                # culling radius shrinks mid-recording -> different logic
                # masks from frame 3 on
                eng.set_draw_distances(draw_distance=200.0)
            seed = 2**32 - 1 if i == 2 else i
            inp = dc.replace(InputState.idle(i).with_keys(KEY_W),
                             rng_seed=np.uint32(seed))
            eng.frame(inp, 1 / 30, render=False)
            hashes.append(world_hash(eng.world))
        assert float(eng.camera.draw_distance) == 200.0
        eng.flush_history()

        eng2 = engine_factory(slot=1, **ENGINE_KW)
        from render_engine_tpu.runtime.history import HistoryLog

        player = Player(eng2, HistoryLog.load(d))
        got = player.replay_all(render=False)
        assert got == hashes
        assert float(eng2.camera.draw_distance) == 200.0

    def test_mid_recording_window_change(self, tmp_path, engine_factory):
        """WindowDimensionsChange analogue: resolution changes re-jit only
        the render; the replayed trajectory is unchanged and the replayed
        engine renders at the recorded new size."""
        d = str(tmp_path)
        # set_window mutates config.render (not restored by reset) ->
        # dedicated cache slots
        eng = engine_factory(slot="win0", **ENGINE_KW)
        eng.config.history_dir = d
        eng.frame(InputState.idle(0), 1 / 30, render=False)
        eng.set_window(64, 16)
        img = eng.frame(InputState.idle(1), 1 / 30, render=True)
        assert img.shape == (16, 64, 3)
        h_live = world_hash(eng.world)
        eng.flush_history()

        eng2 = engine_factory(slot="win1", **ENGINE_KW)
        from render_engine_tpu.runtime.history import HistoryLog

        player = Player(eng2, HistoryLog.load(d))
        player.step(render=False)
        img2, _ = player.step(render=True)
        assert img2.shape == (16, 64, 3)
        assert world_hash(eng2.world) == h_live


class TestChurnStress:
    def test_capacity_churn_replays_bitwise(self, engine_factory):
        """Integration stress: a near-capacity world where in-step spawning
        hits the ceiling (spawn backpressure) must still replay
        bit-identically, and the pressure must be visible in drop stats.

        28 slots hold the fixed population (2 stars + 20 asteroids +
        wormhole + producer + station + user = 26) plus two free; the mine
        producer fires every 4 frames at dt = 1.0, exhausting the free
        slots within the run (MINE_SPAWN_PERIOD = 4 s)."""
        kw = dict(width=64, height=16, capacity=28, num_asteroids=20,
                  max_tris=2048, spawn_budget=2)
        eng = engine_factory(**kw)
        hashes = []
        spawn_drops = 0
        for i in range(40):
            # large dt accelerates the producer's timer; varied keys churn
            # the user entity through the recorded input stream
            key = KEY_W if i % 3 else KEY_UP
            eng.frame(InputState.idle(i).with_keys(key), 1.0, render=False)
            hashes.append(world_hash(eng.world))
            if eng._last_drops is not None:
                from render_engine_tpu.logic.step import unpack_drop_stats
                spawn_drops += unpack_drop_stats(
                    eng._last_drops)["spawn_dropped"]
        alive = int(np.asarray(eng.world.alive).sum())
        # filled to (or within a kill of) capacity — OOB mine deaths can
        # free a slot between spawns
        assert alive >= eng.world.capacity - 2
        assert spawn_drops > 0  # backpressure observed, not silent

        # bit-identical replay of the whole churn
        eng2 = engine_factory(slot=1, **kw)
        player = Player(eng2, eng.history)
        for i in range(eng.history.num_frames):
            player.step(render=False)
            assert world_hash(eng2.world) == hashes[i], f"frame {i} diverged"
