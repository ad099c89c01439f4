"""Playback: deterministic replay with the reference's 5-mode state machine.

Port of the debug/playback controls (src/threads/render_thread.rs:32-40,
323-400, 445-474 and Pipeline::debug_execute pipeline.rs:279-421):

  * RUN                   — live simulation
  * DEBUG                 — replaying the recording frame by frame
  * DEBUG_CUSTOM_MOVEMENT — replay continues but the camera is detached and
                            freely movable (Esc detaches, Insert reattaches)
  * ONE_PAST_LAST_FRAME   — reached the recording's end; Up simulates one
                            live frame at a time
  * ONE_PAST_LAST_PAUSE   — paused past the end; Right resumes live RUN

Because the step is pure, "replay" is simply re-running it on the recorded
input stream; the detached camera re-renders the same states with another
camera — no special engine support needed (the reference had to thread a
custom_movement flag through debug_execute :351-372).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from render_engine_tpu.logic.types import (
    InputState,
    KEY_A,
    KEY_D,
    KEY_ESC,
    KEY_INSERT,
    KEY_RIGHT,
    KEY_S,
    KEY_SHIFT,
    KEY_SPACE,
    KEY_UP,
    KEY_W,
)
from render_engine_tpu.runtime.engine import Engine
from render_engine_tpu.runtime.history import HistoryLog
from render_engine_tpu.utils.hashing import world_hash


FLY_ACCEL = 60.0  # detached-camera flight acceleration, units/s^2


def _flight_accel(camera, keys) -> jnp.ndarray:
    """WASD + Space/Shift acceleration in the camera's frame — the
    DCustomMovement free flight (render_thread.rs:357-372 feeding
    camera_object.rs:174-180 via the input macros, input_macros.rs:1-53).
    ``keys`` is the host-side bool vector; the few jnp ops here run once
    per replay frame, off the hot path."""
    fwd = camera.direction()
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(fwd, world_up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-6)
    a = jnp.zeros(3, jnp.float32)
    if bool(keys[KEY_W]):
        a = a + fwd
    if bool(keys[KEY_S]):
        a = a - fwd
    if bool(keys[KEY_D]):
        a = a + right
    if bool(keys[KEY_A]):
        a = a - right
    if bool(keys[KEY_SPACE]):
        a = a + world_up
    if bool(keys[KEY_SHIFT]):
        a = a - world_up
    return a * jnp.float32(FLY_ACCEL)


class PlaybackMode(enum.Enum):
    RUN = "run"
    DEBUG = "debug"
    DEBUG_CUSTOM_MOVEMENT = "debug_custom_movement"
    ONE_PAST_LAST_FRAME = "one_past_last_frame"
    ONE_PAST_LAST_PAUSE = "one_past_last_pause"


class Player:
    """Drives an Engine from a HistoryLog with the 5-mode state machine."""

    def __init__(self, engine: Engine, history: HistoryLog):
        self.engine = engine
        self.history = history
        self.mode = PlaybackMode.DEBUG
        self.cursor = 0  # next recorded frame to apply
        self.detached_camera = None

        # rebuild initial state from the baseline (Pipeline::new_from_file).
        # The snapshot was taken AFTER transform refresh, so it is used
        # verbatim — re-deriving anything here could round differently and
        # break bit-determinism.
        engine.world = history.restore_world(engine.world_config)
        engine.camera = history.restore_camera(engine.camera)

    # -- state machine -----------------------------------------------------
    def handle_controls(self, controls: InputState):
        """Mode transitions from playback-control keys
        (render_thread.rs:323-400)."""
        k = controls.keys
        if self.mode in (PlaybackMode.DEBUG,
                         PlaybackMode.DEBUG_CUSTOM_MOVEMENT):
            if bool(k[KEY_ESC]):
                self.mode = PlaybackMode.DEBUG_CUSTOM_MOVEMENT
                if self.detached_camera is None:
                    self.detached_camera = self.engine.camera
            elif bool(k[KEY_INSERT]):
                self.mode = PlaybackMode.DEBUG
                self.detached_camera = None
        if self.mode == PlaybackMode.ONE_PAST_LAST_PAUSE and bool(
            k[KEY_RIGHT]
        ):
            self.mode = PlaybackMode.RUN

    # -- stepping ----------------------------------------------------------
    def step(self, controls: InputState | None = None, render: bool = True):
        """Advance one playback frame. Returns (image_or_None, at_end)."""
        if controls is not None:
            self.handle_controls(controls)

        if self.mode in (PlaybackMode.DEBUG,
                         PlaybackMode.DEBUG_CUSTOM_MOVEMENT):
            if self.cursor >= self.history.num_frames:
                self.mode = PlaybackMode.ONE_PAST_LAST_FRAME
                return None, True
            # recorded config changes apply before the frame they preceded
            # (DrawDistancesChange / WindowDimensionsChange replay,
            # pipeline.rs:373-401)
            event = self.history.events.get(self.cursor)
            if event:
                self.engine.apply_config_event(event)
            inputs, dt = self.history.frame(self.cursor)
            # drive the EXACT program that advanced this frame when it was
            # recorded (fused frame vs standalone step) — the
            # bit-determinism invariant is program-sequence identity
            adv = ("fused" if self.history.advance_fused(self.cursor)
                   else "step")
            self.cursor += 1
            if self.mode == PlaybackMode.DEBUG_CUSTOM_MOVEMENT and controls:
                # fly the detached camera (mouse look + WASD inertial
                # flight); the recorded camera still drives logic, so the
                # replayed world state is untouched
                cam = self.detached_camera
                dy, dp = controls.mouse_delta[0], controls.mouse_delta[1]
                cam = cam.rotated(dy, dp)
                self.detached_camera = cam.float_position(
                    _flight_accel(cam, controls.keys), dt)
            img = self.engine.frame(inputs, dt, render=render, advance=adv)
            if (self.mode == PlaybackMode.DEBUG_CUSTOM_MOVEMENT and render
                    and self.detached_camera is not None):
                img = self.engine.render_only(self.detached_camera)
            return img, self.cursor >= self.history.num_frames

        if self.mode == PlaybackMode.ONE_PAST_LAST_FRAME:
            # Up: simulate one live frame then pause
            # (render_thread.rs:344-355, 445-466)
            if controls is not None and bool(controls.keys[KEY_UP]):
                img = self.engine.frame(
                    InputState.idle(seed=self.engine.frame_index),
                    render=render)
                self.mode = PlaybackMode.ONE_PAST_LAST_PAUSE
                return img, True
            return None, True

        if self.mode == PlaybackMode.ONE_PAST_LAST_PAUSE:
            return None, True

        # RUN: live simulation past the recording
        img = self.engine.frame(
            controls or InputState.idle(seed=self.engine.frame_index),
            render=render)
        return img, True

    # -- verification --------------------------------------------------------
    def replay_all(self, render: bool = False) -> list[str]:
        """Replay the full recording headless, returning per-frame world
        hashes — the bit-determinism harness."""
        hashes = []
        while self.cursor < self.history.num_frames:
            self.step(render=render)
            hashes.append(world_hash(self.engine.world))
        return hashes
