"""Decompose the recorded-path FPS gap (VERDICT r4 missing #1).

The unrecorded headline runs ONE fused step+shadow+render dispatch at
~63 FPS; the recorded path (bit-determinism invariant: state advances
through the standalone _step program) pays TWO dispatches and measured
44.7 FPS. This times each configuration with the one-readback-per-window
rule (jax.block_until_ready is unreliable through the axon tunnel):

  A fused unrecorded frames        (the 63-FPS baseline)
  B recorded frames                (step + render_shadowed + host record)
  C two-dispatch, no host record   (isolates HistoryLog cost)
  D step-only loop                 (the step program's pipelined cost)
  E render_shadowed-only loop      (the render program's pipelined cost)

Usage: python debug_logs/diag_recorded_path.py [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    from render_engine_tpu.demo.space_scene import build_space_engine
    from render_engine_tpu.logic.types import InputState, KEY_W

    eng = build_space_engine(width=1920, height=1080, capacity=16384,
                             num_asteroids=10000, max_tris=24576)
    eng.config.record_history = False

    def idle(i):
        return InputState.idle(i).with_keys(KEY_W)

    # warm up / compile every program we will time
    img = eng.frame(idle(0), 1 / 60)
    float(img.sum())
    eng.config.record_history = True
    eng.history.set_baseline(eng.world, eng.camera, meta={})
    img = eng.frame(idle(1), 1 / 60)
    float(img.sum())
    eng.config.record_history = False

    results = {}

    def window(label, body):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = body(i)
        # ONE scalar readback closes the window
        if out is not None:
            float(np.asarray(out.sum()) if hasattr(out, "sum") else 0.0)
        dt = time.perf_counter() - t0
        results[label] = dt / n * 1e3
        print(f"{label:38s} {dt / n * 1e3:7.2f} ms/frame "
              f"({n / dt:6.2f} fps)")

    # A: fused unrecorded
    window("A fused unrecorded", lambda i: eng.frame(idle(100 + i), 1 / 60))

    # B: recorded (two dispatches + host record)
    eng.config.record_history = True
    window("B recorded (2 dispatch + record)",
           lambda i: eng.frame(idle(1000 + i), 1 / 60))
    eng.config.record_history = False

    # C: two dispatches WITHOUT host recording (frame() takes the
    # unfused path whenever record_history is on; emulate by calling the
    # two programs directly)
    def two_dispatch(i):
        inp = idle(2000 + i).with_prev(eng._prev_keys)
        eng._prev_keys = inp.keys
        eng.world, eng.camera, eng._last_drops = eng._step(
            eng.world, eng.camera, inp, np.float32(1 / 60))
        img, eng.shadow_state = eng._render_shadowed(
            eng.world, eng.camera, eng.shadow_state, inp)
        return img

    window("C two-dispatch, no record", two_dispatch)

    # D: step-only
    def step_only(i):
        inp = idle(3000 + i).with_prev(eng._prev_keys)
        eng._prev_keys = inp.keys
        eng.world, eng.camera, eng._last_drops = eng._step(
            eng.world, eng.camera, inp, np.float32(1 / 60))
        return eng.world["position"]

    window("D step-only loop", step_only)

    # E: render-only (same world each time; donation of shadow_state keeps
    # the chain honest)
    def render_only(i):
        inp = idle(4000 + i).with_prev(eng._prev_keys)
        img, eng.shadow_state = eng._render_shadowed(
            eng.world, eng.camera, eng.shadow_state, inp)
        return img

    window("E render_shadowed-only loop", render_only)

    print()
    a, b, c, d, e = (results[k] for k in sorted(results))
    print(f"record host cost  (B - C): {b - c:6.2f} ms")
    print(f"2nd-dispatch cost (C - A): {c - a:6.2f} ms")
    print(f"device sum  (D + E) vs A : {d + e:6.2f} vs {a:6.2f} ms")


if __name__ == "__main__":
    main()
