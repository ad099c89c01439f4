"""Quick headline FPS probe: build the bench engine, time N fused frames.

Much faster than bench.py (no supervisor, one window) — for A/B timing of
perf changes. Time via wall clock with ONE scalar readback at the window
end (block_until_ready is unreliable through the axon tunnel).

Usage: python debug_logs/quick_fps.py [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120

    from render_engine_tpu.demo.space_scene import build_space_engine
    from render_engine_tpu.logic.types import InputState

    # EXACTLY the bench child's engine (bench.py): max_tris 16384,
    # shadow_tile_budget 0.28, idle coasting patrol. Same env sweep knobs
    # as bench.py for A/Bs.
    def _opt_int(name):
        v = os.environ.get(name)
        return int(v) if v else None

    t0 = time.perf_counter()
    eng = build_space_engine(
        width=1920, height=1080, capacity=16384,
        num_asteroids=10000, max_tris=16384,
        shadow_tile_budget=float(os.environ.get("BENCH_SHADOW_TILES",
                                                0.28)),
        shadow_pcf_scale=_opt_int("BENCH_PCF_SCALE"),
        shadow_update_interval=_opt_int("BENCH_SHADOW_INTERVAL"),
        light_tile_budget=_opt_int("BENCH_LIGHT_TILE_BUDGET"),
        raster_tile_budget=_opt_int("BENCH_TILE_BUDGET"))
    eng.config.record_history = False
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    img = eng.frame(InputState.idle(0), 1 / 60)
    print(f"compile+first {time.perf_counter() - t0:.1f}s "
          f"sum={float(img.sum()):.1f}", flush=True)

    fidx = 1
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            img = eng.frame(InputState.idle(fidx), 1 / 60)
            fidx += 1
        float(img.sum())
        dt = time.perf_counter() - t0
        print(f"window {w}: {n / dt:.2f} fps ({dt / n * 1e3:.2f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
