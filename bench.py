"""Headline benchmark: the BASELINE.json north-star config.

10k-entity space scene stepped, culled, and deferred-rendered at 1080p on
one TPU core; metric = FPS (driver target: >60). The reference publishes no
numbers (BASELINE.md), so vs_baseline is FPS / 60-FPS-target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Env knobs: BENCH_WIDTH/HEIGHT/ASTEROIDS/FRAMES/MAX_TRIS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    n_ast = int(os.environ.get("BENCH_ASTEROIDS", 10000))
    frames = int(os.environ.get("BENCH_FRAMES", 50))
    # budget sizing: the scattered 10k-asteroid field leaves ~8.6k visible
    # triangles after culling+LoV; every geometry/binning stage pays for the
    # full budget, so keep headroom modest (~1.9x; triangle_budget_dropped
    # in the output stays 0)
    max_tris = int(os.environ.get("BENCH_MAX_TRIS", 16384))

    from render_engine_tpu.demo.space_scene import build_space_engine
    from render_engine_tpu.logic.types import InputState, KEY_W

    capacity = 1 << (n_ast + 64).bit_length()  # headroom above population
    eng = build_space_engine(
        width=width, height=height, capacity=capacity,
        num_asteroids=n_ast, max_tris=max_tris,
        shadow_tile_budget=float(os.environ.get("BENCH_SHADOW_TILES", 0.2)),
    )
    eng.config.record_history = False

    def sync(img):
        # force full execution: block_until_ready is unreliable through the
        # axon tunnel, a scalar readback is not
        float(jnp.sum(eng.world["position"]))
        if img is not None:
            float(jnp.sum(img))

    # warmup / compile
    for i in range(3):
        img = eng.frame(InputState.idle(i).with_keys(KEY_W), dt=1 / 60,
                        render=True)
    sync(img)

    # per-frame fused dispatches (step+shadow+render in one program per
    # frame; XLA async dispatch pipelines them). NOTE: a lax.scan-batched
    # variant (Engine.run_frames_rendered) was measured SLOWER end-to-end
    # through the axon tunnel (~28 vs ~21 ms/frame at N=30: identical
    # device time but ~270 ms per-call host overhead + a fresh multi-minute
    # compile per scan length) — keep the per-frame loop here.
    # MEDIAN of 3 timed windows: the axon tunnel's throughput wobbles a few
    # percent run to run (one observed transient measured 20x slow); a
    # median is the honest steady-state figure. Every window simulates and
    # renders every frame. The ship patrols (thrust, brake, thrust) so all
    # three windows view comparable scene content instead of flying off.
    from render_engine_tpu.logic.types import KEY_S

    windows = []
    fidx = 100
    for key in (KEY_W, KEY_S, KEY_W):
        t0 = time.perf_counter()
        for i in range(frames):
            img = eng.frame(InputState.idle(fidx).with_keys(key),
                            dt=1 / 60, render=True)
            fidx += 1
        # ONE readback: the last image depends on the last stepped world,
        # so this proves the whole fused chain drained (a second readback
        # costs another ~28 ms tunnel round trip inside the timed window)
        float(jnp.sum(img))
        windows.append(frames / (time.perf_counter() - t0))

    fps = float(np.median(windows))
    alive = int(np.asarray(eng.world.alive).sum())
    result = {
        "metric": (
            f"FPS at {width}x{height} deferred, space scene "
            f"({alive} entities stepped+culled)"
        ),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "windows_fps": [round(w, 2) for w in windows],
        # budget-overflow observability: nonzero counters mean the frame
        # silently truncated work (grow the corresponding budget)
        "drops": eng.drop_stats(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
