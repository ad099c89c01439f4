"""Headline benchmark: the BASELINE.json north-star config.

10k-entity space scene stepped, culled, and deferred-rendered at 1080p on
one TPU core; metric = FPS (driver target: >60). The reference publishes no
numbers (BASELINE.md), so vs_baseline is FPS / 60-FPS-target.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

The axon TPU tunnel demonstrably locks up for minutes at a time (round-2
capture died with "Unable to initialize backend 'axon': UNAVAILABLE"), so
the top-level process is a SUPERVISOR: it probes backend health in
timeout-bounded subprocesses with backoff, then runs the actual bench in a
child process and retries the whole child on failure. Only the child prints
to stdout; all supervisor chatter goes to stderr.

Env knobs: BENCH_WIDTH/HEIGHT/ASTEROIDS/FRAMES/MAX_TRIS,
BENCH_ATTEMPTS/BENCH_TIMEOUT/BENCH_PROBE_BUDGET/BENCH_DEADLINE.

BENCH_DEADLINE (seconds, default 7200) is the TOTAL wall budget: tunnel
outages here last hours (round 3 logged 8+ h), so a dead probe does not
end the run — the supervisor re-probes every ~15 min until the tunnel
heals or the deadline expires. A healthy tunnel is unaffected (first
probe passes, the bench runs once).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _log(msg):
    print(f"[bench supervisor] {msg}", file=sys.stderr, flush=True)


_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "print('probe ok:', float(jnp.ones((8, 128)).sum()),"
    " jax.default_backend())"
)


def _probe_backend(timeout_s: float) -> bool:
    """Touch the TPU backend in a throwaway process (a hung tunnel call
    cannot be interrupted in-process, so probe where we can kill it)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        _log(f"probe timed out after {timeout_s:.0f}s (tunnel locked?)")
        return False
    if proc.returncode == 0:
        _log(proc.stdout.strip())
        return True
    _log(f"probe failed rc={proc.returncode}: {proc.stderr.strip()[-500:]}")
    return False


def _wait_for_backend(budget_s: float) -> bool:
    """Retry the probe with backoff until it passes or the budget is gone."""
    deadline = time.monotonic() + budget_s
    delay = 20.0
    while True:
        if _probe_backend(timeout_s=240):
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        sleep_s = min(delay, remaining)
        _log(f"backing off {sleep_s:.0f}s "
             f"({remaining:.0f}s of probe budget left)")
        time.sleep(sleep_s)
        delay = min(delay * 2, 120.0)


def supervise() -> int:
    attempts = int(os.environ.get("BENCH_ATTEMPTS", 3))
    child_timeout = float(os.environ.get("BENCH_TIMEOUT", 2400))
    probe_budget = float(os.environ.get("BENCH_PROBE_BUDGET", 900))
    deadline_budget = float(os.environ.get("BENCH_DEADLINE", 7200))
    deadline = time.monotonic() + deadline_budget

    env = dict(os.environ)
    env["_BENCH_CHILD"] = "1"
    attempt = 0
    ran_child = False
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        # Gate each child run on a live probe. Outages span hours (round 3
        # logged 8+ h), so an exhausted probe budget is not fatal: nap
        # ~15 min (a killed probe locks the tunnel claim for about that
        # long anyway) and re-probe until the deadline runs out. A healthy
        # tunnel passes the first probe and runs the child immediately.
        if not _wait_for_backend(min(probe_budget, remaining)):
            remaining = deadline - time.monotonic()
            if remaining > 1200 or ran_child:
                nap = min(900.0, max(remaining - 300.0, 60.0))
                _log(f"tunnel still down; napping {nap:.0f}s "
                     f"({remaining:.0f}s of deadline left)")
                time.sleep(nap)
                continue
            _log("deadline nearly spent and the bench never ran: "
                 "trying it blind")
        attempt += 1
        ran_child = True
        remaining = deadline - time.monotonic()
        run_timeout = max(min(child_timeout, remaining), 300.0)
        _log(f"attempt {attempt}/{attempts}: running bench child "
             f"(timeout {run_timeout:.0f}s; first TPU compile through the "
             "tunnel takes several minutes)")
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, timeout=run_timeout,
            )
        except subprocess.TimeoutExpired:
            _log(f"attempt {attempt}: bench child timed out")
            continue
        if proc.returncode == 0:
            return 0
        _log(f"attempt {attempt}: bench child failed rc={proc.returncode}")
        if attempt >= attempts:
            _log(f"attempt cap ({attempts}) reached")
            break
        backoff = 60.0 * attempt
        _log(f"sleeping {backoff:.0f}s before retry")
        time.sleep(backoff)
    _log("deadline/attempts exhausted")
    return 1


def main():
    import jax.numpy as jnp
    import numpy as np

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
    from render_engine_tpu.logic.types import InputState

    print(f"[bench child] building engine {width}x{height}, "
          f"{n_ast} asteroids ...", file=sys.stderr, flush=True)
    capacity = 1 << (n_ast + 64).bit_length()  # headroom above population
    # zero-edit perf sweeps: every sweepable knob rides an env var so a TPU
    # session can A/B without touching code (each edit would otherwise pay
    # a fresh multi-minute tunnel compile anyway; env sweeps are scriptable)
    def _opt_int(name):
        v = os.environ.get(name)
        return int(v) if v else None

    eng = build_space_engine(
        width=width, height=height, capacity=capacity,
        num_asteroids=n_ast, max_tris=max_tris,
        shadow_tile_budget=float(os.environ.get("BENCH_SHADOW_TILES", 0.28)),
        # BENCH_NORMAL_MAPS=0 drops the station's normal map (48-wide
        # packed rows instead of 64) for an A/B on the first TPU session
        normal_maps=os.environ.get("BENCH_NORMAL_MAPS", "1") != "0",
        shadow_update_interval=_opt_int("BENCH_SHADOW_INTERVAL"),
        shadow_pcf_scale=_opt_int("BENCH_PCF_SCALE"),
        light_tile_budget=_opt_int("BENCH_LIGHT_TILE_BUDGET"),
        shadow_slots=_opt_int("BENCH_SHADOW_SLOTS"),
        raster_tile_budget=_opt_int("BENCH_TILE_BUDGET"),
        shadow_lov_bias=_opt_int("BENCH_SHADOW_LOV"),
        **({} if not os.environ.get("BENCH_SHADOW_MAX_TRIS")
           else {"shadow_max_tris": int(os.environ["BENCH_SHADOW_MAX_TRIS"])}),
    )
    eng.config.record_history = False

    def sync(img):
        # force full execution: block_until_ready is unreliable through the
        # axon tunnel, a scalar readback is not
        float(jnp.sum(eng.world["position"]))
        if img is not None:
            float(jnp.sum(img))

    print("[bench child] warmup/compile (first TPU compile through the "
          "tunnel takes several minutes) ...", file=sys.stderr, flush=True)
    # warmup / compile
    for i in range(3):
        img = eng.frame(InputState.idle(i), dt=1 / 60,
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
    # renders every frame. The ship COASTS (no thrust): the scene is fully
    # dynamic regardless (10k orbiting asteroids, spinning station, shadow
    # updates, collisions), but a thrusting patrol couples the camera pose
    # to chaotic sim events — an earlier thrust-brake-thrust patrol ended
    # with the ship inside the station (wormhole-impulse + FP-divergence
    # lottery), a full-screen textured close-up that saturates any static
    # texture-tile budget and made both FPS and the drop counters
    # unreproducible run-to-run. A fixed viewpoint benches the same
    # content every run; input handling itself is exercised identically
    # (the key array is read by the same traced logic either way).
    windows = []
    window_drops = []
    fidx = 100
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(frames):
            img = eng.frame(InputState.idle(fidx), dt=1 / 60, render=True)
            fidx += 1
        # ONE readback: the last image depends on the last stepped world,
        # so this proves the whole fused chain drained (a second readback
        # costs another ~28 ms tunnel round trip inside the timed window)
        float(jnp.sum(img))
        windows.append(frames / (time.perf_counter() - t0))
        print(f"[bench child] window {len(windows)}: "
              f"{windows[-1]:.2f} fps", file=sys.stderr, flush=True)
        # drop counters OUTSIDE the timed window, at every window boundary:
        # a single end-of-run snapshot is one arbitrary pose; the per-
        # counter MAX over three poses is the honest truncation figure
        window_drops.append(eng.drop_stats())

    fps = float(np.median(windows))

    # RECORDED window: the north-star target is ">60 FPS ... with
    # bit-deterministic playback" (BASELINE.md) — recording is the
    # reference's default mode (lib.rs:93-139). Rendered recorded frames
    # advance through the SAME fused one-dispatch program (the per-frame
    # advance choice is recorded and replay re-drives it, see
    # docs/playback.md), so the only recording overhead is the host-side
    # input append.
    eng.config.record_history = True
    eng.history.set_baseline(eng.world, eng.camera, meta={})
    t0 = time.perf_counter()
    for i in range(frames):
        img = eng.frame(InputState.idle(fidx), dt=1 / 60, render=True)
        fidx += 1
    float(jnp.sum(img))
    recorded_fps = frames / (time.perf_counter() - t0)
    eng.config.record_history = False
    print(f"[bench child] recorded window: {recorded_fps:.2f} fps "
          f"({eng.history.num_frames} frames in the log)",
          file=sys.stderr, flush=True)

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
        # the same frames WITH record/playback history on — the
        # north-star conjunction figure
        "recorded_fps": round(recorded_fps, 2),
        # budget-overflow observability: nonzero counters mean a frame
        # silently truncated work (grow the corresponding budget). Per-
        # counter MAX over the three window-boundary snapshots.
        "drops": {k: max(d[k] for d in window_drops)
                  for k in window_drops[0]},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("_BENCH_CHILD"):
        main()
    else:
        sys.exit(supervise())
