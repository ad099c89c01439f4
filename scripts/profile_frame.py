"""Capture + parse a device trace of demo frames (no TensorBoard needed).

Usage:  python scripts/profile_frame.py [width height asteroids max_tris]

Captures 3 frames with jax.profiler, then parses the Chrome-format
trace.json.gz: per-program totals and top HLO ops inside one step and one
render window. This is how the round-1 perf work attributed time; see
CLAUDE.md 'Perf model'.
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 1920
    height = int(args[1]) if len(args) > 1 else 1080
    n_ast = int(args[2]) if len(args) > 2 else 10000
    max_tris = int(args[3]) if len(args) > 3 else 24576

    from render_engine_tpu.demo.space_scene import build_space_engine
    from render_engine_tpu.logic.types import InputState, KEY_W

    def _opt_int(name):
        v = os.environ.get(name)
        return None if v in (None, "") else int(v)

    cap = 1 << (n_ast + 64).bit_length()
    # same sweep knobs as bench.py: profile EXACTLY the configuration the
    # headline runs (BENCH_SHADOW_INTERVAL=1 removes the lax.cond around
    # the shadow pass so its inner ops attribute to real source lines)
    eng = build_space_engine(
        width=width, height=height, capacity=cap,
        num_asteroids=n_ast, max_tris=max_tris,
        normal_maps=os.environ.get("BENCH_NORMAL_MAPS", "1") != "0",
        shadow_tile_budget=float(os.environ.get("BENCH_SHADOW_TILES", 0.2)),
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
    img = eng.frame(InputState.idle(0).with_keys(KEY_W), 1 / 60)
    float(img.sum())

    out_dir = "/tmp/retpu_trace"
    jax.profiler.start_trace(out_dir)
    for i in range(3):
        img = eng.frame(InputState.idle(1 + i).with_keys(KEY_W), 1 / 60)
    float(img.sum())
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{out_dir}/**/*.trace.json.gz",
                              recursive=True))
    with gzip.open(traces[-1]) as f:
        ev = json.load(f)["traceEvents"]

    spans = [e for e in ev if e.get("ph") == "X"
             and e.get("name", "").startswith("jit_")]
    per_program = collections.Counter()
    for s in spans:
        per_program[s["name"].split("(")[0]] += s["dur"]
    print("=== per-program totals (3 frames)")
    for n, d in per_program.most_common():
        print(f"{d/3e3:8.2f} ms/frame  {n}")

    def ops_in(win):
        t0, t1 = win["ts"], win["ts"] + win["dur"]
        tot = collections.Counter()
        for e in ev:
            if (e.get("ph") == "X" and "dur" in e
                    and not e.get("name", "").startswith("jit_")
                    and e["ts"] >= t0 and e["ts"] + e["dur"] <= t1):
                tot[e["name"]] += e["dur"]
        return tot

    def by_source(win):
        """Aggregate op time by source file:line (the attribution that
        actually finds hot code; NOTE conditionals' spans INCLUDE their
        inner ops, so cond lines double-count against their bodies)."""
        t0, t1 = win["ts"], win["ts"] + win["dur"]
        tot = collections.Counter()
        cnt = collections.Counter()
        for e in ev:
            if (e.get("ph") == "X" and "dur" in e
                    and not e.get("name", "").startswith("jit_")
                    and e["ts"] >= t0 and e["ts"] + e["dur"] <= t1):
                src = e.get("args", {}).get("source", "<none>")
                src = src.replace("/root/repo/render_engine_tpu/", "")
                tot[src] += e["dur"]
                cnt[src] += 1
        return tot, cnt

    def by_class(win):
        """Aggregate op time by HLO op CLASS (fusion / copy / sort / ...).
        Ops nested inside a conditional span are dropped (the cond span
        already carries their time) so class totals sum to the window."""
        t0, t1 = win["ts"], win["ts"] + win["dur"]
        inwin = [e for e in ev
                 if (e.get("ph") == "X" and "dur" in e
                     and not e.get("name", "").startswith("jit_")
                     and e["ts"] >= t0 and e["ts"] + e["dur"] <= t1)]
        conds = [(e["ts"], e["ts"] + e["dur"]) for e in inwin
                 if e["name"].startswith("conditional")]
        tot = collections.Counter()
        cnt = collections.Counter()
        for e in inwin:
            # inclusive containment, excluding the span itself: ops that
            # start/end exactly at a cond boundary belong to that cond, and
            # inner conditionals are dropped too (the outermost cond span
            # carries the whole subtree's time once)
            span = (e["ts"], e["ts"] + e["dur"])
            if any(c0 <= span[0] and span[1] <= c1 and (c0, c1) != span
                   for c0, c1 in conds):
                continue
            cls = e["name"].split(".")[0].split("(")[0]
            tot[cls] += e["dur"]
            cnt[cls] += 1
        return tot, cnt

    for label, prefix in (("STEP", "jit_step_only"),
                          ("RENDER", "jit_render_pure"),
                          ("RENDER", "jit_render_shadowed"),
                          ("FRAME", "jit_frame_fused")):
        # report BOTH captured frame windows when they differ (shadow
        # update frames vs skip frames under shadow_update_interval)
        wins = [s for s in spans if s["name"].startswith(prefix)][:2]
        for wi, win in enumerate(wins):
            print(f"=== {label} window {wi} ({win['dur']/1e3:.1f} ms) "
                  "by source line")
            tot, cnt = by_source(win)
            for n, d in tot.most_common(20):
                print(f"{d/1e3:8.2f} ms  x{cnt[n]:4d}  {n}")
        if wins:
            print(f"=== {label} top ops (window 0)")
            n_ops = int(os.environ.get("PROFILE_TOP_OPS", 15))
            # per-op source attribution: one representative source per op
            # name (ops recur across frames with the same source)
            op_src = {}
            for e in ev:
                if e.get("ph") == "X" and "dur" in e:
                    s = e.get("args", {}).get("source")
                    if s and e["name"] not in op_src:
                        op_src[e["name"]] = s.replace(
                            "/root/repo/render_engine_tpu/", "")
            for n, d in ops_in(wins[0]).most_common(n_ops):
                print(f"{d/1e3:8.2f} ms  {n[:60]:60s} "
                      f"{op_src.get(n, '')}")
            print(f"=== {label} by op class (window 0, cond-inner dropped)")
            tot, cnt = by_class(wins[0])
            for n, d in tot.most_common(20):
                print(f"{d/1e3:8.2f} ms  x{cnt[n]:4d}  {n}")


if __name__ == "__main__":
    main()
