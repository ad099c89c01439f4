"""First-healthy-TPU-session orchestrator.

Rounds 3 and 4 both built through multi-hour axon tunnel outages, so the
moment the tunnel heals there is a QUEUE of TPU-verification work (see
CLAUDE.md "Known gaps"): smoke, the headline bench, the normal-map A/B,
all five baseline configs (committing benchmarks/results.json), the
config-3 light-tile-budget sweep, and the feature-targeted replay
verifier. This script runs that whole playbook as checkpointed
subprocess steps: each step gets its own timeout + log file under
debug_logs/tpu_session/, and a finished step is skipped on re-run (delete
its .done file to force a rerun). A tunnel hiccup therefore costs one
step, not the session.

Usage:
    python scripts/tpu_session.py            # run everything pending
    python scripts/tpu_session.py --wait     # probe every ~15 min until the
                                             # tunnel heals, then run; loop
                                             # until every step is done (or
                                             # TPU_SESSION_DEADLINE s, def 11 h)
    python scripts/tpu_session.py --list     # show step status
    python scripts/tpu_session.py smoke bench  # run specific steps
    TPU_SESSION_SKIP=profile python scripts/tpu_session.py

The reference's analogue is simply "cargo run --release" on a GPU box;
this exists because our target hardware sits behind a flaky tunnel.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(ROOT, "debug_logs", "tpu_session")
PY = sys.executable


def _probe(timeout_s=300):
    code = ("import jax, jax.numpy as jnp;"
            "print('probe ok', float(jnp.ones((8,128)).sum()),"
            " jax.default_backend())")
    try:
        p = subprocess.run([PY, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, "probe timeout"
    return p.returncode == 0, (p.stdout + p.stderr).strip()[-300:]


# (name, argv, timeout_s, extra_env). Order matters: cheap proof first,
# then the driver-visible artifacts, then tuning data.
STEPS = [
    # end-to-end demo incl. replay hash; also warms the XLA compile cache
    ("smoke", [PY, "scripts/smoke_space.py"], 2700, {}),
    # headline: one supervised attempt (the tunnel was probed healthy just
    # before, so no need for bench.py's own 2 h outage loop)
    ("bench", [PY, "bench.py"], 3000,
     {"BENCH_DEADLINE": "2700", "BENCH_PROBE_BUDGET": "300"}),
    # A/B: is the 64-wide packed row (normal mapping) regressing the
    # headline? Rows are latency-bound so it should be ~free — verify.
    ("bench_nonorm", [PY, "bench.py"], 3000,
     {"BENCH_DEADLINE": "2700", "BENCH_PROBE_BUDGET": "300",
      "BENCH_NORMAL_MAPS": "0"}),
    # all five baseline configs; appends benchmarks/results.json (COMMIT IT)
    ("configs", [PY, "benchmarks/run_benchmarks.py"], 7200, {}),
    # config-3 light-culling sweep: default-off vs two budgets
    ("lights_off", [PY, "benchmarks/run_benchmarks.py", "lights"], 3600,
     {"BENCH_LIGHT_TILE_BUDGET": "0",
      "BENCH_OUT": os.path.join(LOGDIR, "lights_sweep.json")}),
    ("lights_48", [PY, "benchmarks/run_benchmarks.py", "lights"], 3600,
     {"BENCH_LIGHT_TILE_BUDGET": "48",
      "BENCH_OUT": os.path.join(LOGDIR, "lights_sweep.json")}),
    ("lights_96", [PY, "benchmarks/run_benchmarks.py", "lights"], 3600,
     {"BENCH_LIGHT_TILE_BUDGET": "96",
      "BENCH_OUT": os.path.join(LOGDIR, "lights_sweep.json")}),
    # bit-determinism over round-3/4 features (emissive maps, tile lights,
    # hits_topk) live on the TPU
    ("replay", [PY, "scripts/replay_features.py"], 2700, {}),
    # device trace for the next-perf-levers decisions (PCF floor, small-op
    # tail, texture rows)
    ("profile", [PY, "scripts/profile_frame.py"], 2700, {}),
    # back-sweeps AFTER the core artifacts: pcf_scale 3 and shadow
    # interval 3 became the DEFAULTS in r5 (both TPU-measured; STATUS.md
    # has the ladder), so the regression sweeps now measure one notch
    # back toward the reference's cadence/quality — if the deltas drift
    # from the recorded ~2 FPS each, something changed
    ("bench_pcf2", [PY, "bench.py"], 3000,
     {"BENCH_DEADLINE": "2700", "BENCH_PROBE_BUDGET": "300",
      "BENCH_PCF_SCALE": "2"}),
    ("bench_interval2", [PY, "bench.py"], 3000,
     {"BENCH_DEADLINE": "2700", "BENCH_PROBE_BUDGET": "300",
      "BENCH_SHADOW_INTERVAL": "2"}),
]


def run_step(name, argv, timeout_s, extra_env):
    done = os.path.join(LOGDIR, f"{name}.done")
    log = os.path.join(LOGDIR, f"{name}.log")
    if os.path.exists(done):
        print(f"[tpu_session] {name}: already done, skipping", flush=True)
        return True
    ok, msg = _probe()
    if not ok:
        print(f"[tpu_session] {name}: tunnel unhealthy ({msg}); stopping",
              flush=True)
        return False
    env = dict(os.environ)
    env.update(extra_env)
    t0 = time.time()
    print(f"[tpu_session] {name}: starting (timeout {timeout_s}s) "
          f"-> {log}", flush=True)
    with open(log, "w") as fh:
        fh.write(f"# {argv} env+{extra_env}\n")
        fh.flush()
        try:
            p = subprocess.run(argv, cwd=ROOT, env=env, timeout=timeout_s,
                               stdout=fh, stderr=subprocess.STDOUT)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = -1
    dt = time.time() - t0
    tail = ""
    try:
        with open(log) as fh:
            tail = "".join(fh.readlines()[-3:]).strip()
    except OSError:
        pass
    if rc == 0:
        with open(done, "w") as fh:
            fh.write(f"{time.strftime('%Y-%m-%dT%H:%M:%S')} {dt:.0f}s\n")
        print(f"[tpu_session] {name}: OK in {dt:.0f}s\n{tail}", flush=True)
        return True
    print(f"[tpu_session] {name}: FAILED rc={rc} after {dt:.0f}s "
          f"(continuing to next step)\n{tail}", flush=True)
    return True  # a failed step shouldn't starve the rest of the queue


def _run_pending(only, skip):
    """One pass over the queue. Returns (summary, n_pending_after)."""
    summary = {}
    for name, argv, timeout_s, extra_env in STEPS:
        if only and name not in only:
            continue
        if name in skip:
            continue
        if not run_step(name, argv, timeout_s, extra_env):
            summary[name] = "blocked"
            break
        summary[name] = ("done" if os.path.exists(
            os.path.join(LOGDIR, f"{name}.done")) else "failed")
    pending = sum(
        1 for name, _, _, _ in STEPS
        if name not in skip and (not only or name in only)
        and not os.path.exists(os.path.join(LOGDIR, f"{name}.done")))
    return summary, pending


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    if "--list" in sys.argv:
        for name, _, _, _ in STEPS:
            state = ("done" if os.path.exists(
                os.path.join(LOGDIR, f"{name}.done")) else "pending")
            print(f"{name:14s} {state}")
        return
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    skip = set(os.environ.get("TPU_SESSION_SKIP", "").split(","))
    if "--wait" not in sys.argv:
        summary, _ = _run_pending(only, skip)
        print(f"[tpu_session] summary: {json.dumps(summary)}", flush=True)
        return
    # --wait: the rounds-3/4 outages lasted 8+ h, so park on a ~15 min
    # probe loop (a killed probe locks the tunnel claim about that long
    # anyway) and rerun the queue after every heal until nothing is pending.
    deadline = time.time() + float(
        os.environ.get("TPU_SESSION_DEADLINE", 39600))
    while time.time() < deadline:
        ok, msg = _probe()
        if not ok:
            print(f"[tpu_session] tunnel down ({msg[-120:]}); "
                  "re-probing in ~15 min", flush=True)
            time.sleep(870)
            continue
        summary, pending = _run_pending(only, skip)
        print(f"[tpu_session] pass summary: {json.dumps(summary)} "
              f"({pending} pending)", flush=True)
        if pending == 0:
            print("[tpu_session] ALL STEPS DONE", flush=True)
            return
        time.sleep(300)
    print("[tpu_session] --wait deadline expired", flush=True)
    sys.exit(3)


if __name__ == "__main__":
    main()
