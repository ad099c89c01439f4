"""Drive the demo through the browser window AGAINST THE REAL TPU engine
and commit the evidence (VERDICT r4 missing #4).

The web viewer is e2e-tested on CPU (tests/test_web_viewer.py); this
script produces the TPU artifact: it runs scripts/web_viewer.py's loop on
the TPU demo engine while acting as its own browser client over real HTTP
— GET /, GET /frame.png, POST /input with WASD + pointer-lock deltas —
for ~60 s, then writes into debug_out/:

  * tpu_browser_frame.png        — a frame as SERVED over HTTP
  * tpu_browser_drive.json      — the round-trip log (per-phase FPS at
                                   the ~28 ms tunnel RTT, input echo
                                   checks, frame counts)

Run on the TPU host:  python scripts/tpu_browser_drive.py [seconds]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0

    from render_engine_tpu.demo.space_scene import build_space_engine
    from render_engine_tpu.logic.types import InputState, NUM_KEYS
    from render_engine_tpu.render.frame import to_srgb_u8
    from render_engine_tpu.runtime.web_viewer import KEY_CODES, WebViewer

    print("building TPU demo engine (first compile is slow) ...",
          flush=True)
    t0 = time.perf_counter()
    eng = build_space_engine(width=640, height=360, capacity=512,
                             num_asteroids=200, max_tris=16384)
    eng.config.record_history = False
    img = eng.frame(InputState.idle(0), 1 / 60)
    float(np.asarray(img).sum())
    print(f"engine up in {time.perf_counter() - t0:.0f}s "
          f"(backend: {img.devices()})", flush=True)

    viewer = WebViewer(host="127.0.0.1", port=0)
    base = viewer.url.rstrip("/")
    print(f"serving on {base}", flush=True)

    def get(path):
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return r.read()

    def post_input(keys, dx=0.0, dy=0.0):
        body = json.dumps({"keys": keys, "dx": dx, "dy": dy}).encode()
        req = urllib.request.Request(
            base + "/input", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.read()

    # the browser page itself serves
    page = get("/")
    assert b"<html" in page.lower(), "index page missing"

    log = {"page_bytes": len(page), "phases": [], "input_echo": []}
    # drive phases: coast, thrust+look, strafe — like a player would
    phases = [
        ("coast", [], 0.0, 0.0),
        ("thrust+look", ["KeyW"], 40.0, 10.0),
        ("strafe", ["KeyA", "KeyW"], -25.0, 0.0),
    ]
    per_phase = max(2.0, seconds / len(phases))
    frame = 0
    png = b""
    for name, keys, dx, dy in phases:
        post_input(keys, dx, dy)
        # input echo check: the viewer's poll must reflect the POSTed keys
        k, mouse = viewer.poll_input()
        echoed = sorted(code for code, idx in KEY_CODES.items() if k[idx])
        log["input_echo"].append({"phase": name, "sent": sorted(keys),
                                  "echoed": echoed,
                                  "mouse": [float(mouse[0]),
                                            float(mouse[1])]})
        # feed the polled input into real TPU frames, publishing each
        t0 = time.perf_counter()
        n0 = frame
        while time.perf_counter() - t0 < per_phase:
            inp = InputState(keys=k, mouse_delta=mouse.astype(np.float32),
                             rng_seed=np.uint32(frame),
                             prev_keys=np.zeros(NUM_KEYS, bool))
            img = eng.frame(inp, dt=1 / 60)
            viewer.publish(np.asarray(to_srgb_u8(img)))
            # fetch the frame THROUGH HTTP like the browser does
            png = get("/frame.png")
            frame += 1
            mouse = np.zeros(2, np.float32)  # deltas drain after 1 frame
        dt_phase = time.perf_counter() - t0
        fps = (frame - n0) / dt_phase
        log["phases"].append({"phase": name, "frames": frame - n0,
                              "fps": round(fps, 2),
                              "served_png_bytes": len(png)})
        print(f"phase {name}: {fps:.1f} fps over {frame - n0} frames "
              f"(every frame fetched over HTTP)", flush=True)

    os.makedirs("debug_out", exist_ok=True)
    with open("debug_out/tpu_browser_frame.png", "wb") as f:
        f.write(png)
    log["total_frames"] = frame
    log["note"] = ("every frame: POSTed input folded into InputState, TPU "
                   "step+render, PNG published and fetched back over HTTP "
                   "(the ~28 ms axon tunnel RTT bounds the loop)")
    with open("debug_out/tpu_browser_drive.json", "w") as f:
        json.dump(log, f, indent=1)
    viewer.close()
    print("wrote debug_out/tpu_browser_frame.png + tpu_browser_drive.json")


if __name__ == "__main__":
    main()
