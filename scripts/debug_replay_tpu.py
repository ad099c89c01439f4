"""Isolate TPU replay divergence: same-fn rerun vs cross-engine rerun."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.logic.types import InputState, KEY_W
from render_engine_tpu.utils.hashing import world_hash


def run(eng, nframes=3, render=False):
    # reset to its own recorded baseline
    hashes = []
    for i in range(nframes):
        eng.frame(InputState.idle(i).with_keys(KEY_W), 1 / 30, render=render)
        hashes.append(world_hash(eng.world)[:12])
    return hashes


def main():
    print("backend:", jax.default_backend())
    kw = dict(width=128, height=32, capacity=128, num_asteroids=40,
              max_tris=2048)

    eng_a = build_space_engine(**kw)
    base_a = eng_a.history.baseline_world
    h1 = run(eng_a)
    # restore baseline into the SAME engine (same compiled step)
    from render_engine_tpu.ecs import world as W
    eng_a.world = W.restore(eng_a.world_config, base_a)
    eng_a.camera = eng_a.history.restore_camera(eng_a.camera)
    h2 = run(eng_a)
    print("same-engine rerun equal:", h1 == h2, h1, h2)

    # fresh engine (fresh jit cache), same baseline
    eng_b = build_space_engine(**kw)
    eng_b.world = W.restore(eng_b.world_config, base_a)
    eng_b.camera = eng_b.history.restore_camera(eng_b.camera)
    h3 = run(eng_b)
    print("cross-engine equal:", h1 == h3, h3)

    # render interleaved vs not
    eng_a.world = W.restore(eng_a.world_config, base_a)
    eng_a.camera = eng_a.history.restore_camera(eng_a.camera)
    h4 = run(eng_a, render=True)
    print("render-interleaved equal:", h1 == h4, h4)


if __name__ == "__main__":
    main()
