"""Isolate TPU replay divergence with ONE engine build (tunnel compiles are
slow): same-fn rerun, then a second jit instance of the same function."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.ecs import world as W
from render_engine_tpu.logic.types import InputState, KEY_W
from render_engine_tpu.utils.hashing import world_hash


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    eng = build_space_engine(width=128, height=32, capacity=128,
                             num_asteroids=40, max_tris=2048)
    print(f"built {time.time()-t0:.0f}s", flush=True)
    base = eng.history.baseline_world

    def run(step_fn, nframes=3):
        world = W.restore(eng.world_config, base)
        camera = eng.history.restore_camera(eng.camera)
        hs = []
        for i in range(nframes):
            inputs = InputState.idle(i).with_keys(KEY_W)
            import jax.numpy as jnp
            world, camera = step_fn(world, camera, inputs, jnp.float32(1 / 30))
            hs.append(world_hash(world)[:12])
        return hs

    t0 = time.time()
    h1 = run(eng._step)
    print(f"run1 {time.time()-t0:.0f}s", h1, flush=True)
    h2 = run(eng._step)
    print("same-jit rerun equal:", h1 == h2, h2, flush=True)

    # a SECOND jit instance of the same python function
    bank = eng.bank
    from render_engine_tpu.logic.step import make_step

    step2 = make_step(tuple(eng.config.entity_types),
                      logic_radius=eng.config.logic_radius,
                      spawn_budget=eng.config.spawn_budget,
                      collision_budget=eng.config.collision_budget)
    f2 = jax.jit(lambda w, c, i, d: step2(w, c, i, d, bank.aabb_min,
                                          bank.aabb_max))
    t0 = time.time()
    h3 = run(f2)
    print(f"fresh-jit {time.time()-t0:.0f}s equal:", h1 == h3, h3, flush=True)


if __name__ == "__main__":
    main()
