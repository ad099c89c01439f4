"""TPU-side parity audit: the production Pallas path vs the golden jnp
path on the same demo world, on real hardware.

The CPU suite proves parity under interpret=True, where every dot runs
exact. On TPU the kernels' dot_generals lower through Mosaic — if Mosaic
rounded f32 dot inputs to bf16 (as the XLA path's DEFAULT precision
does), the one-hot resolve would quantize every interpolated attribute
(uv, normals, depth) and the images would diverge well beyond FP noise.
This measures that directly: max |pallas - jnp| over a full demo frame.
"""
import sys

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.logic.types import InputState
from render_engine_tpu.render.frame import render_frame

eng = build_space_engine(width=640, height=360, capacity=1 << 12,
                         num_asteroids=500, max_tris=8192)
eng.config.record_history = False
print("platform:", jax.devices()[0].platform, file=sys.stderr, flush=True)
for i in range(10):
    eng.frame(InputState.idle(i), dt=1 / 60, render=False)

world, bank, cam = eng.world, eng.bank, eng.camera
base = eng.config.render

imgs = {}
for backend in ("pallas", "jnp"):
    settings = dataclasses.replace(
        base, backend=backend,
        fused_shading=(backend == "pallas") and base.fused_shading)
    img = render_frame(world, cam, bank, settings, cubemap=eng.cubemap,
                       atlas=eng.atlas, shadow_state=eng.shadow_state,
                       systems=eng.compiled_systems,
                       inputs=InputState.idle(99))
    imgs[backend] = np.asarray(img)

a, b = imgs["pallas"], imgs["jnp"]
diff = np.abs(a - b)
print("image shapes:", a.shape, b.shape)
print(f"max |pallas - jnp|: {diff.max():.6f}")
print(f"mean |diff|: {diff.mean():.8f}")
print(f"pixels differing > 1/255: "
      f"{(diff.max(axis=-1) > 1 / 255).mean() * 100:.4f}%")
u8a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
u8b = (np.clip(b, 0, 1) * 255).astype(np.uint8)
print(f"u8-identical: {bool((u8a == u8b).all())}")
