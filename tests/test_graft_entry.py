"""Regression gate for __graft_entry__.entry().

entry() is the driver's single-chip compile check; it composes the
engine's PRIVATE jitted programs (_step/_render) directly, so an engine
boundary-wire change can break it without any other test noticing — r5's
packed-input rewire did exactly that (entry() kept the old
(world, camera, inputs, dt) call and raised TypeError at the gate).
Trace-only (eval_shape / lower): ~3 s on CPU, no XLA compile.
"""

from __future__ import annotations

import jax


def test_entry_traces_and_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    world, camv, img = out
    # image: (H, W, 3) float
    assert img.shape == (192, 256, 3)
    # camera crosses the boundary serialized — 1-D f32 vector in and out
    assert camv.ndim == 1 and camv.shape == args[1].shape
    # world round-trips the same pytree structure
    assert (jax.tree_util.tree_structure(world)
            == jax.tree_util.tree_structure(args[0]))
    # and the packed input vector is the one-buffer wire (1-D f32)
    assert args[2].ndim == 1
