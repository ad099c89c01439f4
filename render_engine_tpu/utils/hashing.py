"""Bit-exact state hashing for determinism checks.

The reference proves replay correctness by visually replaying the recording;
our stronger contract (SURVEY.md section 4) is a per-frame hash of the whole
world pytree: same inputs => same hash sequence, bit for bit.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def world_hash(world) -> str:
    """SHA-256 over every leaf's raw bytes, in a canonical leaf order."""
    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(world)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(arr.dtype.str.encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()
