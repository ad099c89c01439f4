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
    """SHA-256 over every leaf's raw bytes, keyed by its stable tree path.

    Deliberately does NOT hash the treedef repr: meta fields (e.g. the
    component registry object) repr with memory addresses, which would make
    bit-identical states from different engine instances hash differently.
    """
    h = hashlib.sha256()
    flat = jax.tree_util.tree_flatten_with_path(world)[0]
    for path, leaf in flat:
        h.update(jax.tree_util.keystr(path).encode())
        arr = np.asarray(leaf)
        h.update(arr.dtype.str.encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()
