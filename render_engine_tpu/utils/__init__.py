"""Cross-cutting helpers: state hashing, timing, PNG IO."""

from render_engine_tpu.utils.hashing import world_hash  # noqa: F401
from render_engine_tpu.utils.png import write_png  # noqa: F401
