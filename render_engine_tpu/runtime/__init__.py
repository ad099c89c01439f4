"""Runtime: engine loop, record/replay history, supervision.

Replaces the reference's 3-thread topology (src/lib.rs launch_render_system:
monitor + render + history threads with condvar-handshaked double buffers)
with a single host loop driving jitted device steps: XLA's async dispatch
already overlaps frame N's host work with frame N-1's device work, which is
exactly what the double buffer bought the reference.
"""

from render_engine_tpu.runtime.config import EngineConfig  # noqa: F401
from render_engine_tpu.runtime.engine import Engine  # noqa: F401
from render_engine_tpu.runtime.history import HistoryLog  # noqa: F401
from render_engine_tpu.runtime.replay import Player, PlaybackMode  # noqa: F401
