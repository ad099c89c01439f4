"""Demo scenes — the space game (reference src/space_logic/, src/main.rs)."""

from render_engine_tpu.demo.space_scene import build_space_engine  # noqa: F401
