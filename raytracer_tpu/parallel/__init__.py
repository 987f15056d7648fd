"""Multi-chip rendering over a ("sample", "pixel") device mesh."""

from .sharded import build_sharded_render, make_mesh, render_sharded
