from .mesh import render_mesh, shard_render  # noqa: F401
