from .types import SceneData, ShapeType, MaterialKind  # noqa: F401
