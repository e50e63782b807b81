"""Multi-device scaling: mesh helpers, batched data-parallel planning and
tensor-parallel proxy-model sharding."""

from . import batched, mesh  # noqa: F401
from .mesh import make_mesh  # noqa: F401
