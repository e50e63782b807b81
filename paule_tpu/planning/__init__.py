"""Planning engine: jitted planning scan, continue-learning trainers, result
containers and the chunked iterative planner."""

from . import engine, results, trainer  # noqa: F401
