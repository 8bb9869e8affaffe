"""Mathematical primitives: SDEs, losses, trace estimators, integrators."""

from . import integrate, losses, sde, trace

__all__ = ["integrate", "losses", "sde", "trace"]
