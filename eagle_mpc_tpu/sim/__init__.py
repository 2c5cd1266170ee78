"""Plant simulators for closed-loop validation."""

from .plant import AerialSimulator

__all__ = ["AerialSimulator"]
