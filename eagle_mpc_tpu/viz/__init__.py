"""Visualization: matplotlib plot suite + 3-D multicopter display."""

from . import plots
from .visualizer import MulticopterDisplay, rotor_geometry

__all__ = ["plots", "MulticopterDisplay", "rotor_geometry"]
