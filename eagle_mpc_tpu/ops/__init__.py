"""TPU-tuned primitive operations (small-matrix linear algebra)."""

from . import smallmat  # noqa: F401
