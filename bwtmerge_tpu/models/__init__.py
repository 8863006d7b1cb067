"""Model layer: host/device BWT representations, FM-index, merge engine."""

from .runs import RunArrays
from .fmi import FMI

__all__ = ["RunArrays", "FMI"]
