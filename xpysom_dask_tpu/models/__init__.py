"""Model layer: the MiniSom/XPySom-compatible ``XPySom`` class and the
NumPy golden reference used as the parity oracle."""

from .population import SomPopulation
from .som import XPySom

__all__ = ["XPySom", "SomPopulation"]
