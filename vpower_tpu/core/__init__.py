from .particles import Particles
from .field import BoxField, FoldedField

__all__ = ["Particles", "BoxField", "FoldedField"]
