"""Model layer: neural trial functions + training harness."""

from .model import Model
from .network import FeedForwardNeuralNetwork, identity_bc

__all__ = ["Model", "FeedForwardNeuralNetwork", "identity_bc"]
