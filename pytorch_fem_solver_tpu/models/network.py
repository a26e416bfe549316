"""Neural trial functions for VPINNs.

Capability parity with the reference ``FeedForwardNeuralNetwork``
(/root/reference/torch_fem/model/neural_network.py:15-138) in an idiomatic
JAX design: the network is an immutable pytree module (params are leaves,
architecture is static aux), so the *whole module* can be passed through
``jax.grad`` / ``jax.jit`` / optax — mirroring how the reference passes the
``torch.nn.Module`` into user training steps.

Derivative exports:

* ``gradient`` — one reverse-mode sweep (``jax.vjp``), differentiable, so
  losses built on it support the VPINN double-backward;
* ``laplacian`` — forward-over-reverse (JVP of the gradient per coordinate),
  the standard efficient Hessian-diagonal trick; the reference instead loops
  ``torch.autograd.grad`` per coordinate (neural_network.py:102-138).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import config


def identity_bc(x):
    """Default boundary-condition modifier: multiply by one (no constraint)."""
    return jnp.ones_like(x[..., :1])


class FeedForwardNeuralNetwork:
    """MLP with optional strong-Dirichlet boundary modifier.

    Output = net(x) * boundary_condition_modifier(x), so homogeneous
    Dirichlet conditions hold exactly by construction (parity with
    neural_network.py:80-82).
    """

    def __init__(
        self,
        input_dimension: int,
        output_dimension: int,
        nb_hidden_layers: int,
        neurons_per_layers: int,
        activation_function: Callable = jnp.tanh,
        use_xavier_initialization: bool = False,
        boundary_condition_modifier: Optional[Callable] = None,
        seed: int = 0,
        final_layer_scale: float = 1.0,
        *,
        _params: Optional[tuple] = None,
    ):
        self.input_dimension = int(input_dimension)
        self.output_dimension = int(output_dimension)
        self.nb_hidden_layers = int(nb_hidden_layers)
        self.neurons_per_layers = int(neurons_per_layers)
        self.activation_function = activation_function
        self.boundary_condition_modifier = (
            boundary_condition_modifier
            if boundary_condition_modifier is not None
            else identity_bc
        )

        if _params is not None:
            self.weights, self.biases = _params
            return

        dims = (
            [self.input_dimension]
            + [self.neurons_per_layers] * (self.nb_hidden_layers + 1)
            + [self.output_dimension]
        )
        rng = np.random.default_rng(seed)
        dtype = config.default_dtype()
        weights, biases = [], []
        for fan_in, fan_out in zip(dims[:-1], dims[1:]):
            if use_xavier_initialization:
                bound = math.sqrt(6.0 / (fan_in + fan_out))
            else:
                bound = 1.0 / math.sqrt(fan_in)
            weights.append(
                jnp.asarray(
                    rng.uniform(-bound, bound, size=(fan_in, fan_out)), dtype=dtype
                )
            )
            b_bound = 1.0 / math.sqrt(fan_in)
            biases.append(
                jnp.asarray(rng.uniform(-b_bound, b_bound, size=(fan_out,)), dtype=dtype)
            )
        if final_layer_scale != 1.0:
            # shrinking the output layer starts training near u_theta = 0
            # (relative error 1), which stabilizes variational losses
            weights[-1] = weights[-1] * final_layer_scale
            biases[-1] = biases[-1] * final_layer_scale
        self.weights = tuple(weights)
        self.biases = tuple(biases)

    # -- functional core ---------------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward pass at points x (..., input_dimension) -> (..., out)."""
        h = x
        for w, b in zip(self.weights[:-1], self.biases[:-1]):
            h = self.activation_function(h @ w + b)
        h = h @ self.weights[-1] + self.biases[-1]
        return h * self.boundary_condition_modifier(x)

    forward = __call__

    def gradient(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """d(output)/d(inputs), shape (..., input_dimension).

        One reverse-mode sweep; remains differentiable (create_graph parity).
        """
        out, vjp = jax.vjp(self.__call__, inputs)
        return vjp(jnp.ones_like(out))[0]

    def laplacian(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Sum of second derivatives w.r.t. each input coordinate (..., 1)."""
        lap = jnp.zeros_like(inputs[..., :1])
        for i in range(self.input_dimension):
            tangent = jnp.zeros_like(inputs).at[..., i].set(1.0)
            _, hess_col = jax.jvp(self.gradient, (inputs,), (tangent,))
            lap = lap + hess_col[..., i : i + 1]
        return lap

    # -- parameter utilities ----------------------------------------------

    def parameters(self) -> dict:
        """Flat dict of parameter arrays (checkpoint-friendly)."""
        out = {}
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            out[f"w{i}"] = w
            out[f"b{i}"] = b
        return out

    def with_parameters(self, params: dict) -> "FeedForwardNeuralNetwork":
        """Return a copy with parameters replaced (immutably)."""
        n = len(self.weights)
        weights = tuple(jnp.asarray(params[f"w{i}"]) for i in range(n))
        biases = tuple(jnp.asarray(params[f"b{i}"]) for i in range(n))
        return self._replace_params(weights, biases)

    def _replace_params(self, weights, biases) -> "FeedForwardNeuralNetwork":
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        obj.weights = tuple(weights)
        obj.biases = tuple(biases)
        return obj


def _nn_flatten(nn: FeedForwardNeuralNetwork):
    children = (nn.weights, nn.biases)
    aux = (
        type(nn),
        nn.input_dimension,
        nn.output_dimension,
        nn.nb_hidden_layers,
        nn.neurons_per_layers,
        nn.activation_function,
        nn.boundary_condition_modifier,
    )
    return children, aux


def _nn_unflatten(aux, children):
    cls, in_dim, out_dim, n_hidden, width, act, bc = aux
    obj = object.__new__(cls)
    obj.input_dimension = in_dim
    obj.output_dimension = out_dim
    obj.nb_hidden_layers = n_hidden
    obj.neurons_per_layers = width
    obj.activation_function = act
    obj.boundary_condition_modifier = bc
    obj.weights, obj.biases = children
    return obj


jax.tree_util.register_pytree_node(
    FeedForwardNeuralNetwork, _nn_flatten, _nn_unflatten
)
