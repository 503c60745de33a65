"""Activation functions (plain + derivative pairs for dual propagation).

Numerics match the reference implementations:

* tanhExp — y = x * tanh(exp(x)) with linear passthrough above x > 20
  (reference: neddf/nn_module/tanh_exp.py:14-57). The threshold guards
  exp overflow; tanh saturates to 1.0 in float32 well below 20, so the
  branch is value-continuous.
* softplus — threshold-20 linearisation like torch.nn.functional.softplus
  (reference dual version: neddf/nn_module/with_grad/softplus.py).
* leaky_relu — slope 0.01 (reference: with_grad/leaky_relu.py:36-38).

Each entry in ``ACTIVATIONS`` is ``(f, dfdx)``; ``dfdx`` is the exact
first derivative used for the tangent rows of the dual tensor. All
functions are built from differentiable jnp primitives, so higher-order
terms (the 2nd-derivative couplings the reference writes by hand in its
custom ``backward``s) come from JAX autodiff automatically.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_TANHEXP_THRESHOLD = 20.0


def tanh_exp(x: Array) -> Array:
    """TanhExp activation: x * tanh(exp(x)), linear for x > 20."""
    xs = jnp.minimum(x, _TANHEXP_THRESHOLD)  # guard exp overflow in both branches
    return jnp.where(x > _TANHEXP_THRESHOLD, x, x * jnp.tanh(jnp.exp(xs)))


def tanh_exp_deriv(x: Array) -> Array:
    xs = jnp.minimum(x, _TANHEXP_THRESHOLD)
    ex = jnp.exp(xs)
    tx = jnp.tanh(ex)
    d = tx - x * ex * (tx * tx - 1.0)
    return jnp.where(x > _TANHEXP_THRESHOLD, 1.0, d)


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0.0)


def relu_deriv(x: Array) -> Array:
    return (x > 0.0).astype(x.dtype)


def leaky_relu(x: Array, negative_slope: float = 0.01) -> Array:
    return jnp.where(x >= 0.0, x, negative_slope * x)


def leaky_relu_deriv(x: Array, negative_slope: float = 0.01) -> Array:
    return jnp.where(x >= 0.0, 1.0, negative_slope).astype(x.dtype)


def softplus(x: Array) -> Array:
    """Softplus with threshold-20 linearisation (torch semantics)."""
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def softplus_deriv(x: Array) -> Array:
    return jnp.where(x > 20.0, 1.0, jax.nn.sigmoid(x))


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def sigmoid_deriv(x: Array) -> Array:
    s = jax.nn.sigmoid(x)
    return s * (1.0 - s)


# name -> (f, df/dx); names match the reference's ActivationType literals
ACTIVATIONS: Dict[str, Tuple[Callable[[Array], Array], Callable[[Array], Array]]] = {
    "ReLU": (relu, relu_deriv),
    "LeakyReLU": (leaky_relu, leaky_relu_deriv),
    "tanhExp": (tanh_exp, tanh_exp_deriv),
    "Softplus": (softplus, softplus_deriv),
    "Sigmoid": (sigmoid, sigmoid_deriv),
}
