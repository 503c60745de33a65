"""Loss functions (pure, jit-traceable).

Behavioural twins of neddf/loss/*: key-based losses that read
``outputs[key_output]`` vs ``targets[key_target]`` and emit
``{key_loss: w * loss}`` plus a ``*_coarse`` duplicate when
weight_coarse > 0 (base_loss.py:45-84).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


class BaseLoss:
    key_output: str
    key_target: str
    key_loss: str

    def __init__(self, weight: float = 1.0, weight_coarse: float = 0.1) -> None:
        self.weight = weight
        self.weight_coarse = weight_coarse

    def loss(self, output: Array, target: Array) -> Array:
        raise NotImplementedError()

    def __call__(
        self, outputs: Dict[str, Array], targets: Dict[str, Array]
    ) -> Dict[str, Array]:
        out = {
            self.key_loss: self.weight
            * self.loss(outputs[self.key_output], targets[self.key_target])
        }
        if self.weight_coarse > 0.0:
            out[f"{self.key_loss}_coarse"] = self.weight_coarse * self.loss(
                outputs[f"{self.key_output}_coarse"], targets[self.key_target]
            )
        return out


class ColorLoss(BaseLoss):
    """MSE on rendered color (color_loss.py:41-55)."""

    key_output = key_target = key_loss = "color"

    def loss(self, output: Array, target: Array) -> Array:
        return jnp.mean(jnp.square(output - target))


class MaskBCELoss(BaseLoss):
    """BCE on (1 - transmittance) vs mask, clamped (mask_bce_loss.py:41-59)."""

    key_output = "transmittance"
    key_target = "mask"
    key_loss = "mask"

    def loss(self, output: Array, target: Array) -> Array:
        mask_output = jnp.clip(1.0 - output, 1e-6, 1.0 - 1e-6)
        return -jnp.mean(
            target * jnp.log(mask_output) + (1.0 - target) * jnp.log(1.0 - mask_output)
        )


class MaskMSELoss(BaseLoss):
    """MSE on (1 - transmittance) vs mask (mask_mse_loss.py:40-55)."""

    key_output = "transmittance"
    key_target = "mask"
    key_loss = "mask"

    def loss(self, output: Array, target: Array) -> Array:
        mask_output = jnp.clip(1.0 - output, 1e-6, 1.0 - 1e-6)
        return jnp.mean(jnp.square(mask_output - target))


class FieldsConstraintLoss(BaseLoss):
    """Mean of the integrated field-constraint penalty
    (fields_constraint_loss.py:40-54; target is a zeros placeholder)."""

    key_output = key_target = key_loss = "fields_penalty"

    def loss(self, output: Array, target: Array) -> Array:
        del target
        return jnp.mean(output)
