"""Activation functions matching the reference's factory.

Reference: `get_actvn_layer` (`/root/reference/anatomix/model/network.py:
171-204`). Note the UNet-level factory uses LeakyReLU slope 0.3 (the
ConvBlock one uses 0.2, but ConvBlock is not used by the UNet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_activation(name: str, *, lrelu_slope: float = 0.3):
    """Return an elementwise activation callable, or None for 'none'."""
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=lrelu_slope)
    if name == "elu":
        return jax.nn.elu
    if name == "selu":
        return jax.nn.selu
    if name == "tanh":
        return jnp.tanh
    if name == "prelu":
        # PReLU has a learned parameter; handled at the layer level (see
        # `prelu` below and `models/unet.py`). The callable here is the
        # init-value (0.25) static version.
        return lambda x: prelu(x, 0.25)
    if name == "none":
        return None
    raise ValueError(f"Unsupported activation: {name}")


def prelu(x, weight):
    """torch `nn.PReLU`: `max(0,x) + weight * min(0,x)`.

    `weight` is a learnable array — shape (1,) for torch's default
    `num_parameters=1` (one scalar shared across channels, init 0.25,
    `network.py:91,193`) — broadcast against x.
    """
    w = jnp.asarray(weight).astype(x.dtype)
    return jnp.where(x >= 0, x, w * x)
