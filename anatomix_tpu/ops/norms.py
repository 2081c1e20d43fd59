"""Normalization layers matching torch semantics, channel-last (NDHWC).

Matches the reference norm factory (`/root/reference/anatomix/model/
network.py:127-168`):

* 'batch'    -> BatchNorm3d(eps): affine, running stats (eval uses them).
* 'instance' -> InstanceNorm3d(eps): per-sample/channel spatial stats,
                no affine, no running stats (train == eval).
* 'instance_affine' -> instance norm with learned scale/bias.

Normalization statistics are always computed in float32 regardless of the
activations' dtype (the TPU-native replacement for AMP: bf16 matmuls with
fp32 norms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(
    x: jax.Array,
    *,
    eps: float = 1e-5,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """InstanceNorm over spatial dims of an NDHWC array.

    torch InstanceNorm3d(track_running_stats=False) uses biased variance and
    identical behavior in train and eval. With `axis_name`, statistics are
    all-reduced over that mesh axis (spatially sharded volumes; shards must
    be equal-sized).
    """
    # one-pass E[x²]−E[x]² statistics: the (x − mean)² form has two uses
    # of a full-size f32 intermediate, which XLA materializes to HBM (a
    # ~2.7 ms copy per norm at 128³×32ch); the moment form keeps the only
    # full-size pass inside the final normalize fusion. f32 moments are
    # ample for unit-scale activations.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        m2 = jax.lax.pmean(m2, axis_name)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_inference(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """BatchNorm3d in eval mode: running stats + affine, per channel."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(
        jnp.float32
    )
    shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    return (x.astype(jnp.float32) * inv + shift).astype(x.dtype)


def batch_norm_train(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    momentum: float = 0.1,
    axis_name: str | None = None,
):
    """BatchNorm3d in train mode.

    Normalizes with current-batch statistics (biased variance) and returns
    `(y, new_running_mean, new_running_var)` where the running stats are
    updated with the *unbiased* variance, exactly like torch.

    If `axis_name` is given, statistics are all-reduced across that mesh axis
    (the TPU-native equivalent of SyncBatchNorm over ICI).
    """
    x32 = x.astype(jnp.float32)
    reduce_axes = (0, 1, 2, 3)
    mean = jnp.mean(x32, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
    n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    var = mean_sq - jnp.square(mean)  # biased
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    return y.astype(x.dtype), new_mean, new_var


def channel_demean(x: jax.Array) -> jax.Array:
    """Subtract each channel's *spatial* mean (the ViT 'demean' output norm,
    `/root/reference/anatomix/model/vit3d/architectures.py:28-33`: NDHWC
    equivalent of `x - x.mean(dim=(2,3,4))`)."""
    return x - jnp.mean(x, axis=(1, 2, 3), keepdims=True)


def channel_layer_norm(x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """Per-voxel LayerNorm over channels, no affine (ViT ChannelLayerNorm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
