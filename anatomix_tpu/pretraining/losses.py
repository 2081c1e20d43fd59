"""Supervised patch contrastive (SupPatchNCE) loss.

Semantics match `SupPatchNCELoss` (`/root/reference/pretraining/models/
supcl_model.py:16-226`): cosine-similarity Gram matrix over the 2·P sampled
patch embeddings of the two views, temperature scaling, row-max
stabilization, self-contrast masking, positives = same segmentation label
(both views share the synthetic subject's seg, so the (P, P) same-label mask
tiles to (2P, 2P)), with optional *rarity weighting* (inverse-class-count
anchor weights) and the *balanced (BCL-style) denominator* (per-class
log-weighted logsumexp). `weighting_mode='sqrt'` softens both corrections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sup_patch_nce_loss(
    features: jax.Array,  # (2, P, C) projector outputs (unnormalized)
    labels: jax.Array,  # (P,) integer class of each sampled voxel
    *,
    temperature: float = 0.07,
    weigh_rarity: bool = False,
    balance_denominator: bool = False,
    weighting_mode: str = "raw",
) -> jax.Array:
    n_views, P, C = features.shape
    feat = features.reshape(n_views * P, C).astype(jnp.float32)
    feat = feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-8
    )

    logits = (feat @ feat.T) / temperature
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True)
    )

    labels2 = jnp.tile(labels.reshape(-1), n_views)  # (2P,)
    same_class = (labels2[:, None] == labels2[None, :]).astype(jnp.float32)
    class_counts = jnp.sum(same_class, axis=1)  # includes self, >= n_views

    eye = jnp.eye(n_views * P, dtype=jnp.float32)
    logits_mask = 1.0 - eye
    mask_pos = same_class * logits_mask

    if balance_denominator:
        # weight each contrast item by the inverse size of its own class
        # (self excluded) so every class contributes equal repulsion mass
        n_per_class = class_counts[None, :] - same_class
        if weighting_mode == "sqrt":
            n_per_class = jnp.sqrt(n_per_class)
        log_w = jnp.where(
            logits_mask > 0,
            -jnp.log(jnp.maximum(n_per_class, 1e-12)),
            -jnp.inf,
        )
        log_denom = jax.nn.logsumexp(logits + log_w, axis=1, keepdims=True)
    else:
        # masked logsumexp == log(sum(exp(logits) * logits_mask))
        masked = jnp.where(logits_mask > 0, logits, -jnp.inf)
        log_denom = jax.nn.logsumexp(masked, axis=1, keepdims=True)

    log_prob = logits - log_denom
    mean_log_prob_pos = jnp.sum(mask_pos * log_prob, axis=1) / jnp.maximum(
        jnp.sum(mask_pos, axis=1), 1.0
    )
    loss = -mean_log_prob_pos

    if weigh_rarity:
        counts = (
            jnp.sqrt(class_counts)
            if weighting_mode == "sqrt"
            else class_counts
        )
        w = 1.0 / counts
        return jnp.sum(w * loss) / jnp.sum(w)
    return jnp.mean(loss)
