"""Multi-stage training loss.

Behavioral reference: models/losses.py:6-48 (final_loss) in
TruongKhang/cds-mvsnet. Per stage: masked smooth-L1 on interval-normalized
depth + 0.1 x masked mean curvature + 5 x class-balanced BCE-with-logits on
the per-depth-bin feature similarity, each scaled by dlossw[stage]; plus 2 x
smooth-L1 on the refined depth vs the stage-4 ground truth.

Masked reductions are implemented with where-sums (fixed shapes — no boolean
indexing, which would be dynamic under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["final_loss", "smooth_l1", "masked_mean"]


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _bce_with_logits(logits, target, pos_weight):
    # torch BCEWithLogits: -[w_p t log σ(x) + (1-t) log(1-σ(x))], stable form.
    log_sig = -jnp.logaddexp(0.0, -logits)  # log σ(x)
    log_one_minus = -jnp.logaddexp(0.0, logits)  # log(1-σ(x))
    return -(pos_weight * target * log_sig + (1 - target) * log_one_minus)


def final_loss(
    outputs: dict,
    depth_gt_ms: dict[str, jnp.ndarray],
    mask_ms: dict[str, jnp.ndarray],
    dlossw,
    depth_interval: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (total_loss, last-stage depth_loss). ``depth_interval (B,)``."""
    di = depth_interval[:, None, None]
    total = jnp.float32(0.0)
    depth_loss = jnp.float32(0.0)

    for stage_idx, stage_key in enumerate(["stage1", "stage2", "stage3"]):
        stage = outputs[stage_key]
        mask = mask_ms[stage_key] > 0.5  # (B, h, w)
        err = (stage["depth"] - depth_gt_ms[stage_key]) / di
        depth_loss = masked_mean(smooth_l1(err), mask)
        norm_curv_reg = masked_mean(stage["norm_curv"], mask)

        feat_loss = 0.0
        if "feat_distance" in stage:
            feat_dis = stage["feat_distance"]  # (B, D+1, h, w)
            target = stage["feat_target"]
            mask_d = jnp.broadcast_to(mask[:, None], target.shape)
            m = mask_d.astype(jnp.float32)
            pos = jnp.sum(target * m)
            neg = jnp.sum(m) - pos
            balanced_weight = neg / jnp.maximum(pos, 1.0)
            feat_loss = masked_mean(_bce_with_logits(feat_dis, target, balanced_weight), mask_d)

        w = dlossw[stage_idx] if dlossw is not None else 1.0
        total = total + w * (depth_loss + 5.0 * feat_loss + 0.1 * norm_curv_reg)

    if "refined_depth" in outputs and "stage4" in depth_gt_ms:
        mask4 = mask_ms["stage4"] > 0.5
        err = (outputs["refined_depth"] - depth_gt_ms["stage4"]) / di
        depth_loss = masked_mean(smooth_l1(err), mask4)
        total = total + 2.0 * depth_loss

    return total, depth_loss
