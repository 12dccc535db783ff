"""Training losses.

Behavioural contract: reference `crowdsam/utils.py` — dice_loss (:526-546),
mIoU (:547-555), sigmoid_focal_loss (:265-311, defined there but unused by
the trainer; kept for API parity) — and the composite adapter loss of
`tools/train.py:147-204`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """inputs (B, K, ...) logits, targets (B, 1|K, ...) binary.

    Flattens trailing dims like the reference (inputs.flatten(2)); returns
    (B, K) per-pair losses."""
    probs = jax.nn.sigmoid(inputs)
    b, k = probs.shape[0], probs.shape[1]
    probs = probs.reshape(b, k, -1)
    targets = targets.reshape(targets.shape[0], targets.shape[1], -1)
    numerator = 2 * (probs * targets).sum(-1)
    denominator = probs.sum(-1) + targets.sum(-1)
    return 1 - (numerator + 1) / (denominator + 1)


def miou(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """inputs (B, K, H, W) logits, targets (B, 1, H, W) binary -> (B, K) IoU
    of the binarized inputs vs targets (reference mIoU)."""
    mask_bin = (inputs > 0).astype(jnp.float32)
    b, k = mask_bin.shape[0], mask_bin.shape[1]
    mask_bin = mask_bin.reshape(b, k, -1)
    targets = targets.reshape(targets.shape[0], targets.shape[1], -1).astype(
        jnp.float32
    )
    inter = (mask_bin * targets).sum(-1)
    union = mask_bin.sum(-1) + targets.sum(-1) - inter
    return inter / jnp.maximum(union, 1e-9)


def sigmoid_focal_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """RetinaNet focal loss, sum over last dim then mean (reference :265-311)."""
    p = jax.nn.sigmoid(preds)
    ce = jnp.maximum(preds, 0) - preds * targets + jnp.log1p(jnp.exp(-jnp.abs(preds)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.sum(axis=-1).mean()


def adapter_loss(
    low_res_masks: jnp.ndarray,      # (P, K, R, R) logits
    fused_iou: jnp.ndarray,          # (P, K) iou_pred * sigmoid(cls)
    cls_logits: jnp.ndarray,         # (C, R, R) FG-map logits
    target_masks: jnp.ndarray,       # (P_pos, R, R) binary pseudo-GT
    fg_mask: jnp.ndarray,            # (R, R) binary union of GT
    region_valid: jnp.ndarray,       # (R, R) valid-region mask (256-scale crop)
    num_pos: int,
    mask_loss: bool = False,
    neg_hinge_weight: float = 0.0,
    neg_hinge_margin: float = 0.05,
):
    """Composite adapter loss (reference `tools/train.py:147-204`):
    - MSE between fused IoU and the true mIoU of each positive's masks
      (zero targets for negatives), split pos/neg;
    - dice between the FG-map logits and the union-of-GT mask over the
      valid (unpadded) region."""
    pos_masks = low_res_masks[:num_pos]
    iou_true = miou(pos_masks, target_masks[:, None])  # (P_pos, K)

    iou_target = jnp.zeros_like(fused_iou)
    iou_target = iou_target.at[:num_pos].set(iou_true)
    cls_loss = jnp.square(fused_iou - iou_target).sum(axis=1)
    pos_cls_loss = cls_loss[:num_pos].mean()
    neg_cls_loss = cls_loss[num_pos:].mean()

    # FG-map dice over the valid region (the reference crops to the scaled
    # image extent; masking is equivalent for the dice sums).
    v = region_valid[None]
    fg_dice = dice_loss(
        (cls_logits * v - 1e4 * (1 - v))[None],
        (fg_mask[None] * v)[None],
    ).mean()

    out = {
        "pos_cls_loss": pos_cls_loss,
        "neg_cls_loss": neg_cls_loss,
        "dice_loss": fg_dice,
    }
    if mask_loss:
        # TPU-repo extension for full-decoder training (train.full_decoder,
        # no pretrained SAM in this environment): supervise the predicted
        # masks themselves.  The reference's adapter set never touches the
        # mask path, so it has no such term (tools/train.py:147-204).
        # Best-of-K like SAM: only the closest head per prompt gets gradient.
        per_k = dice_loss(pos_masks, target_masks[:, None])  # (P_pos, K)
        out["mask_dice_loss"] = per_k.min(axis=1).mean()
    if neg_hinge_weight > 0.0:
        # TPU-repo calibration extension (train.neg_hinge_weight, default
        # off): square hinge pushing every negative prompt's fused score
        # below `neg_hinge_margin` — the MSE term's gradient vanishes as
        # fused -> 0, which leaves background plateaued just above the
        # inference pred_iou threshold (0.1) on the bench fixture.
        h = jnp.maximum(fused_iou[num_pos:] - neg_hinge_margin, 0.0)
        out["neg_hinge_loss"] = (
            neg_hinge_weight * jnp.square(h).sum(axis=1).mean()
        )
    return out
