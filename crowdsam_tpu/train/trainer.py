"""10-shot PWD-Net adapter trainer.

Behavioural contract: reference `tools/train.py`:
- feature cache (:50-106): per shot, one dual-backbone encode + GT-box
  prompts -> pseudo-GT low-res masks;
- train loop (:205-267): 2000 steps; per step sample 30 positive point
  prompts (one random interior pixel of a sampled GT mask) + 30 negative
  points from background at 256 scale, all labeled 1; losses = MSE between
  fused IoU (iou_pred * sigmoid(cls)) and true per-mask mIoU (zero targets
  for negatives) + dice of the FG map vs union-of-GT; grad clip 0.1, AdamW
  lr 1e-5 wd 1e-4 over {dino_proj, point_classifier, parallel_iou_head}
  only (:294-306);
- the reference builds SAM with .eval() and never re-enables train mode, so
  DropMLP dropout is inactive during training — quirk preserved
  (build_sam.py:153, mask_decoder.py:247-251).

TPU-native: the cache is stacked into device arrays (boxes padded to a
static max); each step is ONE jitted program — on-device prompt sampling
(Gumbel tricks), forward, loss, backward, masked AdamW update.  Gradients
are taken only w.r.t. the adapter subtree, so XLA prunes the transformer
backward exactly like the reference's requires_grad=False graph.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from crowdsam_tpu.train.losses import adapter_loss
from crowdsam_tpu.utils.logging import get_logger

ADAPTER_KEYS = ("parallel_iou_head", "point_classifier", "dino_proj")


def split_adapter_params(dec_params: Dict[str, Any], full: bool = False):
    """Decoder params -> (adapter subtree, frozen subtree).

    `full=True` makes the ENTIRE mask decoder trainable — a TPU-repo
    extension beyond the reference's head-only adapter set (reference
    tools/train.py:289-300 freezes everything but the PWD heads because it
    starts from pretrained SAM).  Used when no pretrained SAM exists
    (bench fixtures in this environment): with random frozen weights only
    full-decoder training can learn prompt-conditioned masks.  Config:
    `train.full_decoder: true`."""
    flat = traverse_util.flatten_dict(dec_params)
    if full:
        return traverse_util.unflatten_dict(dict(flat)), {}
    adapter = {k: v for k, v in flat.items() if k[0] in ADAPTER_KEYS}
    frozen = {k: v for k, v in flat.items() if k[0] not in ADAPTER_KEYS}
    return (
        traverse_util.unflatten_dict(adapter),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(adapter, frozen):
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(adapter))
    return traverse_util.unflatten_dict(flat)


def _opt_state_to_dict(opt_state):
    from flax import serialization

    return serialization.to_state_dict(opt_state)


def _restore_opt_state(template, state_dict):
    from flax import serialization

    restored = serialization.from_state_dict(template, state_dict)
    return jax.tree_util.tree_map(jnp.asarray, restored)


class AdapterTrainer:
    def __init__(self, config: Dict[str, Any], predictor, logger=None):
        """predictor: a SamPredictor with DINOv2 attached."""
        self.config = config
        self.predictor = predictor
        self.sam = predictor.model
        self.logger = logger or get_logger()
        tr = config["train"]
        self.n_shot = tr["n_shot"]
        self.steps = tr["steps"]
        self.pos_sample = tr["samples_per_batch"]
        self.neg_factor = tr["neg_factor"]
        self.neg_sample = int(self.neg_factor * self.pos_sample)
        self.lr = tr["lr"]
        self.weight_decay = tr["weight_decay"]
        self.seed = tr.get("seed", 1)
        self.full_decoder = bool(tr.get("full_decoder", False))
        # Calibration extensions (TPU-repo; default off = reference
        # semantics, tools/train.py:147-204).  hard_neg_frac routes that
        # fraction of the negative prompts to the points the CURRENT FG map
        # scores highest (background the model is confidently wrong about —
        # exactly the prompts the EPS sampler will pick at inference);
        # neg_hinge_weight adds w * relu(fused - margin)^2 on negative
        # fused scores, pushing background below the pred_iou threshold.
        self.hard_neg_frac = float(tr.get("hard_neg_frac", 0.0))
        self.neg_hinge_weight = float(tr.get("neg_hinge_weight", 0.0))
        self.neg_hinge_margin = float(tr.get("neg_hinge_margin", 0.05))
        self.clip_grad = 0.1
        self.low_res = self.sam.img_size // 4

    # ------------------------------------------------------------------ cache
    def cache_features(self, dataset) -> Dict[str, jnp.ndarray]:
        """Encode each shot once; decode GT-box prompts into pseudo-GT masks
        (reference cache_feature, train.py:50-106)."""
        n = min(self.n_shot, len(dataset))
        feats, dinos, masks, counts, hws = [], [], [], [], []
        box_lists = []
        for i in range(n):
            img, nboxes = dataset[i]
            h, w = img.shape[:2]
            boxes = nboxes * np.array([w, h, w, h])
            box_lists.append(boxes)
            hws.append((h, w))
        maxb = int(np.ceil(max(len(b) for b in box_lists) / 8) * 8)

        for i in range(n):
            img, _ = dataset[i]
            h, w = hws[i]
            boxes = box_lists[i]
            self.predictor.set_image(img)
            tb = self.predictor.transform.apply_boxes(
                boxes, self.predictor.original_size
            )
            padded = np.zeros((maxb, 4), dtype=np.float32)
            padded[: len(boxes)] = tb
            if self.full_decoder:
                # Full-decoder training (no pretrained SAM): pseudo-GT from
                # the model's own GT-box decodes would be random-weight
                # noise, so the targets are the GT boxes themselves as
                # filled rectangles in the low-res (input/4) frame.
                m = np.zeros((maxb, self.low_res, self.low_res), bool)
                for bi, bx in enumerate(tb / 4.0):
                    x0, y0 = np.floor(bx[:2]).astype(int)
                    x1, y1 = np.ceil(bx[2:]).astype(int)
                    m[bi, max(y0, 0): y1 + 1, max(x0, 0): x1 + 1] = True
            else:
                _, _, _, low_res = self.predictor.predict_batch(
                    boxes=jnp.asarray(padded),
                    multimask_output=False,
                    return_full_masks=False,
                )
                m = np.array(low_res[:, 0] > self.sam.mask_threshold)
            m[len(boxes):] = False
            feats.append(np.asarray(self.predictor.features[0]))
            dinos.append(np.asarray(self.predictor.dino_feats[0]))
            masks.append(m)
            counts.append(len(boxes))
            self.logger.info(f"cached shot {i}: {len(boxes)} boxes")
        self.predictor.reset_image()

        cache = {
            "features": jnp.asarray(np.stack(feats)),
            "dino_feats": jnp.asarray(np.stack(dinos)),
            "target_masks": jnp.asarray(np.stack(masks)),
            "fg_mask": jnp.asarray(np.stack([m.any(axis=0) for m in masks])),
            "n_boxes": jnp.asarray(counts, jnp.int32),
            "img_hw": jnp.asarray(hws, jnp.float32),
        }
        return cache

    # ------------------------------------------------------------------ step
    def _build_step(self, cache, mesh=None):
        """mesh: optional 2D jax.sharding.Mesh ('data', 'model').  With a
        mesh, the prompt axis is data-parallel across 'data' (each chip
        decodes a slice of the 60 point prompts against the replicated image
        embedding — the natural parallelism of this model, SURVEY.md §2.5)
        and the projected DINO map is spatially sharded over 'model'; XLA
        inserts the gradient psums."""
        sam = self.sam
        r = self.low_res
        pos_n, neg_n = self.pos_sample, self.neg_sample
        pe_params = sam.params["prompt_encoder"]

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            def shard_prompts(x):
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, Pspec("data", *[None] * (x.ndim - 1)))
                )

            def shard_spatial(x):
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, Pspec("model", *[None] * (x.ndim - 1)))
                )
        else:
            shard_prompts = shard_spatial = lambda x: x
        dense_pe = sam.prompt_encoder.apply(
            {"params": pe_params}, method=sam.prompt_encoder.get_dense_pe
        )

        def loss_fn(adapter_p, frozen_p, shot, key):
            dec_params = merge_params(adapter_p, frozen_p)
            features = cache["features"][shot][None]
            dino = cache["dino_feats"][shot]          # (Gd, Gd, C)
            tmasks_all = cache["target_masks"][shot]  # (MAXB, R, R)
            fg = cache["fg_mask"][shot]
            nb = cache["n_boxes"][shot]
            h, w = cache["img_hw"][shot][0], cache["img_hw"][shot][1]

            k1, k2, k3 = jax.random.split(key, 3)
            # -- positive prompts: random GT mask, random interior pixel ----
            pos_idx = jax.random.randint(k1, (pos_n,), 0, nb)
            tmasks = tmasks_all[pos_idx]  # (pos_n, R, R)
            g = jax.random.gumbel(k2, (pos_n, r * r))
            flat = jnp.where(tmasks.reshape(pos_n, -1), g, -jnp.inf)
            pidx = jnp.argmax(flat, axis=-1)
            pos_pts = jnp.stack([pidx % r, pidx // r], axis=-1).astype(jnp.float32)

            # Differentiable DINO projection (trainable dino_proj feeds both
            # the pooling and FG-map paths, reference predict_masks :187).
            # Computed before prompt sampling so hard-negative mining can
            # read the current FG map.
            proj = sam.mask_decoder.apply(
                {"params": dec_params}, dino[None],
                method=sam.mask_decoder.project_dino,
            )[0]  # (Gd, Gd, 256)

            # FG map from the same projection (predict_fg_map path).
            cls_map = sam.mask_decoder.apply(
                {"params": dec_params}, proj[None],
                method=sam.mask_decoder.classify_points,
            )[0]  # (Gd, Gd, C)
            cls_map = jax.image.resize(
                cls_map.astype(jnp.float32), (r, r, cls_map.shape[-1]),
                "linear", antialias=False,
            ).transpose(2, 0, 1)

            # -- negative prompts: background of the 256-scale valid region -
            scale = jnp.minimum(r / h, r / w)
            ri = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
            valid = (ri < (scale * h).astype(jnp.int32)) & (
                ci < (scale * w).astype(jnp.int32)
            )
            ok = (~fg) & valid
            gn = jax.random.gumbel(k3, (r * r,))
            n_hard = int(round(self.hard_neg_frac * neg_n))
            if n_hard > 0:
                # Hard negatives: background points the CURRENT FG map is
                # most confident about (these are the false positives the
                # EPS sampler feeds the decoder at inference).  Gumbel noise
                # keeps the picks varied across steps (detached: selection
                # indices carry no gradient anyway).
                fg_conf = jax.lax.stop_gradient(
                    jnp.max(cls_map, axis=0)
                ).reshape(-1)
                hard_logits = jnp.where(ok.reshape(-1), fg_conf + gn, -jnp.inf)
                _, hidx = jax.lax.top_k(hard_logits, n_hard)
                uni_logits = jnp.where(ok.reshape(-1), gn, -jnp.inf)
                _, uidx = jax.lax.top_k(uni_logits, neg_n - n_hard)
                nidx = jnp.concatenate([hidx, uidx])
            else:
                neg_logits = jnp.where(ok.reshape(-1), gn, -jnp.inf)
                _, nidx = jax.lax.top_k(neg_logits, neg_n)
            neg_pts = jnp.stack([nidx % r, nidx // r], axis=-1).astype(jnp.float32)

            # 256-frame -> image frame -> input frame (train.py:233-236)
            pts = jnp.concatenate([pos_pts, neg_pts], axis=0) / scale
            in_scale = sam.img_size / jnp.maximum(h, w)
            new_h = jnp.floor(h * in_scale + 0.5)
            new_w = jnp.floor(w * in_scale + 0.5)
            pts = pts * jnp.stack([new_w / w, new_h / h])
            labels = jnp.ones((pos_n + neg_n, 1), jnp.int32)

            sparse, dense = sam.prompt_encoder.apply(
                {"params": pe_params}, points=(shard_prompts(pts)[:, None, :], labels)
            )
            sparse = shard_prompts(sparse)
            dense = shard_prompts(dense)
            proj_r = shard_spatial(
                jax.image.resize(
                    proj, (r, r, proj.shape[-1]), "linear", antialias=False
                )
            )
            masks, iou_pred, cls_scores = sam.mask_decoder.apply(
                {"params": dec_params},
                features, dense_pe, sparse, dense, True,
                dino_feats_proj=proj_r,
            )
            fused_iou = iou_pred * jax.nn.sigmoid(cls_scores[..., 0])

            losses = adapter_loss(
                masks, fused_iou, cls_map,
                tmasks, fg.astype(jnp.float32), valid.astype(jnp.float32),
                num_pos=pos_n,
                mask_loss=self.full_decoder,
                neg_hinge_weight=self.neg_hinge_weight,
                neg_hinge_margin=self.neg_hinge_margin,
            )
            return sum(losses.values()), losses

        tx = optax.chain(
            optax.clip_by_global_norm(self.clip_grad),
            optax.adamw(self.lr, weight_decay=self.weight_decay),
        )

        @jax.jit
        def train_step(adapter_p, frozen_p, opt_state, shot, key):
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                adapter_p, frozen_p, shot, key
            )
            updates, opt_state = tx.update(grads, opt_state, adapter_p)
            adapter_p = optax.apply_updates(adapter_p, updates)
            return adapter_p, opt_state, total, losses

        return tx, train_step

    # ------------------------------------------------------------------ train
    def train(
        self,
        dataset,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 500,
        resume: bool = True,
        losses_out: Dict[str, float] | None = None,
    ) -> Dict[str, Any]:
        """Runs the full loop; returns the updated mask_decoder params.
        `losses_out`: optional dict filled with the final step's loss terms.

        With `checkpoint_dir`, the adapter params + optimizer state are
        written every `checkpoint_every` steps and training resumes from the
        latest checkpoint (the reference has no mid-training checkpointing
        or resume at all — SURVEY.md §5)."""
        import os

        from crowdsam_tpu.utils.checkpoint import load_pytree, save_pytree

        cache = self.cache_features(dataset)
        n_cached = int(cache["features"].shape[0])
        adapter_p, frozen_p = split_adapter_params(
            self.sam.params["mask_decoder"], full=self.full_decoder)
        _KERNEL_FLAGS = ("CROWDSAM_DISABLE_MASK_HEAD_KERNEL",
                         "CROWDSAM_DISABLE_TAIL_KERNEL",
                         "CROWDSAM_DISABLE_PALLAS_LN",
                         "CROWDSAM_DISABLE_FLASH",
                         "CROWDSAM_DISABLE_FUSED_WINDOW")
        _saved_flags = {f: os.environ.get(f) for f in _KERNEL_FLAGS}
        if self.full_decoder:
            # The decoder's Pallas inference kernels (mask head / decode
            # tail / fused LN) have no VJP; with the full decoder trainable
            # the backward pass hits them.  Gating is read at trace time, so
            # disabling for the duration of the loop (the jitted step traces
            # on its first call) selects the differentiable jnp paths; the
            # env is restored afterwards so inference programs traced later
            # keep their kernels.  Head-only adapter training never
            # differentiates through the kernels — reference set unchanged.
            for flag in _KERNEL_FLAGS:
                os.environ[flag] = "1"
        tx, train_step = self._build_step(cache)
        opt_state = tx.init(adapter_p)
        key = jax.random.PRNGKey(self.seed)

        start_step = 0
        ckpt_path = (
            os.path.join(checkpoint_dir, "trainer_state.msgpack")
            if checkpoint_dir
            else None
        )
        if resume and ckpt_path and os.path.exists(ckpt_path):
            state = load_pytree(ckpt_path)
            start_step = int(state["step"])
            adapter_p = jax.tree_util.tree_map(jnp.asarray, state["adapter"])
            opt_state = _restore_opt_state(opt_state, state["opt_state"])
            self.logger.info(f"resumed from {ckpt_path} at step {start_step}")

        t0 = time.time()
        try:
            for step in range(start_step, self.steps):
                shot = jnp.int32(step % n_cached)
                step_key = jax.random.fold_in(key, step)
                adapter_p, opt_state, total, losses = train_step(
                    adapter_p, frozen_p, opt_state, shot, step_key
                )
                if step % 100 == 0:
                    ld = {k: round(float(v), 3) for k, v in losses.items()}
                    rate = (step - start_step + 1) / (time.time() - t0)
                    self.logger.info(
                        f"step: {step}/{self.steps} "
                        + " ".join(f"{k}: {v}" for k, v in ld.items())
                        + f" ({rate:.1f} it/s)"
                    )
                if ckpt_path and (step + 1) % checkpoint_every == 0:
                    save_pytree(ckpt_path, {
                        "step": np.asarray(step + 1),
                        "adapter": jax.tree_util.tree_map(
                            np.asarray, adapter_p),
                        "opt_state": jax.tree_util.tree_map(
                            np.asarray, _opt_state_to_dict(opt_state)
                        ),
                    })
        finally:
            for flag, old in _saved_flags.items():
                if old is None:
                    os.environ.pop(flag, None)
                else:
                    os.environ[flag] = old

        if losses_out is not None and self.steps > start_step:
            losses_out.update(
                {k: float(v) for k, v in losses.items()})
        new_dec = merge_params(adapter_p, frozen_p)
        self.sam.params["mask_decoder"] = new_dec
        return new_dec
