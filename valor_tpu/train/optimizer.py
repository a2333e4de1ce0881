"""Multi-group AdamW via optax.

Replaces the reference's 5x2 param-group optimizer (optim/misc.py:13-100):
five LR groups (basic / new / clip-visual / clip-text / decoder) crossed
with decay vs no-decay (bias + LayerNorm params), each with its own
schedule-scaled LR.  On TPU the whole fused update chain (global-norm clip
-> adamw moments -> weight decay -> lr scale) compiles into a handful of
fused XLA kernels — the role apex's multi_tensor kernels played on GPU
(SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import optax

from valor_tpu.core.config import TrainConfig
from valor_tpu.train.schedule import make_schedule

NO_DECAY_SUFFIXES = ("bias", "scale")  # our LayerNorm params are scale/bias


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_group(path_str: str, new_params_name: Sequence[str]) -> str:
    """Group name for a parameter path (reference: optim/misc.py:33-64).

    clip params split visual/text; 'decoder' head params; user-listed new
    params; everything else basic.
    """
    p = path_str
    if "clip" in p and ("vision" in p or "visual" in p):
        return "clip_visual"
    if "clip" in p:
        return "clip_text"
    if "multimodal_encoder/decoder" in p:
        return "decoder"
    if any(n in p for n in new_params_name):
        return "new"
    return "basic"


def is_no_decay(path_str: str) -> bool:
    last = path_str.rsplit("/", 1)[-1]
    # biases, LN scale/bias, and bare embeddings-like 1D params follow the
    # reference convention ['bias','LayerNorm.bias','LayerNorm.weight']
    return last in ("bias", "scale") or last.endswith("_bias")


def is_frozen(path_str: str, frozen_vision: bool, frozen_multimodal: bool) -> bool:
    """Frozen-parameter predicates (reference: modeling.py:319-322 vision,
    :675-682 multimodal-except-cross-attn + cls head)."""
    p = path_str
    if frozen_vision and ("clip_vision" in p or p.startswith("video_encoder")):
        return True
    if frozen_multimodal:
        if p.startswith("cls_head"):
            return True
        if p.startswith("multimodal_encoder") and "cross" not in p:
            return True
    return False


def label_params(
    params,
    new_params_name: Sequence[str],
    frozen_vision: bool = False,
    frozen_multimodal: bool = False,
):
    def lbl(path, _):
        p = _path_str(path)
        if is_frozen(p, frozen_vision, frozen_multimodal):
            return "frozen"
        g = param_group(p, new_params_name)
        d = "nd" if is_no_decay(p) else "wd"
        return f"{g}_{d}"

    return jax.tree_util.tree_map_with_path(lbl, params)


def build_optimizer(
    params,
    cfg: TrainConfig,
    frozen_vision: bool = False,
    frozen_multimodal: bool = False,
) -> optax.GradientTransformation:
    decoder_lr = cfg.decoder_lr if cfg.decoder_lr != -1 else cfg.learning_rate
    group_lr = {
        "basic": cfg.learning_rate,
        "new": cfg.new_lr if cfg.new_lr > 0 else cfg.learning_rate,
        "clip_visual": cfg.clip_lr,
        "clip_text": cfg.clip_lr_text,
        "decoder": decoder_lr,
    }

    def adamw_for(group: str, decay: bool):
        sched = make_schedule(
            cfg.scheduler, group_lr[group], cfg.num_train_steps, cfg.warmup_ratio
        )
        return optax.adamw(
            learning_rate=sched,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=1e-6,
            weight_decay=cfg.weight_decay if decay else 0.0,
        )

    transforms: Dict[str, Any] = {}
    for g in group_lr:
        transforms[f"{g}_wd"] = adamw_for(g, True)
        transforms[f"{g}_nd"] = adamw_for(g, False)
    transforms["frozen"] = optax.set_to_zero()

    labels = label_params(params, cfg.new_params_name, frozen_vision, frozen_multimodal)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.multi_transform(transforms, labels),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
