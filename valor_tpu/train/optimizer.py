"""Multi-group AdamW via optax — single-pass, TPU-friendly.

Replaces the reference's 5x2 param-group optimizer (optim/misc.py:13-100):
five LR groups (basic / new / clip-visual / clip-text / decoder) crossed
with decay vs no-decay (bias + LayerNorm params), each with its own
schedule-scaled LR, plus frozen-parameter masks.

Implementation note (measured on the v5e): optax.multi_transform's N-way
masked partition multiplies the optimizer-state pytree by the number of
groups (thousands of leaves), which made each update step dominated by
per-buffer dispatch overhead (13 s/step).  Instead this builds ONE adamw
pass over one tree: scale_by_adam -> per-leaf weight decay mask -> per-leaf
schedule-scaled LR from a static label tree.  Mathematically identical
(adam moments are per-leaf independent), with the whole fused update chain
compiling to a handful of XLA kernels — the role apex's multi_tensor
kernels played on GPU (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from valor_tpu.core.config import TrainConfig
from valor_tpu.train.schedule import make_schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_group(path_str: str, new_params_name: Sequence[str]) -> str:
    """Group name for a parameter path (reference: optim/misc.py:33-64)."""
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
    """biases + LayerNorm scale/bias, following the reference convention
    ['bias','LayerNorm.bias','LayerNorm.weight'] (optim/misc.py:14)."""
    last = path_str.rsplit("/", 1)[-1]
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


def global_norm_flat(tree) -> jnp.ndarray:
    """Global L2 norm via ONE fused reduction over a concatenated vector.

    optax.global_norm emits a scalar reduction per leaf (~940 for
    VALOR-base), which measured 280 s/step on the tunneled v5e runtime
    (scalar kernels each paid a host round-trip); a single concatenate +
    vdot compiles to one reduction kernel.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    dtypes = {x.dtype for x in leaves}
    if len(dtypes) == 1 and next(iter(dtypes)) == jnp.bfloat16:
        # bf16 grad regime (TrainConfig.grad_dtype): concatenate in the
        # native dtype — half the flat-vector write+read traffic — and
        # accumulate the squares in fp32 inside the dot (bf16 inputs are
        # exact under the fp32-accumulating product, so the norm matches
        # the fp32-concat path bit-for-bit on the same grads)
        flat = jnp.concatenate([x.ravel() for x in leaves])
        sq = jax.lax.dot_general(
            flat, flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sqrt(sq)
    flat = jnp.concatenate([x.ravel().astype(jnp.float32) for x in leaves])
    return jnp.sqrt(jnp.vdot(flat, flat))


def clip_by_global_norm_flat(max_norm: float) -> optax.GradientTransformation:
    """clip_by_global_norm with the flat-reduction norm (same semantics:
    scale by max_norm/norm only when norm > max_norm)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        gnorm = global_norm_flat(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-9))
        # multiply in f32 (one rounding on store) but KEEP each leaf's
        # dtype: a plain `u * scale` with a f32 scalar promotes bf16
        # grads back to f32, silently defeating the grad_dtype regime's
        # traffic saving through the adam stage downstream
        return (
            jax.tree_util.tree_map(lambda u: (u * scale).astype(u.dtype), updates),
            state,
        )

    return optax.GradientTransformation(init, update)


class AdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_dtyped(
    b1: float, b2: float, eps: float,
    mu_dtype: jnp.dtype, nu_dtype: jnp.dtype,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moment dtypes configurable.

    optax exposes mu_dtype only; on the bandwidth-bound step the fp32
    second moment is the larger optimizer-traffic term (read+write every
    update).  bf16 nu carries ~0.4% relative error on an EMA of squares
    (wide exponent keeps tiny grad^2 representable) -> ~0.2% on the
    update denominator; convergence A/B in tests/test_train.py.
    Bias correction follows optax (count incremented first)."""

    def init(params):
        mu = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, mu_dtype), params)
        nu = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, nu_dtype), params)
        return AdamState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def mu32(g, m):
            return b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32)

        def nu32(g, v):
            g = g.astype(jnp.float32)
            return b2 * v.astype(jnp.float32) + (1 - b2) * g * g

        def adam(g, m, v):
            # the step's update reads the FULL-PRECISION EMAs — optax
            # semantics (scale_by_adam casts to mu_dtype for storage
            # only, after computing the update); the casts below are
            # storage-only.  XLA CSEs the duplicated EMA expressions.
            return (mu32(g, m) / c1) / (jnp.sqrt(nu32(g, v) / c2) + eps)

        new_updates = jax.tree_util.tree_map(adam, updates, state.mu, state.nu)
        mu = jax.tree_util.tree_map(
            lambda g, m: mu32(g, m).astype(mu_dtype), updates, state.mu
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: nu32(g, v).astype(nu_dtype), updates, state.nu
        )
        return new_updates, AdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class GroupLRState(NamedTuple):
    count: jnp.ndarray


def scale_by_group_schedules(
    labels, schedules: Dict[str, Callable], weight_decay: float
) -> optax.GradientTransformation:
    """Per-leaf: updates = -lr_label(step) * (adam_update + wd_label * param).

    `labels` is a static tree of group strings aligned with the param tree;
    `schedules` maps group -> lr schedule.  Frozen leaves get lr 0.
    """

    def init(params):
        del params
        return GroupLRState(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        count = state.count
        lr = {k: s(count) for k, s in schedules.items()}  # scalars, traced once

        def one(u, p, lbl):
            if lbl == "frozen":
                return jnp.zeros_like(u)
            wd = weight_decay if lbl.endswith("_wd") else 0.0
            v = u + wd * p if wd else u
            return -lr[lbl] * v

        new_updates = jax.tree_util.tree_map(one, updates, params, labels)
        return new_updates, GroupLRState(count=count + 1)

    return optax.GradientTransformation(init, update)


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
    schedules: Dict[str, Callable] = {}
    for g, lr in group_lr.items():
        sched = make_schedule(cfg.scheduler, lr, cfg.num_train_steps, cfg.warmup_ratio)
        schedules[f"{g}_wd"] = sched
        schedules[f"{g}_nd"] = sched

    labels = label_params(params, cfg.new_params_name, frozen_vision, frozen_multimodal)
    # optimizer family (reference: optim/misc.py:80-92 --optim):
    #   adamw  -> decoupled weight decay (HF AdamW copy, eps 1e-6),
    #   adam   -> torch Adam: L2 folded into the gradient BEFORE the
    #             moments (coupled), eps 1e-8,
    #   adamax -> torch Adamax (infinity-norm second moment), coupled L2.
    #
    # Frozen grads are zeroed BEFORE the global-norm clip: the reference
    # sets requires_grad=False on frozen towers (modeling.py:319-322), so
    # its clip_grad_norm_ over amp.master_params never sees them; letting
    # them into the flat norm would inflate gnorm and over-clip the
    # trainable params' updates.  (It also keeps the frozen leaves' adam
    # moments exactly zero.)
    chain: list = []
    if any(
        lbl == "frozen" for lbl in jax.tree_util.tree_leaves(labels)
    ):
        def _zero_frozen(updates, state, params=None):
            del params
            return (
                jax.tree_util.tree_map(
                    lambda u, lbl: jnp.zeros_like(u) if lbl == "frozen" else u,
                    updates, labels,
                ),
                state,
            )

        chain.append(
            optax.GradientTransformation(
                lambda params: optax.EmptyState(), _zero_frozen
            )
        )
    chain.append(clip_by_global_norm_flat(cfg.grad_norm))
    decoupled_wd = cfg.weight_decay
    if cfg.optim in ("adam", "adamax"):
        decoupled_wd = 0.0
        if cfg.weight_decay:
            wd_mask = jax.tree_util.tree_map(
                lambda lbl: lbl.endswith("_wd"), labels
            )
            chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask))
    if cfg.optim == "adamax":
        chain.append(optax.scale_by_adamax(b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8))
    elif cfg.optim == "adam":
        chain.append(
            optax.scale_by_adam(
                b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8,
                mu_dtype=jnp.dtype(cfg.adam_mu_dtype),
            )
        )
    elif cfg.optim == "adamw":
        if jnp.dtype(cfg.adam_nu_dtype) != jnp.float32:
            chain.append(
                scale_by_adam_dtyped(
                    b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-6,
                    mu_dtype=jnp.dtype(cfg.adam_mu_dtype),
                    nu_dtype=jnp.dtype(cfg.adam_nu_dtype),
                )
            )
        else:
            chain.append(
                optax.scale_by_adam(
                    b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-6,
                    mu_dtype=jnp.dtype(cfg.adam_mu_dtype),
                )
            )
    else:
        raise ValueError(f"invalid optimizer {cfg.optim!r} (adam|adamax|adamw)")
    chain.append(scale_by_group_schedules(labels, schedules, decoupled_wd))
    tx = optax.chain(*chain)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
