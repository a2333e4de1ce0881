"""Checkpointing: orbax save/restore + load-time surgery.

Replaces the reference's ModelSaver + resume + pretrain-dir inheritance
(utils/save.py:32-64, train_utils.py:117-192):
  * save model+optimizer every eval interval, delete the previous one
    unless keep-all, track best_{metric} per task,
  * resume: find the latest step in output_dir,
  * pretrain-dir load with checkpoint surgery: CLIP visual pos-emb
    bilinear resize for a new resolution (train_utils.py:153-168,
    model/clip.py:481-491) and frame-embedding row extension by copying
    the last trained row (train_utils.py:148-151).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from valor_tpu.core.logging import LOGGER


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, "ckpt", f"step_{step}")


class ModelSaver:
    """Checkpoint writer.

    ``use_async=True`` (TrainConfig.async_checkpoint) swaps the orbax
    StandardCheckpointer for an AsyncCheckpointer: ``save`` returns as soon
    as the state has been snapshotted to host memory and the write commits
    in a background thread while training continues — the reference blocks
    the whole job on torch.save every eval interval (utils/save.py:38-64).
    Filesystem bookkeeping (best copy, previous-step cleanup) is deferred
    until the write that produced it is durable: the next ``save`` or
    ``finish()`` waits on the pending write first, so a crash mid-write can
    never have deleted the previous good checkpoint.
    """

    def __init__(
        self,
        output_dir: str,
        remove_before_ckpt: bool = True,
        use_async: bool = False,
    ):
        self.output_dir = output_dir
        self.remove_before = remove_before_ckpt
        self.last_step: Optional[int] = None
        self.use_async = bool(use_async) and _HAS_ORBAX
        self._pending: Optional[tuple] = None  # (step, best_name) of in-flight write
        os.makedirs(os.path.join(output_dir, "ckpt"), exist_ok=True)
        if _HAS_ORBAX:
            self._ckptr = (
                ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                if self.use_async
                else ocp.StandardCheckpointer()
            )

    def save(self, state, step: int, best_name: Optional[str] = None) -> None:
        path = os.path.abspath(_ckpt_dir(self.output_dir, step))
        # `step` names the checkpoint (optimizer steps, reference
        # utils/save.py:44); `micro_step` preserves TrainState.step — the
        # per-micro-batch device counter — so resume under gradient
        # accumulation restarts with the exact counter it left off with.
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": step,
            "micro_step": int(state.step),
        }
        if _HAS_ORBAX:
            # every process participates (orbax coordinates the
            # multihost write and barriers in wait_until_finished)
            self.finish()  # previous async write (if any) + its bookkeeping
            self._ckptr.save(path, payload, force=True)
            if self.use_async:
                self._pending = (step, best_name)
                return
            self._ckptr.wait_until_finished()
        elif jax.process_index() == 0:  # flat-numpy fallback
            os.makedirs(path, exist_ok=True)
            flat = jax.tree_util.tree_map(np.asarray, payload)
            np.save(os.path.join(path, "state.npy"), flat, allow_pickle=True)
        self._bookkeep(step, best_name)

    def finish(self) -> None:
        """Block until any in-flight async write is durable and run its
        deferred bookkeeping.  No-op for sync savers; call at end of
        training and before any restore/latest_step readback."""
        if self._pending is None:
            return
        step, best_name = self._pending
        self._pending = None
        self._ckptr.wait_until_finished()
        self._bookkeep(step, best_name)

    def _bookkeep(self, step: int, best_name: Optional[str]) -> None:
        # plain-filesystem bookkeeping (best copy, previous-step cleanup)
        # must run on ONE process: on a shared filesystem two hosts
        # rmtree/copytree-ing the same directory race and crash
        if jax.process_index() == 0:
            path = os.path.abspath(_ckpt_dir(self.output_dir, step))
            if best_name:
                best_path = os.path.join(self.output_dir, "ckpt", f"best_{best_name}")
                if os.path.exists(best_path):
                    shutil.rmtree(best_path)
                shutil.copytree(path, best_path)
            if self.remove_before and self.last_step is not None:
                prev = _ckpt_dir(self.output_dir, self.last_step)
                if os.path.exists(prev):
                    shutil.rmtree(prev)
        self.last_step = step

    def latest_step(self) -> Optional[int]:
        self.finish()
        root = os.path.join(self.output_dir, "ckpt")
        if not os.path.isdir(root):
            return None
        steps = [
            int(m.group(1))
            for d in os.listdir(root)
            if (m := re.match(r"step_(\d+)$", d))
        ]
        return max(steps) if steps else None

    def restore(self, state, step: Optional[int] = None):
        self.finish()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        path = os.path.abspath(_ckpt_dir(self.output_dir, step))
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": 0,
            "micro_step": 0,
        }
        if _HAS_ORBAX:
            try:
                restored = self._ckptr.restore(path, payload)
            except ValueError:  # checkpoint without micro_step
                payload.pop("micro_step")
                restored = self._ckptr.restore(path, payload)
        else:
            restored = np.load(os.path.join(path, "state.npy"), allow_pickle=True).item()
        LOGGER.info(f"restored checkpoint at step {step}")
        return restored


# ---------------------------------------------------------------------------
# checkpoint surgery
# ---------------------------------------------------------------------------


def bilinear_resize_pos_embed(pos: np.ndarray, new_grid: int, has_cls: bool = True) -> np.ndarray:
    """[(1+)g*g, C] -> [(1+)G*G, C] bilinear over the spatial grid
    (reference: model/clip.py:481-491, modeling.py:520-527)."""
    pos = np.asarray(pos, np.float32)
    cls = pos[:1] if has_cls else None
    grid_part = pos[1:] if has_cls else pos
    g = int(round(len(grid_part) ** 0.5))
    c = grid_part.shape[-1]
    img = grid_part.reshape(g, g, c)
    resized = np.asarray(
        jax.image.resize(jnp.asarray(img), (new_grid, new_grid, c), method="bilinear")
    )
    out = resized.reshape(new_grid * new_grid, c)
    return np.concatenate([cls, out], axis=0) if has_cls else out


def bilinear_resize_pos_embed_2d(
    pos: np.ndarray, src_hw, dst_hw, has_cls: bool = True
) -> np.ndarray:
    """Non-square variant for the AST pos-emb remap (modeling.py:520-527)."""
    pos = np.asarray(pos, np.float32)
    cls = pos[:1] if has_cls else None
    grid = pos[1:] if has_cls else pos
    c = grid.shape[-1]
    img = grid.reshape(src_hw[0], src_hw[1], c)
    resized = np.asarray(
        jax.image.resize(jnp.asarray(img), (dst_hw[0], dst_hw[1], c), method="bilinear")
    )
    out = resized.reshape(dst_hw[0] * dst_hw[1], c)
    return np.concatenate([cls, out], axis=0) if has_cls else out


def extend_frame_embedding(frame_emb: np.ndarray, n_needed: int) -> np.ndarray:
    """Copy the last trained row into rows beyond the pretrain frame count
    (reference: train_utils.py:148-151), or TRUNCATE to the first
    n_needed rows when finetuning with fewer frames than pretrain.

    (The reference never shrinks because its frame_embedding is a
    fixed max-size buffer it indexes a prefix of; ours is sized to the
    config, so returning the source unchanged here would hand
    adapt_pretrained_params a wrong-shaped leaf that only explodes much
    later inside model.apply.)"""
    fe = np.asarray(frame_emb)
    n_have = fe.shape[1]
    if n_needed == n_have:
        return fe
    if n_needed < n_have:
        return fe[:, :n_needed]
    pad = np.repeat(fe[:, -1:], n_needed - n_have, axis=1)
    return np.concatenate([fe, pad], axis=1)


def adapt_pretrained_params(
    params: Dict[str, Any],
    target_params: Dict[str, Any],
) -> Dict[str, Any]:
    """Shape-adapt a loaded param tree onto the target's shapes: pos-emb
    resize for clip vision + ast, frame-emb extension; everything else is
    taken verbatim when shapes match, target-initialised otherwise
    (strict=False load semantics, modeling.py:107-115)."""
    flat_src = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_dst, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    out = []
    missing, mismatched = [], []
    for path, dst in flat_dst:
        src = flat_src.get(path)
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        if src is None:
            missing.append(key)
            out.append(dst)
            continue
        src = np.asarray(src)
        if src.shape == dst.shape:
            out.append(jnp.asarray(src, dst.dtype))
        elif "positional_embedding" in key and src.ndim == 2 and "clip_vision" in key:
            out.append(
                jnp.asarray(
                    bilinear_resize_pos_embed(src, int(round((dst.shape[0] - 1) ** 0.5))),
                    dst.dtype,
                )
            )
        elif "frame_embedding" in key and src.ndim == 3:
            out.append(jnp.asarray(extend_frame_embedding(src, dst.shape[1]), dst.dtype))
        else:
            mismatched.append(f"{key}: {src.shape} -> {dst.shape}")
            out.append(dst)
    if missing:
        LOGGER.info(f"missing keys (target-init): {missing[:20]}{'...' if len(missing) > 20 else ''}")
    if mismatched:
        LOGGER.info(f"shape-mismatched keys (target-init): {mismatched}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target_params), out
    )
