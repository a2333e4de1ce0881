"""Task-string algebra.

The reference framework dispatches every forward call on a task string such as

    ``pt_contra%tva%tv%ta_caption%tva%tv%ta``   (pretraining)
    ``ret%tva%tv``                              (retrieval)
    ``cap%tva``                                 (captioning)
    ``qa%tva``                                  (generative QA)

where each ``%``-suffix names a *modality group* (t=text, v=video/image,
a=audio).  The reference parses these ad-hoc at five call sites
(reference: model/pretrain.py:216-226, :544, :714, :1192;
train_utils.py:440-443); here there is exactly one canonical parser that
produces a hashable, immutable description used as a jit static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Valid modality-group names (order matters for loss averaging parity).
_VALID_GROUPS = ("tva", "tv", "ta", "va", "vta", "atv")

TaskFamily = str  # 'pt' | 'ret' | 'cap' | 'qa'


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    """Immutable, hashable description of a task string.

    Attributes:
      family: one of ``pt``, ``ret``, ``cap``, ``qa``.
      contra_groups: modality groups for the contrastive objective.
      caption_groups: modality groups for the caption objective.
      mlm_groups: modality groups for the masked-LM objective.
      raw: the original task string.
    """

    family: TaskFamily
    contra_groups: Tuple[str, ...] = ()
    caption_groups: Tuple[str, ...] = ()
    mlm_groups: Tuple[str, ...] = ()
    raw: str = ""

    # -- derived helpers ---------------------------------------------------
    @property
    def groups(self) -> Tuple[str, ...]:
        """All groups across all sub-objectives (dedup, stable order)."""
        seen, out = set(), []
        for g in self.contra_groups + self.caption_groups + self.mlm_groups:
            if g not in seen:
                seen.add(g)
                out.append(g)
        return tuple(out)

    @property
    def uses_video(self) -> bool:
        return any("v" in g for g in self.groups)

    @property
    def uses_audio(self) -> bool:
        return any("a" in g for g in self.groups)

    @property
    def uses_text(self) -> bool:
        return any("t" in g for g in self.groups)

    def __str__(self) -> str:  # pragma: no cover - debugging nicety
        return self.raw


def _parse_groups(segment: str) -> Tuple[str, ...]:
    parts = tuple(p for p in segment.split("%")[1:] if p)
    for p in parts:
        if p not in _VALID_GROUPS:
            raise ValueError(f"unknown modality group {p!r} in {segment!r}")
    return parts


def parse_task(task: str) -> TaskSpec:
    """Parse a task string into a :class:`TaskSpec`.

    Mirrors the semantics of the reference's inline parsing
    (reference: model/pretrain.py:216-226 for ``pt_*``; the single-``%``
    split for ``ret``/``cap``/``qa`` at model/pretrain.py:545,714,1192).
    """
    if task.startswith("pt"):
        contra, caption, mlm = (), (), ()
        for seg in task.split("_"):
            if "mlm" in seg:
                mlm = _parse_groups(seg)
            elif "caption" in seg:
                caption = _parse_groups(seg)
            elif "contra" in seg:
                contra = _parse_groups(seg)
        return TaskSpec("pt", contra, caption, mlm, raw=task)
    if task.startswith("ret"):
        return TaskSpec("ret", contra_groups=_parse_groups(task), raw=task)
    if task.startswith("cap"):
        return TaskSpec("cap", caption_groups=_parse_groups(task), raw=task)
    if task.startswith("qa"):
        return TaskSpec("qa", caption_groups=_parse_groups(task), raw=task)
    raise ValueError(f"unrecognised task string: {task!r}")
