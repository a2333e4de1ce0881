"""Task-prompt assembly.

The reference feeds fixed prompt sentences into every pretrain objective
when ``use_task_prompt`` is on (reference: model/modeling.py:355-369
``get_task_prompt``; call sites model/pretrain.py:255-256 contra, :438/:451/
:463 caption, :492/:505/:516 per-group MLM, :834-859 finetune caption,
:949-977 generation, :1270-1321 QA splice) — the VALOR-large pretrain
config enables it (config/pretrain-VALOR-large.json).

Sentences are tokenized ONCE per task here on the host and injected into
batches as ``prompt_tokens_*`` arrays ([1, P], broadcast to the batch on
device); the QA prompt body is spliced into the question tokens exactly as
the reference does: ``[CLS] + body + question[1:]``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from valor_tpu.core.tasks import TaskSpec

# the exact reference sentences (model/pretrain.py — see module docstring)
CONTRA_PROMPT = "project language in common space"
CAPTION_PROMPT = "describe the video with natural language"
MLM_PROMPTS = {
    "tva": "predict masked tokens with visual and audio cues",
    "tv": "predict masked tokens with visual cues",
    "ta": "predict masked tokens with audio cues",
}
QA_PROMPT = "answer the question"


class PromptTable:
    """Pre-tokenized prompt arrays for batch injection.

    ``get_task_prompt`` wraps the sentence in the tokenizer's BOS/EOS
    (reference: modeling.py:355-369): BERT -> [CLS] ids [SEP], CLIP ->
    [sot] ids [eot].  The contra prompt follows the TEXT encoder's
    tokenizer; caption/mlm/qa prompts follow the MULTIMODAL encoder's
    (all call sites pass the fusion encoder's default type).
    """

    def __init__(
        self,
        bert_tokenizer=None,
        clip_tokenizer=None,
        txt_encoder_type: str = "bert_base_uncased",
        multimodal_encoder_type: str = "bert_base_uncased",
    ):
        self._bert = bert_tokenizer
        self._clip = clip_tokenizer
        self._txt_type = txt_encoder_type
        self._mm_type = multimodal_encoder_type
        self._cache: Dict[Any, np.ndarray] = {}

    # -- tokenization -------------------------------------------------------
    def _encode(self, sentence: str, encoder_type: str, wrap: bool = True) -> np.ndarray:
        key = (sentence, encoder_type, wrap)
        if key not in self._cache:
            if encoder_type.startswith("clip"):
                assert self._clip is not None, "clip tokenizer required for prompts"
                ids = self._clip.encode(sentence)
                full = [self._clip.sot_token] + ids + [self._clip.eot_token]
            else:
                assert self._bert is not None, "bert tokenizer required for prompts"
                ids = self._bert.convert_tokens_to_ids(self._bert.tokenize(sentence))
                full = [self._bert.cls_token_id] + ids + [self._bert.sep_token_id]
            arr = np.asarray(full if wrap else full[1:-1], np.int32)[None]
            self._cache[key] = arr
        return self._cache[key]

    def contra(self) -> np.ndarray:
        return self._encode(CONTRA_PROMPT, self._txt_type)

    def caption(self) -> np.ndarray:
        return self._encode(CAPTION_PROMPT, self._mm_type)

    def mlm(self, group: str) -> np.ndarray:
        return self._encode(MLM_PROMPTS.get(group, MLM_PROMPTS["tva"]), self._mm_type)

    def qa_body(self) -> np.ndarray:
        """Unwrapped body — reference strips BOS/EOS before the splice
        (pretrain.py:1272 ``task_prompt[:,1:-1]``)."""
        return self._encode(QA_PROMPT, self._mm_type, wrap=False)

    # -- batch injection ----------------------------------------------------
    def inject(self, batch: Dict[str, Any], spec: TaskSpec) -> Dict[str, Any]:
        """Add prompt arrays for every objective the task runs."""
        out = dict(batch)
        if spec.family == "qa":
            q = np.asarray(out["question_prompt"])
            body = np.broadcast_to(
                self.qa_body(), (q.shape[0], self.qa_body().shape[1])
            )
            out["question_prompt"] = np.concatenate(
                [q[:, :1], body, q[:, 1:]], axis=1
            )
            return out
        if spec.contra_groups or spec.family == "ret":
            out["prompt_tokens_contra"] = self.contra()
        if spec.caption_groups or spec.family == "cap":
            out["prompt_tokens_caption"] = self.caption()
        for g in spec.mlm_groups:
            out[f"prompt_tokens_mlm_{g}"] = self.mlm(g)
        return out


def maybe_prompt_table(model_cfg, tokenizers) -> Optional[PromptTable]:
    """PromptTable when use_task_prompt is on (reference: pretrain.py:82)."""
    if not model_cfg.use_task_prompt:
        return None
    bert_tok, clip_tok = tokenizers
    return PromptTable(
        bert_tokenizer=bert_tok,
        clip_tokenizer=clip_tok,
        txt_encoder_type=model_cfg.txt_encoder_type,
        multimodal_encoder_type=model_cfg.multimodal_encoder_type,
    )


def prompted_collate(collate_fn, prompts: Optional[PromptTable], spec: TaskSpec):
    """Wrap a collate function to inject prompt arrays (no-op without a
    table)."""
    if prompts is None:
        return collate_fn

    def fn(items):
        return prompts.inject(collate_fn(items), spec)

    return fn
