"""SCST training-time reward scorer.

reference: scorer/scorer.py:31-147 — per-sample reward = CIDEr (with
document frequencies precomputed over the *training* annotations) +
sentence BLEU-4 against the sample's reference captions; called on the
host between the greedy (baseline) and sampled rollouts.
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence

import numpy as np

from valor_tpu.eval.caption_metrics import CiderScorer, bleu_sentence


class Scorer:
    def __init__(self, annotation_file: str, ids: Sequence[str], tokenizer):
        """annotation_file: {id: caption or [captions]} JSON (the train txt
        mapper); ids: the training id subset; tokenizer: BertTokenizer-like
        with .tokenize()."""
        raw = json.load(open(annotation_file))
        self.refs: Dict[str, List[List[str]]] = {}
        for id_ in ids:
            caps = raw[id_]
            if isinstance(caps, str):
                caps = [caps]
            self.refs[id_] = [tokenizer.tokenize(_clean(c)) for c in caps]
        self.cider = CiderScorer().fit_df(self.refs.values())
        self.tokenizer = tokenizer

    def __call__(self, ids: Sequence[str], hyp_token_ids: Sequence[Sequence[int]]) -> np.ndarray:
        """ids: batch sample ids; hyp_token_ids: generated id lists (EOS
        stripped).  Returns reward per sample (CIDEr + BLEU4)."""
        hyps = [
            self.tokenizer.convert_ids_to_tokens([int(t) for t in h])
            for h in hyp_token_ids
        ]
        refs = [self.refs[i] for i in ids]
        cider = self.cider.score(hyps, refs)
        bleu = np.asarray(
            [bleu_sentence(h, r) for h, r in zip(hyps, refs)], np.float32
        )
        return cider + bleu


def _clean(text: str) -> str:
    import string

    text = " ".join(w for w in text.split(" ") if w).lower()
    for p in string.punctuation:
        text = text.replace(p, "")
    return text


class AdaptiveAlpha:
    """Self-critical baseline coefficient (reference: pretrain.py:1461-1507).

    alpha_type 0 -> constant 1; 1 -> recent-window mean of sample/greedy
    reward ratio; 2 -> running total ratio.
    """

    def __init__(self, alpha_type: int = 0, beta: float = 1.0, recent: int = 5000):
        self.alpha_type = alpha_type
        self.beta = beta
        self.recent = np.zeros(recent, np.float64)
        self.recent_n = recent
        self.idx = 0
        self.sample_total = 0.0
        self.greedy_total = 0.0

    def update(self, reward_sample: np.ndarray, reward_greedy: np.ndarray) -> None:
        s, g = float(np.mean(reward_sample)), float(np.mean(reward_greedy))
        self.sample_total += s
        self.greedy_total += g
        self.recent[self.idx % self.recent_n] = s / g if g else 1.0
        self.idx += 1

    def value(self) -> float:
        if self.alpha_type == 0:
            return 1.0
        if self.alpha_type == 1:
            n = min(self.idx, self.recent_n)
            return float(np.mean(self.recent[:n])) * self.beta if n else 1.0
        if self.alpha_type == 2:
            return (self.sample_total / self.greedy_total) * self.beta if self.greedy_total else 1.0
        raise ValueError(self.alpha_type)
