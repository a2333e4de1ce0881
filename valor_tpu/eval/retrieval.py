"""Retrieval evaluation: score matrix -> R@K / median / mean ranks.

reference: test.py:249-318 (validate_ret) + test.py:714-775
(compute_metric_ret) + dual-softmax rescoring (test.py:685-712).

The score matrix is computed on device (fine or coarse, fp32 accumulate);
ranking happens in numpy on host — it's O(n^2 log n) on a few thousand
items, irrelevant next to the encoder time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from valor_tpu.tasks import losses as L


def rank_metrics(
    score: np.ndarray,  # [n_txt, n_gallery] similarity, higher = better
    ids: Sequence,  # gallery ids, len n_gallery
    ids_txt: Sequence,  # per-text ground-truth gallery id, len n_txt
    direction: str = "t2v",
) -> Dict[str, float]:
    score = np.asarray(score, np.float32)
    n_txt, n_gal = score.shape
    gal_index = {g: i for i, g in enumerate(ids)}

    if direction == "t2v":
        order = np.argsort(-score, axis=1)
        ranks = np.empty(n_txt, np.int64)
        for t in range(n_txt):
            correct = gal_index[ids_txt[t]]
            ranks[t] = int(np.where(order[t] == correct)[0][0])
    else:  # v2t: best text rank per gallery item
        order = np.argsort(-score, axis=0)  # per-gallery ranking of texts
        ranks_list: List[int] = []
        for g in range(n_gal):
            txts = [t for t in range(n_txt) if ids_txt[t] == ids[g]]
            if not txts:
                continue
            pos = {t: r for r, t in enumerate(order[:, g])}
            ranks_list.append(min(pos[t] for t in txts))
        ranks = np.asarray(ranks_list, np.int64)

    n = len(ranks)
    return {
        "r1": round(100.0 * float((ranks < 1).sum()) / n, 1),
        "r5": round(100.0 * float((ranks < 5).sum()) / n, 1),
        "r10": round(100.0 * float((ranks < 10).sum()) / n, 1),
        "medianR": float(np.median(ranks) + 1),
        "meanR": float(ranks.mean() + 1),
    }


def retrieval_report(
    score_t2v: np.ndarray,
    ids: Sequence,
    ids_txt: Sequence,
    dual_softmax: bool = False,
) -> Dict[str, float]:
    """Both directions + ravg, with optional dual-softmax rescoring."""
    if dual_softmax:
        score_t2v = np.asarray(L.dual_softmax_rescore(score_t2v))
    fwd = rank_metrics(score_t2v, ids, ids_txt, "t2v")
    bwd = rank_metrics(score_t2v, ids, ids_txt, "v2t")
    out = {f"t2v_{k}": v for k, v in fwd.items()}
    out.update({f"v2t_{k}": v for k, v in bwd.items()})
    out["ravg"] = round(
        (fwd["r1"] + fwd["r5"] + fwd["r10"] + bwd["r1"] + bwd["r5"] + bwd["r10"]) / 6, 1
    )
    return out


def qa_accuracy(predictions: Sequence[str], answers: Sequence) -> float:
    """Exact-match accuracy; multi-reference answers count any match
    (reference: test.py:44-133 validate_qa)."""
    hit = 0
    for pred, ans in zip(predictions, answers):
        if isinstance(ans, (list, tuple)):
            hit += int(any(pred == a for a in ans))
        else:
            hit += int(pred == ans)
    return round(100.0 * hit / max(len(predictions), 1), 2)
