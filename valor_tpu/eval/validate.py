"""Validation driver: per-task eval loops.

reference: test.py:18-443 — validate() dispatches on the task family:
  * retrieval (validate_ret :249): collect contra features over the val
    set, build the (sliced) fine/coarse score matrix, rank on host.
  * caption (validate_cap :136): autoregressive generation -> BLEU/CIDEr/
    ROUGE against the annotation references.
  * qa (validate_qa :44): generation -> exact-match accuracy.

Cross-host gathers: the reference pickles predictions over NCCL
(all_gather_list, utils/distributed.py:127); here each host holds its own
shard and multihost runs combine with
jax.experimental.multihost_utils.process_allgather (single-host: no-op).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from valor_tpu.core.logging import LOGGER
from valor_tpu.core.tasks import TaskSpec, parse_task
from valor_tpu.eval import generate as gen
from valor_tpu.eval.caption_metrics import caption_eval
from valor_tpu.eval.retrieval import qa_accuracy, retrieval_report
from valor_tpu.tasks import losses as L


def retrieval_scores(
    model,
    params,
    feats: Dict[str, Any],
    group: str,
    contra_type: str,
) -> np.ndarray:
    """Full-gallery score matrix for one modality group (device, chunked)."""

    def fw(name, x):
        return model.apply(
            {"params": params}, x, method=lambda m, y: getattr(m, name)(y)
        )

    ft, fv, fa = feats.get("feat_t"), feats.get("feat_v"), feats.get("feat_a")
    txt = feats.get("txt_tokens")
    if contra_type == "coarse":
        if group == "tv":
            return np.asarray(L.coarse_score(ft, fv))
        if group == "ta":
            return np.asarray(L.coarse_score(ft, fa))
        if group == "tva":
            return np.asarray(L.coarse_score(ft, fv) + L.coarse_score(ft, fa))
        raise ValueError(group)
    mask_t = jnp.asarray((np.asarray(txt) != 0).astype(np.float32))
    ones = lambda f: jnp.ones(f.shape[:2], jnp.float32)
    wt = fw("text_fine_weight", ft)
    if group == "tv":
        wv = fw("video_fine_weight", fv)
        return np.asarray(L.fine_score_chunked(ft, fv, mask_t, ones(fv), wt, wv))
    if group == "ta":
        wa = fw("audio_fine_weight", fa)
        return np.asarray(L.fine_score_chunked(ft, fa, mask_t, ones(fa), wt, wa))
    if group == "tva":
        fva = jnp.concatenate([fv, fa], axis=1)
        wv = fw("video_fine_weight", fv)
        wa = fw("audio_fine_weight", fa)
        wva = jnp.concatenate([wv, wa], axis=1)
        return np.asarray(
            L.fine_score_chunked(ft, fva, mask_t, ones(fva), wt, wva)
        )
    raise ValueError(group)


def validate_ret(
    model, params, eval_step, loader, task: TaskSpec, contra_type: str,
    dual_softmax: bool = False, evaluate_ret_text: bool = False,
) -> Dict[str, float]:
    feats_all: Dict[str, List] = {"feat_t": [], "feat_v": [], "feat_a": [], "txt_tokens": []}
    ids: List = []
    ids_txt: List = []
    for batch in loader:
        host_meta_ids = batch.pop("ids", None)
        host_ids_txt = batch.pop("ids_txt", None)
        batch.pop("sample_num", None)
        out = eval_step(params, batch, task)
        for k in ("feat_t", "feat_v", "feat_a", "txt_tokens"):
            if out.get(k) is not None:
                feats_all[k].append(np.asarray(out[k], np.float32 if k != "txt_tokens" else np.int32))
        if host_meta_ids is not None:
            ids.extend(host_meta_ids)
        if host_ids_txt is not None:
            ids_txt.extend(host_ids_txt)
    feats = {
        k: jnp.asarray(np.concatenate(v)) if v else None for k, v in feats_all.items()
    }
    temp = float(
        model.apply({"params": params}, method=lambda m: m.temperature())
    )
    report: Dict[str, float] = {}
    for g in task.contra_groups:
        score = retrieval_scores(model, params, feats, g, contra_type)
        r = retrieval_report(
            score, ids, ids_txt or ids, dual_softmax, temp, evaluate_ret_text
        )
        report.update({f"{g}_{k}": v for k, v in r.items()})
    if task.contra_groups:
        first = task.contra_groups[0]
        report["ravg"] = report[f"{first}_ravg"]
    return report


def validate_cap(
    model,
    params,
    loader,
    task: TaskSpec,
    tokenizer,
    annotations: Dict[str, List[str]],
    *,
    caption_type: str = "unimlm",
    max_len: int = 30,
    beam_size: int = 1,
    result_dir: Optional[str] = None,
    step: int = 0,
    submit_format: Optional[str] = None,  # 'coco' | 'nocaps' | 'vatex'
) -> Dict[str, float]:
    """Caption eval; optionally dump per-step results / leaderboard
    submission files (reference: test.py:136-236)."""
    hyps: Dict[str, str] = {}
    for batch in loader:
        ids = batch.pop("ids")
        batch.pop("ids_txt", None)
        batch.pop("sample_num", None)
        out = gen.generate(
            model, params, batch, task.caption_groups,
            caption_type=caption_type, max_len=max_len, beam_size=beam_size,
        )
        seqs = np.asarray(out[f"generated_sequences_{task.caption_groups[0]}"])
        for id_, seq in zip(ids, seqs):
            hyps[str(id_)] = decode_sequence(tokenizer, seq)
    if result_dir:
        import json
        import os

        os.makedirs(result_dir, exist_ok=True)
        if submit_format == "coco":
            payload = [
                {"image_id": int(str(i).split("_")[-1]), "caption": c}
                for i, c in hyps.items()
            ]
            path = os.path.join(result_dir, "submission.json")
        elif submit_format == "nocaps":
            payload = [{"image_id": int(i), "caption": c} for i, c in hyps.items()]
            path = os.path.join(result_dir, "submission.json")
        elif submit_format == "vatex":
            payload = dict(hyps)
            path = os.path.join(result_dir, "submission.json")
        else:
            payload = [{"video_id": i, "caption": c} for i, c in hyps.items()]
            path = os.path.join(result_dir, f"step_{step}.json")
        with open(path, "w") as f:
            json.dump(payload, f)
    if submit_format:
        return {}
    refs = {str(i): annotations[str(i)] for i in hyps}
    return caption_eval(hyps, refs)


def validate_qa(
    model, params, loader, task: TaskSpec, tokenizer,
    answers: Optional[Dict[str, Any]] = None,
    *, caption_type: str = "unimlm", max_len: int = 10, beam_size: int = 1,
    result_dir: Optional[str] = None, step: int = 0, dset_name: str = "",
) -> Dict[str, float]:
    """QA exact-match accuracy + submission dumps.

    Ground-truth answers ride the batch when the QA collate is used
    (data/vqa.py valorqa_collate_test); the ``answers`` dict is a fallback
    for plain collates.  With ``result_dir`` set, writes the reference's
    result files (test.py:67-114): ``step{N}_gt.json`` (ground truths),
    ``step{N}_{g}_pred.json`` (answer strings) and — when the dataset
    carries question_ids (VQAv2 test-std) —
    ``step{N}_{g}_pred_submited_{dset}.json`` as
    ``[{"question_id": ..., "answer": ...}]``.
    """
    preds: List[str] = []
    gts: List[Any] = []
    submit: List[Dict[str, Any]] = []
    for batch in loader:
        ids = batch.pop("ids")
        batch_answers = batch.pop("answers", None)
        question_ids = batch.pop("question_ids", None)
        batch.pop("ids_txt", None)
        batch.pop("sample_num", None)
        # row -> source-media mapping BEFORE generate (which consumes
        # tile_index to expand media to the tiled question rows)
        tile = batch.get("tile_index")
        row_to_id = (
            [ids[int(t)] for t in np.asarray(tile)] if tile is not None else ids
        )
        out = gen.generate(
            model, params, batch, task.caption_groups,
            caption_type=caption_type, max_len=max_len, beam_size=beam_size,
        )
        seqs = np.asarray(out[f"generated_sequences_{task.caption_groups[0]}"])
        for j, seq in enumerate(seqs):
            text = decode_sequence(tokenizer, seq)
            preds.append(text)
            if question_ids:
                submit.append({"question_id": question_ids[j], "answer": text})
            if batch_answers is not None:
                gts.append(batch_answers[j])
            else:
                # exact row -> id mapping; a mismatch means the collate and
                # the generator disagree about the tiling — fail loudly
                # instead of scoring the tail against the wrong answer
                if j >= len(row_to_id):
                    raise ValueError(
                        f"generated {len(seqs)} rows but only "
                        f"{len(row_to_id)} id rows; carry 'answers' in the "
                        "batch (QA test collate) or pass tile_index"
                    )
                gts.append(answers[str(row_to_id[j])])
    if result_dir:
        import json
        import os

        from valor_tpu.parallel.collectives import all_gather_lists

        all_gts = all_gather_lists(gts)
        all_preds = all_gather_lists(preds)
        all_submit = all_gather_lists(submit) if submit else []
        if jax.process_index() != 0:
            return {"accuracy": qa_accuracy(preds, gts)}
        os.makedirs(result_dir, exist_ok=True)
        g = task.caption_groups[0]
        with open(os.path.join(result_dir, f"step{step}_gt.json"), "w") as f:
            json.dump(all_gts, f)
        with open(os.path.join(result_dir, f"step{step}_{g}_pred.json"), "w") as f:
            json.dump(all_preds, f)
        if all_submit:
            name = f"step{step}_{g}_pred_submited_{dset_name or 'qa'}.json"
            with open(os.path.join(result_dir, name), "w") as f:
                json.dump(all_submit, f)
    return {"accuracy": qa_accuracy(preds, gts)}


def validate_pt(
    model, params, eval_step, loader, task: TaskSpec, contra_type: str = "fine"
) -> Dict[str, float]:
    """Pretrain proxy metrics (reference: test.py:415-665): token-level
    caption/mlm accuracy on masked positions + retrieval recall on the val
    shard when a contra objective is present."""
    cap_hit = cap_tot = mlm_hit = mlm_tot = 0
    feats_all: Dict[str, List] = {"feat_t": [], "feat_v": [], "feat_a": [], "txt_tokens": []}
    ids: List = []
    ids_txt: List = []
    for batch in loader:
        host_ids = batch.pop("ids", None)
        host_ids_txt = batch.pop("ids_txt", None)
        batch.pop("sample_num", None)
        out = eval_step(params, batch, task)
        for g in task.caption_groups:
            key = f"caption_scores_{g}"
            if key in out:
                pred = np.asarray(out[key]).argmax(-1)
                lab = np.asarray(out["txt_labels_caption"])
                m = lab != -1
                cap_hit += int((pred[m] == lab[m]).sum())
                cap_tot += int(m.sum())
        for g in task.mlm_groups:
            key = f"mlm_scores_{g}"
            if key in out:
                pred = np.asarray(out[key]).argmax(-1)
                lab = np.asarray(out["txt_labels_mlm"])
                m = lab != -1
                mlm_hit += int((pred[m] == lab[m]).sum())
                mlm_tot += int(m.sum())
        if task.contra_groups:
            for k in ("feat_t", "feat_v", "feat_a", "txt_tokens"):
                if out.get(k) is not None:
                    feats_all[k].append(np.asarray(out[k]))
            if host_ids is not None:
                ids.extend(host_ids)
            if host_ids_txt is not None:
                ids_txt.extend(host_ids_txt)
    report: Dict[str, float] = {}
    if cap_tot:
        report["caption_token_acc"] = round(100.0 * cap_hit / cap_tot, 2)
    if mlm_tot:
        report["mlm_token_acc"] = round(100.0 * mlm_hit / mlm_tot, 2)
    if task.contra_groups and feats_all["feat_t"]:
        feats = {
            k: jnp.asarray(np.concatenate(v)) if v else None
            for k, v in feats_all.items()
        }
        g = task.contra_groups[0]
        score = retrieval_scores(model, params, feats, g, contra_type)
        r = retrieval_report(score, ids, ids_txt or ids)
        report[f"contra_recall_{g}"] = r["forward_r1"]
    return report


def decode_sequence(tokenizer, seq: np.ndarray, eos: int = 102) -> str:
    """ids -> sentence, stopping at EOS, merging wordpieces
    (reference: model/pretrain.py:146-163)."""
    toks: List[int] = []
    for t in seq.tolist():
        if t == eos:
            break
        toks.append(int(t))
    return tokenizer.decode(toks)


# best-metric key per task family (reference: train_utils.py:258-272)
def best_metric_name(task: TaskSpec) -> str:
    return {"ret": "ravg", "cap": "CIDEr", "qa": "accuracy", "pt": "total"}[task.family]
