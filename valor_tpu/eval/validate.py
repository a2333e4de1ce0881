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
from valor_tpu.models.valor import EOS_TOKEN
from valor_tpu.tasks import losses as L


# query/gallery modality split per group (reference test.py:290-377:
# rows x columns of each score matrix; multi-modality sides concatenate
# features along the token axis)
_GROUP_SIDES = {
    "tv": ("t", "v"),
    "ta": ("t", "a"),
    "tva": ("t", "va"),
    "va": ("v", "a"),
    "vta": ("v", "ta"),
    "atv": ("a", "tv"),
}


def retrieval_scores(
    model,
    params,
    feats: Dict[str, Any],
    group: str,
    contra_type: str,
) -> np.ndarray:
    """Full-gallery score matrix for one modality group (device, chunked).

    Fine mode supports every group the task grammar accepts, incl. the
    audio<->video directions (reference test.py:341-377: va / vta / atv);
    coarse mode supports tv/ta/tva (the only groups the reference's coarse
    branch implements, test.py:379-401)."""

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
            if model.cfg.late_fusion:
                return np.asarray(L.coarse_score(ft, fv) + L.coarse_score(ft, fa))
            # early fusion: learned va_fusion over concatenated features
            # (reference test.py:391-394)
            fva = L.l2_normalize(
                model.apply(
                    {"params": params},
                    jnp.concatenate([fv, fa], axis=-1),
                    method=lambda m, x: m.va_fusion(x),
                )
            )
            return np.asarray(L.coarse_score(ft, fva))
        raise ValueError(
            f"coarse retrieval does not support group {group!r} "
            "(reference test.py coarse branch: tv/ta/tva only)"
        )

    def part(name: str):
        if name == "t":
            mask_t = jnp.asarray((np.asarray(txt) != 0).astype(np.float32))
            return ft, mask_t, fw("text_fine_weight", ft)
        if name == "v":
            return fv, jnp.ones(fv.shape[:2], jnp.float32), fw("video_fine_weight", fv)
        return fa, jnp.ones(fa.shape[:2], jnp.float32), fw("audio_fine_weight", fa)

    def side(names: str):
        ps = [part(n) for n in names]
        if len(ps) == 1:
            return ps[0]
        return tuple(jnp.concatenate([p[i] for p in ps], axis=1) for i in range(3))

    if group not in _GROUP_SIDES:
        raise ValueError(group)
    if group == "tva" and model.cfg.late_fusion:
        # reference test.py:300-309: late fusion sums per-modality fine
        # scores with unit weights
        t, v, a = part("t"), part("v"), part("a")
        ones = lambda p: jnp.ones_like(p[2])
        return np.asarray(
            L.fine_score_gallery(t[0], v[0], t[1], v[1], ones(t), ones(v))
            + L.fine_score_gallery(t[0], a[0], t[1], a[1], ones(t), ones(a))
        )
    qn, gn = _GROUP_SIDES[group]
    if len(gn) > 1 and "t" in gn:
        # a concatenated text+media gallery (vta/atv) requires 1:1
        # text<->item alignment (the reference's torch.cat has the same
        # constraint, test.py:355/364)
        sizes = {n: part(n)[0].shape[0] for n in gn}
        if len(set(sizes.values())) > 1:
            raise ValueError(
                f"group {group!r} needs aligned per-item features, got rows {sizes}"
            )
    q, g = side(qn), side(gn)
    if group == "tva" and model.cfg.fineweight_type == "none":
        # reference test.py:315-318: unit weights on both sides
        q = (q[0], q[1], jnp.ones_like(q[2]))
        g = (g[0], g[1], jnp.ones_like(g[2]))
    return np.asarray(L.fine_score_gallery(q[0], g[0], q[1], g[1], q[2], g[2]))


def _gather_eval_features(
    feats_all: Dict[str, List], ids: List, ids_txt: List
) -> Tuple[Dict[str, Any], List, List]:
    """Concatenate per-batch features, then merge across hosts.

    The reference gathers eval features and ids to every rank before
    scoring (test.py:267-290: all_gather_list + ddp_allgather); here the
    per-host shards are ragged (ShardedBatchSampler covers all items), so
    arrays ride all_gather_ragged and id lists all_gather_lists.
    Single-host: both are no-ops.

    Which keys are present is decided GLOBALLY (one object gather every
    host always runs): a host whose shard is empty — n_items <
    process_count — has every local list empty, and skipping its
    all_gather_ragged calls while the other hosts enter theirs would
    misalign the collective sequence and deadlock. Empty hosts
    contribute zero-row arrays of the agreed shape instead.
    """
    from valor_tpu.parallel.collectives import (
        all_gather_lists,
        all_gather_objects,
        all_gather_ragged,
    )

    local = {k: (np.concatenate(v) if v else None) for k, v in feats_all.items()}
    metas = all_gather_objects(
        {
            k: [list(a.shape[1:]), str(a.dtype)]
            for k, a in local.items()
            if a is not None
        }
    )
    global_meta: Dict[str, Any] = {}
    for m in metas:
        global_meta.update(m)
    feats: Dict[str, Any] = {}
    for k in feats_all:  # fixed key order on every host
        if k not in global_meta:
            feats[k] = None
            continue
        shape, dtype = global_meta[k]
        a = local[k]
        if a is None:
            a = np.zeros((0, *shape), dtype)
        feats[k] = jnp.asarray(all_gather_ragged(a))
    return feats, all_gather_lists(ids), all_gather_lists(ids_txt)


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
    feats, ids, ids_txt = _gather_eval_features(feats_all, ids, ids_txt)
    temp = float(
        model.apply({"params": params}, method=lambda m: m.temperature())
    )
    report: Dict[str, float] = {}
    for g in task.contra_groups:
        score = retrieval_scores(model, params, feats, g, contra_type)
        # text-query groups rank the item gallery per caption row; the
        # audio/video-query groups (va/vta/atv) are item->item, so rows
        # carry item ids (reference test.py:341-377 — its ids_txt == ids
        # on the 1:1 AV-retrieval sets these groups support)
        row_ids = (ids_txt or ids) if g[0] == "t" else ids
        r = retrieval_report(
            score, ids, row_ids, dual_softmax, temp, evaluate_ret_text
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
    submission files (reference: test.py:136-236).

    EVERY caption group is scored, like the reference's per-group
    val_log ('tva'/'tv'/'ta' each get compute_metric_cap + a
    step_{N}_{g}.json dump, test.py:200-236): the first group reports
    flat keys (CIDEr, Bleu_4, ... — what best-checkpoint tracking
    reads), further groups are prefixed ``{g}_``.  Submission files
    use the first group (the reference's submit flags are single-group
    too)."""
    groups = list(task.caption_groups)
    group_hyps: Dict[str, Dict[str, str]] = {g: {} for g in groups}
    for batch in loader:
        ids = batch.pop("ids")
        batch.pop("ids_txt", None)
        batch.pop("sample_num", None)
        out = gen.generate(
            model, params, batch, task.caption_groups,
            caption_type=caption_type, max_len=max_len, beam_size=beam_size,
        )
        for g in groups:
            seqs = np.asarray(out[f"generated_sequences_{g}"])
            for id_, seq in zip(ids, seqs):
                group_hyps[g][str(id_)] = decode_sequence(tokenizer, seq)
    # merge the disjoint per-host shards BEFORE scoring (reference
    # test.py:203 all_gather_list): every host must report the same
    # dataset-level metric or the per-host best-checkpoint tracking in
    # Trainer.validate diverges. Single-host: no-op.
    from valor_tpu.parallel.collectives import all_gather_objects

    for g in groups:
        merged: Dict[str, str] = {}
        for chunk in all_gather_objects(group_hyps[g]):
            merged.update(chunk)
        group_hyps[g] = merged
    hyps = group_hyps[groups[0]]
    if result_dir and jax.process_index() == 0:
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
            # per-group step dumps, reference step_{N}_{g}.json naming
            path = None
            for g in groups:
                payload_g = [
                    {"video_id": i, "caption": c}
                    for i, c in group_hyps[g].items()
                ]
                gpath = os.path.join(result_dir, f"step_{step}_{g}.json")
                with open(gpath, "w") as f:
                    json.dump(payload_g, f)
        if path is not None:
            with open(path, "w") as f:
                json.dump(payload, f)
    if submit_format:
        return {}
    report: Dict[str, float] = {}
    for gi, g in enumerate(groups):
        hy = group_hyps[g]
        refs = {str(i): annotations[str(i)] for i in hy}
        scores = caption_eval(hy, refs)
        if gi == 0:
            report.update(scores)
        else:
            report.update({f"{g}_{k}": v for k, v in scores.items()})
    return report


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
    groups = list(task.caption_groups)
    group_preds: Dict[str, List[str]] = {g: [] for g in groups}
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
        # every group is decoded and scored (reference per-group val_log,
        # test.py:108-128); ground truths are shared across groups
        for gi, g in enumerate(groups):
            seqs = np.asarray(out[f"generated_sequences_{g}"])
            for j, seq in enumerate(seqs):
                text = decode_sequence(tokenizer, seq)
                group_preds[g].append(text)
                if gi > 0:
                    continue
                if question_ids:
                    submit.append(
                        {"question_id": question_ids[j], "answer": text})
                if batch_answers is not None:
                    gts.append(batch_answers[j])
                else:
                    # exact row -> id mapping; a mismatch means the
                    # collate and the generator disagree about the tiling
                    # — fail loudly instead of scoring the tail against
                    # the wrong answer
                    if j >= len(row_to_id):
                        raise ValueError(
                            f"generated {len(seqs)} rows but only "
                            f"{len(row_to_id)} id rows; carry 'answers' in "
                            "the batch (QA test collate) or pass tile_index"
                        )
                    gts.append(answers[str(row_to_id[j])])
    # merge the disjoint per-host shards BEFORE scoring (reference
    # test.py:101 all_gather_list) so every host reports the same
    # dataset-level accuracy; the submit gather runs UNCONDITIONALLY —
    # gating it on the local list would misalign collectives on hosts
    # with an empty shard. Single-host: no-ops.
    from valor_tpu.parallel.collectives import all_gather_lists

    gts = all_gather_lists(gts)
    for g in groups:
        group_preds[g] = all_gather_lists(group_preds[g])
    preds = group_preds[groups[0]]
    submit = all_gather_lists(submit)
    if result_dir and jax.process_index() == 0:
        import json
        import os

        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, f"step{step}_gt.json"), "w") as f:
            json.dump(gts, f)
        for g in groups:
            gp = os.path.join(result_dir, f"step{step}_{g}_pred.json")
            with open(gp, "w") as f:
                json.dump(group_preds[g], f)
        if submit:
            g0 = groups[0]
            name = f"step{step}_{g0}_pred_submited_{dset_name or 'qa'}.json"
            with open(os.path.join(result_dir, name), "w") as f:
                json.dump(submit, f)
    report = {"accuracy": qa_accuracy(preds, gts)}
    for g in groups[1:]:
        report[f"{g}_accuracy"] = qa_accuracy(group_preds[g], gts)
    return report


def validate_pt(
    model, params, eval_step, loader, task: TaskSpec, contra_type: str = "fine"
) -> Dict[str, float]:
    """Pretrain proxy metrics (reference: test.py:415-665): per-group
    token-level caption/mlm accuracy on masked positions + per-group
    retrieval recall on the val shard when a contra objective is present.

    Reference conventions kept: one shared masked-token denominator per
    objective across groups (test.py:464/482), correct/total counters
    summed over hosts BEFORE the division (all_gather_list of the counts,
    test.py:497-531), a recall entry for every contra group.  Reference
    bug NOT replicated: its per-group mlm counters are gated on
    ``caption_task`` instead of ``mlm_task`` (test.py:483-492), silently
    dropping mlm accuracy whenever the group sets differ.  Scale
    divergence: we report percentages (0-100, like our other metrics);
    the reference logs raw fractions rounded to 2 decimals here."""
    cap_hit = {g: 0 for g in task.caption_groups}
    mlm_hit = {g: 0 for g in task.mlm_groups}
    cap_tot = mlm_tot = 0
    feats_all: Dict[str, List] = {"feat_t": [], "feat_v": [], "feat_a": [], "txt_tokens": []}
    ids: List = []
    ids_txt: List = []
    for batch in loader:
        host_ids = batch.pop("ids", None)
        host_ids_txt = batch.pop("ids_txt", None)
        batch.pop("sample_num", None)
        out = eval_step(params, batch, task)
        if task.caption_groups and "txt_labels_caption" in out:
            lab = np.asarray(out["txt_labels_caption"])
            m = lab != -1
            cap_tot += int(m.sum())
            for g in task.caption_groups:
                key = f"caption_scores_{g}"
                if key in out:
                    pred = np.asarray(out[key]).argmax(-1)
                    cap_hit[g] += int((pred[m] == lab[m]).sum())
        if task.mlm_groups and "txt_labels_mlm" in out:
            lab = np.asarray(out["txt_labels_mlm"])
            m = lab != -1
            mlm_tot += int(m.sum())
            for g in task.mlm_groups:
                key = f"mlm_scores_{g}"
                if key in out:
                    pred = np.asarray(out[key]).argmax(-1)
                    mlm_hit[g] += int((pred[m] == lab[m]).sum())
        if task.contra_groups:
            for k in ("feat_t", "feat_v", "feat_a", "txt_tokens"):
                if out.get(k) is not None:
                    feats_all[k].append(np.asarray(out[k]))
            if host_ids is not None:
                ids.extend(host_ids)
            if host_ids_txt is not None:
                ids_txt.extend(host_ids_txt)
    # merge counters across hosts before dividing — every host must report
    # the dataset-level accuracy or per-host best-checkpoint tracking
    # diverges (same contract as validate_cap/validate_qa). One
    # unconditional gather: participation must not depend on local data.
    from valor_tpu.parallel.collectives import all_gather_objects

    merged = all_gather_objects((cap_hit, cap_tot, mlm_hit, mlm_tot))
    cap_hit = {g: sum(c[0][g] for c in merged) for g in task.caption_groups}
    mlm_hit = {g: sum(c[2][g] for c in merged) for g in task.mlm_groups}
    cap_tot = sum(c[1] for c in merged)
    mlm_tot = sum(c[3] for c in merged)
    report: Dict[str, float] = {}
    for g in task.caption_groups:
        if cap_tot:
            report[f"caption_acc_{g}"] = round(100.0 * cap_hit[g] / cap_tot, 2)
    if cap_tot:
        report["caption_token_acc"] = round(
            100.0 * sum(cap_hit.values()) / (cap_tot * max(len(cap_hit), 1)), 2
        )
    for g in task.mlm_groups:
        if mlm_tot:
            report[f"mlm_acc_{g}"] = round(100.0 * mlm_hit[g] / mlm_tot, 2)
    if mlm_tot:
        report["mlm_token_acc"] = round(
            100.0 * sum(mlm_hit.values()) / (mlm_tot * max(len(mlm_hit), 1)), 2
        )
    if task.contra_groups:
        # gather UNCONDITIONALLY on the host-independent task spec — a
        # `and feats_all["feat_t"]` guard here would be data-dependent
        # collective participation (empty-shard hosts would skip while
        # the rest block inside the gather)
        feats, ids, ids_txt = _gather_eval_features(feats_all, ids, ids_txt)
        if feats.get("feat_t") is not None and feats["feat_t"].shape[0] > 0:
            # one recall per contra group (reference test.py:534-657:
            # t2v/t2va/t2a/v2a/v2ta/a2tv recalls)
            for g in task.contra_groups:
                score = retrieval_scores(model, params, feats, g, contra_type)
                row_ids = (ids_txt or ids) if g[0] == "t" else ids
                r = retrieval_report(score, ids, row_ids)
                report[f"contra_recall_{g}"] = r["forward_r1"]
    return report


def decode_sequence(tokenizer, seq: np.ndarray, eos: int = EOS_TOKEN) -> str:
    """ids -> sentence, stopping at EOS, merging wordpieces
    (reference: model/pretrain.py:146-163)."""
    toks: List[int] = []
    for t in seq.tolist():
        if t == eos:
            break
        toks.append(int(t))
    return tokenizer.decode(toks)


# best-metric key per task family (reference: train_utils.py:258-272 —
# pt runs track no best checkpoint, get_best_name returns None for them;
# Trainer.evaluate_and_save scans for these keys directly)
def best_metric_name(task: TaskSpec) -> Optional[str]:
    return {"ret": "ravg", "cap": "CIDEr", "qa": "accuracy", "pt": None}[task.family]
