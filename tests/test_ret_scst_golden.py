"""Golden parity for the eval/reward math that full-model goldens don't
cover: the reference's OWN ``compute_metric_ret`` / dual-softmax rescoring
(test.py:685-775), SCST ``Scorer`` (scorer/scorer.py:31-147), and the
adaptive self-critical baseline (model/pretrain.py:1461-1507) — each run
directly from /root/reference and compared against our implementations on
shared random fixtures.

These lock down rank-metric semantics (torch lower-median on even
galleries, first-occurrence gt indexing, ravg-from-unrounded recalls),
the dual-softmax axis/temperature/scale conventions, and the exact
CIDEr(train-df)+BLEU4 reward values SCST trains against.
"""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_golden_fullmodel import _install_reference_stubs
from valor_tpu.eval.retrieval import retrieval_report
from valor_tpu.eval.scorer import AdaptiveAlpha, Scorer


@pytest.fixture(scope="module")
def ref_test_mod():
    _install_reference_stubs()
    spec = importlib.util.spec_from_file_location(
        "ref_test_mod", "/root/reference/test.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class _RefModelStub:
    """Just enough surface for get_model_attr (reference test.py:669-680)."""

    def __init__(self, temp, dual_softmax, evaluate_ret_text):
        self.video_encoder_type = "videoswin"  # non-clip -> temp = contra_temp
        self.contra_temp = temp
        self.dual_softmax = dual_softmax
        self.evaluate_ret_text = evaluate_ret_text


def _parse_ref_log(log, prefix):
    r1, r5, r10 = (float(x) for x in log[f"{prefix}_recall"].split("/"))
    return {
        f"{prefix}_r1": r1,
        f"{prefix}_r5": r5,
        f"{prefix}_r10": r10,
        f"{prefix}_ravg": float(log[f"{prefix}_ravg"]),
        f"{prefix}_medianR": float(log[f"{prefix}_medianR"]),
        f"{prefix}_meanR": float(log[f"{prefix}_meanR"]),
    }


class TestRetMetricGolden:
    @pytest.mark.parametrize("n_txt,n_gal", [(20, 10), (21, 7), (8, 8)])
    @pytest.mark.parametrize("dual_softmax", [False, True])
    def test_compute_metric_ret(self, ref_test_mod, n_txt, n_gal, dual_softmax):
        rng = np.random.RandomState(n_txt * 100 + n_gal + int(dual_softmax))
        score = rng.randn(n_txt, n_gal).astype(np.float32)
        ids = [f"v{i}" for i in range(n_gal)]
        # multi-caption galleries: several text rows share a video id;
        # first n_gal rows cover every gallery item exactly once so the
        # backward direction always has a ground truth
        ids_txt = list(ids) + [ids[rng.randint(n_gal)] for _ in range(n_txt - n_gal)]
        temp = 0.05
        ref_log = ref_test_mod.compute_metric_ret(
            torch.from_numpy(score.copy()), ids, list(ids_txt),
            _RefModelStub(temp, dual_softmax, evaluate_ret_text=True),
        )
        ours = retrieval_report(
            score, ids, ids_txt,
            dual_softmax=dual_softmax, temp=temp, evaluate_ret_text=True,
        )
        for prefix in ("forward", "backward"):
            ref = _parse_ref_log(ref_log, prefix)
            for k, v in ref.items():
                assert ours[k] == pytest.approx(v, abs=1e-3), (k, ours[k], v)

    def test_even_gallery_lower_median(self, ref_test_mod):
        # ranks (0,1): torch.median -> 0 (lower), np.median -> 0.5.
        score = np.array([[2.0, 1.0], [2.0, 1.0]], np.float32)
        ids = ["a", "b"]
        ids_txt = ["a", "b"]  # second row's gt ranks 1 -> ranks [0, 1]
        ref_log = ref_test_mod.compute_metric_ret(
            torch.from_numpy(score.copy()), ids, ids_txt,
            _RefModelStub(0.07, False, False),
        )
        ours = retrieval_report(score, ids, ids_txt)
        assert ours["forward_medianR"] == ref_log["forward_medianR"] == 1.0

    def test_dual_softmax_matrices_match(self, ref_test_mod):
        import torch.nn.functional as F

        from valor_tpu.eval.retrieval import (
            dual_softmax_backward,
            dual_softmax_forward,
        )

        rng = np.random.RandomState(7)
        score = rng.randn(12, 6).astype(np.float32)
        temp = 0.03
        t = torch.from_numpy(score)
        ref_fwd = (t * F.softmax(t / temp, dim=0) * len(t)).numpy()
        ref_bwd = (t * F.softmax(t / temp, dim=1) * len(t[0])).numpy()
        np.testing.assert_allclose(
            dual_softmax_forward(score, temp), ref_fwd, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            dual_softmax_backward(score, temp), ref_bwd, rtol=1e-5, atol=1e-5
        )


# ---------------------------------------------------------------------------
# SCST Scorer: CIDEr(train-df) + sentence BLEU4 rewards
# ---------------------------------------------------------------------------


class _WhitespaceTok:
    """Deterministic whitespace tokenizer exposing both API surfaces:
    reference Scorer calls .encode() (ids); ours calls .tokenize() /
    .convert_ids_to_tokens().  The id<->token bijection makes the n-gram
    statistics identical on both sides."""

    def __init__(self, corpus):
        vocab = sorted({w for s in corpus for w in s.split()})
        self.stoi = {w: i for i, w in enumerate(vocab)}
        self.itos = {i: w for w, i in self.stoi.items()}

    def encode(self, s):
        return [self.stoi[w] for w in s.split()]

    def tokenize(self, s):
        return s.split()

    def convert_ids_to_tokens(self, ids):
        return [self.itos[int(i)] for i in ids]


CAPTIONS = {
    "vid1": ["a man rides a horse on the beach",
             "a person is riding a horse"],
    "vid2": ["two dogs play with a red ball"],
    "vid3": ["a woman slices an onion in the kitchen",
             "someone cuts an onion with a knife"],
    "vid4": ["children sing a song at school"],
    "vid5": ["a chef cooks pasta in a large pot"],
}
HYPS = {
    "vid1": "a man rides a horse",
    "vid2": "dogs play with a ball",
    "vid3": "a woman slices an onion in the kitchen",  # exact prefix match
    "vid4": "a cat sleeps on the sofa",  # zero overlap
    "vid5": "a chef cooks pasta pasta pasta",  # repeated n-grams
}


class TestScorerGolden:
    @pytest.fixture(scope="class")
    def fixtures(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("scst")
        tok = _WhitespaceTok(
            [c for caps in CAPTIONS.values() for c in caps]
            + list(HYPS.values())
        )
        # reference format: COCO-style annotations + ids file
        ref_ann = {
            "annotations": [
                {"video_id": vid, "caption": c}
                for vid, caps in CAPTIONS.items()
                for c in caps
            ]
        }
        (d / "ref_ann.json").write_text(json.dumps(ref_ann))
        (d / "ids.json").write_text(json.dumps(list(CAPTIONS)))
        # our format: {id: [captions]}
        (d / "ours_ann.json").write_text(json.dumps(CAPTIONS))
        return d, tok

    def test_rewards_match_reference(self, fixtures):
        d, tok = fixtures
        _install_reference_stubs()
        from scorer.scorer import Scorer as RefScorer

        ids = list(CAPTIONS)
        hyp_ids = [tok.encode(HYPS[i]) for i in ids]
        ref_scorer = RefScorer(str(d / "ref_ann.json"), str(d / "ids.json"), tok)
        ref_rewards = ref_scorer(ids, hyp_ids)

        ours = Scorer(str(d / "ours_ann.json"), ids, tok)
        our_rewards = ours(ids, hyp_ids)
        np.testing.assert_allclose(our_rewards, ref_rewards, rtol=1e-6, atol=1e-8)


# ---------------------------------------------------------------------------
# AdaptiveAlpha vs the reference's init_alpah/update_alpha/get_alpha
# ---------------------------------------------------------------------------


class TestAdaptiveAlphaGolden:
    @pytest.fixture(scope="class")
    def ref_valor_cls(self):
        _install_reference_stubs()
        from model.pretrain import VALOR

        return VALOR

    @pytest.mark.parametrize("alpha_type", [0, 1, 2])
    def test_alpha_trajectory(self, ref_valor_cls, alpha_type):
        beta = 0.9
        ref = types.SimpleNamespace()
        ref_valor_cls.init_alpah(ref)
        ref.alpha_type = alpha_type
        ref.beta = beta
        ours = AdaptiveAlpha(alpha_type=alpha_type, beta=beta)
        rng = np.random.RandomState(alpha_type)
        for _ in range(25):
            rs = rng.rand(8).astype(np.float32) + 0.1
            rg = rng.rand(8).astype(np.float32) + 0.1
            ref_valor_cls.update_alpha(ref, rs, rg)
            ours.update(rs, rg)
            assert ours.value() == pytest.approx(
                ref_valor_cls.get_alpha(ref), rel=1e-6
            )
