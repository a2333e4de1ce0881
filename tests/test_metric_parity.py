"""Golden metric parity: our BLEU/CIDEr/ROUGE-L vs the reference's own
pycocoevalcap scorers on a fixture corpus, plus METEOR behavior tests.

reference: cococaption/pycocoevalcap/{bleu,cider,rouge}/ — imported
directly (pure Python, no Java needed for these three).
"""

import sys

import numpy as np
import pytest

REF = "/root/reference/cococaption"


@pytest.fixture(scope="module")
def corpus():
    """Tokenized fixture corpus: {id: [hyp]} vs {id: [refs]} — varied
    lengths, partial overlaps, repeated n-grams, a perfect match, and a
    zero-overlap pair."""
    gts = {
        "1": ["a man is riding a horse on the beach", "a person rides a horse"],
        "2": ["two dogs play with a ball in the park"],
        "3": ["a woman slices a red onion with a knife",
              "someone is cutting an onion"],
        "4": ["the cat sleeps on the warm windowsill"],
        "5": ["children are singing a song at school"],
        "6": ["a chef cooks pasta in a large kitchen",
              "a man prepares food in the kitchen"],
    }
    res = {
        "1": ["a man rides a horse on the beach"],
        "2": ["dogs are playing with a ball"],
        "3": ["a woman slices a red onion with a knife"],  # perfect
        "4": ["a dog barks loudly"],  # zero overlap
        "5": ["children sing songs at a school"],
        "6": ["the chef is cooking pasta in the kitchen kitchen kitchen"],
    }
    return gts, res


@pytest.fixture(scope="module")
def ref_scorers():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from pycocoevalcap.bleu.bleu import Bleu
    from pycocoevalcap.cider.cider import Cider
    from pycocoevalcap.rouge.rouge import Rouge

    return Bleu(4), Cider(), Rouge()


class TestMetricParity:
    def test_bleu_matches_pycocoevalcap(self, corpus, ref_scorers):
        from valor_tpu.eval.caption_metrics import bleu_corpus

        gts, res = corpus
        bleu_ref, _ = ref_scorers[0].compute_score(gts, res)
        h = [res[k][0].split() for k in sorted(res)]
        r = [[s.split() for s in gts[k]] for k in sorted(res)]
        ours = bleu_corpus(h, r)
        np.testing.assert_allclose(ours, bleu_ref, atol=1e-4)

    def test_cider_matches_pycocoevalcap(self, corpus, ref_scorers):
        from valor_tpu.eval.caption_metrics import CiderScorer

        gts, res = corpus
        cider_ref, _ = ref_scorers[1].compute_score(gts, res)
        h = [res[k][0].split() for k in sorted(res)]
        r = [[s.split() for s in gts[k]] for k in sorted(res)]
        ours = float(np.mean(CiderScorer().score(h, r)))
        np.testing.assert_allclose(ours, cider_ref, atol=1e-4)

    def test_rouge_matches_pycocoevalcap(self, corpus, ref_scorers):
        from valor_tpu.eval.caption_metrics import rouge_l

        gts, res = corpus
        rouge_ref, _ = ref_scorers[2].compute_score(gts, res)
        h = [res[k][0].split() for k in sorted(res)]
        r = [[s.split() for s in gts[k]] for k in sorted(res)]
        np.testing.assert_allclose(rouge_l(h, r), rouge_ref, atol=1e-4)

    def test_caption_eval_report_carries_meteor(self, corpus):
        from valor_tpu.eval.caption_metrics import caption_eval

        gts, res = corpus
        report = caption_eval({k: v[0] for k, v in res.items()}, gts)
        for key in ("Bleu_4", "ROUGE_L", "CIDEr", "METEOR"):
            assert key in report
        assert 0.0 < report["METEOR"] <= 1.0


class TestMeteorLite:
    def test_perfect_match_near_one(self):
        from valor_tpu.eval.cococaption import meteor_lite

        s = meteor_lite({"a": "the cat sat on the mat"}, {"a": ["the cat sat on the mat"]})
        # single chunk -> penalty 0.5*(1/6)^3, F=1
        assert s == pytest.approx(1.0 - 0.5 * (1 / 6) ** 3, abs=1e-6)

    def test_zero_overlap_is_zero(self):
        from valor_tpu.eval.cococaption import meteor_lite

        assert meteor_lite({"a": "x y z"}, {"a": ["p q r"]}) == 0.0

    def test_word_order_penalised(self):
        from valor_tpu.eval.cococaption import meteor_lite

        ref = {"a": ["the quick brown fox jumps over the lazy dog"]}
        in_order = meteor_lite({"a": "the quick brown fox jumps over the lazy dog"}, ref)
        shuffled = meteor_lite({"a": "dog lazy the over jumps fox brown quick the"}, ref)
        assert shuffled < in_order

    def test_stem_stage_matches_morphology(self):
        from valor_tpu.eval.cococaption import meteor_lite

        # 'running'/'runs' match via Porter stems; exact-only would be 0
        s = meteor_lite({"a": "running quickly"}, {"a": ["runs quick"]})
        assert s > 0.0

    def test_porter_stemmer_known_pairs(self):
        from valor_tpu.eval.cococaption import porter_stem

        # canonical examples from Porter 1980
        for w, st in [
            ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
            ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
            ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
            ("troubling", "troubl"), ("sized", "size"), ("hopping", "hop"),
            ("falling", "fall"), ("hissing", "hiss"), ("happy", "happi"),
            ("relational", "relat"), ("conditional", "condit"),
            ("rational", "ration"), ("valenci", "valenc"),
            ("digitizer", "digit"), ("operator", "oper"),
            ("feudalism", "feudal"), ("decisiveness", "decis"),
            ("hopefulness", "hope"), ("callousness", "callous"),
            ("formaliti", "formal"), ("sensitiviti", "sensit"),
            ("triplicate", "triplic"), ("formative", "form"),
            ("formalize", "formal"), ("electriciti", "electr"),
            ("electrical", "electr"), ("hopeful", "hope"),
            ("goodness", "good"), ("revival", "reviv"),
            ("allowance", "allow"), ("inference", "infer"),
            ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
            ("adjustable", "adjust"), ("defensible", "defens"),
            ("irritant", "irrit"), ("replacement", "replac"),
            ("adjustment", "adjust"), ("dependent", "depend"),
            ("adoption", "adopt"), ("homologou", "homolog"),
            ("communism", "commun"), ("activate", "activ"),
            ("angulariti", "angular"), ("homologous", "homolog"),
            ("effective", "effect"), ("bowdlerize", "bowdler"),
            ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
            ("controll", "control"), ("roll", "roll"),
        ]:
            assert porter_stem(w) == st, (w, porter_stem(w), st)
