"""audio<->video retrieval eval (reference test.py:341-377): the va / vta /
atv directions of retrieval_scores + validate_ret, golden-checked against
the reference's compute_fine_matrix wiring."""

import jax
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from tests.test_golden_losses import ref_pretrain  # noqa: F401  (fixture)
from valor_tpu.core.tasks import parse_task
from valor_tpu.eval.retrieval import retrieval_report
from valor_tpu.eval.validate import retrieval_scores, validate_ret
from valor_tpu.models.valor import VALORModel
from valor_tpu.train.step import make_eval_step  # before ref stubs fake yaml


@pytest.fixture(scope="module")
def av_model():
    cfg = tiny_model_config(
        fusion_vocab=128, txt_encoder_type="bert_base_uncased", init_clip_head=False
    )
    model = VALORModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "bert_tokens": np.array([[101, 7, 8, 102, 0, 0]] * 2, np.int32),
        "video_pixels": rng.randn(2, 1, 32, 32, 3).astype(np.float32),
        "audio_spectrograms": rng.randn(2, 1, 16, 32).astype(np.float32),
    }
    spec = parse_task("ret%tva")
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch, spec, True, True,
    )["params"]
    return model, params


def _feats(n=5, T=3, V=4, D=16, seed=0, normalize=False):
    rng = np.random.RandomState(seed)

    def f(shape):
        x = rng.randn(*shape).astype(np.float32)
        if normalize:
            x /= np.linalg.norm(x, axis=-1, keepdims=True)
        return x

    txt = np.zeros((n, T), np.int32)
    txt[:, :2] = 1  # two valid tokens per caption
    return {
        "feat_t": jax.numpy.asarray(f((n, T, D))),
        "feat_v": jax.numpy.asarray(f((n, V, D))),
        "feat_a": jax.numpy.asarray(f((n, V, D))),
        "txt_tokens": jax.numpy.asarray(txt),
    }


class TestEvalTrainScoreParity:
    """eval retrieval_scores and the model's in-jit group_score_matrix
    implement the same group dispatch twice (gallery-chunked fine_score
    vs in-batch fine_score); this pins them equal on identical features
    for EVERY group so a semantics change in one cannot silently diverge
    train-contra from eval-retrieval scores."""

    @pytest.mark.parametrize("group", ["tv", "ta", "tva", "va", "vta", "atv"])
    def test_fine_mode_groups_match(self, av_model, group):
        model, params = av_model
        feats = _feats(n=4, D=model.cfg.contra_dim)
        ours = retrieval_scores(model, params, feats, group, "fine")
        theirs = np.asarray(
            model.apply(
                {"params": params}, group, feats, feats["txt_tokens"],
                method=lambda m, g, f, t: m.group_score_matrix(g, f, t),
            )
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


class TestGoldenAVDirections:
    """Our retrieval_scores vs the reference compute_fine_matrix with the
    reference's per-direction mask/weight wiring (test.py:341-377), using
    the model's own fine-weight MLPs for both sides."""

    def _fw(self, model, params, name, x):
        return np.asarray(
            model.apply({"params": params}, x, method=lambda m, y: getattr(m, name)(y))
        )

    def _ref_fine(self, ref_pretrain, fa, fb, ma, mb, wa, wb):
        import torch

        return ref_pretrain.VALOR.compute_fine_matrix_slice(
            None,
            *(torch.from_numpy(np.asarray(x, np.float32).copy()) for x in (fa, fb, ma, mb, wa, wb)),
        ).numpy()

    def test_va(self, av_model, ref_pretrain):
        model, params = av_model
        feats = _feats()
        ours = retrieval_scores(model, params, feats, "va", "fine")
        fv, fa = np.asarray(feats["feat_v"]), np.asarray(feats["feat_a"])
        ones = np.ones(fv.shape[:2], np.float32)
        ref = self._ref_fine(
            ref_pretrain, fv, fa, ones, ones,
            self._fw(model, params, "video_fine_weight", fv),
            self._fw(model, params, "audio_fine_weight", fa),
        )
        np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)

    def test_vta(self, av_model, ref_pretrain):
        model, params = av_model
        feats = _feats()
        ours = retrieval_scores(model, params, feats, "vta", "fine")
        ft = np.asarray(feats["feat_t"])
        fv, fa = np.asarray(feats["feat_v"]), np.asarray(feats["feat_a"])
        mask_t = (np.asarray(feats["txt_tokens"]) != 0).astype(np.float32)
        fta = np.concatenate([ft, fa], axis=1)
        mta = np.concatenate([mask_t, np.ones(fa.shape[:2], np.float32)], axis=1)
        wta = np.concatenate(
            [
                self._fw(model, params, "text_fine_weight", ft),
                self._fw(model, params, "audio_fine_weight", fa),
            ],
            axis=1,
        )
        ref = self._ref_fine(
            ref_pretrain, fv, fta, np.ones(fv.shape[:2], np.float32), mta,
            self._fw(model, params, "video_fine_weight", fv), wta,
        )
        np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)

    def test_atv(self, av_model, ref_pretrain):
        model, params = av_model
        feats = _feats()
        ours = retrieval_scores(model, params, feats, "atv", "fine")
        ft = np.asarray(feats["feat_t"])
        fv, fa = np.asarray(feats["feat_v"]), np.asarray(feats["feat_a"])
        mask_t = (np.asarray(feats["txt_tokens"]) != 0).astype(np.float32)
        ftv = np.concatenate([ft, fv], axis=1)
        mtv = np.concatenate([mask_t, np.ones(fv.shape[:2], np.float32)], axis=1)
        wtv = np.concatenate(
            [
                self._fw(model, params, "text_fine_weight", ft),
                self._fw(model, params, "video_fine_weight", fv),
            ],
            axis=1,
        )
        ref = self._ref_fine(
            ref_pretrain, fa, ftv, np.ones(fa.shape[:2], np.float32), mtv,
            self._fw(model, params, "audio_fine_weight", fa), wtv,
        )
        np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


class TestAVRetrievalSemantics:
    def test_va_self_retrieval_r1(self, av_model):
        # identical (per-token l2-normalised) audio and video features ->
        # the diagonal dominates -> forward R@1 = 100
        model, params = av_model
        feats = _feats(normalize=True)
        feats["feat_a"] = feats["feat_v"]
        score = retrieval_scores(model, params, feats, "va", "fine")
        ids = [f"i{k}" for k in range(score.shape[0])]
        rep = retrieval_report(score, ids, ids)
        assert rep["forward_r1"] == 100.0

    def test_coarse_va_unsupported(self, av_model):
        model, params = av_model
        with pytest.raises(ValueError, match="coarse"):
            retrieval_scores(model, params, _feats(), "va", "coarse")

    def test_vta_misaligned_rows_raise(self, av_model):
        model, params = av_model
        feats = _feats()
        feats["feat_t"] = feats["feat_t"][:3]  # 3 captions vs 5 items
        feats["txt_tokens"] = feats["txt_tokens"][:3]
        with pytest.raises(ValueError, match="aligned"):
            retrieval_scores(model, params, feats, "vta", "fine")


class TestValidateRetAVGroups:
    def test_all_groups_end_to_end(self, av_model):
        """ret%tva%va%vta%atv evaluates without error and reports r1/5/10
        per direction (VERDICT round 2 item 2)."""
        model, params = av_model
        spec = parse_task("ret%tva%tv%ta%va%vta%atv")
        rng = np.random.RandomState(1)
        batches = []
        for b in range(2):
            batches.append(
                {
                    "ids": [f"v{b}{i}" for i in range(3)],
                    "bert_tokens": np.tile(
                        np.array([[101, 7 + b, 8, 102, 0, 0]], np.int32), (3, 1)
                    ),
                    "video_pixels": rng.randn(3, 1, 32, 32, 3).astype(np.float32),
                    "audio_spectrograms": rng.randn(3, 1, 16, 32).astype(np.float32),
                }
            )
        eval_step = make_eval_step(model)
        report = validate_ret(
            model, params, eval_step, iter(batches), spec, "fine"
        )
        for g in ("tva", "tv", "ta", "va", "vta", "atv"):
            for k in ("r1", "r5", "r10", "ravg", "medianR", "meanR"):
                assert np.isfinite(report[f"{g}_forward_{k}"])
        assert report["ravg"] == report["tva_forward_ravg"]
