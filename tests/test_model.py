"""L1: VALOR model forwards — shapes, finiteness, task dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from valor_tpu.core.tasks import parse_task
from valor_tpu.models.valor import VALORModel


def make_batch(rng, b=4, n_frames=2, n_clips=1, n_txt=8, res=32, mel=16, alen=32, vocab=512):
    ks = jax.random.split(rng, 4)
    txt = jax.random.randint(ks[0], (b, n_txt), 106, vocab)
    txt = txt.at[:, 0].set(101).at[:, -2].set(102).at[:, -1].set(0)
    return {
        "bert_tokens": txt,
        "clip_tokens": txt,
        "video_pixels": jax.random.normal(ks[1], (b, n_frames, res, res, 3)),
        "audio_spectrograms": jax.random.normal(ks[2], (b, n_clips, mel, alen)),
    }


def init_and_apply(cfg, batch, task, compute_loss=True, train=True):
    model = VALORModel(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "mask": jax.random.PRNGKey(1)},
        batch,
        parse_task(task),
        compute_loss,
        train,
    )
    out = model.apply(
        variables,
        batch,
        parse_task(task),
        compute_loss,
        train,
        rngs={"mask": jax.random.PRNGKey(2)},
    )
    return out, variables


class TestPretrain:
    def test_pt_trimodal(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "pt_contra%tva%tv%ta_caption%tva%tv%ta")
        assert set(out) == {"contra_loss", "caption_loss"}
        for v in out.values():
            assert np.isfinite(float(v))

    def test_pt_with_mlm(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "pt_contra%tv_caption%tv_mlm%tv")
        assert set(out) == {"contra_loss", "caption_loss", "mlm_loss"}

    def test_pt_coarse_contra(self):
        cfg = tiny_model_config(contra_type="coarse")
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "pt_contra%tva%tv%ta")
        assert np.isfinite(float(out["contra_loss"]))

    def test_pt_no_cross_attn(self):
        # video/audio concat into the fusion sequence instead
        cfg = tiny_model_config(multimodal_use_cross_attn=False)
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "pt_caption%tva")
        assert np.isfinite(float(out["caption_loss"]))

    @pytest.mark.parametrize("topo", ["va_parallel", "video_audio", "audio_video"])
    def test_cross_attn_topologies(self, topo):
        cfg = tiny_model_config(cross_attn_type=topo)
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "pt_caption%tva%tv%ta")
        assert np.isfinite(float(out["caption_loss"]))


class TestRetrieval:
    def test_ret_loss_and_features(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "ret%tva%tv")
        assert np.isfinite(float(out["contra_loss"]))
        feats, _ = init_and_apply(cfg, batch, "ret%tva%tv", compute_loss=False)
        assert feats["feat_t"].shape[0] == 4
        assert feats["feat_v"].shape[-1] == cfg.contra_dim or feats["feat_v"].shape[-1] == 16
        # features L2-normalised
        n = np.linalg.norm(np.asarray(feats["feat_t"]), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-3)

    def test_ret_bert_text_encoder(self):
        cfg = tiny_model_config(
            txt_encoder_type="bert_base_uncased", init_clip_head=False
        )
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "ret%tv")
        assert np.isfinite(float(out["contra_loss"]))

    def test_ret_audio_only(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "ret%ta")
        assert np.isfinite(float(out["contra_loss"]))


class TestCaption:
    def test_cap_loss_unimlm(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "cap%tva")
        assert np.isfinite(float(out["caption_loss"]))

    def test_cap_loss_lm(self):
        cfg = tiny_model_config(caption_type="lm")
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "cap%tv")
        assert np.isfinite(float(out["caption_loss"]))

    def test_cap_full_masker(self):
        cfg = tiny_model_config(full_masker=True)
        batch = make_batch(jax.random.PRNGKey(0))
        out, _ = init_and_apply(cfg, batch, "cap%tv")
        assert np.isfinite(float(out["caption_loss"]))


class TestQA:
    def test_qa_single_answer(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        batch["question_prompt"] = batch["bert_tokens"]
        out, _ = init_and_apply(cfg, batch, "qa%tva")
        assert np.isfinite(float(out["qa_loss"]))

    def test_qa_tiled_multi_answer(self):
        cfg = tiny_model_config()
        b_q, n_ans = 2, 3
        batch = make_batch(jax.random.PRNGKey(0), b=b_q)
        tiled = make_batch(jax.random.PRNGKey(1), b=b_q * n_ans)
        batch["bert_tokens"] = tiled["bert_tokens"]
        batch["question_prompt"] = tiled["bert_tokens"]
        batch["tile_index"] = jnp.repeat(jnp.arange(b_q), n_ans)
        batch["answer_weights"] = jnp.full((b_q * n_ans,), 1.0 / n_ans)
        out, _ = init_and_apply(cfg, batch, "qa%tv")
        assert np.isfinite(float(out["qa_loss"]))


class TestVideoSwin:
    def test_videoswin_pt(self):
        cfg = tiny_model_config(
            video_encoder_type="videoswin_tiny_test",
            txt_encoder_type="bert_base_uncased",
            init_clip_head=False,
        )
        batch = make_batch(jax.random.PRNGKey(0), n_frames=2, res=32)
        out, _ = init_and_apply(cfg, batch, "pt_contra%tv_caption%tv")
        assert np.isfinite(float(out["contra_loss"]))
        assert np.isfinite(float(out["caption_loss"]))



class TestRematScopeGuard:
    """checkpointing=True must reject scopes that would silently disable
    remat (typos, empty strings) — the failure otherwise surfaces only as
    an HBM OOM at flagship shapes (valor.py _remat)."""

    def _init(self, scope):
        cfg = tiny_model_config(checkpointing=True, remat_scope=scope)
        batch = make_batch(jax.random.PRNGKey(0))
        init_and_apply(cfg, batch, "ret%tv")

    def test_typo_rejected(self):
        with pytest.raises(ValueError, match="unknown token"):
            self._init("video")  # should be 'vision'

    def test_empty_rejected(self):
        with pytest.raises(ValueError, match="remat_scope"):
            self._init("")

    def test_whitespace_rejected(self):
        with pytest.raises(ValueError, match="remat_scope"):
            self._init(" , ")

    def test_explicit_none_allowed(self):
        self._init("none")  # intentional no-remat spelled out

    def test_valid_scope_allowed(self):
        self._init("vision,fusion")
