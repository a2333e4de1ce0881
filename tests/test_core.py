"""L0: task algebra, config system, masks, token masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valor_tpu.core.config import Config, load_config
from valor_tpu.core.tasks import parse_task
from valor_tpu.ops.masking import full_mask, lm_shift_labels, mask_tokens
from valor_tpu.ops.masks import fusion_attention_bias, sequence_mask


class TestTaskAlgebra:
    def test_pretrain_task(self):
        t = parse_task("pt_contra%tva%tv%ta_caption%tva%tv%ta")
        assert t.family == "pt"
        assert t.contra_groups == ("tva", "tv", "ta")
        assert t.caption_groups == ("tva", "tv", "ta")
        assert t.mlm_groups == ()
        assert t.uses_video and t.uses_audio and t.uses_text

    def test_pretrain_with_mlm(self):
        t = parse_task("pt_contra%tv_caption%tv_mlm%tv")
        assert t.mlm_groups == ("tv",)

    def test_ret_cap_qa(self):
        assert parse_task("ret%tva%tv").contra_groups == ("tva", "tv")
        assert parse_task("cap%tva").caption_groups == ("tva",)
        assert parse_task("qa%tv").family == "qa"

    def test_hashable_static(self):
        a = parse_task("ret%tv")
        b = parse_task("ret%tv")
        assert a == b and hash(a) == hash(b)

    def test_bad_group(self):
        with pytest.raises(ValueError):
            parse_task("ret%xyz")


class TestConfig:
    def test_defaults(self):
        cfg = load_config()
        assert cfg.model.video_encoder_type == "clip_vit_base_16"
        assert cfg.train.learning_rate == 1e-4

    def test_json_and_overrides(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(
            """
            {"video_resolution": 192, "learning_rate": 2e-4,
             "data_cfg": {"train": [{"datasets": [{"name": "d", "ids_path": "i",
               "txt": "t", "video": "v", "datatype": "video"}],
               "task": "ret%tv", "batch_size": 8}], "val": []}}
            """
        )
        cfg = load_config(str(p), overrides={"video_resolution": 256})
        assert cfg.model.video_resolution == 256  # CLI wins over JSON
        assert cfg.train.learning_rate == 2e-4
        assert cfg.data_train[0].task == "ret%tv"
        assert cfg.data_train[0].datasets[0].name == "d"

    def test_convenience_overrides(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(
            '{"data_cfg": {"train": [{"datasets": [], "task": "ret%tv",'
            ' "batch_size": 8, "video_sample_num": 4}], "val": []}}'
        )
        cfg = load_config(str(p), overrides={"train_video_sample_num": 7, "train_batch_size": 16})
        assert cfg.data_train[0].video_sample_num == 7
        assert cfg.data_train[0].batch_size == 16


class TestMasks:
    def test_bidirectional_padding(self):
        tokens = jnp.array([[101, 5, 6, 0, 0]])
        km = sequence_mask(tokens)
        bias = fusion_attention_bias(km, text_len=5, causal=False)
        assert bias.shape == (1, 1, 5, 5)
        np.testing.assert_array_equal(np.asarray(bias[0, 0, 0, :3]), 0.0)
        assert np.all(np.asarray(bias[0, 0, :, 3:]) < -1000)

    def test_causal_prefix(self):
        # text len 3 + 2 media slots
        km = jnp.ones((1, 5))
        bias = np.asarray(fusion_attention_bias(km, text_len=3, causal=True)[0, 0])
        # text query 0 cannot see text 1,2 but sees media
        assert bias[0, 1] < -1000 and bias[0, 2] < -1000
        assert bias[0, 3] == 0 and bias[0, 4] == 0
        # media queries cannot see text at all
        assert bias[3, 0] < -1000 and bias[4, 2] < -1000
        assert bias[3, 4] == 0

    def test_full_masker(self):
        # doubled text block of 4 (2 originals + 2 masks) + 1 media slot
        km = jnp.ones((1, 5))
        bias = np.asarray(fusion_attention_bias(km, text_len=4, causal=True, full_masker=True)[0, 0])
        # original stream causal
        assert bias[0, 1] < -1000 and bias[1, 0] == 0
        # originals blind to mask stream
        assert bias[0, 2] < -1000 and bias[1, 3] < -1000
        # mask stream: causal over originals + own identity only
        assert bias[2, 0] == 0 and bias[2, 1] < -1000
        assert bias[2, 2] == 0 and bias[2, 3] < -1000
        assert bias[3, 3] == 0
        # media query blind to all text
        assert np.all(bias[4, :4] < -1000) and bias[4, 4] == 0


class TestTokenMasking:
    def test_mask_tokens_distribution(self):
        rng = jax.random.PRNGKey(0)
        tokens = jnp.tile(jnp.array([[101, 7, 8, 9, 10, 0, 0]]), (256, 1))
        out, labels = mask_tokens(rng, tokens, 0.5, mask_token=103, range_start=106, range_end=200)
        out, labels = np.asarray(out), np.asarray(labels)
        # BOS and padding never masked
        assert np.all(labels[:, 0] == -1)
        assert np.all(labels[:, 5:] == -1)
        assert np.all(out[:, 0] == 101)
        # every row has at least one masked position
        assert np.all((labels != -1).sum(axis=1) >= 1)
        # labels store original tokens
        m = labels != -1
        assert np.all(labels[m] == np.tile(np.array([[101, 7, 8, 9, 10, 0, 0]]), (256, 1))[m])
        # roughly 80% [MASK] among masked positions
        frac_mask = (out[m] == 103).mean()
        assert 0.65 < frac_mask < 0.92

    def test_full_mask(self):
        tokens = jnp.array([[101, 7, 8, 102, 0]])
        doubled, labels = full_mask(tokens, mask_token=103)
        assert doubled.shape == (1, 10)
        np.testing.assert_array_equal(np.asarray(doubled[0, 5:]), 103)
        lab = np.asarray(labels[0])
        # mask-stream position 5+j labels tokens[j+1]
        np.testing.assert_array_equal(lab[5:9], [7, 8, 102, -1])
        assert np.all(lab[:5] == -1)

    def test_lm_shift(self):
        tokens = jnp.array([[101, 7, 8, 102, 0, 0]])
        labels = np.asarray(lm_shift_labels(tokens)[0])
        np.testing.assert_array_equal(labels, [7, 8, 102, -1, -1, -1])
