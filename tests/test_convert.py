"""Checkpoint converter tests: synthetic torch-style state dicts ->
flax trees that drop into the model's param structure."""

import jax
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from tests.test_model import make_batch
from valor_tpu.core.tasks import parse_task
from valor_tpu.models import convert as C
from valor_tpu.models.valor import VALORModel
from valor_tpu.train.checkpoints import (
    adapt_pretrained_params,
    bilinear_resize_pos_embed,
    extend_frame_embedding,
)


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def synth_bert_sd(hidden=32, layers=2, vocab=512, inter=64):
    sd = {
        "embeddings.word_embeddings.weight": _rand(vocab, hidden),
        "embeddings.position_embeddings.weight": _rand(512, hidden),
        "embeddings.token_type_embeddings.weight": _rand(2, hidden),
        "embeddings.LayerNorm.weight": _rand(hidden),
        "embeddings.LayerNorm.bias": _rand(hidden),
        "cls.predictions.transform.dense.weight": _rand(hidden, hidden),
        "cls.predictions.transform.dense.bias": _rand(hidden),
        "cls.predictions.transform.LayerNorm.weight": _rand(hidden),
        "cls.predictions.transform.LayerNorm.bias": _rand(hidden),
        "cls.predictions.bias": _rand(vocab),
    }
    for i in range(layers):
        p = f"encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            sd[f"{p}.attention.self.{qkv}.weight"] = _rand(hidden, hidden)
            sd[f"{p}.attention.self.{qkv}.bias"] = _rand(hidden)
        sd[f"{p}.attention.output.dense.weight"] = _rand(hidden, hidden)
        sd[f"{p}.attention.output.dense.bias"] = _rand(hidden)
        sd[f"{p}.attention.output.LayerNorm.weight"] = _rand(hidden)
        sd[f"{p}.attention.output.LayerNorm.bias"] = _rand(hidden)
        sd[f"{p}.intermediate.dense.weight"] = _rand(inter, hidden)
        sd[f"{p}.intermediate.dense.bias"] = _rand(inter)
        sd[f"{p}.output.dense.weight"] = _rand(hidden, inter)
        sd[f"{p}.output.dense.bias"] = _rand(hidden)
        sd[f"{p}.output.LayerNorm.weight"] = _rand(hidden)
        sd[f"{p}.output.LayerNorm.bias"] = _rand(hidden)
    return sd


class TestBertConvert:
    def test_convert_and_load(self):
        cfg = tiny_model_config()
        model = VALORModel(cfg)
        batch = make_batch(jax.random.PRNGKey(0))
        task = parse_task("cap%tv")
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batch, task, True, True,
        )["params"]
        sd = synth_bert_sd()
        tree = C.convert_bert(sd)
        adapted = adapt_pretrained_params(tree, params)
        # word embedding landed and transposed linears have right shapes
        got = np.asarray(
            adapted["multimodal_encoder"]["embeddings"]["word_embeddings"]
        )
        np.testing.assert_array_equal(got, sd["embeddings.word_embeddings.weight"])
        q = np.asarray(
            adapted["multimodal_encoder"]["layer_0"]["self_attn"]["attn"]["query"]["kernel"]
        )
        np.testing.assert_array_equal(q, sd["encoder.layer.0.attention.self.query.weight"].T)
        # cls head bias from predictions.bias
        np.testing.assert_array_equal(
            np.asarray(adapted["cls_head"]["decoder_bias"]), sd["cls.predictions.bias"]
        )
        # and the model still runs with the adapted params
        out = model.apply(
            {"params": adapted}, batch, task, True, True,
            rngs={"mask": jax.random.PRNGKey(2)},
        )
        assert np.isfinite(float(out["caption_loss"]))


class TestSurgery:
    def test_pos_embed_resize(self):
        pos = _rand(1 + 4 * 4, 8)
        out = bilinear_resize_pos_embed(pos, 8)
        assert out.shape == (1 + 8 * 8, 8)
        np.testing.assert_array_equal(out[0], pos[0])  # CLS untouched

    def test_frame_embedding_extension(self):
        fe = _rand(1, 4, 8)
        out = extend_frame_embedding(fe, 7)
        assert out.shape == (1, 7, 8)
        for j in range(4, 7):
            np.testing.assert_array_equal(out[0, j], fe[0, -1])

    def test_adapt_resizes_clip_pos_embed(self):
        # mismatched clip_vision positional_embedding gets bilinear-resized
        cfg = tiny_model_config(video_resolution=64)  # grid 4 -> 17 rows
        model = VALORModel(cfg)
        batch = make_batch(jax.random.PRNGKey(0), res=64)
        task = parse_task("ret%tv")
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batch, task, True, True,
        )["params"]
        src = {"clip_vision": {"positional_embedding": _rand(1 + 2 * 2, 32)}}
        adapted = adapt_pretrained_params(src, params)
        assert np.asarray(
            adapted["clip_vision"]["positional_embedding"]
        ).shape == (17, 32)
