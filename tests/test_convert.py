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

    def test_frame_embedding_shrink_truncates(self):
        """Finetuning with FEWER frames than pretrain must hand back the
        first n trained rows, never a wrong-shaped leaf that explodes
        later inside model.apply."""
        fe = _rand(1, 8, 8)
        out = extend_frame_embedding(fe, 3)
        assert out.shape == (1, 3, 8)
        np.testing.assert_array_equal(out, fe[:, :3])

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


def synth_clip_sd(width=32, layers=2, patch=16, res=32, vocab=512, ctx=77, embed=16):
    """OpenAI-CLIP-named state dict at clip_vit_tiny dims."""
    grid = res // patch
    sd = {
        "visual.conv1.weight": _rand(width, 3, patch, patch),
        "visual.class_embedding": _rand(width),
        "visual.positional_embedding": _rand(1 + grid * grid, width),
        "visual.ln_pre.weight": _rand(width),
        "visual.ln_pre.bias": _rand(width),
        "visual.ln_post.weight": _rand(width),
        "visual.ln_post.bias": _rand(width),
        "visual.proj": _rand(width, embed),
        "token_embedding.weight": _rand(vocab, width),
        "positional_embedding": _rand(ctx, width),
        "ln_final.weight": _rand(width),
        "ln_final.bias": _rand(width),
        "text_projection": _rand(width, embed),
        "logit_scale": np.float32(2.6593),
    }
    for tower, n in (("visual.transformer.resblocks", layers), ("transformer.resblocks", layers)):
        for i in range(n):
            p = f"{tower}.{i}"
            sd[f"{p}.ln_1.weight"] = _rand(width)
            sd[f"{p}.ln_1.bias"] = _rand(width)
            sd[f"{p}.ln_2.weight"] = _rand(width)
            sd[f"{p}.ln_2.bias"] = _rand(width)
            sd[f"{p}.attn.in_proj_weight"] = _rand(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = _rand(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = _rand(width, width)
            sd[f"{p}.attn.out_proj.bias"] = _rand(width)
            sd[f"{p}.mlp.c_fc.weight"] = _rand(4 * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = _rand(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = _rand(width, 4 * width)
            sd[f"{p}.mlp.c_proj.bias"] = _rand(width)
    return sd


def synth_valor_full_sd(hidden=32, contra=16, audio_tokens=2):
    """A full VALOR training checkpoint at tiny_model_config dims, using the
    reference VALORModel attribute names (modeling.py:341-351, :569, :605,
    :635, :651; pretrain.py:89-119)."""
    sd = {f"clip_model.{k}": v for k, v in synth_clip_sd().items()}
    # prompted CLIP text tower (use_task_prompt; clip.py:372-427)
    sd["clip_model.prompt_embedding.weight"] = _rand(1, 32)
    bert = synth_bert_sd()
    for k, v in bert.items():
        if not k.startswith("cls."):
            sd[f"multimodal_encoder.{k}"] = v
    # prompt-type embedding (bert.py:181) + va_concate cross-attn blocks
    # (bert.py:447-493 cross_attn.cross.{q,k,v} / cross_attn.output.*)
    sd["multimodal_encoder.embeddings.prompt_embedding.weight"] = _rand(1, hidden)
    for i in range(2):
        p = f"multimodal_encoder.encoder.layer.{i}.cross_attn"
        for qkv in ("query", "key", "value"):
            sd[f"{p}.cross.{qkv}.weight"] = _rand(hidden, hidden)
            sd[f"{p}.cross.{qkv}.bias"] = _rand(hidden)
        sd[f"{p}.output.dense.weight"] = _rand(hidden, hidden)
        sd[f"{p}.output.dense.bias"] = _rand(hidden)
        sd[f"{p}.output.LayerNorm.weight"] = _rand(hidden)
        sd[f"{p}.output.LayerNorm.bias"] = _rand(hidden)
    # BERTPredictionHead at VALOR level (modeling.py:232-246, :651-656)
    sd["cls.dense.weight"] = _rand(hidden, hidden)
    sd["cls.dense.bias"] = _rand(hidden)
    sd["cls.layernorm.weight"] = _rand(hidden)
    sd["cls.layernorm.bias"] = _rand(hidden)
    sd["cls.decoder.weight"] = bert["embeddings.word_embeddings.weight"]
    sd["cls.decoder.bias"] = _rand(512)
    # AST under its in-model names (modeling.py:738-762, transformer.py:56-170)
    sd["audio_embeddings.cls_token"] = _rand(1, 1, hidden)
    sd["audio_embeddings.first_conv.weight"] = _rand(hidden, 1, 16, 16)
    sd["audio_embeddings.first_conv.bias"] = _rand(hidden)
    sd["audio_embeddings.position_embeddings.weight"] = _rand(audio_tokens + 1, hidden)
    for i in range(2):
        p = f"audio_encoder.layer.{i}"
        for j in range(4):
            sd[f"{p}.attention.linears.{j}.weight"] = _rand(hidden, hidden)
            sd[f"{p}.attention.linears.{j}.bias"] = _rand(hidden)
        sd[f"{p}.ff_layer.linear1.weight"] = _rand(64, hidden)
        sd[f"{p}.ff_layer.linear1.bias"] = _rand(64)
        sd[f"{p}.ff_layer.linear2.weight"] = _rand(hidden, 64)
        sd[f"{p}.ff_layer.linear2.bias"] = _rand(hidden)
        sd[f"{p}.layernorm1.weight"] = _rand(hidden)
        sd[f"{p}.layernorm1.bias"] = _rand(hidden)
        sd[f"{p}.layernorm2.weight"] = _rand(hidden)
        sd[f"{p}.layernorm2.bias"] = _rand(hidden)
    sd["audio_encoder.last_layernorm.weight"] = _rand(hidden)
    sd["audio_encoder.last_layernorm.bias"] = _rand(hidden)
    # contrastive heads + glue (pretrain.py:98-119, modeling.py:341-351)
    sd["contra_head_a.linear.weight"] = _rand(contra, hidden)
    for name in ("text_fine_weight", "video_fine_weight", "audio_fine_weight"):
        sd[f"{name}.0.weight"] = _rand(contra, contra)
        sd[f"{name}.0.bias"] = _rand(contra)
        sd[f"{name}.2.weight"] = _rand(1, contra)
        sd[f"{name}.2.bias"] = _rand(1)
    sd["contra_temp"] = np.float32(0.07)
    sd["video_type_embeddings"] = _rand(1, 1, hidden)
    sd["audio_type_embeddings"] = _rand(1, 1, hidden)
    sd["video_frame_embedding"] = _rand(1, 32, hidden)
    sd["audio_frame_embedding"] = _rand(1, 32, hidden)
    return sd


class TestValorFullConvert:
    """Released full-checkpoint conversion (VERDICT #10): the whole VALOR
    .pt state_dict lands on our param tree with no missing/mismatched leaf."""

    def _model_params(self):
        cfg = tiny_model_config()
        model = VALORModel(cfg)
        batch = make_batch(jax.random.PRNGKey(0))
        task = parse_task("pt_contra%tva_caption%tva")
        return model, batch, task, model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batch, task, True, True,
        )["params"]

    def test_full_checkpoint_covers_tree(self):
        model, batch, task, params = self._model_params()
        sd = synth_valor_full_sd()
        tree = C.convert_valor_full(sd, resolution=32)
        flat_dst = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_src = dict(jax.tree_util.tree_flatten_with_path(tree)[0])
        missing = []
        mismatched = []
        for path, dst in flat_dst:
            key = "/".join(str(getattr(k, "key", k)) for k in path)
            if path not in flat_src:
                missing.append(key)
            elif np.shape(flat_src[path]) != dst.shape:
                mismatched.append(f"{key}: {np.shape(flat_src[path])} != {dst.shape}")
        assert not missing, f"missing from converted checkpoint: {missing}"
        assert not mismatched, f"shape mismatches: {mismatched}"
        # spot-check a transpose and the frame embedding passthrough
        np.testing.assert_array_equal(
            np.asarray(tree["contra_head_a"]["kernel"]),
            sd["contra_head_a.linear.weight"].T,
        )
        np.testing.assert_array_equal(
            np.asarray(tree["video_frame_embedding"]), sd["video_frame_embedding"]
        )
        # the adapted model runs
        adapted = adapt_pretrained_params(tree, params)
        out = model.apply(
            {"params": adapted}, batch, task, True, True,
            rngs={"mask": jax.random.PRNGKey(2)},
        )
        assert all(np.isfinite(float(v)) for v in out.values())

    def test_load_converted_detects_full_checkpoint(self, tmp_path):
        import torch

        sd = synth_valor_full_sd()
        path = str(tmp_path / "valor_tiny.pt")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
        tree = C.load_converted(path)
        assert "clip_vision" in tree and "audio_encoder" in tree and "cls_head" in tree


class TestJitArchive:
    """torch.jit archive loading (the released CLIP weights are jit
    archives — reference modeling.py:559-566; VERDICT Missing #8)."""

    def test_clip_jit_archive(self, tmp_path):
        import torch
        from torch import nn

        sd = synth_clip_sd()

        class Holder(nn.Module):
            def forward(self):
                return torch.zeros(1)

        root = Holder()
        for key, val in sd.items():
            parts = key.split(".")
            m = root
            for p in parts[:-1]:
                if not hasattr(m, p):
                    setattr(m, p, nn.Module())
                m = getattr(m, p)
            m.register_parameter(
                parts[-1], nn.Parameter(torch.from_numpy(np.asarray(val)))
            )
        path = str(tmp_path / "clip_tiny_jit.pt")
        torch.jit.save(torch.jit.script(root), path)
        tree = C.load_converted(path)
        assert "clip_vision" in tree and "clip_text" in tree
        np.testing.assert_allclose(
            np.asarray(tree["clip_proj"]["visual_proj"]), sd["visual.proj"]
        )
