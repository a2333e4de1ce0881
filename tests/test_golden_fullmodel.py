"""FULL-MODEL golden parity: the actual reference ``VALOR`` class
(/root/reference/model/pretrain.py:64), instantiated at a reduced-depth
flagship shape (B/16-width CLIP towers @ 2 layers, 768-wide AST @ 2
layers, 2-layer BERT fusion w/ va_concate cross-attn), run end-to-end
against our model on weights converted with ``convert_valor_full``:

  * ret:  per-modality features (compute_loss=False) + the training
          contrastive loss over every modality group,
  * pt:   contra + caption losses (caption_type='lm' — deterministic;
          the unimlm masking path is RNG-driven on both sides and is
          covered by the component goldens),
  * cap:  greedy AND beam-3 generated sequences, token-for-token,
  * qa:   greedy generated answers + the ('lm') QA loss.

The reference's hardwired artifact loads (CLIP jit archive, BERT bin /
config / vocab, AudioSet init) are served by tiny random artifacts via
monkeypatched loaders — every line of reference model code still runs.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

# import the heavy deps BEFORE the reference stubs fake yaml/toolz
import jax
import jax.numpy as jnp

from tests.conftest import tiny_model_config  # noqa: F401  (env side-effects)
from valor_tpu.core.config import ModelConfig
from valor_tpu.core.tasks import parse_task
from valor_tpu.eval import generate as gen
from valor_tpu.models.convert import convert_valor_full
from valor_tpu.models.valor import VALORModel
from valor_tpu.train.step import make_eval_step  # noqa: F401

torch = pytest.importorskip("torch")

B = 3  # batch
N_FRAMES = 2
RES = 64
MELS, AUDIO_LEN = 32, 32
GEN_LEN = 5

# ---------------------------------------------------------------------------
# reference-side fixture
# ---------------------------------------------------------------------------


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)


def _install_reference_stubs():
    import torch.nn as nn

    import importlib

    _stub("pkg_resources", packaging=importlib.import_module("packaging"))
    _stub("ftfy", fix_text=lambda s: s)
    # the \p{L} pattern needs the real `regex` package (absent); the
    # tokenizer itself is never invoked in these tests
    _stub("regex", compile=lambda *a, **k: None, IGNORECASE=0)
    _stub("ipdb", set_trace=lambda: None)
    _stub("tensorboardX", SummaryWriter=object)
    _stub("boto3")
    _stub("botocore")
    _stub("botocore.exceptions", ClientError=Exception)
    _stub("yaml", safe_load=lambda *a, **k: {})
    _stub("easydict", EasyDict=dict)
    _stub("toolz", sandbox=types.ModuleType("toolz.sandbox"))
    _stub("toolz.sandbox", unzip=lambda x: zip(*x))
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.__all__ = []
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    apex = types.ModuleType("apex")
    apex_n = types.ModuleType("apex.normalization")
    apex_f = types.ModuleType("apex.normalization.fused_layer_norm")

    class FLN(nn.LayerNorm):
        def __init__(self, s, eps=1e-12):
            super().__init__(s, eps=eps)

    apex_f.FusedLayerNorm = FLN
    apex_n.fused_layer_norm = apex_f
    apex.normalization = apex_n
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.normalization", apex_n)
    sys.modules.setdefault("apex.normalization.fused_layer_norm", apex_f)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _fake_clip_sd(rng, vision_layers=2, text_layers=2):
    """Reduced-depth B/16-shaped CLIP jit-archive state dict (width 768
    vision / 512 text, patch 16, grid 4 -> resolution 64, vocab 49408)."""
    vw, tw, embed, patch, grid = 768, 512, 512, 16, RES // 16

    def t(*shape, scale=0.02):
        return torch.from_numpy((rng.randn(*shape) * scale).astype(np.float32))

    def ln(prefix, w):
        return {
            f"{prefix}.weight": 1.0 + t(w),
            f"{prefix}.bias": t(w),
        }

    sd = {
        "visual.conv1.weight": t(vw, 3, patch, patch),
        "visual.class_embedding": t(vw),
        "visual.positional_embedding": t(grid * grid + 1, vw),
        "visual.proj": t(vw, embed),
        "token_embedding.weight": t(49408, tw),
        "positional_embedding": t(77, tw),
        "text_projection": t(tw, embed),
        "logit_scale": torch.tensor(float(np.log(1.0 / 0.07))),
    }
    sd.update(ln("visual.ln_pre", vw))
    sd.update(ln("visual.ln_post", vw))
    sd.update(ln("ln_final", tw))
    for tower, w, layers in (
        ("visual.transformer", vw, vision_layers),
        ("transformer", tw, text_layers),
    ):
        for i in range(layers):
            p = f"{tower}.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = t(3 * w, w)
            sd[f"{p}.attn.in_proj_bias"] = t(3 * w)
            sd[f"{p}.attn.out_proj.weight"] = t(w, w)
            sd[f"{p}.attn.out_proj.bias"] = t(w)
            sd.update(ln(f"{p}.ln_1", w))
            sd.update(ln(f"{p}.ln_2", w))
            sd[f"{p}.mlp.c_fc.weight"] = t(4 * w, w)
            sd[f"{p}.mlp.c_fc.bias"] = t(4 * w)
            sd[f"{p}.mlp.c_proj.weight"] = t(w, 4 * w)
            sd[f"{p}.mlp.c_proj.bias"] = t(w)
    return sd


def _fake_bert_bin(rng):
    """Only the cls.predictions.* keys load_bert_model reads
    unconditionally (modeling.py:645-651)."""

    def t(*shape, scale=0.02):
        return torch.from_numpy((rng.randn(*shape) * scale).astype(np.float32))

    return {
        "cls.predictions.transform.dense.weight": t(768, 768),
        "cls.predictions.transform.dense.bias": t(768),
        "cls.predictions.transform.LayerNorm.weight": 1.0 + t(768),
        "cls.predictions.transform.LayerNorm.bias": t(768),
        "cls.predictions.decoder.weight": t(30522, 768),
        "cls.predictions.bias": t(30522),
    }


BERT_CONFIG = {
    "attention_probs_dropout_prob": 0.1,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 768,
    "initializer_range": 0.02,
    "intermediate_size": 3072,
    "max_position_embeddings": 512,
    "num_attention_heads": 12,
    "num_hidden_layers": 2,
    "type_vocab_size": 2,
    "vocab_size": 30522,
}


def _ref_opts():
    return types.SimpleNamespace(
        video_encoder_type="clip_vit_base_16",
        txt_encoder_type="clip_vit_base_16",
        audio_encoder_type="ast",
        multimodal_encoder_type="bert_base_uncased",
        multimodal_use_cross_attn=True,
        cross_attn_type="va_concate",
        share_txt_and_multimodal=True,
        initial_multimodal=False,
        initial_vision=True,
        frozen_vision=False,
        frozen_multimodal=False,
        checkpointing=False,
        video_resolution=RES,
        audio_melbins=MELS,
        audio_patch_size=16,
        audio_target_length=AUDIO_LEN,
        max_generation_len=GEN_LEN,
        beam_size=1,
        beam_size_qa=1,
        label_smoothing=0.0,
        contra_type="fine",
        caption_type="unimlm",
        evaluate_ret_text=False,
        scst_finetuning=False,
        full_masker=False,
        contra_loss_ratio=1.0,
        fineweight_type="two",
        use_task_prompt=False,
        late_fusion=False,
        init_clip_head=True,
        contra_dim=512,
        dual_softmax=False,
    )


@pytest.fixture(scope="module")
def ref_valor(tmp_path_factory):
    """(reference VALOR model, our VALORModel, our converted params)."""
    mp = pytest.MonkeyPatch()
    _install_reference_stubs()
    root = tmp_path_factory.mktemp("ref_valor")
    pw = root / "pretrained_weights"
    pw.mkdir()
    (pw / "bert_base_uncased_config.json").write_text(json.dumps(BERT_CONFIG))
    from tests.test_data import TINY_VOCAB

    (pw / "bert-base-uncased-vocab.txt").write_text("\n".join(TINY_VOCAB))

    rng = np.random.RandomState(0)
    clip_sd = _fake_clip_sd(rng)
    bert_bin = _fake_bert_bin(rng)

    real_torch_load = torch.load

    def fake_torch_load(path, *a, **k):
        name = os.path.basename(str(path))
        if name == "bert-base-uncased.bin":
            return {k2: v.clone() for k2, v in bert_bin.items()}
        return real_torch_load(path, *a, **k)

    mp.setattr(torch, "load", fake_torch_load)
    mp.setattr(
        torch.jit,
        "load",
        lambda path, *a, **k: types.SimpleNamespace(
            state_dict=lambda: {k2: v.clone() for k2, v in clip_sd.items()}
        ),
    )
    # CPU runtime: reference code .cuda()s tensors freely
    mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)

    import importlib

    modeling = importlib.import_module("model.modeling")
    pretrain = importlib.import_module("model.pretrain")
    # AudioSet init needs the released artifact; the converted weights are
    # whatever the final state is, so random init is equivalent here
    mp.setattr(modeling.VALORModel, "initialize_audio_weights", lambda self: None)
    # reduced-depth AST (base_cfg is the module-level 12-layer config)
    mp.setattr(modeling.base_cfg, "num_hidden_layers", 2)

    # single-process gloo group for the reference's ddp_allgather calls
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method=f"file://{root}/pg", rank=0, world_size=1
        )

    cwd = os.getcwd()
    os.chdir(root)
    try:
        torch.manual_seed(0)
        ref = pretrain.VALOR(_ref_opts()).float().eval()
    finally:
        os.chdir(cwd)

    cfg = ModelConfig(
        video_encoder_type="clip_vit_base_16",
        txt_encoder_type="clip_vit_base_16",
        clip_vision_layers=2,
        clip_text_layers=2,
        multimodal_use_cross_attn=True,
        cross_attn_type="va_concate",
        video_resolution=RES,
        audio_melbins=MELS,
        audio_target_length=AUDIO_LEN,
        audio_layers=2,
        fusion_layers=2,
        contra_type="fine",
        caption_type="unimlm",
        init_clip_head=True,
        dtype="float32",
        max_generation_len=GEN_LEN,
        beam_size=3,
        dropout=0.1,  # inert: train=False / .eval() on both sides
    )
    ours = VALORModel(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_valor_full(sd, resolution=RES)

    yield ref, ours, params
    mp.undo()


@pytest.fixture(scope="module")
def batch_np():
    rng = np.random.RandomState(7)
    bert = np.zeros((B, 6), np.int32)
    clip = np.zeros((B, 6), np.int32)
    lens = [4, 5, 6]
    for i in range(B):
        n = lens[i]
        bert[i, 0], bert[i, n - 1] = 101, 102
        bert[i, 1 : n - 1] = rng.randint(106, 1000, n - 2)
        clip[i, 0], clip[i, n - 1] = 49406, 49407
        clip[i, 1 : n - 1] = rng.randint(1, 49000, n - 2)
    return {
        "bert_tokens": bert,
        "clip_tokens": clip,
        "video": rng.randn(B, N_FRAMES, 3, RES, RES).astype(np.float32),
        "audio": rng.randn(B, 1, MELS, AUDIO_LEN).astype(np.float32),
    }


def _ref_batch(b):
    return {
        "txt_tokens": {
            "bert_tokens": torch.from_numpy(b["bert_tokens"]).long(),
            "clip_tokens": torch.from_numpy(b["clip_tokens"]).long(),
        },
        "video_pixels": torch.from_numpy(b["video"]),
        "audio_spectrograms": torch.from_numpy(b["audio"]),
        "ids": [f"v{i}" for i in range(B)],
    }


def _our_batch(b):
    return {
        "bert_tokens": jnp.asarray(b["bert_tokens"]),
        "clip_tokens": jnp.asarray(b["clip_tokens"]),
        "video_pixels": jnp.asarray(np.transpose(b["video"], (0, 1, 3, 4, 2))),
        "audio_spectrograms": jnp.asarray(b["audio"]),
    }


def _eos_normalise(seqs):
    seqs = np.asarray(seqs)
    out = seqs.copy()
    for r in range(out.shape[0]):
        hit = np.where(out[r] == 102)[0]
        if len(hit):
            out[r, hit[0] :] = 102
    return out


class TestRetParity:
    def test_features(self, ref_valor, batch_np):
        ref, ours, params = ref_valor
        with torch.no_grad():
            r = ref(_ref_batch(batch_np), "ret%tva", compute_loss=False)
        o = ours.apply(
            {"params": params}, _our_batch(batch_np), parse_task("ret%tva"),
            False, False,
        )
        for k in ("feat_t", "feat_v", "feat_a"):
            np.testing.assert_allclose(
                np.asarray(o[k]), r[k].numpy(), rtol=2e-4, atol=2e-4,
                err_msg=k,
            )

    def test_training_loss_all_groups(self, ref_valor, batch_np):
        ref, ours, params = ref_valor
        task = "ret%tva%tv%ta%va%vta%atv"
        with torch.no_grad():
            r = ref(_ref_batch(batch_np), task, compute_loss=True)
        o = ours.apply(
            {"params": params}, _our_batch(batch_np), parse_task(task),
            True, False,
        )
        np.testing.assert_allclose(
            float(o["contra_loss"]), float(r["contra_loss"]), rtol=2e-4
        )


class TestPretrainParity:
    def test_contra_and_caption_losses_lm(self, ref_valor, batch_np):
        """caption_type='lm' makes the caption objective deterministic
        (shifted labels, no RNG masking) on both sides."""
        ref, ours, params = ref_valor
        import dataclasses

        ours_lm = VALORModel(dataclasses.replace(ours.cfg, caption_type="lm"))
        task = "pt_contra%tva%tv%ta_caption%tva%tv%ta"
        old = ref.caption_type
        ref.caption_type = "lm"
        try:
            with torch.no_grad():
                r = ref(_ref_batch(batch_np), task, compute_loss=True)
        finally:
            ref.caption_type = old
        o = ours_lm.apply(
            {"params": params}, _our_batch(batch_np), parse_task(task),
            True, False,
        )
        np.testing.assert_allclose(
            float(o["contra_loss"]), float(r["contra_loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(o["caption_loss"]), float(r["caption_loss"]), rtol=2e-4
        )


class TestCaptionGenerationParity:
    def _ours_generate(self, ours, params, batch_np, beam):
        return gen.generate(
            ours, params, _our_batch(batch_np), ("tva", "tv", "ta"),
            caption_type="unimlm", max_len=GEN_LEN, beam_size=beam,
        )

    def test_greedy(self, ref_valor, batch_np):
        ref, ours, params = ref_valor
        ref.beam_size = 1
        with torch.no_grad():
            r = ref(_ref_batch(batch_np), "cap%tva%tv%ta", compute_loss=False)
        o = self._ours_generate(ours, params, batch_np, beam=1)
        for g, rk in (("tva", "t_va"), ("tv", "t_v"), ("ta", "t_a")):
            np.testing.assert_array_equal(
                np.asarray(o[f"generated_sequences_{g}"]),
                _eos_normalise(r[f"generated_sequences_{rk}"].numpy()),
                err_msg=f"greedy {g}",
            )

    def test_beam3(self, ref_valor, batch_np):
        ref, ours, params = ref_valor
        ref.beam_size = 3
        try:
            with torch.no_grad():
                r = ref(_ref_batch(batch_np), "cap%tva", compute_loss=False)
        finally:
            ref.beam_size = 1
        o = self._ours_generate(ours, params, batch_np, beam=3)
        np.testing.assert_array_equal(
            np.asarray(o["generated_sequences_tva"]),
            _eos_normalise(r["generated_sequences_t_va"].numpy()),
            err_msg="beam3 tva",
        )


class TestQAParity:
    def _qa_np(self, batch_np):
        rng = np.random.RandomState(11)
        q = np.zeros((B, 5), np.int32)
        for i in range(B):
            q[i, 0], q[i, 3] = 101, 102
            q[i, 1:3] = rng.randint(106, 1000, 2)
        ans = np.zeros((B, 4), np.int32)
        for i in range(B):
            ans[i, 0], ans[i, 2] = 101, 102
            ans[i, 1] = rng.randint(106, 1000)
        return q, ans

    def test_generate_greedy(self, ref_valor, batch_np):
        ref, ours, params = ref_valor
        q, _ = self._qa_np(batch_np)
        rb = _ref_batch(batch_np)
        rb["question_tokens"] = {
            "bert_tokens": torch.from_numpy(q).long(),
            "clip_tokens": torch.from_numpy(q).long(),
        }
        rb["sample_num"] = [1] * B
        with torch.no_grad():
            r = ref(rb, "qa%tva%tv", compute_loss=False)
        ob = _our_batch(batch_np)
        ob["question_prompt"] = jnp.asarray(q)
        o = gen.generate(
            ours, params, ob, ("tva", "tv"),
            caption_type="unimlm", max_len=GEN_LEN, beam_size=1,
        )
        for g, rk in (("tva", "t_va"), ("tv", "t_v")):
            np.testing.assert_array_equal(
                np.asarray(o[f"generated_sequences_{g}"]),
                _eos_normalise(r[f"generated_answers_{rk}"].numpy()),
                err_msg=f"qa greedy {g}",
            )

    def test_loss_lm(self, ref_valor, batch_np):
        ref, ours, params = ref_valor
        import dataclasses

        q, ans = self._qa_np(batch_np)
        rb = _ref_batch(batch_np)
        rb["question_tokens"] = {
            "bert_tokens": torch.from_numpy(q).long(),
            "clip_tokens": torch.from_numpy(q).long(),
        }
        rb["txt_tokens"] = {
            "bert_tokens": torch.from_numpy(ans).long(),
            "clip_tokens": torch.from_numpy(ans).long(),
        }
        rb["answer_nums"] = [1] * B
        rb["answer_weights"] = None
        old = ref.caption_type
        ref.caption_type = "lm"
        try:
            with torch.no_grad():
                r = ref(rb, "qa%tva%tv", compute_loss=True)
        finally:
            ref.caption_type = old
        ours_lm = VALORModel(dataclasses.replace(ours.cfg, caption_type="lm"))
        ob = _our_batch(batch_np)
        ob["bert_tokens"] = jnp.asarray(ans)
        ob["question_prompt"] = jnp.asarray(q)
        o = ours_lm.apply(
            {"params": params}, ob, parse_task("qa%tva%tv"), True, False
        )
        np.testing.assert_allclose(
            float(o["qa_loss"]), float(r["qa_loss"]), rtol=2e-4
        )
