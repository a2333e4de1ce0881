"""Golden parity: our flax encoders vs the ACTUAL reference torch modules.

The reference repo is mounted read-only; its CLIP / VideoSwin / BERT
modules run on CPU torch (apex & misc deps stubbed).  We instantiate the
reference with random weights, convert the state dict through
models/convert.py, and require the flax forward to match the torch forward
numerically — the strongest parity evidence available without the released
checkpoints.
"""

import sys
import types
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)


@pytest.fixture(scope="module")
def reference_modules():
    # stub the reference's heavy/unavailable deps before importing it
    _stub("ipdb", set_trace=lambda: None)
    _stub("tensorboardX", SummaryWriter=object)
    import torch.nn as nn

    apex = types.ModuleType("apex")
    apex_norm = types.ModuleType("apex.normalization")
    apex_fln = types.ModuleType("apex.normalization.fused_layer_norm")

    class _FLN(nn.LayerNorm):
        def __init__(self, shape, eps=1e-12):
            super().__init__(shape, eps=eps)

    apex_fln.FusedLayerNorm = _FLN
    apex_norm.fused_layer_norm = apex_fln
    apex.normalization = apex_norm
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.normalization", apex_norm)
    sys.modules.setdefault("apex.normalization.fused_layer_norm", apex_fln)
    _stub("boto3")
    _stub("botocore")
    _stub("botocore.exceptions", ClientError=Exception)
    _stub("requests", get=None)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref_clip = importlib.import_module("model.clip")
    ref_swin = importlib.import_module("model.videoswin")
    return ref_clip, ref_swin


class TestClipVisionParity:
    def test_vision_tower_forward(self, reference_modules):
        ref_clip, _ = reference_modules
        torch.manual_seed(0)
        # small ViT: width 64, 2 layers, patch 16, res 32
        vt = ref_clip.VisionTransformer(
            input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=32
        ).eval()

        sd = {f"visual.{k}": v for k, v in vt.state_dict().items()}
        # convert_clip expects the text tower too; provide a minimal stub
        sd.update(
            {
                "token_embedding.weight": torch.zeros(16, 8),
                "positional_embedding": torch.zeros(77, 8),
                "ln_final.weight": torch.ones(8),
                "ln_final.bias": torch.zeros(8),
                "text_projection": torch.zeros(8, 32),
                "visual.proj": torch.zeros(64, 32),
                "logit_scale": torch.zeros(()),
            }
        )
        import valor_tpu.models.convert as C

        vision_tree = C.convert_clip(
            {k: v.float().numpy() for k, v in sd.items()}, resolution=32
        )["clip_vision"]

        import jax
        import jax.numpy as jnp

        from valor_tpu.models.clip import CLIPVisionConfig, CLIPVisionTransformer

        cfg = CLIPVisionConfig(width=64, layers=2, patch_size=16, resolution=32, num_heads=2)
        model = CLIPVisionTransformer(cfg, dtype=jnp.float32)

        rng = np.random.RandomState(0)
        img = rng.randn(2, 32, 32, 3).astype(np.float32)

        with torch.no_grad():
            ref_out = vt(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

        init = model.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
        # graft converted weights onto the init structure
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        params = adapt_pretrained_params(vision_tree, init)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(img)))
        assert out.shape == ref_out.shape  # [2, 5, 64]
        np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-4)


class TestBertFusionParity:
    def _build_ref(self, reference_modules, cross_attn_type=None):
        import importlib

        ref_bert = importlib.import_module("model.bert")
        cfgdict = dict(
            vocab_size=64,
            hidden_size=16,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=32,
            hidden_act="gelu",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            max_position_embeddings=64,
            type_vocab_size=2,
            initializer_range=0.02,
        )
        cfg = ref_bert.BertConfig.from_dict(cfgdict)
        cfg.checkpointing = False
        cfg.has_cross_attn = cross_attn_type is not None
        cfg.cross_attn_type = cross_attn_type
        torch.manual_seed(0)
        return ref_bert.BertModel(cfg).eval()

    def _ours(self, cross_attn_type=None):
        from valor_tpu.models.bert import BertConfig, BertFusionEncoder

        import jax.numpy as jnp

        cfg = BertConfig(
            vocab_size=64,
            hidden_size=16,
            num_layers=2,
            num_heads=2,
            intermediate=32,
            max_position_embeddings=64,
            dropout=0.0,
            has_cross_attn=cross_attn_type is not None,
            cross_attn_type=cross_attn_type,
        )
        return BertFusionEncoder(cfg, dtype=jnp.float32)

    def _convert(self, net, init):
        import valor_tpu.models.convert as C
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        sd = {k: v.float().numpy() for k, v in net.state_dict().items()}
        tree = C.convert_bert(sd)["multimodal_encoder"]
        return adapt_pretrained_params(tree, init)

    @pytest.mark.parametrize("causal", [False, True])
    def test_text_only(self, reference_modules, causal):
        # NOTE: the reference's has_cross_attn=False branch is unrunnable
        # (undefined `model` at model/bert.py:807 — DIVERGENCES.md #1), so
        # the text-only golden path goes through its cross-attn-configured
        # encoder with no media, which is what VALOR itself does
        # (share_txt_and_multimodal, modeling.py:689-691).
        import jax
        import jax.numpy as jnp

        net = self._build_ref(reference_modules, "va_concate")
        model = self._ours("va_concate")
        tokens = np.array([[5, 9, 11, 3, 0, 0], [7, 2, 0, 0, 0, 0]], np.int32)
        with torch.no_grad():
            ref = net(torch.from_numpy(tokens.astype(np.int64)), casual=causal).numpy()
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens), causal=causal)["params"]
        params = self._convert(net, init)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(tokens), causal=causal))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("topo", ["va_concate", "va_parallel", "video_audio"])
    def test_cross_attention_topologies(self, reference_modules, topo):
        import jax
        import jax.numpy as jnp

        net = self._build_ref(reference_modules, topo)
        model = self._ours(topo)
        rng = np.random.RandomState(0)
        tokens = np.array([[5, 9, 11, 3, 0, 0]], np.int32)
        video = rng.randn(1, 4, 16).astype(np.float32)
        audio = rng.randn(1, 3, 16).astype(np.float32)
        with torch.no_grad():
            ref = net(
                torch.from_numpy(tokens.astype(np.int64)),
                video_feat=torch.from_numpy(video),
                audio_feat=torch.from_numpy(audio),
                casual=True,
            ).numpy()
        init = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tokens),
            video_feat=jnp.asarray(video), audio_feat=jnp.asarray(audio), causal=True,
        )["params"]
        params = self._convert(net, init)
        out = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(tokens),
                video_feat=jnp.asarray(video), audio_feat=jnp.asarray(audio), causal=True,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


class TestVideoSwinParity:
    def test_swin_forward(self, reference_modules):
        _, ref_swin = reference_modules
        torch.manual_seed(0)
        net = ref_swin.SwinTransformer3D(
            patch_size=(2, 4, 4),
            embed_dim=8,
            depths=[1, 1],
            num_heads=[2, 2],
            window_size=(2, 2, 2),
            drop_path_rate=0.0,
            time_stride=1,
        ).eval()

        import valor_tpu.models.convert as C

        tree = C.convert_videoswin(
            {k: v.float().numpy() for k, v in net.state_dict().items()}
        )["video_encoder"]

        import jax
        import jax.numpy as jnp

        from valor_tpu.models.videoswin import SwinConfig, SwinTransformer3D

        cfg = SwinConfig(
            embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2)
        )
        model = SwinTransformer3D(cfg, dtype=jnp.float32)

        rng = np.random.RandomState(0)
        video = rng.randn(1, 4, 16, 16, 3).astype(np.float32)  # [B,T,H,W,3]

        with torch.no_grad():
            # reference eats [B, 3, T, H, W], returns [B, C, D, H', W']
            ref_out = net(torch.from_numpy(video.transpose(0, 4, 1, 2, 3))).numpy()

        init = model.init(jax.random.PRNGKey(0), jnp.asarray(video))["params"]
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        params = adapt_pretrained_params(tree, init)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
        # ours: [B, D, H', W', C] -> align to reference layout
        out_t = out.transpose(0, 4, 1, 2, 3)
        assert out_t.shape == ref_out.shape
        np.testing.assert_allclose(out_t, ref_out, rtol=5e-4, atol=5e-4)
