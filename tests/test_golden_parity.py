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


class TestClipTextParity:
    def test_encode_text_causal(self, reference_modules):
        """Reference CLIP.encode_text (clip.py:372-427) vs our text tower."""
        ref_clip, _ = reference_modules
        torch.manual_seed(0)
        clip = ref_clip.CLIP(
            embed_dim=16,
            image_resolution=32,
            vision_layers=1,
            vision_width=64,  # reference derives vision heads as width//64
            vision_patch_size=16,
            context_length=16,
            vocab_size=64,
            transformer_width=32,
            transformer_heads=2,
            transformer_layers=2,
        ).float().eval()

        tokens = np.array([[5, 9, 11, 3, 0, 0], [7, 2, 6, 0, 0, 0]], np.int64)
        with torch.no_grad():
            ref = clip.encode_text(torch.from_numpy(tokens), casual=True).numpy()

        import jax
        import jax.numpy as jnp

        import valor_tpu.models.convert as C
        from valor_tpu.models.clip import CLIPTextConfig, CLIPTextTransformer
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        sd = {k: v.float().numpy() for k, v in clip.state_dict().items()}
        tree = C.convert_clip(sd, resolution=32)["clip_text"]
        cfg = CLIPTextConfig(
            width=32, layers=2, vocab_size=64, context_length=16, embed_dim=16, num_heads=2
        )
        model = CLIPTextTransformer(cfg, dtype=jnp.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens.astype(np.int32)))["params"]
        params = adapt_pretrained_params(tree, init)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(tokens.astype(np.int32))))
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


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

    @pytest.mark.parametrize(
        "topo", ["va_concate", "va_parallel", "video_audio", "audio_video"]
    )
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


class TestASTParity:
    def test_audio_encoder_forward(self, reference_modules):
        """AudioEmbeddings + prenorm TransformerEncoder vs reference
        (modeling.py:738-762 + transformer.py:146-170)."""
        import importlib
        import types as _t

        ref_modeling = importlib.import_module("model.modeling")
        ref_tr = importlib.import_module("model.transformer")

        mc = _t.SimpleNamespace(
            hidden_size=16,
            num_attention_heads=2,
            num_hidden_layers=2,
            intermediate_size=32,
            hidden_dropout=0.0,
            attention_dropout=0.0,
            checkpointing=False,
        )
        cfg = _t.SimpleNamespace(audio_patch_size=8, audio_melbins=16, audio_target_length=32)
        torch.manual_seed(0)
        emb = ref_modeling.AudioEmbeddings(mc, cfg).eval()
        enc = ref_tr.TransformerEncoder(mc, mode="prenorm").eval()

        rng = np.random.RandomState(0)
        spec = rng.randn(2, 16, 32).astype(np.float32)
        with torch.no_grad():
            e = emb(torch.from_numpy(spec))
            ref, _ = enc(e)
            ref = ref.numpy()

        # map reference keys onto our converter's AST layout
        sd = {}
        sd["v.cls_token"] = emb.cls_token.detach().numpy()
        w = emb.first_conv.weight.detach().numpy()  # [C,1,8,8]
        sd["v.patch_embed.proj.weight"] = w
        sd["v.patch_embed.proj.bias"] = emb.first_conv.bias.detach().numpy()
        # pos emb in the converter path is resized from the audioset grid;
        # here shapes already match, so inject directly afterwards
        for i, layer in enumerate(enc.layer):
            q, k, v_, o = layer.attention.linears
            sd[f"v.blocks.{i}.attn.qkv.weight"] = np.concatenate(
                [q.weight.detach().numpy(), k.weight.detach().numpy(), v_.weight.detach().numpy()]
            )
            sd[f"v.blocks.{i}.attn.qkv.bias"] = np.concatenate(
                [q.bias.detach().numpy(), k.bias.detach().numpy(), v_.bias.detach().numpy()]
            )
            sd[f"v.blocks.{i}.attn.proj.weight"] = o.weight.detach().numpy()
            sd[f"v.blocks.{i}.attn.proj.bias"] = o.bias.detach().numpy()
            sd[f"v.blocks.{i}.mlp.fc1.weight"] = layer.ff_layer.linear1.weight.detach().numpy()
            sd[f"v.blocks.{i}.mlp.fc1.bias"] = layer.ff_layer.linear1.bias.detach().numpy()
            sd[f"v.blocks.{i}.mlp.fc2.weight"] = layer.ff_layer.linear2.weight.detach().numpy()
            sd[f"v.blocks.{i}.mlp.fc2.bias"] = layer.ff_layer.linear2.bias.detach().numpy()
            sd[f"v.blocks.{i}.norm1.weight"] = layer.layernorm1.weight.detach().numpy()
            sd[f"v.blocks.{i}.norm1.bias"] = layer.layernorm1.bias.detach().numpy()
            sd[f"v.blocks.{i}.norm2.weight"] = layer.layernorm2.weight.detach().numpy()
            sd[f"v.blocks.{i}.norm2.bias"] = layer.layernorm2.bias.detach().numpy()
        sd["v.norm.weight"] = enc.last_layernorm.weight.detach().numpy()
        sd["v.norm.bias"] = enc.last_layernorm.bias.detach().numpy()
        # dummy audioset-grid pos-emb for the converter (overridden below)
        sd["v.pos_embed"] = np.zeros((1, 2 + 12 * 101, 16), np.float32)

        import jax
        import jax.numpy as jnp

        import valor_tpu.models.convert as C
        from valor_tpu.models.ast import ASTConfig, ASTEncoder
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        tree = C.convert_ast(sd, melbins=16, target_length=32, patch=8)["audio_encoder"]
        tree["position_embeddings"] = emb.position_embeddings.weight.detach().numpy()

        acfg = ASTConfig(
            hidden_size=16, layers=2, heads=2, intermediate=32,
            melbins=16, target_length=32, patch_size=8, dropout=0.0,
        )
        model = ASTEncoder(acfg, dtype=jnp.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(spec))["params"]
        params = adapt_pretrained_params(tree, init)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(spec)))
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


class TestTaskPromptParity:
    """Prompted forwards vs the reference (use_task_prompt subsystem).

    reference: model/modeling.py:355-369 builds [BOS]+sentence+[EOS] prompt
    tokens; model/bert.py:772-783 embeds them with the 1-row prompt-type
    embedding; model/clip.py:386-394 likewise for the CLIP text tower; QA
    splices the unwrapped body into the question (pretrain.py:1270-1273).
    """

    def test_bert_fusion_prompted(self, reference_modules):
        import jax
        import jax.numpy as jnp

        helper = TestBertFusionParity()
        net = helper._build_ref(reference_modules, "va_concate")
        model = helper._ours("va_concate")
        rng = np.random.RandomState(0)
        tokens = np.array([[5, 9, 11, 3, 0, 0], [7, 2, 6, 1, 0, 0]], np.int32)
        prompt = np.array([[2, 13, 17, 4]] * 2, np.int32)  # [BOS x x EOS]
        video = rng.randn(2, 4, 16).astype(np.float32)
        audio = rng.randn(2, 3, 16).astype(np.float32)
        with torch.no_grad():
            ref = net(
                torch.from_numpy(tokens.astype(np.int64)),
                task_prompt=torch.from_numpy(prompt.astype(np.int64)),
                video_feat=torch.from_numpy(video),
                audio_feat=torch.from_numpy(audio),
                casual=True,
            ).numpy()
        init = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tokens),
            task_prompt=jnp.asarray(prompt),
            video_feat=jnp.asarray(video), audio_feat=jnp.asarray(audio),
            causal=True,
        )["params"]
        params = helper._convert(net, init)
        out = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(tokens),
                task_prompt=jnp.asarray(prompt),
                video_feat=jnp.asarray(video), audio_feat=jnp.asarray(audio),
                causal=True,
            )
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)

    def test_clip_text_prompted_with_media(self, reference_modules):
        """Prompted CLIP text with media concat (clip.py:386-399)."""
        ref_clip, _ = reference_modules
        torch.manual_seed(0)
        clip = ref_clip.CLIP(
            embed_dim=16, image_resolution=32, vision_layers=1, vision_width=64,
            vision_patch_size=16, context_length=16, vocab_size=64,
            transformer_width=32, transformer_heads=2, transformer_layers=2,
        ).float().eval()
        rng = np.random.RandomState(1)
        tokens = np.array([[5, 9, 11, 3, 0, 0], [7, 2, 6, 0, 0, 0]], np.int64)
        prompt = np.array([[2, 13, 4]] * 2, np.int64)
        video = rng.randn(2, 4, 32).astype(np.float32)
        with torch.no_grad():
            ref = clip.encode_text(
                torch.from_numpy(tokens),
                task_prompt=torch.from_numpy(prompt),
                video_feat=torch.from_numpy(video),
                casual=True,
            ).numpy()

        import jax
        import jax.numpy as jnp

        import valor_tpu.models.convert as C
        from valor_tpu.models.clip import CLIPTextConfig, CLIPTextTransformer
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        sd = {k: v.float().numpy() for k, v in clip.state_dict().items()}
        tree = C.convert_clip(sd, resolution=32)["clip_text"]
        cfg = CLIPTextConfig(
            width=32, layers=2, vocab_size=64, context_length=16, embed_dim=16,
            num_heads=2,
        )
        model = CLIPTextTransformer(cfg, dtype=jnp.float32)
        kw = dict(
            task_prompt=jnp.asarray(prompt.astype(np.int32)),
            video_feat=jnp.asarray(video),
            causal=True,
        )
        init = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tokens.astype(np.int32)), **kw
        )["params"]
        params = adapt_pretrained_params(tree, init)
        out = np.asarray(
            model.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)), **kw)
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


class TestFullMaskerParity:
    """Two-stream full-masker golden parity.

    reference: model/bert.py:195-201 (second half reuses first-half
    positions shifted by one) + :869-885 (the two-stream attention mask).
    The input is [sequence | per-position MASK copies], as built by the
    full-masker caption objective (model/pretrain.py:826-833).
    """

    def test_full_masker_forward(self, reference_modules):
        import jax
        import jax.numpy as jnp

        helper = TestBertFusionParity()
        net = helper._build_ref(reference_modules, "va_concate")
        model = helper._ours("va_concate")
        rng = np.random.RandomState(0)
        # [real tokens | mask-stream] — even total length, both halves padded
        tokens = np.array([[5, 9, 11, 3, 63, 63, 63, 63]], np.int32)
        video = rng.randn(1, 4, 16).astype(np.float32)
        with torch.no_grad():
            ref = net(
                torch.from_numpy(tokens.astype(np.int64)),
                video_feat=torch.from_numpy(video),
                casual=True,
                full_masker=True,
            ).numpy()
        init = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tokens),
            video_feat=jnp.asarray(video), causal=True, full_masker=True,
        )["params"]
        params = helper._convert(net, init)
        out = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(tokens),
                video_feat=jnp.asarray(video), causal=True, full_masker=True,
            )
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


class TestVideoSwin4Stage:
    """4-stage VideoSwin with the REAL (8,7,7) window and shift geometry
    (reference: model/videoswin.py presets; round-1 parity covered only a
    tiny 2-stage config)."""

    def test_swin_4stage_real_windows(self, reference_modules):
        _, ref_swin = reference_modules
        torch.manual_seed(0)
        net = ref_swin.SwinTransformer3D(
            patch_size=(2, 4, 4),
            embed_dim=8,
            depths=[1, 1, 1, 1],
            num_heads=[1, 1, 1, 1],
            window_size=(8, 7, 7),
            mlp_ratio=4.0,
            patch_norm=True,
        ).eval()

        import valor_tpu.models.convert as C

        tree = C.convert_videoswin(
            {k: v.float().numpy() for k, v in net.state_dict().items()}
        )["video_encoder"]

        import jax
        import jax.numpy as jnp

        from valor_tpu.models.videoswin import SwinConfig, SwinTransformer3D

        cfg = SwinConfig(
            embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
            window_size=(8, 7, 7),
        )
        model = SwinTransformer3D(cfg, dtype=jnp.float32)

        rng = np.random.RandomState(0)
        # 16 frames @112px -> (8, 28, 28) patch grid: stages see 28/14/7/7,
        # exercising both the 7-divisible and the pad+shift mask paths
        video = rng.randn(1, 16, 112, 112, 3).astype(np.float32)

        with torch.no_grad():
            ref_out = net(torch.from_numpy(video.transpose(0, 4, 1, 2, 3))).numpy()

        init = model.init(jax.random.PRNGKey(0), jnp.asarray(video))["params"]
        from valor_tpu.train.checkpoints import adapt_pretrained_params

        params = adapt_pretrained_params(tree, init)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
        out_t = out.transpose(0, 4, 1, 2, 3)
        assert out_t.shape == ref_out.shape
        np.testing.assert_allclose(out_t, ref_out, rtol=1e-3, atol=1e-3)
