"""Golden parity for the loss math: our jax implementations vs the
reference's own functions (model/pretrain.py fine matrix,
model/modeling.py contrastive loss), invoked unbound on dummy selves."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_pretrain():
    import torch.nn as nn

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    stub("ipdb", set_trace=lambda: None)
    stub("tensorboardX", SummaryWriter=object)
    stub("boto3")
    stub("botocore")
    stub("botocore.exceptions", ClientError=Exception)
    stub("yaml", safe_load=lambda *a, **k: {})
    stub("easydict", EasyDict=dict)
    stub("toolz", sandbox=types.ModuleType("toolz.sandbox"))
    stub("toolz.sandbox", unzip=lambda x: zip(*x))
    # torchvision is absent (torch-cpu only image); pretrain.py only uses
    # `from torchvision.transforms import *` at import time
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
    import importlib

    return importlib.import_module("model.pretrain")


class TestFineMatrixGolden:
    def test_fine_matrix_slice(self, ref_pretrain):
        """compute_fine_matrix_slice (pretrain.py:191-211) vs fine_score."""
        rng = np.random.RandomState(0)
        A, T, B, V, D = 5, 4, 6, 3, 8
        featA = rng.randn(A, T, D).astype(np.float32)
        featB = rng.randn(B, V, D).astype(np.float32)
        maskA = (rng.rand(A, T) > 0.3).astype(np.float32)
        maskA[:, 0] = 1
        maskB = np.ones((B, V), np.float32)
        weightA = rng.randn(A, T).astype(np.float32)
        weightB = rng.randn(B, V).astype(np.float32)

        ref = ref_pretrain.VALOR.compute_fine_matrix_slice(
            None,
            torch.from_numpy(featA),
            torch.from_numpy(featB),
            torch.from_numpy(maskA),
            torch.from_numpy(maskB),
            torch.from_numpy(weightA.copy()),
            torch.from_numpy(weightB.copy()),
        ).numpy()

        import jax.numpy as jnp

        from valor_tpu.tasks.losses import fine_score

        ours = np.asarray(
            fine_score(
                jnp.asarray(featA), jnp.asarray(featB),
                jnp.asarray(maskA), jnp.asarray(maskB),
                jnp.asarray(weightA), jnp.asarray(weightB),
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


class TestContrastiveGolden:
    def test_contrastive_loss(self, ref_pretrain):
        """VALORModel.contrastive_loss (modeling.py:418-433) vs ours."""
        import importlib

        ref_modeling = importlib.import_module("model.modeling")
        rng = np.random.RandomState(1)
        score = rng.randn(6, 6).astype(np.float32)

        shim = types.SimpleNamespace(
            video_encoder_type="videoswin_small",  # -> uses contra_temp
            contra_temp=torch.tensor(0.07),
        )
        ref = ref_modeling.VALORModel.contrastive_loss(
            shim, torch.from_numpy(score)
        ).item()

        import jax.numpy as jnp

        from valor_tpu.tasks.losses import contrastive_loss

        ours = float(contrastive_loss(jnp.asarray(score), jnp.asarray(0.07)))
        np.testing.assert_allclose(ours, ref, rtol=2e-5)
