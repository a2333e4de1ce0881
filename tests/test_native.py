"""Native C++ data-path tests (skipped when the library isn't built)."""

import math

import numpy as np
import pytest
from PIL import Image

from valor_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libvalor_native.so not built"
)


class TestDecodeResize:
    def test_batch_decode(self, tmp_path):
        paths = []
        rng = np.random.RandomState(0)
        for i in range(4):
            arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
            p = tmp_path / f"img{i}.jpg"
            Image.fromarray(arr).save(p, quality=95)
            paths.append(str(p))
        mean = np.array([0.5, 0.5, 0.5], np.float32)
        std = np.array([0.25, 0.25, 0.25], np.float32)
        out, failed = native.decode_resize_batch(paths, (32, 32), mean, std)
        assert failed == 0
        assert out.shape == (4, 32, 32, 3)
        assert np.isfinite(out).all()
        # compare against PIL bilinear + same normalisation
        ref = Image.open(paths[0]).resize((32, 32), Image.BILINEAR)
        ref = (np.asarray(ref, np.float32) / 255.0 - mean) / std
        corr = np.corrcoef(out[0].ravel(), ref.ravel())[0, 1]
        assert corr > 0.98

    def test_bad_file_zero_filled(self, tmp_path):
        p = tmp_path / "bad.jpg"
        p.write_bytes(b"not a jpeg")
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        out, failed = native.decode_resize_batch([str(p)], (8, 8), mean, std)
        assert failed == 1
        assert np.all(out == 0)


class TestNativeFbank:
    def test_matches_numpy(self):
        from valor_tpu.data.fbank import fbank_np

        t = np.arange(22050, dtype=np.float32) / 22050.0
        wav = np.sin(2 * math.pi * 440 * t).astype(np.float32)
        ref = fbank_np(wav, 22050, 64)
        got = native.fbank(wav, 22050, 64)
        assert got.shape == ref.shape
        # same mel geometry; small numeric differences from fft vs matmul
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert corr > 0.99
