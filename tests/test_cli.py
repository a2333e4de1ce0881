"""CLI end-to-end: config file -> cli.train main() on a disk fixture."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tests.test_data import TINY_VOCAB


@pytest.fixture
def cli_fixture(tmp_path, monkeypatch):
    ids = [f"v{i}" for i in range(8)]
    (tmp_path / "ids.json").write_text(json.dumps(ids))
    caps = ["a cat sits on the mat", "the dog runs", "a cat", "the mat"]
    (tmp_path / "txt.json").write_text(
        json.dumps({v: caps[i % 4] for i, v in enumerate(ids)})
    )
    frames = tmp_path / "frames"
    rng = np.random.RandomState(0)
    for v in ids:
        d = frames / v
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (40, 56, 3), np.uint8)).save(
                d / f"img_{i:04d}.jpg"
            )
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(TINY_VOCAB))
    monkeypatch.setenv("VALOR_BERT_VOCAB", str(vocab))
    import valor_tpu.cli.build as B

    monkeypatch.setattr(B, "DEFAULT_BERT_VOCAB", str(vocab))

    cfg = {
        "video_encoder_type": "clip_vit_tiny",
        "txt_encoder_type": "bert_base_uncased",
        "multimodal_encoder_type": "bert_base_uncased",
        "init_clip_head": False,
        "video_resolution": 32,
        "audio_melbins": 16,
        "audio_target_length": 32,
        "fusion_hidden": 32,
        "fusion_layers": 2,
        "fusion_heads": 2,
        "fusion_intermediate": 64,
        "fusion_vocab": 128,
        "audio_hidden": 32,
        "audio_layers": 2,
        "audio_heads": 2,
        "audio_intermediate": 64,
        "contra_dim": 16,
        "dtype": "float32",
        "learning_rate": 1e-3,
        "num_train_steps": 3,
        "valid_steps": 0,
        "first_eval": False,
        "max_generation_len": 4,
        "output_dir": str(tmp_path / "out"),
        "data_cfg": {
            "train": [
                {
                    "datasets": [
                        {
                            "name": "fix",
                            "ids_path": str(tmp_path / "ids.json"),
                            "txt": str(tmp_path / "txt.json"),
                            "video": str(frames),
                            "datatype": "video",
                        }
                    ],
                    "task": "ret%tv",
                    "batch_size": 4,
                    "video_sample_num": 2,
                    "max_txt_len": 6,
                    "epoch": 1,
                }
            ],
            "val": [
                {
                    "name": "fix",
                    "ids_path": str(tmp_path / "ids.json"),
                    "txt": str(tmp_path / "txt.json"),
                    "video": str(frames),
                    "datatype": "video",
                    "task": "ret%tv",
                    "batch_size": 4,
                    "video_sample_num": 2,
                    "max_txt_len": 6,
                }
            ],
        },
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return p, tmp_path


class TestCLI:
    def test_train_main_end_to_end(self, cli_fixture):
        from valor_tpu.cli.train import main

        cfg_path, root = cli_fixture
        main(["--config", str(cfg_path)])
        out = root / "out"
        assert (out / "hps.json").exists()
        # a checkpoint was written at the final step
        ckpts = os.listdir(out / "ckpt")
        assert any(c.startswith("step_") for c in ckpts)

    def test_zero_shot_eval(self, cli_fixture):
        from valor_tpu.cli.train import main

        cfg_path, root = cli_fixture
        main(["--config", str(cfg_path), "--zero_shot", "true"])

    def test_infer_image_end_to_end(self, cli_fixture, capsys):
        # regression: cli.infer used to init params with compute_loss=False,
        # which skips the fusion decoder entirely (models/valor.py
        # forward_cap returns early) — generation then died with
        # ScopeParamNotFoundError on the first fusion param lookup, and a
        # checkpoint restore would silently drop all decoder weights from
        # its template.  The fixed init traces the loss path (True, False).
        from valor_tpu.cli.infer import main

        cfg_path, root = cli_fixture
        img = sorted((root / "frames" / "v0").glob("*.jpg"))[0]
        main([
            "--image_path", str(img), "--task", "cap%tva",
            "--config", str(cfg_path), "--beam_size", "1",
        ])
        out = capsys.readouterr().out
        assert "[tva]" in out  # one decoded caption line per group
