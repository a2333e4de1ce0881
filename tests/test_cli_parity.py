"""CLI/config parity: optimizer choices, fp16->dtype, valid_freq, pretrain
hps.json inheritance, QA submission dumps.

reference: optim/misc.py:80-92 (--optim), train_utils.py:512 (valid_freq),
train_utils.py:136-144 (cover_cfg), test.py:67-114 (QA submissions).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from valor_tpu.core.config import (
    Config,
    TrainConfig,
    inherit_pretrain_config,
    load_config,
)
from valor_tpu.train.optimizer import build_optimizer

torch = pytest.importorskip("torch")


def _flat_params():
    rng = np.random.RandomState(0)
    return {
        "dense": {"kernel": rng.randn(4, 3).astype(np.float32), "bias": rng.randn(3).astype(np.float32)},
    }


def _torch_step(optim_name, params, grads, lr, wd, betas, eps):
    tp = {
        k2: torch.nn.Parameter(torch.from_numpy(v2.copy()))
        for k2, v2 in params["dense"].items()
    }
    groups = [
        {"params": [tp["kernel"]], "weight_decay": wd},
        {"params": [tp["bias"]], "weight_decay": 0.0},  # no-decay group
    ]
    cls = {"adam": torch.optim.Adam, "adamax": torch.optim.Adamax}[optim_name]
    opt = cls(groups, lr=lr, betas=betas, eps=eps)
    tp["kernel"].grad = torch.from_numpy(grads["dense"]["kernel"].copy())
    tp["bias"].grad = torch.from_numpy(grads["dense"]["bias"].copy())
    opt.step()
    return {k2: v2.detach().numpy() for k2, v2 in tp.items()}


class TestOptimizerChoices:
    @pytest.mark.parametrize("optim_name", ["adam", "adamax"])
    def test_matches_torch(self, optim_name):
        """One optimizer step equals torch Adam/Adamax with per-group L2
        (the reference passes param groups with weight_decay to torch's
        coupled-L2 optimizers, optim/misc.py:86-92)."""
        params = _flat_params()
        rng = np.random.RandomState(1)
        grads = {
            "dense": {
                "kernel": rng.randn(4, 3).astype(np.float32),
                "bias": rng.randn(3).astype(np.float32),
            }
        }
        lr, wd, betas = 1e-2, 0.01, (0.9, 0.98)
        cfg = TrainConfig(
            optim=optim_name,
            learning_rate=lr,
            clip_lr=lr,
            clip_lr_text=lr,
            weight_decay=wd,
            betas=betas,
            grad_norm=1e9,  # disable clipping for the comparison
            num_train_steps=100,
            warmup_ratio=1e-9,  # warmup over before step 1 -> ratio 1.0
            scheduler="warmup_constant",
        )
        jp = jax.tree_util.tree_map(jnp.asarray, params)
        tx = build_optimizer(jp, cfg)
        state = tx.init(jp)
        updates, _ = tx.update(jax.tree_util.tree_map(jnp.asarray, grads), state, jp)
        new = jax.tree_util.tree_map(lambda p, u: p + u, jp, updates)
        eps = 1e-8
        ref = _torch_step(optim_name, params, grads, lr, wd, betas, eps)
        np.testing.assert_allclose(
            np.asarray(new["dense"]["kernel"]), ref["kernel"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new["dense"]["bias"]), ref["bias"], rtol=1e-5, atol=1e-6
        )

    def test_invalid_optim_raises(self):
        cfg = TrainConfig(optim="sgd", num_train_steps=10)
        with pytest.raises(ValueError, match="invalid optimizer"):
            build_optimizer({"w": jnp.zeros(3)}, cfg)


class TestConfigKnobs:
    def test_fp16_maps_to_dtype(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(json.dumps({"fp16": False}))
        assert load_config(str(p)).model.dtype == "float32"
        p.write_text(json.dumps({"fp16": True}))
        assert load_config(str(p)).model.dtype == "bfloat16"
        # explicit dtype wins over fp16
        p.write_text(json.dumps({"fp16": False, "dtype": "bfloat16"}))
        assert load_config(str(p)).model.dtype == "bfloat16"

    def test_valid_freq_derives_valid_steps(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(json.dumps({"num_train_steps": 1000, "valid_freq": 10}))
        assert load_config(str(p)).train.valid_steps == 99  # 1000//10 - 1
        # explicit valid_steps wins
        p.write_text(
            json.dumps({"num_train_steps": 1000, "valid_freq": 10, "valid_steps": 50})
        )
        assert load_config(str(p)).train.valid_steps == 50

    def test_pretrain_config_inheritance(self, tmp_path):
        """Finetuning from --pretrain_dir copies the architecture keys from
        the pretrain run's hps.json (reference cover_cfg)."""
        from valor_tpu.core.config import config_to_json

        pre_cfg = Config(
            model=tiny_model_config(
                contra_type="coarse", cross_attn_type="va_parallel", use_task_prompt=True
            )
        )
        (tmp_path / "hps.json").write_text(config_to_json(pre_cfg))
        cfg = Config(model=tiny_model_config())
        cfg.train.pretrain_dir = str(tmp_path)
        inherited = inherit_pretrain_config(cfg)
        assert cfg.model.contra_type == "coarse"
        assert cfg.model.cross_attn_type == "va_parallel"
        assert cfg.model.use_task_prompt is True
        assert set(inherited) >= {"contra_type", "cross_attn_type", "use_task_prompt"}

    def test_every_config_field_has_a_reader(self):
        """No dead knobs: every ModelConfig/TrainConfig field name appears
        somewhere in the package outside config.py."""
        import dataclasses
        import subprocess

        from valor_tpu.core.config import ModelConfig, TrainConfig

        fields = [f.name for f in dataclasses.fields(ModelConfig)] + [
            f.name for f in dataclasses.fields(TrainConfig)
        ]
        root = os.path.join(os.path.dirname(__file__), "..", "valor_tpu")
        src = subprocess.run(
            ["grep", "-rho", "--include=*.py", r"\.\w\+", root],
            capture_output=True, text=True,
        ).stdout
        used = set(m[1:] for m in src.split())
        dead = [f for f in fields if f not in used]
        assert not dead, f"config fields with no reader: {dead}"


class TestQASubmissionDumps:
    def test_submission_files_written(self, tmp_path):
        """validate_qa writes gt/pred/submission json in the reference
        format when question_ids are present (test.py:104-114)."""
        from valor_tpu.core.tasks import parse_task
        from valor_tpu.data.tokenizers.wordpiece import BertTokenizer
        from valor_tpu.eval.validate import validate_qa
        from valor_tpu.models.valor import VALORModel
        from tests.test_data import TINY_VOCAB

        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(TINY_VOCAB))
        tok = BertTokenizer(str(vocab))

        cfg = tiny_model_config(
            fusion_vocab=128, txt_encoder_type="bert_base_uncased", init_clip_head=False
        )
        model = VALORModel(cfg)
        spec = parse_task("qa%tv")
        rng = np.random.RandomState(0)
        batch = {
            "ids": ["v0", "v1"],
            "question_prompt": np.array(
                [[101, 7, 8, 102, 0], [101, 9, 10, 102, 0]], np.int32
            ),
            "bert_tokens": np.array([[103, 0, 0], [103, 0, 0]], np.int32),
            "video_pixels": rng.randn(2, 2, 32, 32, 3).astype(np.float32),
            "answers": ["cat", "dog"],
            "question_ids": [17, 42],
            "tile_index": np.arange(2, dtype=np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            {k: v for k, v in batch.items() if k not in ("ids", "answers", "question_ids")},
            spec, True, True,
        )["params"]
        out_dir = tmp_path / "results"
        report = validate_qa(
            model, params, iter([dict(batch)]), spec, tok,
            result_dir=str(out_dir), step=7, dset_name="fixqa", max_len=3,
        )
        assert "accuracy" in report
        files = os.listdir(out_dir)
        assert "step7_gt.json" in files
        assert "step7_tv_pred.json" in files
        assert "step7_tv_pred_submited_fixqa.json" in files
        submit = json.load(open(out_dir / "step7_tv_pred_submited_fixqa.json"))
        assert [s["question_id"] for s in submit] == [17, 42]
        assert all("answer" in s for s in submit)


class TestCaptionSubmissionFormats:
    """Caption leaderboard dumps (reference --coco_submit/--nocaps_submit/
    --vatex_submit, test.py:136-236) via validate_cap(submit_format=...)."""

    def _run(self, tmp_path, monkeypatch, fmt, ids):
        from valor_tpu.eval import generate as gen
        from valor_tpu.eval import validate as V

        def fake_generate(model, params, batch, groups, **kw):
            n = len(batch["_n"]) if "_n" in batch else 2
            return {f"generated_sequences_{groups[0]}": np.full((n, 3), 102)}

        monkeypatch.setattr(gen, "generate", fake_generate)

        class Tok:
            def decode(self, ids_):
                return "a cap"

            def convert_ids_to_tokens(self, ids_):
                return ["a", "cap"]

        loader = iter([{"ids": list(ids), "_n": list(ids)}])
        out_dir = tmp_path / f"res_{fmt or 'none'}"
        rep = V.validate_cap(
            None, None, loader, __import__("valor_tpu.core.tasks", fromlist=["parse_task"]).parse_task("cap%tv"),
            Tok(), {}, result_dir=str(out_dir), step=5, submit_format=fmt,
        )
        return rep, out_dir

    def test_coco_format(self, tmp_path, monkeypatch):
        rep, out = self._run(tmp_path, monkeypatch, "coco", ["coco_123", "coco_7"])
        assert rep == {}  # submit mode skips metrics
        sub = json.load(open(out / "submission.json"))
        assert {s["image_id"] for s in sub} == {123, 7}
        assert all("caption" in s for s in sub)

    def test_nocaps_format(self, tmp_path, monkeypatch):
        _, out = self._run(tmp_path, monkeypatch, "nocaps", ["11", "12"])
        sub = json.load(open(out / "submission.json"))
        assert {s["image_id"] for s in sub} == {11, 12}

    def test_vatex_format(self, tmp_path, monkeypatch):
        _, out = self._run(tmp_path, monkeypatch, "vatex", ["va", "vb"])
        sub = json.load(open(out / "submission.json"))
        assert set(sub) == {"va", "vb"}


class TestMultiGroupCaptionEval:
    """A multi-group caption task ('cap%tva%tv') must score EVERY group
    like the reference's per-group val_log (test.py:200-236), not only
    caption_groups[0]: first group flat keys, later groups prefixed, one
    step_{N}_{g}.json dump per group."""

    def test_all_groups_scored_and_dumped(self, tmp_path, monkeypatch):
        import json as J

        from valor_tpu.core.tasks import parse_task
        from valor_tpu.eval import generate as gen
        from valor_tpu.eval import validate as V

        # tva rows decode to the reference caption (perfect), tv rows to
        # garbage -> the two groups MUST get different CIDEr/Bleu
        def fake_generate(model, params, batch, groups, **kw):
            out = {}
            for g in groups:
                tok = 5 if g == "tva" else 9
                out[f"generated_sequences_{g}"] = np.full((2, 3), tok)
            return out

        monkeypatch.setattr(gen, "generate", fake_generate)

        class Tok:
            def decode(self, ids_):
                return "good caption" if ids_[0] == 5 else "bad"

        loader = iter([{"ids": ["a", "b"]}])
        ann = {"a": ["good caption"], "b": ["good caption"]}
        out_dir = tmp_path / "res"
        rep = V.validate_cap(
            None, None, loader, parse_task("cap%tva%tv"), Tok(), ann,
            result_dir=str(out_dir), step=3,
        )
        # (CIDEr idf degenerates to 0 on a 2-doc corpus of identical refs,
        # so Bleu_1 is the discriminator here)
        assert "CIDEr" in rep and "tv_CIDEr" in rep
        assert rep["Bleu_1"] == 1.0 and rep["tv_Bleu_1"] < 1.0
        assert (out_dir / "step_3_tva.json").exists()
        assert (out_dir / "step_3_tv.json").exists()
        dump_tv = J.load(open(out_dir / "step_3_tv.json"))
        assert all(d["caption"] == "bad" for d in dump_tv)

    def test_multi_group_qa_accuracy(self, monkeypatch):
        from valor_tpu.core.tasks import parse_task
        from valor_tpu.eval import generate as gen
        from valor_tpu.eval import validate as V

        def fake_generate(model, params, batch, groups, **kw):
            return {
                f"generated_sequences_{g}": np.full((2, 2), 5 if g == "tva" else 9)
                for g in groups
            }

        monkeypatch.setattr(gen, "generate", fake_generate)

        class Tok:
            def decode(self, ids_):
                return "yes" if ids_[0] == 5 else "no"

        loader = iter([{"ids": ["a", "b"], "answers": ["yes", "yes"]}])
        rep = V.validate_qa(
            None, None, loader, parse_task("qa%tva%tv"), Tok(),
        )
        assert rep["accuracy"] == 100.0
        assert rep["tv_accuracy"] == 0.0


class TestQAFallbackRowMapping:
    """validate_qa's answers-dict fallback must map tiled rows to their
    source ids via tile_index (round-2 clamped the index, scoring tail rows
    against the wrong ground truth)."""

    def _run(self, monkeypatch, batch, answers):
        from valor_tpu.core.tasks import parse_task
        from valor_tpu.eval import generate as gen
        from valor_tpu.eval import validate as V

        captured = {}

        def fake_generate(model, params, b, groups, **kw):
            n = len(b["tile_index"]) if b.get("tile_index") is not None else len(b["_n"])
            return {f"generated_sequences_{groups[0]}": np.full((n, 3), 102)}

        monkeypatch.setattr(gen, "generate", fake_generate)

        class Tok:
            def decode(self, ids_):
                return "x"

        real_qa_accuracy = V.qa_accuracy

        def spy(preds, gts):
            captured["gts"] = list(gts)
            return real_qa_accuracy(preds, gts)

        monkeypatch.setattr(V, "qa_accuracy", spy)
        V.validate_qa(
            None, None, iter([batch]), parse_task("qa%tv"), Tok(), answers=answers
        )
        return captured["gts"]

    def test_tiled_rows_map_by_tile_index(self, monkeypatch):
        # 3 question rows from 2 media ids: rows -> v0, v0, v1
        batch = {
            "ids": ["v0", "v1"],
            "tile_index": np.array([0, 0, 1], np.int32),
        }
        gts = self._run(monkeypatch, batch, {"v0": "cat", "v1": "dog"})
        assert gts == ["cat", "cat", "dog"]

    def test_row_overflow_raises(self, monkeypatch):
        # more generated rows than id rows with no tiling info: loud error,
        # not silent clamping
        import pytest

        batch = {"ids": ["v0"], "_n": ["r0", "r1"], "tile_index": None}
        with pytest.raises(ValueError, match="id rows"):
            self._run(monkeypatch, batch, {"v0": "cat"})
