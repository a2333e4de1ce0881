"""QA dataset/collate, validate_pt proxy metrics, SCST loss tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from tests.test_data import TINY_VOCAB
from tests.test_model import make_batch
from valor_tpu.core.tasks import parse_task
from valor_tpu.data.tokenizers.wordpiece import BertTokenizer
from valor_tpu.data.vqa import (
    QATxtMapper,
    valorqa_collate_test,
    valorqa_collate_train,
)
from valor_tpu.models.valor import VALORModel
from valor_tpu.tasks.scst import scst_loss


@pytest.fixture
def qa_fixture(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(TINY_VOCAB))
    tok = BertTokenizer(str(vocab))
    qa = {
        "v0": [{"question": "a cat", "answer": "the mat"}],
        "v1": [
            {
                "question": "the dog",
                "answer": ["cat", "mat"],
                "answer_weights": [0.7, 0.3],
            }
        ],
        "v2": [
            {"question": "a cat", "answer": "dog", "question_id": 7},
            {"question": "the mat", "answer": "cat", "question_id": 8},
        ],
    }
    p = tmp_path / "qa.json"
    p.write_text(json.dumps(qa))
    return p, tok


class TestQAMapper:
    def test_train_single_answer(self, qa_fixture):
        p, tok = qa_fixture
        m = QATxtMapper(str(p), max_len=6, bert_tokenizer=tok, training=True)
        out = m["v0"]
        assert len(out["answer"]) == 1
        assert out["answer"][0]["bert_tokens"].shape == (7,)  # max_len 5 + 2
        assert out["answer_weights"] == [1.0]

    def test_train_multi_answer(self, qa_fixture):
        p, tok = qa_fixture
        m = QATxtMapper(str(p), max_len=6, bert_tokenizer=tok, training=True)
        out = m["v1"]
        assert len(out["answer"]) == 2
        assert out["answer_weights"] == [0.7, 0.3]

    def test_test_mode(self, qa_fixture):
        p, tok = qa_fixture
        m = QATxtMapper(str(p), max_len=6, bert_tokenizer=tok, training=False)
        out = m["v2"]
        assert len(out["questions"]) == 2
        assert out["answers"] == ["dog", "cat"]
        assert out["question_ids"] == [7, 8]


class TestQACollate:
    def _samples(self, qa_fixture, training=True):
        p, tok = qa_fixture
        m = QATxtMapper(str(p), max_len=6, bert_tokenizer=tok, training=training)
        rng = np.random.RandomState(0)
        out = []
        for vid in ("v0", "v1"):
            out.append(
                {"id": vid, "qa": m[vid], "video": rng.randn(2, 8, 8, 3).astype(np.float32), "audio": None}
            )
        return out

    def test_train_collate_tiling(self, qa_fixture):
        batch = valorqa_collate_train(self._samples(qa_fixture), pad_multiple=4)
        # v0 has 1 answer, v1 has 2 -> 3 tiled rows, padded to 4 with a
        # zero-weight copy of row 0 (shape bucketing)
        assert batch["bert_tokens"].shape[0] == 4
        assert batch["video_pixels"].shape[0] == 2
        np.testing.assert_array_equal(batch["tile_index"], [0, 1, 1, 0])
        np.testing.assert_allclose(batch["answer_weights"], [1.0, 0.7, 0.3, 0.0])

    def test_test_collate(self, qa_fixture):
        p, tok = qa_fixture
        m = QATxtMapper(str(p), max_len=6, bert_tokenizer=tok, training=False)
        rng = np.random.RandomState(0)
        samples = [
            {"id": "v2", "qa": m["v2"], "video": rng.randn(2, 8, 8, 3).astype(np.float32), "audio": None}
        ]
        batch = valorqa_collate_test(samples)
        assert batch["question_prompt"].shape[0] == 2
        assert batch["answers"] == ["dog", "cat"]
        np.testing.assert_array_equal(batch["tile_index"], [0, 0])


class TestValidatePT:
    def test_proxy_metrics(self):
        from valor_tpu.eval.validate import validate_pt
        from valor_tpu.train.step import make_eval_step

        cfg = tiny_model_config()
        task = parse_task("pt_contra%tva%tv_caption%tva%tv_mlm%tv")
        model = VALORModel(cfg)
        b = make_batch(jax.random.PRNGKey(0))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            b, task, True, True,
        )["params"]
        eval_step = make_eval_step(model)
        batch = dict(b)
        batch["ids"] = [f"i{i}" for i in range(4)]
        batch["ids_txt"] = batch["ids"]
        report = validate_pt(model, params, eval_step, [batch], task, cfg.contra_type)
        # per-group accuracies + a recall per contra group (reference
        # test.py:497-657 reports caption_acc_<g>/mlm_acc_<g>/<x>2<y>_recall)
        for key in ("caption_acc_tva", "caption_acc_tv", "mlm_acc_tv",
                    "caption_token_acc", "mlm_token_acc",
                    "contra_recall_tva", "contra_recall_tv"):
            assert key in report, (key, sorted(report))
        assert 0 <= report["caption_token_acc"] <= 100
        # the aggregate is the mean of the per-group accuracies
        agg = (report["caption_acc_tva"] + report["caption_acc_tv"]) / 2
        assert report["caption_token_acc"] == pytest.approx(agg, abs=0.02)


class TestSCSTTrainerLoop:
    def test_scst_trainer_step(self, tmp_path):
        """End-to-end SCST: rollouts -> host CIDEr+BLEU reward -> REINFORCE
        update through the Trainer."""
        import jax
        import json as _json

        from valor_tpu.core.config import Config, TrainConfig
        from valor_tpu.core.tasks import parse_task
        from valor_tpu.data.tokenizers.wordpiece import BertTokenizer
        from valor_tpu.eval.scorer import Scorer
        from valor_tpu.models.valor import VALORModel
        from valor_tpu.train.optimizer import build_optimizer
        from valor_tpu.train.step import TrainState
        from valor_tpu.train.trainer import Trainer

        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(TINY_VOCAB))
        tok = BertTokenizer(str(vocab))
        ids = ["a", "b"]
        ann = {"a": ["a cat sits on the mat"], "b": ["the dog runs"]}
        annfile = tmp_path / "ann.json"
        annfile.write_text(_json.dumps(ann))
        scorer = Scorer(str(annfile), ids, tok)

        mcfg = tiny_model_config(fusion_vocab=128, scst_finetuning=True, max_generation_len=4)
        spec = parse_task("cap%tv")
        batch = make_batch(jax.random.PRNGKey(0), b=2, vocab=128)
        model = VALORModel(mcfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batch, spec, True, True,
        )["params"]
        tcfg = TrainConfig(num_train_steps=1, learning_rate=1e-4)
        tx = build_optimizer(params, tcfg)
        state = TrainState.create(params, tx)
        cfg = Config(model=mcfg, train=tcfg)
        trainer = Trainer(cfg, model, tx, state, meta_loader=[], scorer=scorer)
        device_batch = {k: v for k, v in batch.items() if k != "ids"}
        metrics = trainer.scst_step(device_batch, ids, spec)
        assert "caption_loss_tv" in metrics
        assert np.isfinite(metrics["caption_loss_tv"])
        assert int(trainer.state.step) == 1


class TestSCST:
    def test_scst_loss_sign_and_grad(self):
        cfg = tiny_model_config()
        task = parse_task("cap%tv")
        model = VALORModel(cfg)
        b = make_batch(jax.random.PRNGKey(0))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            b, task, True, True,
        )["params"]
        enc = model.apply({"params": params}, b, task, False, False,
                          rngs={"mask": jax.random.PRNGKey(0)})
        scst_batch = {"video_input": enc["video_input"], "audio_input": None}
        seqs = jnp.asarray(np.random.RandomState(0).randint(106, 120, (4, 5)), jnp.int32)
        rewards = jnp.asarray([1.0, -1.0, 0.5, 0.0])
        loss = scst_loss(
            model, params, scst_batch, seqs, rewards, "unimlm", use_audio=False
        )
        assert np.isfinite(float(loss))
        g = jax.grad(
            lambda p: scst_loss(model, p, scst_batch, seqs, rewards, "unimlm", use_audio=False)
        )(params)
        gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
        assert gn > 0
