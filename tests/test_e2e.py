"""End-to-end integration: fixture data -> trainer -> eval -> checkpoint -> resume."""

import json
import os
import wave

import jax
import numpy as np
import pytest
from PIL import Image

from tests.conftest import tiny_model_config
from tests.test_data import TINY_VOCAB
from valor_tpu.core.config import Config, DataFlowConfig, DatasetConfig, TrainConfig
from valor_tpu.core.tasks import parse_task
from valor_tpu.data.loader import DataLoader, MetaLoader, ShardedBatchSampler
from valor_tpu.data.pipeline import TxtMapper, VALORDataset, VideoMapper, valor_collate
from valor_tpu.data.tokenizers.wordpiece import BertTokenizer
from valor_tpu.models.valor import VALORModel
from valor_tpu.train.checkpoints import ModelSaver
from valor_tpu.train.optimizer import build_optimizer
from valor_tpu.train.step import TrainState, make_eval_step, make_train_step
from valor_tpu.train.trainer import Trainer


@pytest.fixture
def fixture_root(tmp_path):
    ids = [f"vid{i}" for i in range(8)]
    (tmp_path / "ids.json").write_text(json.dumps(ids))
    sentences = ["a cat sits on the mat", "the dog runs", "a cat runs", "the mat"]
    txts = {v: sentences[i % len(sentences)] for i, v in enumerate(ids)}
    (tmp_path / "txt.json").write_text(json.dumps(txts))
    frames = tmp_path / "frames"
    rng = np.random.RandomState(0)
    for vid in ids:
        d = frames / vid
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:04d}.jpg")
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(TINY_VOCAB))
    return tmp_path


def build_everything(root, num_steps=4, with_val=True):
    # fixture tokenizes with BERT only -> use the shared BERT text encoder
    mcfg = tiny_model_config(
        fusion_vocab=128, txt_encoder_type="bert_base_uncased", init_clip_head=False
    )
    tok = BertTokenizer(str(root / "vocab.txt"))
    txt_m = TxtMapper(str(root / "txt.json"), max_len=6, bert_tokenizer=tok)
    vid_m = VideoMapper(str(root / "frames"), resolution=32, sample_num=2)
    ds = VALORDataset(str(root / "ids.json"), txt_m, vid_m, None, training=True)
    sampler = ShardedBatchSampler(len(ds), batch_size=4, seed=0)
    loader = DataLoader(ds, sampler, valor_collate)
    meta = MetaLoader({"pt_contra%tv_caption%tv--fix": (loader, 1)}, seed=0)

    first_task, first_batch = next(iter(meta))
    device_batch = {
        k: v for k, v in first_batch.items() if k not in ("ids", "ids_txt", "sample_num")
    }
    # clip tokens out of range for tiny clip vocab: reuse bert tokens
    model = VALORModel(mcfg)
    spec = parse_task("pt_contra%tv_caption%tv")
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        device_batch,
        spec,
        True,
        True,
    )["params"]
    tcfg = TrainConfig(
        num_train_steps=num_steps,
        learning_rate=1e-3,
        clip_lr=1e-3,
        clip_lr_text=1e-3,
        valid_steps=0,
        seed=0,
    )
    tx = build_optimizer(params, tcfg)
    state = TrainState.create(params, tx)
    cfg = Config(model=mcfg, train=tcfg)
    return cfg, model, tx, state, meta, tok


class TestEndToEnd:
    def test_train_loop_reduces_loss(self, fixture_root):
        cfg, model, tx, state, meta, tok = build_everything(fixture_root, num_steps=6)
        trainer = Trainer(cfg, model, tx, state, meta)
        first_losses = []
        orig_step = trainer.train_step

        def wrapped(state, batch, rng, task):
            s, m = orig_step(state, batch, rng, task)
            first_losses.append(float(m["total_loss"]))
            return s, m

        trainer.train_step = wrapped
        trainer.run()
        assert len(first_losses) == 6
        assert all(np.isfinite(x) for x in first_losses)
        # loss should drop from the first to the last step on repeated data
        assert first_losses[-1] < first_losses[0]

    def test_checkpoint_save_restore(self, fixture_root, tmp_path):
        cfg, model, tx, state, meta, tok = build_everything(fixture_root, num_steps=2)
        out = tmp_path / "out"
        saver = ModelSaver(str(out))
        trainer = Trainer(cfg, model, tx, state, meta, saver=saver)
        final = trainer.run()
        step = int(final.step)
        assert saver.latest_step() == step
        restored = saver.restore(state)
        assert restored is not None
        # params round-trip exactly
        a = jax.tree_util.tree_leaves(final.params)
        b = jax.tree_util.tree_leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_checkpoint_restore_specific_step(self, tmp_path):
        """--pretrain_step semantics: restore a chosen checkpoint instead of
        the latest (reference train_utils.py:120-121)."""
        import jax.numpy as jnp
        import optax

        params = {"w": jnp.ones((3,), jnp.float32)}
        state = TrainState.create(params, optax.sgd(0.1))
        saver = ModelSaver(str(tmp_path / "out"), remove_before_ckpt=False)
        saver.save(state, 1)
        saver.save(state.replace(params={"w": jnp.full((3,), 7.0)}), 2)
        assert saver.latest_step() == 2
        old = saver.restore(state, step=1)
        np.testing.assert_array_equal(np.asarray(old["params"]["w"]), np.ones(3))
        new = saver.restore(state)
        np.testing.assert_array_equal(np.asarray(new["params"]["w"]), np.full(3, 7.0))

    def test_retrieval_validation(self, fixture_root):
        from valor_tpu.eval.validate import validate_ret

        cfg, model, tx, state, meta, tok = build_everything(fixture_root)
        spec = parse_task("ret%tv")
        tok2 = BertTokenizer(str(fixture_root / "vocab.txt"))
        txt_m = TxtMapper(str(fixture_root / "txt.json"), max_len=6, bert_tokenizer=tok2, training=False)
        vid_m = VideoMapper(str(fixture_root / "frames"), resolution=32, sample_num=2, training=False)
        ds = VALORDataset(str(fixture_root / "ids.json"), txt_m, vid_m, None, training=False)
        sampler = ShardedBatchSampler(len(ds), batch_size=4, shuffle=False)
        loader = DataLoader(ds, sampler, valor_collate)
        eval_step = make_eval_step(model)
        report = validate_ret(
            model, state.params, eval_step, iter(loader), spec, cfg.model.contra_type
        )
        assert "tv_t2v_r1" in report or "tv_ravg" in report
        assert 0 <= report["ravg"] <= 100
