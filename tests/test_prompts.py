"""Task-prompt subsystem: tokenization, batch injection, prompted forwards,
prompted QA generation.

reference: model/modeling.py:355-369 (get_task_prompt), pretrain.py:255/438/
492-517 (per-objective prompts), :1270-1273 (QA splice), config/
pretrain-VALOR-large.json (use_task_prompt: true).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import tiny_model_config
from tests.test_data import TINY_VOCAB
from valor_tpu.core.tasks import parse_task
from valor_tpu.data.prompts import (
    CAPTION_PROMPT,
    CONTRA_PROMPT,
    MLM_PROMPTS,
    QA_PROMPT,
    PromptTable,
    maybe_prompt_table,
    prompted_collate,
)
from valor_tpu.data.tokenizers.wordpiece import BertTokenizer


PROMPT_WORDS = sorted(
    set(
        " ".join(
            [CONTRA_PROMPT, CAPTION_PROMPT, QA_PROMPT, *MLM_PROMPTS.values()]
        ).split()
    )
)


@pytest.fixture
def bert_tok(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(list(TINY_VOCAB) + PROMPT_WORDS))
    return BertTokenizer(str(vocab))


@pytest.fixture
def table(bert_tok):
    return PromptTable(bert_tokenizer=bert_tok)


class TestPromptTable:
    def test_wrapping_matches_get_task_prompt(self, table, bert_tok):
        """[CLS] + wordpiece ids + [SEP] (reference modeling.py:358-361)."""
        arr = table.caption()
        assert arr.shape[0] == 1
        ids = arr[0].tolist()
        assert ids[0] == bert_tok.cls_token_id
        assert ids[-1] == bert_tok.sep_token_id
        expect = bert_tok.convert_tokens_to_ids(bert_tok.tokenize(CAPTION_PROMPT))
        assert ids[1:-1] == expect

    def test_mlm_prompts_differ_per_group(self, table):
        assert MLM_PROMPTS["tv"] != MLM_PROMPTS["ta"] != MLM_PROMPTS["tva"]
        tv, ta = table.mlm("tv")[0].tolist(), table.mlm("ta")[0].tolist()
        assert tv != ta

    def test_qa_body_unwrapped(self, table, bert_tok):
        """QA splices the body WITHOUT bos/eos (pretrain.py:1272)."""
        body = table.qa_body()[0].tolist()
        assert bert_tok.cls_token_id not in body
        assert bert_tok.sep_token_id not in body
        expect = bert_tok.convert_tokens_to_ids(bert_tok.tokenize(QA_PROMPT))
        assert body == expect

    def test_inject_pretrain(self, table):
        spec = parse_task("pt_contra%tva%tv_caption%tva_mlm%tva%tv")
        batch = table.inject({"bert_tokens": np.zeros((2, 4), np.int32)}, spec)
        assert "prompt_tokens_contra" in batch
        assert "prompt_tokens_caption" in batch
        assert "prompt_tokens_mlm_tva" in batch and "prompt_tokens_mlm_tv" in batch

    def test_inject_qa_splice_matches_reference_formula(self, table):
        """question_prompt -> [CLS | body | question[1:]]
        (pretrain.py:1270-1273: cat(q[:,0:1], prompt[:,1:-1], q[:,1:]))."""
        spec = parse_task("qa%tv")
        q = np.array([[101, 7, 8, 9, 102, 0]], np.int32)
        out = table.inject({"question_prompt": q}, spec)
        body = table.qa_body()[0]
        expect = np.concatenate([q[:, :1], body[None], q[:, 1:]], axis=1)
        np.testing.assert_array_equal(out["question_prompt"], expect)

    def test_maybe_table_gates_on_config(self, bert_tok):
        cfg_on = tiny_model_config(use_task_prompt=True)
        cfg_off = tiny_model_config(use_task_prompt=False)
        assert maybe_prompt_table(cfg_on, (bert_tok, None)) is not None
        assert maybe_prompt_table(cfg_off, (bert_tok, None)) is None

    def test_prompted_collate_wraps(self, table):
        spec = parse_task("cap%tv")
        collate = prompted_collate(lambda items: {"bert_tokens": np.zeros((1, 4), np.int32)}, table, spec)
        out = collate([None])
        assert "prompt_tokens_caption" in out


def _tiny_batch(b=2, vocab=128):
    rng = np.random.RandomState(0)
    txt = rng.randint(10, vocab, size=(b, 6)).astype(np.int32)
    txt[:, 0] = 101
    return {
        "bert_tokens": txt,
        "clip_tokens": txt,
        "video_pixels": rng.randn(b, 2, 32, 32, 3).astype(np.float32),
        "audio_spectrograms": rng.randn(b, 1, 16, 32).astype(np.float32),
    }


class TestPromptedForward:
    def test_prompt_changes_pretrain_loss(self, table):
        """Prompts must actually reach the compute: the prompted loss
        differs from the unprompted one, and use_task_prompt runs finitely
        through all three objectives."""
        from valor_tpu.models.valor import VALORModel

        cfg = tiny_model_config(
            fusion_vocab=128, txt_encoder_type="bert_base_uncased",
            init_clip_head=False, use_task_prompt=True,
        )
        model = VALORModel(cfg)
        spec = parse_task("pt_contra%tva_caption%tva_mlm%tva")
        base = _tiny_batch()
        prompted = table.inject(dict(base), spec)
        # clamp prompt ids into the tiny vocab
        for k, v in list(prompted.items()):
            if k.startswith("prompt_tokens"):
                prompted[k] = np.clip(v, 0, 127)
        rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
        params = model.init(rngs, prompted, spec, True, True)["params"]

        def loss(batch):
            out = model.apply(
                {"params": params}, batch, spec, True, True,
                rngs={"mask": jax.random.PRNGKey(1)},
            )
            return {k: float(v) for k, v in out.items()}

        lp = loss(prompted)
        lb = loss(base)
        for k, v in lp.items():
            assert np.isfinite(v)
        assert lp["caption_loss"] != lb["caption_loss"]
        assert lp["mlm_loss"] != lb["mlm_loss"]
        assert lp["contra_loss"] != lb["contra_loss"]

    def test_prompted_qa_generation(self, table):
        """QA generation with a spliced prompt produces valid sequences
        (reference: generate_qa with use_task_prompt, pretrain.py:1366+)."""
        from valor_tpu.eval import generate as gen
        from valor_tpu.models.valor import VALORModel

        cfg = tiny_model_config(
            fusion_vocab=128, txt_encoder_type="bert_base_uncased",
            init_clip_head=False, use_task_prompt=True,
        )
        model = VALORModel(cfg)
        spec = parse_task("qa%tv")
        q = np.array([[101, 7, 8, 102, 0, 0], [101, 9, 102, 0, 0, 0]], np.int32)
        batch = {
            "question_prompt": q,
            "bert_tokens": np.array([[103, 0, 0], [103, 0, 0]], np.int32),
            "video_pixels": np.random.RandomState(0).randn(2, 2, 32, 32, 3).astype(np.float32),
        }
        batch = table.inject(batch, spec)
        batch["question_prompt"] = np.clip(batch["question_prompt"], 0, 127)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batch, spec, True, True,
        )["params"]
        out = gen.generate(
            model, params,
            {k: v for k, v in batch.items() if k != "bert_tokens"},
            spec.caption_groups, caption_type="unimlm", max_len=4, beam_size=1,
        )
        seqs = np.asarray(out["generated_sequences_tv"])
        assert seqs.shape == (2, 4)
        assert seqs.dtype in (np.int32, np.int64)
