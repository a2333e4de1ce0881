"""Generation tests: greedy / sample / beam on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import tiny_model_config
from tests.test_model import make_batch
from valor_tpu.core.tasks import parse_task
from valor_tpu.eval import generate as gen
from valor_tpu.models.valor import EOS_TOKEN, VALORModel


def _setup(cfg, batch, task="cap%tv"):
    model = VALORModel(cfg)
    spec = parse_task(task)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch,
        spec,
        True,
        True,
    )
    return model, variables["params"], spec


class TestGenerate:
    def test_greedy_shapes_and_determinism(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch)
        out1 = gen.generate(model, params, batch, spec.caption_groups, max_len=5)
        out2 = gen.generate(model, params, batch, spec.caption_groups, max_len=5)
        s1 = np.asarray(out1["generated_sequences_tv"])
        s2 = np.asarray(out2["generated_sequences_tv"])
        assert s1.shape == (4, 5)
        np.testing.assert_array_equal(s1, s2)
        assert s1.dtype == np.int32
        assert (s1 >= 0).all() and (s1 < cfg.fusion_vocab).all()

    def test_sample_logprobs(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch)
        out = gen.generate(
            model, params, batch, spec.caption_groups,
            max_len=5, mode="sample", rng=jax.random.PRNGKey(7),
        )
        lp = np.asarray(out["logprobs_tv"])
        assert lp.shape == (4, 5)
        assert (lp <= 0).all()

    def test_eos_latch(self):
        # after a row emits EOS, everything that follows must be EOS
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch)
        seqs = np.asarray(
            gen.generate(model, params, batch, spec.caption_groups, max_len=6)[
                "generated_sequences_tv"
            ]
        )
        for row in seqs:
            seen_eos = False
            for t in row:
                if seen_eos:
                    assert t == EOS_TOKEN
                if t == EOS_TOKEN:
                    seen_eos = True

    def test_beam(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch)
        out = gen.generate(
            model, params, batch, spec.caption_groups, max_len=5, beam_size=3
        )
        seqs = np.asarray(out["generated_sequences_tv"])
        assert seqs.shape == (4, 5)

    def test_lm_mode(self):
        cfg = tiny_model_config(caption_type="lm")
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch)
        out = gen.generate(
            model, params, batch, spec.caption_groups, caption_type="lm", max_len=4
        )
        assert np.asarray(out["generated_sequences_tv"]).shape == (4, 4)

    def test_trimodal_generation(self):
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch, "cap%tva")
        out = gen.generate(model, params, batch, spec.caption_groups, max_len=4)
        assert "generated_sequences_tva" in out

    def test_ctx_kv_cache_matches_full_reencode(self):
        """in-sequence decode via precomputed [prompt|media] K/V must equal
        the full causal-prefix re-encode (has_cross_attn=False)."""
        cfg = tiny_model_config(multimodal_use_cross_attn=False)
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch, "cap%tva")
        video_output = model.apply({"params": params}, batch["video_pixels"], method=model.encode_video)
        video_input = model.apply({"params": params}, video_output, method=model.video_fusion_input)
        audio_output = model.apply({"params": params}, batch["audio_spectrograms"], method=model.encode_audio)
        audio_input = model.apply({"params": params}, audio_output, method=model.audio_fusion_input)
        tokens = batch["bert_tokens"][:, :5]
        mask = (tokens != 0).astype(jnp.float32)
        full = model.apply(
            {"params": params}, tokens, None, video_input, audio_input, True, False, mask,
            method=model.fusion_logits,
        )
        ctx_kv, ctx_mask = model.apply(
            {"params": params}, None, video_input, audio_input, method=model.fusion_ctx_kv
        )
        cached = model.apply(
            {"params": params}, tokens, mask, ctx_kv, ctx_mask,
            method=model.fusion_logits_ctx,
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(cached), rtol=3e-5, atol=3e-5)

    def test_generate_in_seq_media(self):
        cfg = tiny_model_config(multimodal_use_cross_attn=False)
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch, "cap%tva")
        out = gen.generate(model, params, batch, spec.caption_groups, max_len=4)
        assert np.asarray(out["generated_sequences_tva"]).shape == (4, 4)

    def test_cross_kv_cache_matches_uncached(self):
        """decode via the precomputed cross-KV cache must equal the direct
        cross-attention forward on the same prefix."""
        cfg = tiny_model_config()
        batch = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, batch, "cap%tva")
        video_output = model.apply({"params": params}, batch["video_pixels"], method=model.encode_video)
        video_input = model.apply({"params": params}, video_output, method=model.video_fusion_input)
        tokens = batch["bert_tokens"][:, :5]
        mask = (tokens != 0).astype(jnp.float32)
        direct = model.apply(
            {"params": params}, tokens, None, video_input, None, True, False, mask,
            method=model.fusion_logits,
        )
        kv = model.apply({"params": params}, video_input, None, method=model.fusion_cross_kv)
        cached = model.apply(
            {"params": params}, tokens, None, None, None, True, False, mask, kv,
            method=model.fusion_logits,
        )
        np.testing.assert_allclose(np.asarray(direct), np.asarray(cached), rtol=2e-5, atol=2e-5)


class TestGeneratorCaching:
    """The production generation path is jitted and cached: the second
    batch of the same shape triggers ZERO retrace (VERDICT round-2 item 3),
    and the cache persists across generate() calls because one Generator
    is memoised per model object."""

    def test_zero_retrace_on_second_batch(self):
        cfg = tiny_model_config()
        b1 = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, b1)
        b2 = make_batch(jax.random.PRNGKey(1))
        gen.generate(model, params, b1, spec.caption_groups, max_len=5)
        g = gen.get_generator(model)
        sizes = g.stats()
        assert sizes and all(n == 1 for n in sizes.values())
        out2 = gen.generate(model, params, b2, spec.caption_groups, max_len=5)
        assert g.stats() == sizes  # no new compiles for the second batch
        # beam adds exactly one new decode program, reused thereafter
        gen.generate(model, params, b1, spec.caption_groups, max_len=5, beam_size=2)
        sizes_beam = g.stats()
        gen.generate(model, params, b2, spec.caption_groups, max_len=5, beam_size=2)
        assert g.stats() == sizes_beam
        assert np.asarray(out2["generated_sequences_tv"]).shape == (4, 5)

    def test_generator_memoised_per_model(self):
        cfg = tiny_model_config()
        b = make_batch(jax.random.PRNGKey(0))
        model, params, spec = _setup(cfg, b)
        assert gen.get_generator(model) is gen.get_generator(model)


class TestGeneratorCacheBound:
    """get_generator keeps a bounded LRU, not an unbounded id->Generator
    dict: a process that builds many models (pytest, sweeps) must not pin
    every model + its compiled programs forever."""

    def test_lru_evicts_and_reuses(self):
        from valor_tpu.eval import generate as gen_mod

        gen_mod._GENERATORS.clear()

        class M:  # stand-in model object; Generator only stores it
            pass

        m1, m2, m3 = M(), M(), M()
        g1 = gen_mod.get_generator(m1)
        assert gen_mod.get_generator(m1) is g1  # cache hit
        gen_mod.get_generator(m2)
        gen_mod.get_generator(m3)
        assert len(gen_mod._GENERATORS) <= gen_mod._GENERATORS_MAX
        # m1 was evicted (least recently used); a fresh Generator is built
        assert gen_mod.get_generator(m1) is not g1
        gen_mod._GENERATORS.clear()
