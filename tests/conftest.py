"""Test harness: force an 8-device CPU platform before jax initialises.

This is the JAX-native "multi-node without a cluster" mechanism
(SURVEY.md §4): every distributed test runs on a virtual 8-device mesh.
"""

import os

# The shell env pins JAX_PLATFORMS=axon (one real TPU behind a tunnel) and a
# sitecustomize hook imports jax at interpreter start, freezing that env into
# jax's config defaults — so the env var alone cannot redirect tests.  The
# config update below works as long as no backend has been initialised yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"

import pytest  # noqa: E402

from valor_tpu.core.config import ModelConfig  # noqa: E402


def tiny_model_config(**kw) -> ModelConfig:
    """A scaled-down VALOR-base: tiny dims, same topology."""
    defaults = dict(
        video_encoder_type="clip_vit_tiny",
        txt_encoder_type="clip_vit_tiny",
        multimodal_encoder_type="bert_base_uncased",
        audio_encoder_type="ast",
        video_resolution=32,
        audio_melbins=16,
        audio_target_length=32,
        audio_patch_size=16,
        fusion_hidden=32,
        fusion_layers=2,
        fusion_heads=2,
        fusion_intermediate=64,
        fusion_vocab=512,
        audio_hidden=32,
        audio_layers=2,
        audio_heads=2,
        audio_intermediate=64,
        contra_dim=16,
        dtype="float32",
        max_generation_len=6,
        max_txt_len=6,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


@pytest.fixture
def tiny_cfg():
    return tiny_model_config()


@pytest.fixture(autouse=True)
def _restore_prng_impl():
    """cli.train.main sets jax_default_prng_impl from TrainConfig.prng_impl
    ('rbg' default); keep that from leaking across tests."""
    prev = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prev:
        jax.config.update("jax_default_prng_impl", prev)
