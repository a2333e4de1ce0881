"""Sequence-parallel (SP) activation sharding over the mesh `model` axis.

The reference has no sequence/context parallelism (SURVEY.md §2.3, §5);
parallel/activations.py adds it the TPU-native way — one GSPMD sharding
constraint on the fusion residual stream, collectives inserted by the
compiler.  These tests assert (a) the constraint engages and physically
splits the sequence dim, (b) it skips non-divisible shapes, and (c) the
losses and gradients of the production pt forward are unchanged by SP
(same math, different layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.conftest import tiny_model_config
from valor_tpu.core.tasks import parse_task
from valor_tpu.models.valor import VALORModel
from valor_tpu.parallel.activations import (
    sequence_sharded,
    sequence_sharding_applied,
    set_sequence_sharding,
)
from valor_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


@pytest.fixture
def sp_mesh():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    set_sequence_sharding(mesh)
    yield mesh
    set_sequence_sharding(None)


def make_batch(b=4, n_txt=8):
    r = np.random.RandomState(0)
    txt = r.randint(106, 500, size=(b, n_txt)).astype(np.int32)
    txt[:, 0] = 101
    txt[:, -2] = 102
    txt[:, -1] = 0
    return {
        "bert_tokens": jnp.asarray(txt),
        "clip_tokens": jnp.asarray(txt),
        "video_pixels": jnp.asarray(r.randn(b, 2, 32, 32, 3), jnp.float32),
        "audio_spectrograms": jnp.asarray(r.randn(b, 1, 16, 32), jnp.float32),
    }


class TestConstraint:
    def test_applies_and_splits_sequence(self, sp_mesh):
        x = jnp.zeros((4, 8, 16))
        before = sequence_sharding_applied()
        y = jax.jit(lambda a: sequence_sharded(a) * 2)(x)
        assert sequence_sharding_applied() == before + 1
        # propagation keeps the constrained layout on the output: the
        # sequence dim is physically split over `model`
        spec = y.sharding.spec
        assert MODEL_AXIS in str(spec) and DATA_AXIS in str(spec)
        shard = y.sharding.shard_shape(y.shape)
        assert shard == (1, 4, 16)

    def test_skips_nondivisible_and_wrong_rank(self, sp_mesh):
        before = sequence_sharding_applied()
        x7 = jnp.zeros((4, 7, 16))  # seq 7 % model 2 != 0
        assert sequence_sharded(x7) is x7
        x3 = jnp.zeros((3, 8, 16))  # batch 3 % data 4 != 0
        assert sequence_sharded(x3) is x3
        x2d = jnp.zeros((4, 8))
        assert sequence_sharded(x2d) is x2d
        assert sequence_sharding_applied() == before

    def test_noop_when_disabled(self):
        set_sequence_sharding(None)
        x = jnp.zeros((4, 8, 16))
        assert sequence_sharded(x) is x
        assert sequence_sharding_applied() == 0


class TestModelEquivalence:
    def test_pt_losses_and_grads_match(self, sp_mesh):
        """Full pt forward+backward: SP on (mesh, TP params) equals the
        plain single-device math."""
        from valor_tpu.parallel.partition import shard_params

        cfg = tiny_model_config(dropout=0.0)
        task = parse_task("pt_contra%tva%tv%ta_caption%tva")
        batch = make_batch()
        model = VALORModel(cfg)

        set_sequence_sharding(None)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batch,
            task,
            True,
            True,
        )["params"]

        def total_loss(p, b):
            losses = model.apply(
                {"params": p}, b, task, True, True, rngs={"mask": jax.random.PRNGKey(2)}
            )
            return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

        ref_loss, ref_grads = jax.jit(jax.value_and_grad(total_loss))(params, batch)

        # SP run: params TP-placed on the mesh, batch sharded over data
        set_sequence_sharding(sp_mesh)
        before = sequence_sharding_applied()
        sp_params = shard_params(params, sp_mesh)
        sp_batch = {
            k: jax.device_put(v, NamedSharding(sp_mesh, P(DATA_AXIS)))
            for k, v in batch.items()
        }
        sp_loss, sp_grads = jax.jit(jax.value_and_grad(total_loss))(sp_params, sp_batch)
        assert sequence_sharding_applied() > before, "SP constraint never engaged"

        np.testing.assert_allclose(
            np.asarray(ref_loss), np.asarray(sp_loss), rtol=2e-5, atol=2e-6
        )
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
        flat_sp = {
            jax.tree_util.keystr(kp): g
            for kp, g in jax.tree_util.tree_leaves_with_path(sp_grads)
        }
        assert len(flat_ref) == len(flat_sp)
        for kp, g in flat_ref:
            got = np.asarray(flat_sp[jax.tree_util.keystr(kp)], np.float32)
            want = np.asarray(g, np.float32)
            np.testing.assert_allclose(
                got, want, rtol=5e-4, atol=5e-5, err_msg=jax.tree_util.keystr(kp)
            )
