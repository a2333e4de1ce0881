"""ZeRO-3-style fully-sharded parameters (--fsdp).

TPU-native extension (the reference replicates every param per GPU,
train_utils.py:232 DDP): large param leaves shard one free dim over
`data`, GSPMD all_gathers at use sites and reduce-scatters grads, and the
adam moments inherit the layout — param + grad + optimizer memory all
drop by the DP degree.  Oracle: the replicated program on the same mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import tiny_model_config
from tests.test_model import make_batch
from valor_tpu.core.config import Config, TrainConfig
from valor_tpu.core.tasks import parse_task
from valor_tpu.parallel.mesh import DATA_AXIS, make_mesh

TASK = "pt_contra%tva_caption%tva"


def _build(fsdp: bool, zero: bool = False, n_model: int = 1, **model_kw):
    from valor_tpu.cli.build import build_model_and_state

    mesh = make_mesh(n_model=n_model)
    cfg = Config(
        model=tiny_model_config(dropout=0.0, **model_kw),
        train=TrainConfig(
            num_train_steps=1, valid_steps=0, seed=0, fsdp=fsdp,
            zero_optimizer=zero,
        ),
    )
    batch = make_batch(jax.random.PRNGKey(0), b=8)
    model, tx, state = build_model_and_state(cfg, {TASK: batch}, mesh=mesh)
    return mesh, model, tx, state, batch


def _data_sharded_leaves(tree):
    return [
        x
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "sharding")
        and any(
            ax == DATA_AXIS
            for entry in (getattr(x.sharding, "spec", None) or ())
            if entry
            for ax in ((entry,) if isinstance(entry, str) else tuple(entry))
        )
    ]


class TestFSDP:
    def test_params_and_moments_sharded(self):
        mesh, model, tx, state, batch = _build(fsdp=True)
        n_data = mesh.shape[DATA_AXIS]
        sharded = _data_sharded_leaves(state.params)
        assert sharded, "fsdp: no param leaf sharded over data"
        # the big leaves really hold 1/n_data of the rows per device
        big = max(sharded, key=lambda x: x.size)
        shard_rows = {
            s.data.shape for s in big.addressable_shards
        }
        assert all(
            np.prod(shp) == big.size // n_data for shp in shard_rows
        ), f"fsdp leaf not physically split: {shard_rows} vs {big.shape}"
        # small leaves (LayerNorm scales etc.) stay replicated
        small = [
            x
            for x in jax.tree_util.tree_leaves(state.params)
            if hasattr(x, "size") and x.size < 1 << 14
        ]
        assert all(
            getattr(x.sharding, "is_fully_replicated", True) for x in small
        )
        # moments inherit via zeros_like
        assert _data_sharded_leaves(state.opt_state), (
            "fsdp: adam moments did not inherit the data sharding"
        )

    def test_loss_and_step_parity_vs_replicated(self):
        """Same seed, same batch: the FSDP program computes the same losses
        and the same first optimizer step as the replicated program."""
        import optax  # noqa: F401  (tx built by build_model_and_state)

        from valor_tpu.train.step import make_train_step

        mesh_f, model_f, tx_f, state_f, batch = _build(fsdp=True)
        mesh_r, model_r, tx_r, state_r, _ = _build(fsdp=False)
        spec = parse_task(TASK)

        step_f = make_train_step(model_f, tx_f, donate=False)
        step_r = make_train_step(model_r, tx_r, donate=False)
        new_f, mf = step_f(state_f, batch, jax.random.PRNGKey(2), spec)
        new_r, mr = step_r(state_r, batch, jax.random.PRNGKey(2), spec)
        a, b = float(mf["total_loss"]), float(mr["total_loss"])
        assert abs(a - b) <= 2e-3 * max(1.0, abs(b)), f"fsdp loss {a} != {b}"
        # params after one step match (FSDP changes layout, not math)
        pa = jax.tree_util.tree_leaves(new_f.params)
        pb = jax.tree_util.tree_leaves(new_r.params)
        worst = max(
            float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
            for x, y in zip(pa, pb)
        )
        assert worst <= 5e-4, f"fsdp step diverged: max|dp|={worst}"

    def test_composes_with_tp(self):
        """On a (data=4, model=2) mesh TP leaves keep their model-axis
        sharding AND gain a data-axis dim where one is free.  The fusion
        tower is widened to 128 so its attention kernels (128x128 =
        exactly the 16 KiB FSDP threshold) qualify for both."""
        mesh, model, tx, state, batch = _build(
            fsdp=True, n_model=2, fusion_hidden=128, fusion_intermediate=256
        )
        from valor_tpu.parallel.mesh import MODEL_AXIS

        both = []
        for x in jax.tree_util.tree_leaves(state.params):
            spec = getattr(getattr(x, "sharding", None), "spec", None) or ()
            axes = {
                ax
                for entry in spec
                if entry
                for ax in ((entry,) if isinstance(entry, str) else tuple(entry))
            }
            if DATA_AXIS in axes and MODEL_AXIS in axes:
                both.append(x)
        assert both, "no leaf is sharded over BOTH data (fsdp) and model (TP)"
        losses = model.apply(
            {"params": state.params}, batch, parse_task(TASK), True, True,
            rngs={"mask": jax.random.PRNGKey(2)},
        )
        assert all(np.isfinite(float(v)) for v in losses.values())
