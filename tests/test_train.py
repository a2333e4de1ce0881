"""Distributed train-step + optimizer tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import tiny_model_config
from tests.test_model import make_batch
from valor_tpu.core.config import TrainConfig
from valor_tpu.core.tasks import parse_task
from valor_tpu.models.valor import VALORModel
from valor_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from valor_tpu.train.optimizer import build_optimizer, label_params
from valor_tpu.train.schedule import make_schedule
from valor_tpu.train.step import TrainState, make_train_step


def _init(cfg, batch, task):
    model = VALORModel(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch,
        task,
        True,
        True,
    )
    return model, variables["params"]


class TestSchedules:
    def test_warmup_linear(self):
        # schedule step is 0-based; effective step is +1 (reference 1-based)
        s = make_schedule("warmup_linear", 1.0, 100, 0.1)
        np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(9)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(54)), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(s(99)), 0.0, atol=1e-7)

    def test_warmup_cosine(self):
        s = make_schedule("warmup_cosine", 2.0, 100, 0.1)
        # mid-warmup ramp; at x >= warmup the cosine branch applies
        np.testing.assert_allclose(float(s(4)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(
            float(s(9)), 2.0 * 0.5 * (1 + np.cos(np.pi * 0.1)), rtol=1e-6
        )
        np.testing.assert_allclose(float(s(99)), 0.0, atol=1e-6)


class TestOptimizerGroups:
    def test_labels(self):
        cfg = tiny_model_config()
        task = parse_task("ret%tv")
        batch = make_batch(jax.random.PRNGKey(0))
        _, params = _init(cfg, batch, task)
        labels = label_params(params, ["audio_encoder"])
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        joined = {"/".join(str(getattr(k, "key", k)) for k in p): v for p, v in flat}
        # clip vision params -> clip_visual group
        vis = [v for k, v in joined.items() if k.startswith("clip_vision")]
        assert all(v.startswith("clip_visual") for v in vis)
        txt = [v for k, v in joined.items() if k.startswith("clip_text")]
        assert all(v.startswith("clip_text") for v in txt)
        # new_params_name routing
        aud = [v for k, v in joined.items() if k.startswith("audio_encoder")]
        assert all(v.startswith("new") for v in aud)
        # LayerNorm / bias -> no-decay
        ln = [v for k, v in joined.items() if k.endswith("/scale") or k.endswith("/bias")]
        assert ln and all(v.endswith("_nd") for v in ln)

    def test_update_changes_params(self):
        cfg = tiny_model_config()
        task = parse_task("ret%tv")
        batch = make_batch(jax.random.PRNGKey(0))
        model, params = _init(cfg, batch, task)
        tcfg = TrainConfig(num_train_steps=10, learning_rate=1e-2, clip_lr=1e-2, clip_lr_text=1e-2)
        tx = build_optimizer(params, tcfg)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(2), task)
        assert np.isfinite(float(metrics["total_loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        # at least one param moved
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_state.params
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0


class TestFrozenClipExclusion:
    def test_frozen_grads_do_not_inflate_clip_norm(self):
        """The reference's frozen towers carry requires_grad=False, so
        its clip_grad_norm_ never sees their grads; ours must zero them
        BEFORE the global-norm clip or huge frozen-encoder grads shrink
        every trainable update (and they must stay exactly zero after)."""
        cfg = tiny_model_config()
        task = parse_task("ret%tv")
        batch = make_batch(jax.random.PRNGKey(0))
        _, params = _init(cfg, batch, task)
        tcfg = TrainConfig(
            num_train_steps=10, learning_rate=1e-2, clip_lr=1e-2,
            clip_lr_text=1e-2, grad_norm=1.0,
        )
        tx = build_optimizer(params, tcfg, frozen_vision=True)
        opt_state = tx.init(params)
        labels = label_params(params, [], frozen_vision=True)
        # unit grads everywhere, then a HUGE grad on every frozen leaf
        grads_small = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 1e-3), params)
        grads_big = jax.tree_util.tree_map(
            lambda g, lbl: jnp.full_like(g, 1e6) if lbl == "frozen" else g,
            grads_small, labels,
        )
        u_small, _ = tx.update(grads_small, opt_state, params)
        u_big, _ = tx.update(grads_big, tx.init(params), params)
        flat_s = jax.tree_util.tree_flatten_with_path(u_small)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(u_big)[0])
        flat_l = dict(jax.tree_util.tree_flatten_with_path(labels)[0])
        for path, us in flat_s:
            ub, lbl = flat_b[path], flat_l[path]
            if lbl == "frozen":
                assert float(jnp.max(jnp.abs(ub))) == 0.0
            else:
                # trainable updates identical whatever the frozen grads
                np.testing.assert_allclose(
                    np.asarray(us), np.asarray(ub), rtol=1e-6, atol=1e-9)


class TestShardedStep:
    def test_dp_step_on_mesh(self):
        cfg = tiny_model_config()
        task = parse_task("pt_contra%tv_caption%tv")
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        model, params = _init(cfg, batch, task)
        tcfg = TrainConfig(num_train_steps=10)
        tx = build_optimizer(params, tcfg)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, donate=False)

        mesh = make_mesh(n_data=8)
        state_r = jax.device_put(state, replicated(mesh))
        sharded = shard_batch(mesh, batch)
        new_state, metrics = step(state_r, sharded, jax.random.PRNGKey(2), task)
        sharded_loss = float(metrics["total_loss"])
        assert np.isfinite(sharded_loss)

        # numerical agreement with the unsharded step (global-batch semantics)
        _, metrics1 = step(state, batch, jax.random.PRNGKey(2), task)
        np.testing.assert_allclose(
            sharded_loss, float(metrics1["total_loss"]), rtol=2e-4
        )

    def test_graft_dryrun(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)


class TestAdamNuDtype:
    """scale_by_adam_dtyped (bf16 second moment, optimizer.py): fp32/fp32
    must match optax.scale_by_adam exactly; bf16 nu must track closely."""

    def _run(self, tx, grads_seq, params):
        import optax as _optax

        state = tx.init(params)
        outs = []
        for g in grads_seq:
            u, state = tx.update(g, state, params)
            outs.append(u)
        return outs

    def test_fp32_matches_optax(self):
        import optax as _optax

        from valor_tpu.train.optimizer import scale_by_adam_dtyped

        rng = np.random.RandomState(0)
        params = {"w": jnp.asarray(rng.randn(16, 8), jnp.float32)}
        grads_seq = [
            {"w": jnp.asarray(rng.randn(16, 8) * 0.1, jnp.float32)} for _ in range(5)
        ]
        ours = self._run(
            scale_by_adam_dtyped(0.9, 0.98, 1e-6, jnp.float32, jnp.float32),
            grads_seq, params,
        )
        ref = self._run(
            _optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-6), grads_seq, params
        )
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(
                np.asarray(a["w"]), np.asarray(b["w"]), rtol=1e-6, atol=1e-7
            )

    def test_bf16_nu_tracks_fp32(self):
        import optax as _optax

        from valor_tpu.train.optimizer import scale_by_adam_dtyped

        rng = np.random.RandomState(1)
        params = {"w": jnp.asarray(rng.randn(32, 8), jnp.float32)}
        grads_seq = [
            {"w": jnp.asarray(rng.randn(32, 8) * 1e-3, jnp.float32)}
            for _ in range(50)
        ]
        half = self._run(
            scale_by_adam_dtyped(0.9, 0.98, 1e-6, jnp.bfloat16, jnp.bfloat16),
            grads_seq, params,
        )
        full = self._run(
            _optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-6), grads_seq, params
        )
        # adam updates are ~unit scale; the half-precision moments may
        # deviate by ~1% relative, never in direction on average
        a = np.asarray(half[-1]["w"], np.float32)
        b = np.asarray(full[-1]["w"], np.float32)
        assert np.abs(a - b).max() < 0.05
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


class TestClipFlatDtype:
    """clip_by_global_norm_flat must not promote bf16 grads to f32 — the
    grad_dtype regime's traffic saving depends on bf16 leaving the clip."""

    def test_bf16_preserved(self):
        from valor_tpu.train.optimizer import clip_by_global_norm_flat

        tx = clip_by_global_norm_flat(1.0)
        g = {"w": jnp.full((8, 4), 3.0, jnp.bfloat16)}
        out, _ = tx.update(g, tx.init(None))
        assert out["w"].dtype == jnp.bfloat16

    def test_fp32_matches_optax(self):
        import optax as _optax

        from valor_tpu.train.optimizer import clip_by_global_norm_flat

        rng = np.random.RandomState(7)
        g = {
            "a": jnp.asarray(rng.randn(16, 8), jnp.float32),
            "b": jnp.asarray(rng.randn(5), jnp.float32),
        }
        ours, _ = clip_by_global_norm_flat(0.5).update(g, None)
        tx = _optax.clip_by_global_norm(0.5)
        ref, _ = tx.update(g, tx.init(g))
        for k in g:
            np.testing.assert_allclose(
                np.asarray(ours[k]), np.asarray(ref[k]), rtol=1e-6
            )


class TestAdamMuDtypeOptaxParity:
    """With mu_dtype=bf16 / nu=f32, scale_by_adam_dtyped must follow
    optax.scale_by_adam(mu_dtype=bf16)'s SEMANTICS: the step's update is
    computed from the full-precision EMA; the bf16 cast is storage-only.
    Bitwise parity is not expected — optax's `decay * t` multiplies in
    bf16 (weak-typed python scalar x bf16 array) before the f32 add,
    while ours upcasts the stored moment first (strictly more precise) —
    so the two quantised trajectories track within bf16 noise."""

    def test_bf16_mu_tracks_optax(self):
        import optax as _optax

        from valor_tpu.train.optimizer import scale_by_adam_dtyped

        rng = np.random.RandomState(3)
        params = {"w": jnp.asarray(rng.randn(16, 8), jnp.float32)}
        grads_seq = [
            {"w": jnp.asarray(rng.randn(16, 8) * 0.1, jnp.float32)}
            for _ in range(6)
        ]
        ours_tx = scale_by_adam_dtyped(0.9, 0.98, 1e-6, jnp.bfloat16, jnp.float32)
        ref_tx = _optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-6, mu_dtype=jnp.bfloat16)
        s_o, s_r = ours_tx.init(params), ref_tx.init(params)
        for g in grads_seq:
            u_o, s_o = ours_tx.update(g, s_o, params)
            u_r, s_r = ref_tx.update(g, s_r, params)
            # adam updates are ~unit scale; bf16-storage noise bounds the gap
            np.testing.assert_allclose(
                np.asarray(u_o["w"]), np.asarray(u_r["w"]), atol=1.2e-2, rtol=0
            )
        assert s_o.mu["w"].dtype == jnp.bfloat16
        assert s_o.nu["w"].dtype == jnp.float32

    def test_update_not_quantised_by_storage_cast(self):
        """The update must differ from one computed off the ROUNDED EMAs:
        with a grad stream whose mu sits between bf16 grid points, the
        f32-EMA update is measurably different (regression guard for the
        pre-fix behaviour that read the casted moments)."""
        import optax as _optax

        from valor_tpu.train.optimizer import scale_by_adam_dtyped

        # fp32 EMA reference (no storage rounding at all)
        rng = np.random.RandomState(11)
        params = {"w": jnp.asarray(rng.randn(64), jnp.float32)}
        grads_seq = [
            {"w": jnp.asarray(rng.randn(64) * 0.1, jnp.float32)} for _ in range(4)
        ]
        ours_tx = scale_by_adam_dtyped(0.9, 0.98, 1e-6, jnp.bfloat16, jnp.float32)
        full_tx = _optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-6)
        s_o, s_f = ours_tx.init(params), full_tx.init(params)
        for g in grads_seq:
            u_o, s_o = ours_tx.update(g, s_o, params)
            u_f, s_f = full_tx.update(g, s_f, params)
        # step-4 update reads: f32(mu3_bf16 rounded) recurrence but the
        # FINAL EMA value unrounded — the gap to the all-f32 trajectory
        # must be bounded by the PRIOR steps' rounding only (<= ~0.4%),
        # not by rounding the freshly-updated mu too (~double that)
        a, b = np.asarray(u_o["w"]), np.asarray(u_f["w"])
        assert float(np.max(np.abs(a - b))) < 6e-3
