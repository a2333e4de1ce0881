"""MoE wired into the fusion stack (BertConfig.moe_* / ModelConfig
fusion_moe_*): layer selection, aux-loss sowing, remat interplay, and a
full VALOR forward.  Dense defaults must be byte-identical to before."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import tiny_model_config
from tests.test_model import init_and_apply, make_batch
from valor_tpu.models.bert import BertConfig, BertFusionEncoder

TINY = dict(
    vocab_size=128,
    hidden_size=16,
    num_layers=4,
    num_heads=2,
    intermediate=32,
    dropout=0.0,
)


def _tokens(b=2, n=6):
    t = np.random.RandomState(0).randint(5, 100, size=(b, n)).astype(np.int32)
    t[:, 0] = 101
    return jnp.asarray(t)


def test_moe_every_other_layer_param_tree():
    cfg = BertConfig(moe_experts=2, moe_every=2, **TINY)
    enc = BertFusionEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), _tokens())["params"]
    for i in range(4):
        layer = params[f"layer_{i}"]
        if i % 2 == 1:  # every 2nd layer (GShard placement)
            assert "moe_mlp" in layer and "mlp" not in layer
            assert layer["moe_mlp"]["w1"].shape == (2, 16, 32)
        else:
            assert "mlp" in layer and "moe_mlp" not in layer


def test_aux_sown_and_dense_callers_unchanged():
    cfg = BertConfig(moe_experts=2, moe_every=2, **TINY)
    enc = BertFusionEncoder(cfg)
    toks = _tokens()
    # NB init itself sows into "moe"; keep only params (re-passing the
    # sown collection would append a second entry per layer)
    variables = {"params": enc.init(jax.random.PRNGKey(0), toks)["params"]}
    # callers that don't ask for the collection trace unchanged (sow no-op)
    y = enc.apply(variables, toks)
    assert np.all(np.isfinite(np.asarray(y)))
    # callers that do ask get one aux scalar per MoE layer
    y2, mut = enc.apply(variables, toks, mutable=["moe"])
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y))
    aux = jax.tree_util.tree_leaves(mut["moe"])
    assert len(aux) == 2  # layers 1 and 3
    total = sum(float(a) for a in aux)
    assert np.isfinite(total) and total >= 2.0 - 1e-5  # >= 1 per layer


def test_moe_under_remat_grads():
    """sow inside nn.remat-wrapped layers must thread through the
    checkpointed backward."""
    cfg = BertConfig(moe_experts=2, moe_every=1, **TINY)
    enc = BertFusionEncoder(cfg, remat=True)
    toks = _tokens()
    variables = enc.init(jax.random.PRNGKey(0), toks)

    def loss(params):
        y, mut = enc.apply({"params": params}, toks, mutable=["moe"])
        return jnp.sum(y**2) + 0.01 * sum(
            jax.tree_util.tree_leaves(mut["moe"])
        )

    g = jax.jit(jax.grad(loss))(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # the router participates in the loss
    assert float(jnp.abs(g["layer_0"]["moe_mlp"]["router"]).sum()) > 0


def test_train_step_reports_moe_aux():
    """make_train_step(moe_aux_weight>0) collects the sown aux into the
    loss/metrics; the step stays jittable and finite."""
    import optax

    from valor_tpu.core.tasks import parse_task
    from valor_tpu.models.valor import VALORModel
    from valor_tpu.train.step import TrainState, make_train_step

    cfg = tiny_model_config(fusion_moe_experts=2, fusion_moe_every=2)
    model = VALORModel(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    task = parse_task("pt_contra%tv_caption%tv")
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch, task, True, True,
    )["params"]
    tx = optax.sgd(1e-3)
    step = make_train_step(model, tx, donate=False, moe_aux_weight=0.01)
    state = TrainState.create(params, tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(2), task)
    assert "moe_aux" in metrics
    aux = float(metrics["moe_aux"])
    assert np.isfinite(aux) and aux > 0
    # aux participates in the total
    others = sum(
        float(v) for k, v in metrics.items()
        if k not in ("total_loss", "grad_norm")
    )
    np.testing.assert_allclose(float(metrics["total_loss"]), others, rtol=1e-5)


def test_full_valor_forward_with_moe():
    cfg = tiny_model_config(fusion_moe_experts=2, fusion_moe_every=2)
    batch = make_batch(jax.random.PRNGKey(0))
    out, variables = init_and_apply(
        cfg, batch, "pt_contra%tva%tv%ta_caption%tva"
    )
    assert set(out) == {"contra_loss", "caption_loss"}
    for v in out.values():
        assert np.isfinite(float(v))
    # the standalone text encoder stays dense
    p = variables["params"]
    if "txt_encoder" in p:
        assert not any("moe_mlp" in str(k) for k in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda _: 0, p["txt_encoder"])
        ))
        flat = jax.tree_util.tree_flatten_with_path(p["txt_encoder"])[0]
        assert not any("moe_mlp" in jax.tree_util.keystr(k) for k, _ in flat)
