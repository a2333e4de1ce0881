"""Training entry point.

Usage (mirrors the reference CLI, scripts/*.sh):

    python -m valor_tpu.cli.train --config config/fast-retrieval-msrvtt.json \
        --output_dir out/ret-msrvtt [--flag value ...]

Any flat config key can be overridden on the command line (CLI wins over
JSON, JSON over defaults — reference: utils/misc.py:26-36).  Multi-host
runs call jax.distributed.initialize() when JAX_COORDINATOR_ADDRESS is set;
everything else is identical on every host (single-program SPMD).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict

import jax

from valor_tpu.core.config import Config, config_to_json, load_config
from valor_tpu.core.logging import LOGGER, TB_LOGGER, add_log_to_file, is_main_process
from valor_tpu.core.tasks import parse_task


def parse_cli(argv=None) -> Config:
    parser = argparse.ArgumentParser(description="VALOR-TPU trainer")
    parser.add_argument("--config", type=str, default=None)
    args, unknown = parser.parse_known_args(argv)
    overrides: Dict[str, Any] = {}
    key = None
    for tok in unknown:
        if tok.startswith("--"):
            key = tok[2:]
            overrides[key] = True  # bare flag
        elif key is not None:
            prev = overrides[key]
            if prev is True:
                overrides[key] = _parse_value(tok)
            elif isinstance(prev, list):
                prev.append(_parse_value(tok))
            else:
                overrides[key] = [prev, _parse_value(tok)]
    return load_config(args.config, overrides)


def _parse_value(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return s


def make_validate_fn(cfg: Config, model, tokenizers):
    from valor_tpu.cli.build import build_val_loaders
    from valor_tpu.eval import validate as V
    from valor_tpu.train.step import make_eval_step

    import json as _json

    val_loaders = build_val_loaders(cfg, tokenizers)
    eval_step = make_eval_step(model)
    bert_tok, _ = tokenizers
    out_dir = cfg.train.output_dir or "output"

    def run(params, step: int):
        reports = {}
        for (name, loader, task), flow in zip(val_loaders, cfg.data_val):
            if task.family == "ret":
                reports[name] = V.validate_ret(
                    model, params, eval_step, iter(loader), task,
                    cfg.model.contra_type, cfg.model.dual_softmax,
                    cfg.model.evaluate_ret_text,
                )
            elif task.family == "cap":
                # submission mode has no annotation file (reference sets
                # txt_mapper=None, train_utils.py:448)
                if cfg.train.submit_format or not flow.datasets[0].txt:
                    ann = {}
                else:
                    ann = _json.load(open(flow.datasets[0].txt))
                    ann = {str(k): v if isinstance(v, list) else [v] for k, v in ann.items()}
                reports[name] = V.validate_cap(
                    model, params, iter(loader), task, bert_tok, ann,
                    caption_type=cfg.model.caption_type,
                    max_len=cfg.model.max_generation_len,
                    beam_size=cfg.model.beam_size,
                    result_dir=os.path.join(out_dir, f"results_test_{name}"),
                    step=step,
                    submit_format=cfg.train.submit_format or None,
                )
            elif task.family == "qa":
                ans = _json.load(open(flow.datasets[0].txt))
                reports[name] = V.validate_qa(
                    model, params, iter(loader), task, bert_tok, ans,
                    caption_type=cfg.model.caption_type,
                    max_len=cfg.model.max_generation_len,
                    beam_size=cfg.model.beam_size_qa,
                    result_dir=os.path.join(out_dir, f"results_test_{name}"),
                    step=step,
                    dset_name=name,
                )
            elif task.family == "pt":
                reports[name] = V.validate_pt(
                    model, params, eval_step, iter(loader), task, cfg.model.contra_type
                )
        return reports

    return run


def main(argv=None):
    from valor_tpu.utils.runtime import honor_jax_platforms

    honor_jax_platforms()
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    if os.environ.get("VALOR_DEBUG_NANS"):
        from valor_tpu.utils.profiling import enable_debug

        enable_debug(nan_checks=True)
    cfg = parse_cli(argv)
    if cfg.train.prng_impl:
        # before any key is made; 'rbg' measured +3% step throughput
        # (TrainConfig.prng_impl)
        jax.config.update("jax_default_prng_impl", cfg.train.prng_impl)
    if cfg.train.pretrain_dir:
        from valor_tpu.core.config import inherit_pretrain_config

        inherited = inherit_pretrain_config(cfg)
        if inherited:
            LOGGER.info(f"inherited from pretrain hps.json: {inherited}")
    import random as _random

    _random.seed(cfg.train.seed + jax.process_index())
    out_dir = cfg.train.output_dir or "output"
    if is_main_process():
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "hps.json"), "w") as f:
            f.write(config_to_json(cfg))
        add_log_to_file(os.path.join(out_dir, "log", "train.log"))
        TB_LOGGER.create(os.path.join(out_dir, "tb"))

    from valor_tpu.cli.build import (
        build_model_and_state,
        build_tokenizers,
        build_train_loaders,
    )
    from valor_tpu.train.checkpoints import ModelSaver, adapt_pretrained_params
    from valor_tpu.train.trainer import Trainer

    tokenizers = build_tokenizers(cfg.model)
    meta = build_train_loaders(cfg, tokenizers, seed=cfg.train.seed)
    # one example batch per DISTINCT task so init traces every head the mix
    # will train (flax only creates params the traced task touches)
    example_batches = {}
    host_keys = ("ids", "ids_txt", "sample_num", "answers", "question_ids")
    for name, loader in meta.name2loader.items():
        task_str = name.split("--")[0]
        if task_str in example_batches:
            continue
        idx = next(iter(loader.sampler))
        batch = loader.collate_fn([loader.dataset[i] for i in idx])
        example_batches[task_str] = {
            k: v for k, v in batch.items() if k not in host_keys
        }
    # ... and every VAL task family: a val-only family (e.g. caption eval
    # on a retrieval train config) needs heads/caches the train tasks
    # never traced.  The reference never hits this — torch constructs all
    # submodules unconditionally (modeling.py:283).
    if cfg.data_val:
        from valor_tpu.cli.build import build_dataset, collate_for
        from valor_tpu.core.tasks import parse_task as _pt

        traced_families = {_pt(t).family for t in example_batches}
        for flow in cfg.data_val:
            spec = _pt(flow.task)
            if spec.family in traced_families or flow.task in example_batches:
                continue
            traced_families.add(spec.family)
            ds = build_dataset(flow, cfg.model, tokenizers, training=False)
            collate = collate_for(flow.task, False)
            batch = collate([ds[i] for i in range(min(2, len(ds)))])
            example_batches[flow.task] = {
                k: v for k, v in batch.items() if k not in host_keys
            }

    # device mesh: data-parallel over all chips (the reference's 8-GPU DDP,
    # train_utils.py:232) x optional tensor-parallel `model` axis x optional
    # `pipe` axis for fusion pipeline parallelism (--fusion_pipeline_stages)
    from valor_tpu.parallel.mesh import make_mesh

    n_pipe = max(cfg.model.fusion_pipeline_stages, 1)
    mesh = make_mesh(n_model=max(cfg.train.model_shards, 1), n_pipe=n_pipe)
    LOGGER.info(
        f"mesh: data={mesh.shape['data']} x model={mesh.shape['model']}"
        + (f" x pipe={n_pipe}" if n_pipe > 1 else "")
        + f" ({jax.process_count()} hosts)"
    )
    model, tx, state = build_model_and_state(cfg, example_batches, mesh=mesh)

    saver = ModelSaver(
        out_dir, cfg.train.remove_before_ckpt, use_async=cfg.train.async_checkpoint
    )
    if cfg.train.resume:
        restored = saver.restore(state)
        if restored:
            from valor_tpu.train.step import TrainState

            # micro_step is TrainState's per-micro-batch counter; the
            # checkpoint's name ("step") counts optimizer updates
            micro = restored.get("micro_step") or restored["step"]
            state = TrainState(
                step=jax.numpy.asarray(micro),
                params=restored["params"],
                opt_state=restored["opt_state"],
            )
    elif cfg.train.checkpoint or cfg.train.pretrain_dir:
        import numpy as np

        path = cfg.train.checkpoint
        from valor_tpu.parallel.partition import shard_params

        if cfg.train.pretrain_dir:
            sub = ModelSaver(cfg.train.pretrain_dir, remove_before_ckpt=False)
            # --pretrain_step selects a specific checkpoint instead of the
            # latest (reference train_utils.py:120-121)
            restored = sub.restore(state, step=cfg.train.pretrain_step)
            if restored:
                params = adapt_pretrained_params(restored["params"], state.params)
                state = state.replace(params=shard_params(params, mesh))
        elif path and os.path.isdir(path):
            # one of our own run dirs (orbax): restore latest params
            sub = ModelSaver(path, remove_before_ckpt=False)
            restored = sub.restore(state)
            if restored:
                params = adapt_pretrained_params(restored["params"], state.params)
                state = state.replace(params=shard_params(params, mesh))
        elif path and os.path.exists(path):
            # a torch artifact: full VALOR .pt / CLIP jit archive / bert
            # bin / videoswin / ast — converted by key inspection
            from valor_tpu.models.convert import load_converted

            params = adapt_pretrained_params(
                load_converted(path, resolution=cfg.model.video_resolution),
                state.params,
            )
            state = state.replace(params=shard_params(params, mesh))

    validate_fn = make_validate_fn(cfg, model, tokenizers) if cfg.data_val else None
    if cfg.train.zero_shot:
        if validate_fn:
            reports = validate_fn(state.params, 0)
            for name, rep in reports.items():
                LOGGER.info(f"zero-shot {name}: {rep}")
        return
    if cfg.train.first_eval and validate_fn:
        reports = validate_fn(state.params, 0)
        for name, rep in reports.items():
            LOGGER.info(f"first-eval {name}: {rep}")

    scorer = None
    if cfg.model.scst_finetuning:
        import json as _json

        from valor_tpu.eval.scorer import Scorer

        flow = cfg.data_train[0]
        ids = _json.load(open(flow.datasets[0].ids_path))
        scorer = Scorer(flow.datasets[0].txt, ids, tokenizers[0])

    trainer = Trainer(
        cfg, model, tx, state, meta,
        validate_fn=validate_fn, saver=saver, scorer=scorer,
        mesh=mesh, prefetch=cfg.train.prefetch,
    )
    trainer.run()


if __name__ == "__main__":
    main()
