"""Shared builders: config -> tokenizers, datasets, loaders, model, state.

This is the equivalent of the reference's train_utils.py glue
(create_train_dataloaders :415-516, create_val_dataloaders :519-576,
set_parallel_optimizer_and_apex :211-243) for the TPU stack.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from valor_tpu.core.config import Config, DataFlowConfig, ModelConfig
from valor_tpu.core.logging import LOGGER
from valor_tpu.core.tasks import parse_task
from valor_tpu.data.loader import DataLoader, MetaLoader, ShardedBatchSampler
from valor_tpu.data.pipeline import AudioMapper, TxtMapper, VALORDataset, VideoMapper, valor_collate
from valor_tpu.models.valor import VALORModel

DEFAULT_BERT_VOCAB = os.environ.get(
    "VALOR_BERT_VOCAB", "pretrained_weights/bert-base-uncased-vocab.txt"
)
DEFAULT_CLIP_BPE = os.environ.get(
    "VALOR_CLIP_BPE", "pretrained_weights/bpe_simple_vocab_16e6.txt.gz"
)


def build_tokenizers(cfg: ModelConfig):
    """(bert_tokenizer | None, clip_tokenizer | None) per encoder types."""
    bert_tok = clip_tok = None
    needs_bert = cfg.txt_encoder_type.startswith("bert") or cfg.multimodal_encoder_type.startswith("bert")
    needs_clip = cfg.txt_encoder_type.startswith("clip") or cfg.multimodal_encoder_type.startswith("clip")
    if needs_bert:
        from valor_tpu.data.tokenizers.wordpiece import BertTokenizer

        bert_tok = BertTokenizer(DEFAULT_BERT_VOCAB)
    if needs_clip:
        from valor_tpu.data.tokenizers.clip_bpe import ClipBPETokenizer

        clip_tok = ClipBPETokenizer(DEFAULT_CLIP_BPE)
    return bert_tok, clip_tok


def build_dataset(
    flow: DataFlowConfig, mcfg: ModelConfig, tokenizers, training: bool
) -> VALORDataset:
    bert_tok, clip_tok = tokenizers
    ds = flow.datasets[0]
    spec = parse_task(flow.task)
    if spec.family == "qa":
        from valor_tpu.data.vqa import QATxtMapper

        txt_mapper = QATxtMapper(ds.txt, flow.max_txt_len, bert_tok, clip_tok, training)
    else:
        txt_mapper = (
            TxtMapper(ds.txt, flow.max_txt_len, bert_tok, clip_tok, training)
            if ds.txt
            else None
        )
    video_mapper = (
        VideoMapper(
            ds.video,
            resolution=mcfg.video_resolution,
            sample_num=flow.video_sample_num if ds.datatype.startswith("video") else 1,
            datatype=ds.datatype,
            transforms=ds.video_transforms,
            encoder_type=mcfg.video_encoder_type,
            training=training,
            output_uint8=mcfg.uint8_pixels,
        )
        if ds.video and spec.uses_video
        else None
    )
    audio_mapper = (
        AudioMapper(
            ds.audio,
            sample_num=flow.audio_sample_num,
            melbins=mcfg.audio_melbins,
            target_length=mcfg.audio_target_length,
            frame_shift_ms=mcfg.audio_frame_shift,
            mean=mcfg.audio_mean,
            std=mcfg.audio_std,
            training=training,
            device_fbank=mcfg.device_fbank,
        )
        if ds.audio and spec.uses_audio
        else None
    )
    if spec.family == "qa":
        from valor_tpu.data.vqa import VALORQADataset

        return VALORQADataset(ds.ids_path, txt_mapper, video_mapper, audio_mapper, training)
    return VALORDataset(ds.ids_path, txt_mapper, video_mapper, audio_mapper, training)


def collate_for(task: str, training: bool):
    spec = parse_task(task)
    if spec.family == "qa":
        from valor_tpu.data.vqa import valorqa_collate_test, valorqa_collate_train

        return valorqa_collate_train if training else valorqa_collate_test
    return valor_collate


def build_train_loaders(cfg: Config, tokenizers, seed: int = 0) -> MetaLoader:
    from valor_tpu.data.prompts import maybe_prompt_table, prompted_collate

    loaders: Dict[str, Tuple[Any, int]] = {}
    n_hosts = jax.process_count()
    host = jax.process_index()
    prompts = maybe_prompt_table(cfg.model, tokenizers)
    for i, flow in enumerate(cfg.data_train):
        dataset = build_dataset(flow, cfg.model, tokenizers, training=True)
        sampler = ShardedBatchSampler(
            len(dataset),
            batch_size=max(flow.batch_size // n_hosts, 1),
            shard=host,
            n_shards=n_hosts,
            shuffle=True,
            seed=seed,
        )
        collate = prompted_collate(
            collate_for(flow.task, True), prompts, parse_task(flow.task)
        )
        loader = DataLoader(dataset, sampler, collate, n_workers=max(flow.n_workers, 1))
        name = f"{flow.task}--{flow.datasets[0].name or i}"
        loaders[name] = (loader, max(flow.epoch, 1))
        LOGGER.info(
            f"train flow {name}: {len(dataset)} items, batch {flow.batch_size}, ratio {flow.epoch}"
        )
    return MetaLoader(
        loaders,
        accum_steps=cfg.train.gradient_accumulation_steps,
        seed=cfg.train.seed,
        mix_type=cfg.train.dataset_mix_type,
    )


def build_val_loaders(cfg: Config, tokenizers) -> List[Tuple[str, DataLoader, Any]]:
    from valor_tpu.data.prompts import maybe_prompt_table, prompted_collate

    out = []
    prompts = maybe_prompt_table(cfg.model, tokenizers)
    for i, flow in enumerate(cfg.data_val):
        dataset = build_dataset(flow, cfg.model, tokenizers, training=False)
        sampler = ShardedBatchSampler(
            len(dataset),
            batch_size=flow.batch_size,
            shard=jax.process_index(),
            n_shards=jax.process_count(),
            shuffle=False,
        )
        collate = prompted_collate(
            collate_for(flow.task, False), prompts, parse_task(flow.task)
        )
        loader = DataLoader(dataset, sampler, collate, n_workers=max(flow.n_workers, 1))
        name = flow.name or (flow.datasets[0].name if flow.datasets else str(i))
        out.append((name, loader, parse_task(flow.task)))
    return out


# public-checkpoint filenames the reference hardcodes
# (model/modeling.py:514,560-598,621)
_CLIP_WEIGHTS = {
    "clip_vit_base_16": "clip-vit-base-16.pt",
    "clip_vit_base_32": "clip-vit-base-32.pt",
    "clip_vit_large_14": "clip-vit-large-14.pt",
    "clip_vit_large_14_336": "clip-vit-large-14-336px.pt",
}
_SWIN_WEIGHTS = {
    "videoswin": "ckpt_video-swin.pt",
    "videoswin_base_k400_1k": "videoswin_base_k400_1k.pth",
    "videoswin_base_k400_22k": "videoswin_base_k400_22k.pth",
    "videoswin_base_k600_22k": "videoswin_base_k600_22k.pth",
}
_AST_WEIGHTS = "audioset_10_10_0.4593.pth"
_BERT_WEIGHTS = "bert-base-uncased.bin"


def initialize_encoder_weights(mcfg: ModelConfig, params):
    """Load public encoder checkpoints at model construction.

    ``initial_vision`` gates CLIP/VideoSwin (+AST) init and
    ``initial_multimodal`` gates BERT (+cls head) init — reference:
    model/modeling.py:560-660 (its `initial_vision` flag is parsed but
    never read, train_utils.py:656; here it gates as evidently intended).
    Weight files are looked up under $VALOR_PRETRAINED_DIR (default
    ``pretrained_weights/``); missing files are skipped with a log line so
    random-init runs (tests, ablations) proceed.
    """
    import valor_tpu.models.convert as C
    from valor_tpu.train.checkpoints import adapt_pretrained_params

    pdir = os.environ.get("VALOR_PRETRAINED_DIR", "pretrained_weights")

    def path_of(fname):
        p = os.path.join(pdir, fname)
        return p if fname and os.path.exists(p) else None

    trees = []
    if mcfg.initial_vision:
        if mcfg.video_encoder_type.startswith("clip") or mcfg.txt_encoder_type.startswith("clip"):
            name = mcfg.video_encoder_type if mcfg.video_encoder_type.startswith("clip") else mcfg.txt_encoder_type
            p = path_of(_CLIP_WEIGHTS.get(name, ""))
            if p:
                trees.append(("clip", C.convert_clip(p, resolution=mcfg.video_resolution)))
        if mcfg.video_encoder_type.startswith("videoswin"):
            p = path_of(_SWIN_WEIGHTS.get(mcfg.video_encoder_type, ""))
            if p:
                trees.append(("videoswin", C.convert_videoswin(p)))
        p = path_of(_AST_WEIGHTS)
        if p:
            trees.append(
                (
                    "ast",
                    C.convert_ast(
                        p,
                        melbins=mcfg.audio_melbins,
                        target_length=mcfg.audio_target_length,
                        patch=mcfg.audio_patch_size,
                    ),
                )
            )
    if mcfg.initial_multimodal:
        p = path_of(_BERT_WEIGHTS)
        if p:
            trees.append(("bert", C.convert_bert(p)))
    for name, tree in trees:
        LOGGER.info(f"initialising {name} from {pdir}")
        params = adapt_pretrained_params(tree, params)
    if not trees:
        LOGGER.info(
            f"no public encoder weights under {pdir!r}; encoders random-init"
        )
    return params


def _merge_params(base: Dict[str, Any], extra: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge two flax param dicts (same-seed inits agree on shared
    leaves; the merge only adds modules the first task never traced)."""
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge_params(out[k], v)
        else:
            out.setdefault(k, v)
    return out


def build_model_and_state(cfg: Config, example_batches, mesh=None):
    """example_batches: {task_str: device_batch} — one per distinct train
    task.  The reference constructs every submodule unconditionally
    (torch nn.Module __init__); flax init only creates params the traced
    task touches, so a multi-task mix must init over EVERY task and merge
    (same seed -> identical shared params, plus each task's own heads).

    With a `mesh`, params are placed with tensor-parallel PartitionSpecs
    (replication when mesh model=1) BEFORE the optimizer init so the adam
    moments inherit the same shardings."""
    from valor_tpu.train.optimizer import build_optimizer
    from valor_tpu.train.step import TrainState

    # compute-policy switches, set before the first trace: einsum is the
    # measured-faster attention at VALOR sequence lengths (PERF_NOTES.md);
    # remat_policy selects the jax.checkpoint save-list
    from valor_tpu.ops.layers import (
        set_attention_layout,
        set_gelu_stash_dtype,
        set_remat_policy,
        set_scores_dtype,
    )

    set_remat_policy(cfg.model.remat_policy)
    set_scores_dtype(cfg.model.attention_logits_dtype)
    set_gelu_stash_dtype(cfg.model.gelu_stash_dtype)
    set_attention_layout(cfg.model.attention_layout)
    from valor_tpu.parallel.activations import set_sequence_sharding

    set_sequence_sharding(mesh if cfg.model.sequence_parallel else None)
    from valor_tpu.ops.moe import set_expert_sharding

    # EP rides the model axis; a no-op when MoE is off or model=1
    set_expert_sharding(mesh if cfg.model.fusion_moe_experts > 0 else None)
    from valor_tpu.parallel.pipeline import set_pipeline

    # PP rides the pipe axis (make_mesh(n_pipe=...)); the fusion encoder
    # routes its layer stack through the GPipe program when engaged
    set_pipeline(
        mesh if cfg.model.fusion_pipeline_stages > 0 else None,
        cfg.model.fusion_pipeline_microbatches,
    )

    model = VALORModel(cfg.model)
    if isinstance(example_batches, dict) and example_batches and all(
        isinstance(v, dict) for v in example_batches.values()
    ):
        items = list(example_batches.items())
    else:  # single example batch (tests / single-task callers)
        task0 = cfg.data_train[0].task if cfg.data_train else "ret%tv"
        items = [(task0, example_batches)]
    params: Dict[str, Any] = {}
    for task_str, ex in items:
        # jit the init: eager flax init dispatches thousands of tiny ops
        # one at a time (minutes through a remote runtime); one compiled
        # program runs in seconds and lands in the persistent cache.
        spec = parse_task(task_str)
        p = jax.jit(
            lambda rngs, ex=ex, spec=spec: model.init(rngs, ex, spec, True, True)
        )(
            {"params": jax.random.PRNGKey(cfg.train.seed), "mask": jax.random.PRNGKey(1)}
        )["params"]
        params = _merge_params(params, p) if params else p
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    LOGGER.info(f"model has {n_params / 1e6:.1f}M params")
    params = initialize_encoder_weights(cfg.model, params)
    if mesh is not None:
        from valor_tpu.parallel.partition import shard_params

        params = shard_params(params, mesh, fsdp=cfg.train.fsdp)
    tx = build_optimizer(
        params,
        cfg.train,
        frozen_vision=cfg.model.frozen_vision,
        frozen_multimodal=cfg.model.frozen_multimodal,
    )
    state = TrainState.create(params, tx)
    if mesh is not None and cfg.train.zero_optimizer:
        from valor_tpu.parallel.partition import shard_opt_state

        state = state.replace(
            opt_state=shard_opt_state(state.opt_state, state.params, mesh)
        )
    return model, tx, state
