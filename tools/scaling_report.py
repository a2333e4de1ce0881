"""Static multi-chip scaling report: collective traffic per parallelism config.

With one physical chip, multi-chip configs cannot be *timed* — but the
compiled programs are real: this tool jit-compiles the production train
step over virtual 8-device meshes (one per parallelism strategy mix),
parses the optimized HLO for the XLA collectives GSPMD inserted, and
reports per-step collective bytes by category.  That is the quantity the
ICI roofline is built from (bytes / ICI bandwidth = communication time),
so the table is the designed-for-scaling evidence the bench cannot give.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python tools/scaling_report.py
Writes SCALING.json (and prints a markdown table).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402

COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)
_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "f64": 8,
    "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
    "f8e4m3fn": 1, "f8e5m2": 1,
}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _result_bytes(result_types: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(result_types):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Per-category {count, bytes} for every collective in optimized HLO.

    Bytes = per-device result bytes of the collective op (the payload a
    device receives), the standard unit an ICI roofline multiplies by
    (n-1)/n ring factors."""
    out = {c: {"count": 0, "bytes": 0} for c in COLLECTIVES}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s+(.*?)\s+(" + "|".join(COLLECTIVES) + r")[-\.\(]", line)
        if not m:
            continue
        result_types, op = m.group(1), m.group(2)
        # skip -start/-done duplicates: count the -start only
        if f"{op}-done" in line:
            continue
        out[op]["count"] += 1
        out[op]["bytes"] += _result_bytes(result_types)
    return out


def _reduced_flagship():
    """Flagship widths (768 fusion / B-16 CLIP), reduced depth — the same
    shape recipe the driver dryrun uses (__graft_entry__.py)."""
    from valor_tpu.core.config import ModelConfig

    return dict(
        video_encoder_type="clip_vit_base_16",
        txt_encoder_type="clip_vit_base_16",
        clip_vision_layers=2,
        clip_text_layers=2,
        multimodal_use_cross_attn=True,
        cross_attn_type="va_concate",
        video_resolution=64,
        audio_melbins=32,
        audio_target_length=32,
        audio_layers=2,
        fusion_layers=2,
        fusion_vocab=2048,
        contra_type="fine",
        caption_type="unimlm",
        dtype="float32",
        checkpointing=True,
        remat_scope="vision",
        max_txt_len=8,
        max_generation_len=6,
    ), ModelConfig


CONFIGS = [
    # name, mesh kwargs, model overrides, train overrides
    ("dp8 (reference DDP analogue)", dict(n_data=8), {}, {}),
    ("dp8 + zero1 + fsdp", dict(n_data=8), {}, dict(zero_optimizer=True, fsdp=True)),
    ("dp4 x tp2 + sp", dict(n_data=4, n_model=2), dict(sequence_parallel=True), {}),
    (
        "dp2 x tp2 x pp2 (interleave=2)",
        dict(n_data=2, n_model=2, n_pipe=2),
        dict(
            fusion_layers=4,
            fusion_pipeline_stages=2,
            fusion_pipeline_interleave=2,
        ),
        {},
    ),
]


def main() -> None:
    from valor_tpu.cli.build import build_model_and_state
    from valor_tpu.core.config import Config, TrainConfig
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.parallel.mesh import make_mesh, shard_batch
    from valor_tpu.train.step import make_train_step

    base, ModelConfig = _reduced_flagship()
    task_str = "pt_contra%tva_caption%tva"
    spec = parse_task(task_str)
    results = {}
    for name, mesh_kw, model_kw, train_kw in CONFIGS:
        mesh = make_mesh(devices=jax.devices()[:8], **mesh_kw)
        b = 8
        r = np.random.RandomState(0)
        txt = r.randint(106, 500, size=(b, 8)).astype(np.int32)
        txt[:, 0] = 101
        batch = {
            "bert_tokens": txt,
            "clip_tokens": txt,
            "video_pixels": r.randn(b, 2, 64, 64, 3).astype(np.float32),
            "audio_spectrograms": r.randn(b, 1, 32, 32).astype(np.float32),
        }
        cfg = Config(
            model=ModelConfig(**{**base, **model_kw}),
            train=TrainConfig(
                num_train_steps=1, valid_steps=0, seed=0, **train_kw
            ),
        )
        model, tx, state = build_model_and_state(cfg, {task_str: batch}, mesh=mesh)
        dev_batch = shard_batch(mesh, batch)
        step = make_train_step(model, tx, donate=False)
        lowered = step.lower(state, dev_batch, jax.random.PRNGKey(0), spec)
        hlo = lowered.compile().as_text()
        stats = collective_bytes(hlo)
        total = sum(v["bytes"] for v in stats.values())
        results[name] = {"per_collective": stats, "total_bytes": total}
        print(f"{name}: {total / 1e6:.1f} MB collective payload/step", flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..", "SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)

    # markdown table
    print("\n| config | " + " | ".join(COLLECTIVES) + " | total MB |")
    print("|---" * (len(COLLECTIVES) + 2) + "|")
    for name, res in results.items():
        row = [name] + [
            f"{res['per_collective'][c]['bytes'] / 1e6:.1f} ({res['per_collective'][c]['count']})"
            for c in COLLECTIVES
        ] + [f"{res['total_bytes'] / 1e6:.1f}"]
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
