"""Full-size dress rehearsal for released-weight parity (VERDICT r3 #1).

The public VALOR checkpoints (reference README.md:53-60 model zoo) do not
exist in this environment, so accuracy parity cannot be measured — but
nothing else should stand between "weights appear" and "parity number
printed".  This tool retires the remaining *scale* risk today by walking
the exact path a released checkpoint would take, at full VALOR-base
dimensions:

  1. synth    — instantiate the reference's own torch ``VALOR`` class
                (/root/reference/model/pretrain.py:64) at FULL base dims
                (CLIP-B/16 12+12 layers, 12-layer BERT fusion, 30522
                vocab, 12-layer AST at AudioSet 64x512 shapes) with random
                init, and ``torch.save`` its ``state_dict()`` — i.e. a
                synthetic released checkpoint with the real key layout
                produced by the real reference constructor
                (model/modeling.py:560-683 load path).
  2. convert  — ``convert_valor_full`` on that .pt -> full flax param
                tree, serialized; peak RSS recorded (the converter holds
                torch + numpy copies — the number proves a real
                checkpoint converts on a normal host).
  3. eval     — on the real chip: default (full-base) ``ModelConfig``,
                converted params, one REAL ``validate_ret`` pass (3
                batches x 8 items, 8-frame test sampling at 224px, audio
                512x64, i.e. true MSR-VTT-style eval shapes) and one
                REAL ``validate_cap`` beam-search pass through
                ``eval/generate.py`` — the same functions the production
                CLI drives (cli/train.py:72-113).  HBM stats + wall
                times recorded; all outputs asserted finite.

Each phase runs in its own subprocess so ru_maxrss is attributable.
Writes DRESS_REHEARSAL.json at the repo root.  Recipe for the day real
weights land: replace the synth phase's .pt with the released file and
point ``--ckpt`` at it; phases 2-3 are unchanged (see README).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RES = 224
MELS, AUDIO_LEN = 64, 512
N_FRAMES_TEST = 8  # reference ret finetune test sampling (scripts/finetune_ret.sh)
BATCH = 8
GALLERY_BATCHES = 3


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


# ---------------------------------------------------------------------------
# phase 1: synthesize a released-layout checkpoint at full dims
# ---------------------------------------------------------------------------


def _full_clip_sd(rng, torch):
    """Full CLIP-B/16 jit-archive state dict: 12-layer width-768 vision
    (patch 16, grid 14 at 224px), 12-layer width-512 text, vocab 49408 —
    the exact tensor inventory of the released ViT-B-16.pt archive that
    load_clip_model consumes (reference model/clip.py:470-527)."""
    import numpy as np

    vw, tw, embed, patch, grid = 768, 512, 512, 16, RES // 16

    def t(*shape, scale=0.02):
        return torch.from_numpy((rng.randn(*shape) * scale).astype(np.float32))

    def ln(prefix, w):
        return {f"{prefix}.weight": 1.0 + t(w), f"{prefix}.bias": t(w)}

    sd = {
        "visual.conv1.weight": t(vw, 3, patch, patch),
        "visual.class_embedding": t(vw),
        "visual.positional_embedding": t(grid * grid + 1, vw),
        "visual.proj": t(vw, embed),
        "token_embedding.weight": t(49408, tw),
        "positional_embedding": t(77, tw),
        "text_projection": t(tw, embed),
        "logit_scale": torch.tensor(float(__import__("numpy").log(1.0 / 0.07))),
    }
    sd.update(ln("visual.ln_pre", vw))
    sd.update(ln("visual.ln_post", vw))
    sd.update(ln("ln_final", tw))
    for tower, w, layers in (("visual.transformer", vw, 12), ("transformer", tw, 12)):
        for i in range(layers):
            p = f"{tower}.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = t(3 * w, w)
            sd[f"{p}.attn.in_proj_bias"] = t(3 * w)
            sd[f"{p}.attn.out_proj.weight"] = t(w, w)
            sd[f"{p}.attn.out_proj.bias"] = t(w)
            sd.update(ln(f"{p}.ln_1", w))
            sd.update(ln(f"{p}.ln_2", w))
            sd[f"{p}.mlp.c_fc.weight"] = t(4 * w, w)
            sd[f"{p}.mlp.c_fc.bias"] = t(4 * w)
            sd[f"{p}.mlp.c_proj.weight"] = t(w, 4 * w)
            sd[f"{p}.mlp.c_proj.bias"] = t(w)
    return sd


FULL_BERT_CONFIG = {
    "attention_probs_dropout_prob": 0.1,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 768,
    "initializer_range": 0.02,
    "intermediate_size": 3072,
    "max_position_embeddings": 512,
    "num_attention_heads": 12,
    "num_hidden_layers": 12,
    "type_vocab_size": 2,
    "vocab_size": 30522,
}


def phase_synth(workdir: str) -> None:
    import types

    import numpy as np
    import torch

    from tests.test_golden_fullmodel import (  # noqa: E402
        _fake_bert_bin,
        _install_reference_stubs,
        _ref_opts,
    )

    _install_reference_stubs()
    os.makedirs(workdir, exist_ok=True)
    pw = os.path.join(workdir, "pretrained_weights")
    os.makedirs(pw, exist_ok=True)
    with open(os.path.join(pw, "bert_base_uncased_config.json"), "w") as f:
        json.dump(FULL_BERT_CONFIG, f)
    vocab = (
        ["[PAD]"] + [f"unused{i}" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"tok{i}" for i in range(30522 - 104)]
    )
    with open(os.path.join(pw, "bert-base-uncased-vocab.txt"), "w") as f:
        f.write("\n".join(vocab))

    rng = np.random.RandomState(0)
    clip_sd = _full_clip_sd(rng, torch)
    bert_bin = _fake_bert_bin(rng)

    real_torch_load = torch.load

    def fake_torch_load(path, *a, **k):
        if os.path.basename(str(path)) == "bert-base-uncased.bin":
            return {k2: v.clone() for k2, v in bert_bin.items()}
        return real_torch_load(path, *a, **k)

    torch.load = fake_torch_load
    torch.jit.load = lambda path, *a, **k: types.SimpleNamespace(
        state_dict=lambda: {k2: v.clone() for k2, v in clip_sd.items()}
    )
    torch.Tensor.cuda = lambda self, *a, **k: self

    import importlib

    modeling = importlib.import_module("model.modeling")
    pretrain = importlib.import_module("model.pretrain")
    # the AudioSet artifact is absent; a random-init AST is equivalent for
    # a synthetic checkpoint (the released file carries the final state)
    modeling.VALORModel.initialize_audio_weights = lambda self: None

    opts = _ref_opts()
    opts.video_resolution = RES
    opts.audio_melbins = MELS
    opts.audio_target_length = AUDIO_LEN
    opts.max_generation_len = 30
    opts.beam_size = 3
    opts.contra_dim = 512

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        torch.manual_seed(0)
        t0 = time.time()
        ref = pretrain.VALOR(opts).float().eval()
        build_s = time.time() - t0
    finally:
        os.chdir(cwd)

    sd = ref.state_dict()
    n_params = sum(int(v.numel()) for v in sd.values())
    out = os.path.join(workdir, "valor_base_synthetic.pt")
    torch.save(sd, out)
    print(
        json.dumps(
            {
                "phase": "synth",
                "ckpt": out,
                "n_tensors": len(sd),
                "n_params": n_params,
                "ckpt_bytes": os.path.getsize(out),
                "build_seconds": round(build_s, 1),
                "peak_rss_gb": round(_rss_gb(), 2),
            }
        )
    )


# ---------------------------------------------------------------------------
# phase 2: convert
# ---------------------------------------------------------------------------


def phase_convert(workdir: str, ckpt: str) -> None:
    # torch import (inside _load_torch) + numpy copies are the RSS story
    from flax import serialization

    from valor_tpu.models.convert import convert_valor_full

    t0 = time.time()
    params = convert_valor_full(ckpt, resolution=RES)
    convert_s = time.time() - t0
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(int(x.size) for x in leaves)
    out = os.path.join(workdir, "converted.msgpack")
    with open(out, "w+b") as f:
        f.write(serialization.to_bytes(params))
    print(
        json.dumps(
            {
                "phase": "convert",
                "out": out,
                "n_leaves": len(leaves),
                "n_params": n_params,
                "convert_seconds": round(convert_s, 1),
                "peak_rss_gb": round(_rss_gb(), 2),
            }
        )
    )


# ---------------------------------------------------------------------------
# phase 3: real-chip eval at true shapes
# ---------------------------------------------------------------------------


def _eval_batches(task: str, with_ids: bool):
    """True-shape synthetic eval batches (the mappers' output contract:
    data/pipeline.py collate — uint8-decoded frames already normalized,
    mel spectrograms, padded bert/clip tokens)."""
    import numpy as np

    for b in range(GALLERY_BATCHES if task == "ret" else 1):
        r = np.random.RandomState(100 + b)
        txt = r.randint(106, 30000, size=(BATCH, 30)).astype(np.int32)
        txt[:, 0] = 101
        batch = {
            "bert_tokens": txt,
            "clip_tokens": txt,
            "video_pixels": r.randn(BATCH, N_FRAMES_TEST, RES, RES, 3).astype(
                np.float32
            ),
            "audio_spectrograms": r.randn(BATCH, 1, MELS, AUDIO_LEN).astype(
                np.float32
            ),
        }
        if with_ids:
            batch["ids"] = [f"video{b * BATCH + i}" for i in range(BATCH)]
            batch["ids_txt"] = list(batch["ids"])
        yield batch


def phase_eval(workdir: str) -> None:
    import numpy as np

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    from flax import serialization

    from valor_tpu.core.config import ModelConfig
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.eval import validate as V
    from valor_tpu.models.valor import VALORModel
    from valor_tpu.train.step import make_eval_step

    cfg = ModelConfig(  # full VALOR-base: every dim is the default
        contra_type="fine",
        caption_type="unimlm",
        multimodal_use_cross_attn=True,
        cross_attn_type="va_concate",
        video_resolution=RES,
        audio_melbins=MELS,
        audio_target_length=AUDIO_LEN,
        dtype="bfloat16",
        max_generation_len=30,
        beam_size=3,
    )
    model = VALORModel(cfg)

    # restore the converted tree structurally (no target init needed);
    # model.apply fails loudly on any key the converter missed — that
    # strictness IS the rehearsal signal
    ret_task = parse_task("ret%tva")
    with open(os.path.join(workdir, "converted.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    params = jax.device_put(params)
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    dev = jax.local_devices()[0]

    def hbm_gb():
        # memory_stats() returns nothing on some runtimes (e.g. the
        # tunneled remote backend) — record "unavailable" rather than a
        # dead 0.0 gauge (VERDICT round-4 weak #5)
        stats = dev.memory_stats() or {}
        if "bytes_in_use" not in stats:
            return "unavailable"
        return round(stats["bytes_in_use"] / 2**30, 2)

    report = {
        "phase": "eval",
        "platform": dev.platform,
        "device": str(dev.device_kind),
        "n_params": n_params,
        "batch": BATCH,
        "n_frames_test": N_FRAMES_TEST,
        "resolution": RES,
        "audio": [MELS, AUDIO_LEN],
        "hbm_gb_after_params": hbm_gb(),
    }

    # --- retrieval: the real validate_ret over a 24-item gallery --------
    eval_step = make_eval_step(model)
    t0 = time.time()
    ret = V.validate_ret(
        model,
        params,
        eval_step,
        _eval_batches("ret", with_ids=True),
        ret_task,
        cfg.contra_type,
    )
    report["ret_seconds"] = round(time.time() - t0, 1)
    report["hbm_gb_after_ret"] = hbm_gb()
    assert all(np.isfinite(v) for v in ret.values()), ret
    report["ret"] = {k: round(float(v), 4) for k, v in ret.items()}

    # --- caption: the real validate_cap (beam search, full decode) ------
    from valor_tpu.data.tokenizers.wordpiece import BertTokenizer

    tok = BertTokenizer(
        os.path.join(workdir, "pretrained_weights", "bert-base-uncased-vocab.txt")
    )
    ann = {
        f"video{i}": ["a synthetic reference caption"] for i in range(BATCH)
    }
    cap_task = parse_task("cap%tva")
    t0 = time.time()
    cap = V.validate_cap(
        model,
        params,
        _eval_batches("cap", with_ids=True),
        cap_task,
        tok,
        ann,
        caption_type=cfg.caption_type,
        max_len=cfg.max_generation_len,
        beam_size=cfg.beam_size,
    )
    report["cap_seconds"] = round(time.time() - t0, 1)
    report["hbm_gb_after_cap"] = hbm_gb()
    assert all(np.isfinite(v) for v in cap.values()), cap
    report["cap"] = {k: round(float(v), 4) for k, v in cap.items()}
    report["peak_rss_gb"] = round(_rss_gb(), 2)
    print(json.dumps(report))


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["synth", "convert", "eval"], default=None)
    ap.add_argument("--workdir", default="/tmp/valor_dress_rehearsal")
    ap.add_argument(
        "--ckpt",
        default=None,
        help="existing checkpoint .pt (skips synth; use for REAL released weights)",
    )
    args = ap.parse_args()

    if args.phase == "synth":
        return phase_synth(args.workdir)
    if args.phase == "convert":
        return phase_convert(
            args.workdir,
            args.ckpt or os.path.join(args.workdir, "valor_base_synthetic.pt"),
        )
    if args.phase == "eval":
        return phase_eval(args.workdir)

    # parent: run phases in subprocesses so each peak RSS is attributable
    results = {}
    phases = ["convert", "eval"] if args.ckpt else ["synth", "convert", "eval"]
    for phase in phases:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase,
               "--workdir", args.workdir]
        if args.ckpt and phase == "convert":
            cmd += ["--ckpt", args.ckpt]
        env = dict(os.environ)
        if phase != "eval":
            env["JAX_PLATFORMS"] = "cpu"  # host-only phases stay off the chip
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        wall = round(time.time() - t0, 1)
        tail = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not tail:
            print(proc.stdout[-4000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"phase {phase} failed (rc={proc.returncode})")
        results[phase] = json.loads(tail[-1])
        results[phase]["wall_seconds"] = wall
        print(f"[{phase}] ok in {wall}s: {tail[-1][:200]}")
    out = os.path.join(REPO, "DRESS_REHEARSAL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
