"""Single-video inference CLI.

    python -m valor_tpu.cli.infer --video_path x.mp4 --task cap%tva \
        --config hps.json --checkpoint ckpt_dir

Equivalent of the reference's inference.py:19-321: extract frames (1 fps)
and a mono wav via ffmpeg, build a one-item batch, run generation, print.
ffmpeg must be on PATH (same requirement as the reference).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from valor_tpu.core.logging import LOGGER


def extract_frames_and_wav(video_path: str, out_dir: str, fps: int = 1) -> None:
    frames_dir = os.path.join(out_dir, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
         "-vf", f"fps={fps}", os.path.join(frames_dir, "img_%04d.jpg")],
        check=True,
    )
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
         "-ac", "1", "-ar", "22050", os.path.join(out_dir, "audio.wav")],
        check=False,  # silent videos are fine (zero spectrogram)
    )


def main(argv=None):
    from valor_tpu.utils.runtime import honor_jax_platforms

    honor_jax_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_path", default=None)
    parser.add_argument("--image_path", default=None)
    parser.add_argument("--task", default="cap%tva")
    parser.add_argument("--question", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--video_sample_num", type=int, default=8)
    parser.add_argument("--audio_sample_num", type=int, default=2)
    parser.add_argument("--beam_size", type=int, default=3)
    args = parser.parse_args(argv)

    import jax

    from valor_tpu.cli.build import build_tokenizers
    from valor_tpu.core.config import load_config
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.data.pipeline import AudioMapper, VideoMapper
    from valor_tpu.eval import generate as gen
    from valor_tpu.eval.validate import decode_sequence
    from valor_tpu.models.valor import VALORModel

    cfg = load_config(args.config)
    spec = parse_task(args.task)
    tokenizers = build_tokenizers(cfg.model)
    bert_tok, _ = tokenizers

    if args.image_path:
        vm = VideoMapper(
            os.path.dirname(os.path.abspath(args.image_path)) or ".",
            resolution=cfg.model.video_resolution,
            sample_num=1,
            datatype="image",
            encoder_type=cfg.model.video_encoder_type,
            training=False,
        )
        video = vm[os.path.basename(args.image_path)]
        audio = np.zeros(
            (args.audio_sample_num, cfg.model.audio_melbins, cfg.model.audio_target_length),
            np.float32,
        )
    else:
        assert args.video_path, "--video_path or --image_path required"
        with tempfile.TemporaryDirectory() as tmp:
            extract_frames_and_wav(args.video_path, tmp)
            vm = VideoMapper(
                os.path.join(tmp),
                resolution=cfg.model.video_resolution,
                sample_num=args.video_sample_num,
                datatype="video",
                encoder_type=cfg.model.video_encoder_type,
                training=False,
            )
            video = vm["frames"]
            am = AudioMapper(
                tmp,
                sample_num=args.audio_sample_num,
                melbins=cfg.model.audio_melbins,
                target_length=cfg.model.audio_target_length,
                training=False,
            )
            audio = am["audio"]

    batch = {
        "video_pixels": video[None].astype(np.float32),
        "audio_spectrograms": audio[None].astype(np.float32),
    }
    if args.question:
        q = bert_tok.encode(args.question)
        q = [bert_tok.cls_token_id] + q + [bert_tok.sep_token_id]
        batch["question_prompt"] = np.asarray(q, np.int32)[None]

    model = VALORModel(cfg.model)
    # init with compute_loss=True: the loss-free forward returns before the
    # fusion decoder runs (models/valor.py forward_cap/forward_qa), so a
    # compute_loss=False init would create NO fusion/decoder params and the
    # checkpoint restore below would silently drop them from its template —
    # generation then dies with ScopeParamNotFoundError.  The loss path
    # additionally needs text tokens; a [1,2] CLS/SEP row suffices for
    # shape-free param creation.
    init_batch = dict(batch)
    tok_row = np.asarray([[101, 102]], np.int32)
    init_batch.setdefault("bert_tokens", tok_row)
    init_batch.setdefault("clip_tokens", tok_row)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        init_batch,
        spec,
        True,
        False,
    )["params"]
    if args.checkpoint:
        from valor_tpu.train.checkpoints import ModelSaver, adapt_pretrained_params
        from valor_tpu.train.step import TrainState

        saver = ModelSaver(args.checkpoint, remove_before_ckpt=False)

        class _S:  # restore needs a template with params/opt_state
            pass

        tmpl = _S()
        tmpl.params = params
        tmpl.opt_state = {}
        restored = saver.restore(tmpl)
        if restored:
            params = adapt_pretrained_params(restored["params"], params)

    out = gen.generate(
        model,
        params,
        batch,
        spec.caption_groups,
        caption_type=cfg.model.caption_type,
        max_len=cfg.model.max_generation_len,
        beam_size=args.beam_size,
    )
    for g in spec.caption_groups:
        seq = np.asarray(out[f"generated_sequences_{g}"])[0]
        print(f"[{g}] {decode_sequence(bert_tok, seq)}")


if __name__ == "__main__":
    main()
