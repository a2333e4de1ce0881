"""HTTP serving frontend: dynamic-batching caption/QA inference.

    python -m valor_tpu.cli.serve --config hps.json --checkpoint ckpt_dir \
        --task cap%tva --port 8000 --bucket 16 --max_wait_ms 25

The reference has no serving stack — its `inference.py:19-321` handles one
video per process invocation.  This server keeps the model resident and
coalesces concurrent requests into padded fixed-bucket batches
(valor_tpu/serve/engine.py), so throughput tracks the chip's batched decode
rate (~156 captions/s/chip at bucket 64) instead of the single-request
rate (~2.4/s), while `max_wait_ms` bounds the batching latency added to
any request.

Endpoints (JSON in/out):
  GET  /healthz    -> {"ok": true}
  GET  /stats      -> engine counters + latency percentiles + program cache
  POST /generate   -> {"video_path": ...} | {"image_path": ...}
                      [+ "question", "group", "max_len", "beam_size"]
                      -> {"text": ..., "latency_s": ..., "batch_size": ...}

Media arrive as server-local paths (the deployment pairs this process with
an object-store mount or an upstream fetcher); featurization (ffmpeg frame
/wav extraction + the production mappers) runs on the HTTP thread so the
device worker never blocks on IO.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Optional

import numpy as np

from valor_tpu.core.logging import LOGGER

FeaturizeFn = Callable[[Dict[str, Any]], Dict[str, np.ndarray]]
DecodeFn = Callable[[np.ndarray], str]


def make_handler(engine, featurize: FeaturizeFn, decode: DecodeFn,
                 *, request_timeout_s: float = 300.0,
                 max_body_bytes: int = 1 << 20):
    """Build the request-handler class around an engine + codecs.

    Split from ``main`` so tests can mount a tiny model and a fake
    featurizer without checkpoints or ffmpeg.

    Error contract: client mistakes (bad JSON, unknown fields, wrong
    shapes) are 400; oversized bodies 413; engine admission shed 503;
    a request that exceeds ``request_timeout_s`` (wedged device) 504;
    anything else — internal engine/device failure — 500.
    """
    from concurrent.futures import TimeoutError as FutureTimeout

    from valor_tpu.serve.engine import EngineOverloaded

    class Handler(BaseHTTPRequestHandler):
        # engine/featurize/decode close over the server state
        def log_message(self, fmt, *a):  # route through our logger, quietly
            LOGGER.debug("serve: " + fmt % a)

        def _json(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, engine.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    self._json(413, {
                        "error": f"body {n} bytes exceeds limit {max_body_bytes}"
                    })
                    return
                payload = json.loads(self.rfile.read(n) or b"{}")
                item = featurize(payload)
                kw = {}
                if payload.get("group"):
                    kw["group"] = payload["group"]
                for k in ("max_len", "beam_size"):
                    if payload.get(k) is not None:
                        kw[k] = int(payload[k])
                fut = engine.submit(item, **kw)
                try:
                    result = fut.result(timeout=request_timeout_s)
                except FutureTimeout:
                    # abandon the request FOR the engine too: a cancelled
                    # queued future is dropped at batch-pick time, so a
                    # wedged-device backlog of timed-out requests neither
                    # holds max_pending slots nor burns device time for
                    # clients that already got their 504
                    fut.cancel()
                    raise
                self._json(200, {
                    "text": decode(result["sequences"]),
                    "latency_s": result["latency_s"],
                    "batch_size": result["batch_size"],
                    "bucket": result["bucket"],
                })
            except EngineOverloaded as e:
                self._json(503, {"error": str(e), "retry": True})
            except FutureTimeout:
                self._json(504, {
                    "error": f"request exceeded {request_timeout_s}s"
                })
            except (KeyError, ValueError, TypeError,
                    json.JSONDecodeError, FileNotFoundError) as e:
                # validation errors: the caller's payload is at fault
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001 — internal failure
                LOGGER.exception("serve: internal error")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def start_server(engine, featurize: FeaturizeFn, decode: DecodeFn,
                 host: str = "127.0.0.1", port: int = 8000,
                 **handler_kw) -> ThreadingHTTPServer:
    """Start serving on a daemon thread; returns the live server (its
    ``server_address`` carries the bound port when ``port=0``)."""
    server = ThreadingHTTPServer(
        (host, port), make_handler(engine, featurize, decode, **handler_kw)
    )
    t = threading.Thread(target=server.serve_forever, daemon=True, name="valor-serve-http")
    t.start()
    return server


def _production_featurize(cfg, bert_tok, prompt_table=None) -> FeaturizeFn:
    from valor_tpu.cli.infer import extract_frames_and_wav
    from valor_tpu.data.pipeline import AudioMapper, VideoMapper

    def featurize(payload: Dict[str, Any]) -> Dict[str, np.ndarray]:
        item: Dict[str, np.ndarray] = {}
        if payload.get("image_path"):
            path = payload["image_path"]
            vm = VideoMapper(
                os.path.dirname(os.path.abspath(path)) or ".",
                resolution=cfg.model.video_resolution, sample_num=1,
                datatype="image", encoder_type=cfg.model.video_encoder_type,
                training=False, output_uint8=True,
            )
            pixels = vm[os.path.basename(path)]
            if pixels is None:  # mapper's corrupt-sample signal -> client 400
                raise FileNotFoundError(f"unreadable image: {path}")
            # production split-pipeline contract: raw uint8 rows, 4x less
            # host->device traffic; (x/255-mean)/std fuses into the
            # on-device patch embed (models/valor.py encode_video)
            item["video_pixels"] = pixels
            item["audio_spectrograms"] = np.zeros(
                (int(payload.get("audio_sample_num", 2)),
                 cfg.model.audio_melbins, cfg.model.audio_target_length),
                np.float32,
            )
        elif payload.get("video_path"):
            with tempfile.TemporaryDirectory() as tmp:
                extract_frames_and_wav(payload["video_path"], tmp)
                vm = VideoMapper(
                    tmp, resolution=cfg.model.video_resolution,
                    sample_num=int(payload.get("video_sample_num", 8)),
                    datatype="video", encoder_type=cfg.model.video_encoder_type,
                    training=False, output_uint8=True,
                )
                pixels = vm["frames"]
                if pixels is None:
                    raise FileNotFoundError(
                        f"no readable frames in: {payload['video_path']}")
                item["video_pixels"] = pixels  # raw uint8 rows (see above)
                am = AudioMapper(
                    tmp, sample_num=int(payload.get("audio_sample_num", 2)),
                    melbins=cfg.model.audio_melbins,
                    target_length=cfg.model.audio_target_length, training=False,
                )
                item["audio_spectrograms"] = am["audio"].astype(np.float32)
        else:
            raise ValueError("payload needs video_path or image_path")
        if payload.get("question"):
            q = bert_tok.encode(payload["question"])
            q = [bert_tok.cls_token_id] + q + [bert_tok.sep_token_id]
            if prompt_table is not None:
                # prompt-trained checkpoints expect the QA task-prompt body
                # spliced after [CLS], exactly as eval/train inject it
                # (data/prompts.py PromptTable.inject; reference
                # pretrain.py:1270-1321) — without it, serving generations
                # silently diverge from cli.evaluate behavior
                body = prompt_table.qa_body()[0].tolist()
                q = q[:1] + body + q[1:]
            # fixed-length pad so same-question-length requests batch together
            L = int(payload.get("question_pad", 32))
            q = (q + [0] * L)[:L]
            item["question_prompt"] = np.asarray(q, np.int32)
        return item

    return featurize


def main(argv=None):
    from valor_tpu.utils.runtime import honor_jax_platforms

    honor_jax_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--task", default="cap%tva")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--bucket", type=int, default=16,
                        help="max batch; buckets are 1..bucket powers of 4")
    parser.add_argument("--max_wait_ms", type=float, default=25.0)
    parser.add_argument("--beam_size", type=int, default=1)
    parser.add_argument("--max_pending", type=int, default=1024,
                        help="queued-request admission bound (503 past it)")
    parser.add_argument("--request_timeout_s", type=float, default=300.0)
    parser.add_argument("--max_body_bytes", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    import jax

    from valor_tpu.cli.build import build_tokenizers
    from valor_tpu.core.config import load_config
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.eval.validate import decode_sequence
    from valor_tpu.models.valor import VALORModel
    from valor_tpu.serve import InferenceEngine, ServeConfig

    cfg = load_config(args.config)
    spec = parse_task(args.task)
    bert_tok, clip_tok = build_tokenizers(cfg.model)
    model = VALORModel(cfg.model)
    # compute_loss=True so the fusion decoder's params exist (the loss-free
    # forward returns before the decoder runs — see cli/infer.py init note);
    # the token row is a shape-free CLS/SEP stand-in for the loss path.
    example = {
        "video_pixels": np.zeros(
            (1, 8, cfg.model.video_resolution, cfg.model.video_resolution, 3),
            np.float32,
        ),
        "audio_spectrograms": np.zeros(
            (1, 2, cfg.model.audio_melbins, cfg.model.audio_target_length),
            np.float32,
        ),
        "bert_tokens": np.asarray([[101, 102]], np.int32),
        "clip_tokens": np.asarray([[101, 102]], np.int32),
    }
    params = jax.jit(
        lambda r: model.init(r, example, spec, True, False)
    )({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)})["params"]
    if args.checkpoint:
        from valor_tpu.train.checkpoints import ModelSaver, adapt_pretrained_params

        saver = ModelSaver(args.checkpoint, remove_before_ckpt=False)

        class _S:
            pass

        tmpl = _S()
        tmpl.params = params
        tmpl.opt_state = {}
        restored = saver.restore(tmpl)
        if restored:
            params = adapt_pretrained_params(restored["params"], params)

    buckets = []
    b = 1
    while b < args.bucket:
        buckets.append(b)
        b *= 4
    buckets.append(args.bucket)
    group = spec.caption_groups[0]
    # prompt-trained checkpoints (use_task_prompt, e.g.
    # configs/pretrain-valor-large.json) inject the caption task prompt in
    # eval/train via prompted_collate; serving must match or generations
    # silently diverge from cli.evaluate quality
    from valor_tpu.data.prompts import maybe_prompt_table

    table = maybe_prompt_table(cfg.model, (bert_tok, clip_tok))
    prompts = {group: table.caption()} if table is not None else None
    engine = InferenceEngine(
        model, params,
        ServeConfig(
            buckets=tuple(buckets), max_wait_ms=args.max_wait_ms, group=group,
            caption_type=cfg.model.caption_type,
            max_len=cfg.model.max_generation_len, beam_size=args.beam_size,
            max_pending=args.max_pending,
        ),
        prompts=prompts,
    )
    server = start_server(
        engine, _production_featurize(cfg, bert_tok, table),
        lambda seq: decode_sequence(bert_tok, seq),
        host=args.host, port=args.port,
        request_timeout_s=args.request_timeout_s,
        max_body_bytes=args.max_body_bytes,
    )
    LOGGER.info("serving %s on http://%s:%d (bucket %d, wait %.0f ms)",
                args.task, *server.server_address, args.bucket, args.max_wait_ms)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
        engine.shutdown()


if __name__ == "__main__":
    main()
