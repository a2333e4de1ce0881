"""Throughput benchmark: VALOR-base pretrain step, samples/sec/chip.

Measures the full fused training step (CLIP-B/16 over 4 frames @224 +
AST over 1x(64x512) log-mel clip + BERT fusion w/ cross-attn, fine
contrastive + unimlm caption losses, backward, grad-clip + multi-group
adamw) on synthetic data — the decode->fwd-bwd metric BASELINE.json
tracks.

`vs_baseline` compares against the PyTorch+apex reference throughput on
its 8xGPU rig, estimated at ~30 samples/sec/GPU for VALOR-base pretrain
(fp16 A100-class; the repo publishes no number — see BASELINE.md).  The
BASELINE.json target is >3x that per chip; round-2 defaults measure
99.7 samples/s/chip = 3.32x (PERF_NOTES.md ladder).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: remote TPU compiles take minutes; repeat
# bench runs (and the driver's run) hit the cache instead.
_CACHE_DIR = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SAMPLES_PER_SEC_PER_GPU = 30.0


def _auto_workers() -> int:
    """Host-aware loader worker default (VERDICT round-4 #1): one decode
    thread per host core, capped at 16.  The old hard-coded 16 put 16
    GIL-trading decode threads on the driver's ONE core — the measured
    sweep on that host (DATA_SWEEP_RESULT.json, PERF_NOTES round-5) is
    MONOTONE DOWN in worker count: 1 worker 33.6 best / 29.1 mean
    samples/s vs 16 workers 27.6/25.5.  Decode work here is CPU-bound
    with no I/O wait (native libjpeg releases the GIL but still needs a
    core), so threads beyond the core count only add contention.
    ``BENCH_WORKERS`` overrides."""
    env = os.environ.get("BENCH_WORKERS")
    if env:
        return int(env)
    return max(1, min(os.cpu_count() or 1, 16))


def _build_data_fixture(n_ids=64, n_frames=8, size=(342, 256)):
    """Realistic on-disk inputs: fps4-extracted-style JPEG frames + mono
    wavs (reference layout, utils/extract_frame_and_wav_multiprocess.py)."""
    import wave

    from PIL import Image

    root = "/tmp/valor_bench_data"
    marker = os.path.join(root, f".done_{n_ids}_{n_frames}_{size[0]}")
    if os.path.exists(marker):
        return root
    rng = np.random.RandomState(0)
    for i in range(n_ids):
        d = os.path.join(root, "frames", f"vid{i}")
        os.makedirs(d, exist_ok=True)
        for f in range(n_frames):
            arr = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{f:04d}.jpg"), quality=87)
        os.makedirs(os.path.join(root, "audio"), exist_ok=True)
        with wave.open(os.path.join(root, "audio", f"vid{i}.wav"), "w") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes((rng.randn(22050 * 6) * 3000).astype(np.int16).tobytes())
    with open(os.path.join(root, "ids.json"), "w") as f:
        json.dump([f"vid{i}" for i in range(n_ids)], f)
    open(marker, "w").write("ok")
    return root


def main_data_inclusive(report: bool = True, synth_sps=None):
    """BENCH_DATA=1: the BASELINE.json metric as defined — JPEG decode ->
    frames/mel -> H2D -> fwd-bwd-update — through the real mappers and the
    threaded DataLoader.  Reports end-to-end samples/s and the data-stall
    fraction (host time blocked on the input pipeline)."""
    from valor_tpu.core.config import TrainConfig
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.data.loader import DataLoader, DevicePrefetcher, ShardedBatchSampler
    from valor_tpu.data.pipeline import AudioMapper, VALORDataset, VideoMapper, valor_collate
    from valor_tpu.models.valor import VALORModel
    from valor_tpu.train.optimizer import build_optimizer
    from valor_tpu.train.step import TrainState, make_train_loop, make_train_step
    from __graft_entry__ import _flagship_config, _synthetic_batch

    batch_size = int(os.environ.get("BENCH_BATCH", 64))
    inner = int(os.environ.get("BENCH_INNER", 1))
    n_workers = _auto_workers()
    n_steps = int(os.environ.get("BENCH_STEPS", 12))
    if os.environ.get("BENCH_RBG", "1") != "0":
        jax.config.update("jax_default_prng_impl", "rbg")
    # production numerics, same as main(): standalone BENCH_DATA /
    # BENCH_DATA_SWEEP runs must compile the SAME program triple mode
    # does — without bf16 scores + the transpose-free layout the batch-64
    # step carries fp32 logits and per-layer K/V layout copies and OOMs
    # the 16 GB chip
    if os.environ.get("BENCH_SCORES_BF16", "1") != "0":
        from valor_tpu.ops.layers import set_scores_dtype

        set_scores_dtype(os.environ.get("BENCH_SCORES_DTYPE", "bfloat16"))
    from valor_tpu.ops.layers import set_attention_layout

    set_attention_layout(os.environ.get("BENCH_ATTN_LAYOUT", "bshd"))

    # split-pipeline defaults (the production ones): uint8 pixels +
    # device-side mel — the 1-core host can't afford f32 normalise or
    # host DFT (PERF_NOTES.md).  BENCH_HOSTPREP=1 measures the old
    # host-side preparation for comparison.
    hostprep = bool(os.environ.get("BENCH_HOSTPREP"))
    root = _build_data_fixture(n_ids=int(os.environ.get("BENCH_DATA_IDS", 512)))
    video_mapper = VideoMapper(
        os.path.join(root, "frames"), resolution=224, sample_num=4, training=True,
        output_uint8=not hostprep,
    )
    audio_mapper = AudioMapper(
        os.path.join(root, "audio"), sample_num=1, melbins=64,
        target_length=512, training=True, device_fbank=not hostprep,
    )
    ds = VALORDataset(os.path.join(root, "ids.json"), None, video_mapper, audio_mapper, True)
    sampler = ShardedBatchSampler(len(ds), batch_size=batch_size, shuffle=True)
    tok = _synthetic_batch(batch=batch_size)

    def collate(items):
        b = valor_collate(items)
        n = b["video_pixels"].shape[0]
        b["bert_tokens"] = np.asarray(tok["bert_tokens"][:n])
        b["clip_tokens"] = np.asarray(tok["clip_tokens"][:n])
        return b

    loader = DataLoader(
        ds, sampler, collate, n_workers=n_workers, prefetch_batches=4, repeat=True
    )

    cfg = _flagship_config()
    model = VALORModel(cfg)
    task = parse_task("pt_contra%tva%tv%ta_caption%tva%tv%ta")
    example = _synthetic_batch(batch=batch_size)
    params = jax.jit(
        lambda rngs: model.init(rngs, example, task, True, True)
    )({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)})["params"]
    tx = build_optimizer(params, TrainConfig(num_train_steps=10000))
    state = TrainState.create(params, tx)
    del params

    if inner > 1:
        loop = make_train_loop(model, tx, inner, donate=True)
    else:
        step_fn = make_train_step(model, tx, donate=True, with_grad_norm=False)

    def device_put_batch(b):
        return {
            k: jax.device_put(np.asarray(v, np.float32) if v.dtype == np.float64 else v)
            for k, v in b.items()
            if hasattr(v, "ndim")
        }

    prefetched = DevicePrefetcher(iter(loader), device_put_batch)
    it = iter(prefetched)
    rng = jax.random.PRNGKey(2)

    def one_call(i):
        if inner > 1:
            window = [next(it) for _ in range(inner)]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *window)
            return loop(state, stacked, jax.random.fold_in(rng, i), task)
        return step_fn(state, next(it), jax.random.fold_in(rng, i), task)

    # warmup: compile + donation round-trip
    for w in range(2):
        state, metrics = one_call(1000 + w)
        _ = float(metrics["total_loss"])

    times = []
    t_all0 = time.perf_counter()
    for i in range(n_steps):
        t0 = time.perf_counter()
        state, metrics = one_call(i)
        _ = float(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_all0

    per_call = batch_size * inner
    sps = per_call / min(times)
    sps_mean = per_call * n_steps / wall
    # compare against the synthetic-input step time if provided
    synth = synth_sps if synth_sps is not None else os.environ.get("BENCH_SYNTH_SPS")
    stall = None
    if synth:
        stall = max(0.0, 1.0 - sps_mean / float(synth))
    result = {
        "metric": "valor_base_pretrain_samples_per_sec_per_chip_data_inclusive",
        "value": round(sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / REFERENCE_SAMPLES_PER_SEC_PER_GPU, 2),
        "mean_samples_per_sec": round(sps_mean, 2),
        "batch": batch_size,
        "inner_steps": inner,
        "n_workers": n_workers,
        "host_cpu_count": os.cpu_count(),
        "data_stall_vs_synth": round(stall, 4) if stall is not None else None,
        "step_seconds": [round(t, 3) for t in times],
    }
    # sweep mode calls this repeatedly in one process: stop the loader's
    # background production FIRST (a repeat=True loader whose iterator is
    # abandoned otherwise leaves its feeder thread + worker pool alive,
    # decoding batches nobody reads while the NEXT sweep point warms up),
    # then drop the donated state and this iteration's compiled step so
    # HBM doesn't stack
    import gc

    loader.close()
    del state, prefetched, it, loader
    if inner > 1:
        del loop
    else:
        del step_fn
    gc.collect()
    if report:
        print(json.dumps(result))
    return result


def main_workers_sweep(report: bool = True):
    """BENCH_DATA_SWEEP=1: the data-inclusive metric at each loader worker
    count (VERDICT round-4 #1) — one table, one host, so the
    BASELINE-defined number ships at its measured-best point instead of a
    hard-coded thread count.  Results land in PERF_NOTES.md and
    DATA_SWEEP_RESULT.json (main_triple folds the frozen best point in)."""
    import sys

    counts = [
        int(w)
        for w in os.environ.get("BENCH_SWEEP_WORKERS", "1,2,4,8,16").split(",")
    ]
    rows = []
    for w in counts:
        os.environ["BENCH_WORKERS"] = str(w)
        r = main_data_inclusive(report=False)
        rows.append({
            "workers": w,
            "best_samples_per_sec": r["value"],
            "mean_samples_per_sec": r["mean_samples_per_sec"],
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    best = max(rows, key=lambda r: r["mean_samples_per_sec"])
    out = {
        "metric": "valor_base_data_inclusive_workers_sweep",
        "host_cpu_count": os.cpu_count(),
        "rows": rows,
        "best": best,
    }
    if report:
        print(json.dumps(out))
    return out


def main_generate(report: bool = True, return_handles: bool = False):
    """BENCH_GEN=1: caption-generation (serving) throughput — encode media
    once + fixed-buffer greedy/beam decode, end-to-end under one jit
    (eval/generate.py).  Reports captions/s/chip.

    With ``return_handles`` the built (model, cfg, params, batch) come back
    too, so the serving-engine section can reuse the SAME model object —
    ``gen.get_generator`` keys its program cache by model identity, so the
    engine's batches then hit every compiled program from this section."""
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.eval import generate as gen
    from valor_tpu.models.valor import VALORModel
    from __graft_entry__ import _flagship_config, _synthetic_batch

    batch_size = int(os.environ.get("BENCH_BATCH", 64))
    max_len = int(os.environ.get("BENCH_GEN_LEN", 30))
    beam = int(os.environ.get("BENCH_BEAM", 1))
    if os.environ.get("BENCH_RBG", "1") != "0":
        jax.config.update("jax_default_prng_impl", "rbg")
    if os.environ.get("BENCH_SCORES_BF16", "1") != "0":
        from valor_tpu.ops.layers import set_scores_dtype

        set_scores_dtype("bfloat16")

    from valor_tpu.ops.layers import set_attention_layout

    set_attention_layout(os.environ.get("BENCH_ATTN_LAYOUT", "bshd"))
    cfg = _flagship_config()
    if os.environ.get("BENCH_GQA_KV_HEADS"):
        # grouped-query cross-attention serving A/B: shrinks the decode
        # cross-KV cache num_heads/kv_heads-fold (eval/generate.py holds
        # one [B*beam, Hk, S, D] K/V pair per fusion layer per modality)
        cfg = cfg.replace(
            fusion_cross_attn_kv_heads=int(os.environ["BENCH_GQA_KV_HEADS"])
        )
    model = VALORModel(cfg)
    task = parse_task("pt_contra%tva_caption%tva")
    batch = _synthetic_batch(batch=batch_size)
    params = jax.jit(
        lambda rngs: model.init(rngs, batch, task, True, True)
    )({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)})["params"]

    gen_batch = {k: batch[k] for k in ("bert_tokens", "video_pixels", "audio_spectrograms")}

    def run(params, b, salt):
        # the PRODUCTION path: gen.generate's cached jit programs — the
        # same code validate_cap/validate_qa drive (eval/generate.py
        # Generator); no bespoke bench jit.  The salt perturbs the input
        # because the tunneled runtime memoizes identical executions.
        b = dict(b)
        b["video_pixels"] = b["video_pixels"] + jnp.asarray(salt, b["video_pixels"].dtype) * 1e-6
        out = gen.generate(
            model, params, b, ("tva",),
            caption_type=cfg.caption_type, max_len=max_len, beam_size=beam,
        )
        return out["generated_sequences_tva"]

    import sys

    t0 = time.perf_counter()
    _ = np.asarray(run(params, gen_batch, 0.0))  # host readback
    print(f"gen compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    g = gen.get_generator(model)
    assert all(n == 1 for n in g.stats().values()), g.stats()
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        # np.asarray = ground-truth sync: block_until_ready does not block
        # on this runtime's remote arrays (measured 1 ms "steps")
        _ = np.asarray(run(params, gen_batch, float(i + 1)))
        times.append(time.perf_counter() - t0)
    # zero retrace across batches: the compiled-program cache is unchanged
    assert all(n == 1 for n in g.stats().values()), g.stats()
    cps = batch_size / min(times)
    result = {
        "metric": "valor_base_caption_generation_captions_per_sec_per_chip",
        "value": round(cps, 2),
        "unit": "captions/s/chip",
        "batch": batch_size,
        "max_len": max_len,
        "beam_size": beam,
        "step_seconds": [round(t, 3) for t in times],
    }
    if report:
        print(json.dumps(result))
    if return_handles:
        return result, (model, cfg, params, gen_batch, max_len, beam)
    return result


def main_serve(report: bool = True, handles=None):
    """BENCH_SERVE=1: dynamic-batching serving-engine throughput + latency.

    Closed-loop load test of valor_tpu/serve/engine.py on the real chip:
    BENCH_SERVE_CLIENTS concurrent callers (default 128) each submit
    BENCH_SERVE_ROUNDS single-item requests (default 6) and wait for their
    result, exactly as HTTP handler threads would; the engine coalesces
    them into padded bucket-64 batches through the cached Generator
    programs.  Reports sustained requests/s/chip plus the p50/p95/p99
    request latency the batching adds — the engine-level counterpart of
    the per-batch BENCH_GEN number.

    Every request salts its pixels (the tunneled runtime memoizes
    IDENTICAL executions, PERF_NOTES.md), so no two launched batches are
    the same program input."""
    import concurrent.futures as cf

    from valor_tpu.serve import InferenceEngine, ServeConfig

    if handles is None:
        _, handles = main_generate(report=False, return_handles=True)
    model, cfg, params, gen_batch, max_len, beam = handles
    clients = int(os.environ.get("BENCH_SERVE_CLIENTS", 128))
    rounds = int(os.environ.get("BENCH_SERVE_ROUNDS", 6))
    bucket = int(os.environ.get("BENCH_BATCH", 64))
    # uint8 pixel rows — the production serving contract
    # (cli/serve.py featurize ships VideoMapper output_uint8 rows; the
    # (x/255-mean)/std normalisation fuses into the on-device patch
    # embed).  The first triple run measured the cost of getting this
    # wrong: fp32-promoted salted rows made H2D 154 MB/bucket-64 batch,
    # 6.9 s of the 7.3 s batch wall on the 1-core tunnel host.
    fshape = np.asarray(gen_batch["video_pixels"]).shape[1:]
    rng0 = np.random.RandomState(0)
    v0 = rng0.randint(0, 256, size=fshape, dtype=np.uint8)
    a0 = np.asarray(gen_batch["audio_spectrograms"])[0]

    scfg = ServeConfig(
        buckets=(bucket,), max_wait_ms=50.0, group="tva",
        caption_type=cfg.caption_type, max_len=max_len, beam_size=beam,
    )

    def load_point(eng, n_clients, n_rounds):
        """Closed-loop wave: n_clients callers x n_rounds requests each."""
        def client(i, n):
            for j in range(n):
                # distinct per request (the tunneled runtime memoizes
                # IDENTICAL executions): stamp the request id into one
                # pixel instead of adding a float salt — a float salt
                # promotes the whole row to fp32 and quadruples H2D
                s = i * 1000 + j + 1
                v = v0.copy()
                v[0, 0, 0] = (s >> 16) & 255, (s >> 8) & 255, s & 255
                eng.generate({
                    "video_pixels": v,
                    "audio_spectrograms": a0,
                })

        eng.reset_stats()
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(n_clients) as pool:
            list(pool.map(lambda i: client(i, n_rounds), range(n_clients)))
        elapsed = time.perf_counter() - t0
        stats = eng.stats()
        total = n_clients * n_rounds
        return {
            "requests_per_sec": round(total / elapsed, 2),
            "clients": n_clients,
            "requests": total,
            "batches": stats["batches"],
            "mean_occupancy": round(stats["mean_occupancy"], 3),
            "latency_p50_s": round(stats["latency_p50_s"], 3),
            "latency_p95_s": round(stats["latency_p95_s"], 3),
            "latency_p99_s": round(stats["latency_p99_s"], 3),
            "queue_p50_s": round(stats["queue_p50_s"], 3),
            # per-batch phase attribution (VERDICT round-4 #2): host
            # assembly / device / fan-out — where a batch's wall goes
            "batch_phase_mean_s": stats["batch_phase_mean_s"],
            "batch_phase_fraction": stats["batch_phase_fraction"],
        }

    with InferenceEngine(model, params, scfg) as eng:
        # warmup wave: fills one bucket, pays any residual compile
        def _warm(i):
            v = v0.copy()
            v[0, 0, 1] = (i >> 8) & 255, i & 255, 7
            return eng.generate({"video_pixels": v, "audio_spectrograms": a0})

        with cf.ThreadPoolExecutor(bucket) as pool:
            list(pool.map(_warm, range(bucket)))
        # saturated point: clients >> bucket — throughput measurement
        # (latency there measures queue depth, not the batching contract)
        sat = load_point(eng, clients, rounds)
        # moderate-load point: clients = bucket/2 — the operationally
        # meaningful latency set (queue nearly empty; latency = wait +
        # one batch) per VERDICT round-4 #2
        mod = load_point(eng, max(1, bucket // 2), rounds)
    result = {
        "metric": "valor_base_serving_engine_requests_per_sec_per_chip",
        "value": sat["requests_per_sec"],
        "unit": "requests/s/chip",
        "bucket": bucket,
        "max_wait_ms": scfg.max_wait_ms,
        "pad_fraction": round(1.0 - sat["mean_occupancy"], 4),
        "saturated": sat,
        "moderate_load": mod,
    }
    for k in ("clients", "requests", "batches", "mean_occupancy",
              "latency_p50_s", "latency_p95_s", "latency_p99_s"):
        result[k] = sat[k]
    if report:
        print(json.dumps(result))
    return result


def main(report: bool = True):
    from valor_tpu.core.config import TrainConfig
    from valor_tpu.core.tasks import parse_task
    from valor_tpu.models.valor import VALORModel
    from valor_tpu.train.optimizer import build_optimizer
    from valor_tpu.train.step import TrainState, make_train_loop
    from __graft_entry__ import _flagship_config, _flagship_large_config, _synthetic_batch

    import gc

    from valor_tpu.train.step import make_train_step

    large = bool(os.environ.get("BENCH_LARGE"))
    batch_size = int(os.environ.get("BENCH_BATCH", 32 if large else 64))
    # K train steps fused into one XLA program via lax.scan: amortises the
    # runtime's fixed per-execution overhead (PERF_NOTES.md); this is the
    # trainer's own train_inner_steps path, not a bench-only trick.
    inner = int(os.environ.get("BENCH_INNER", 8))
    if os.environ.get("BENCH_RBG", "1") != "0":
        # cheap counter-based PRNG for dropout masks (threefry is
        # ALU-heavy on TPU); matches TrainConfig.prng_impl='rbg', the
        # production default
        jax.config.update("jax_default_prng_impl", "rbg")
    if os.environ.get("BENCH_SCORES_BF16", "1") != "0":
        # production default (ModelConfig.attention_logits_dtype);
        # BENCH_SCORES_DTYPE overrides (e.g. float8_e4m3fn — round-4
        # activation-bytes rung, ops/layers.py)
        from valor_tpu.ops.layers import set_scores_dtype

        set_scores_dtype(os.environ.get("BENCH_SCORES_DTYPE", "bfloat16"))
    if os.environ.get("BENCH_GELU_STASH"):
        # float8 gelu backward stash (ModelConfig.gelu_stash_dtype)
        from valor_tpu.ops.layers import set_gelu_stash_dtype

        set_gelu_stash_dtype(os.environ["BENCH_GELU_STASH"])
    # transpose-free attention layout — production default 'bshd'
    # (ModelConfig.attention_layout; +1.1% measured, round-4 ladder);
    # BENCH_ATTN_LAYOUT=bhsd restores the classic split-heads transpose
    from valor_tpu.ops.layers import set_attention_layout

    set_attention_layout(os.environ.get("BENCH_ATTN_LAYOUT", "bshd"))
    remat = os.environ.get("BENCH_REMAT", "")  # '', 'none', or a policy name
    if remat and remat != "none":
        from valor_tpu.ops.layers import set_remat_policy

        set_remat_policy(remat)
    cfg = _flagship_large_config() if large else _flagship_config()
    if remat == "none":
        cfg = cfg.replace(checkpointing=False)
    if os.environ.get("BENCH_REMAT_SCOPE"):
        cfg = cfg.replace(remat_scope=os.environ["BENCH_REMAT_SCOPE"])
    if os.environ.get("BENCH_GQA_KV_HEADS"):
        # grouped-query cross-attention A/B (fusion_cross_attn_kv_heads)
        cfg = cfg.replace(
            fusion_cross_attn_kv_heads=int(os.environ["BENCH_GQA_KV_HEADS"])
        )
    # finetune-regime shapes (VERDICT round-4 #4): the reference's large
    # caption finetune runs L/14 @ 392px images, 1 frame, cap%tv
    # (configs/caption-mscoco.json, reference scripts/finetune_cap.sh) —
    # a ~3x vision-token memory regime vs 224px pretrain.  E.g.
    # BENCH_LARGE=1 BENCH_RES=392 BENCH_FRAMES=1 BENCH_TASK='cap%tv'.
    res = int(os.environ.get("BENCH_RES", 224))
    n_frames = int(os.environ.get("BENCH_FRAMES", 4))
    if res != 224:
        cfg = cfg.replace(video_resolution=res)
    model = VALORModel(cfg)
    task = parse_task(
        os.environ.get("BENCH_TASK", "pt_contra%tva%tv%ta_caption%tva%tv%ta")
    )
    batch = _synthetic_batch(batch=batch_size, n_frames=n_frames, res=res)

    # jit the init: eager flax init dispatches thousands of tiny ops
    # one-by-one (minutes-to-hours through the tunneled runtime); one
    # compiled program runs in seconds and hits the persistent cache.
    t0 = time.perf_counter()
    params = jax.jit(
        lambda rngs: model.init(rngs, batch, task, True, True)
    )({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)})["params"]
    jax.block_until_ready(params)
    import sys

    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    mu_dtype = "float32" if os.environ.get("BENCH_MU_BF16") == "0" else "bfloat16"
    # bf16 grads through clip+adam (TrainConfig.grad_dtype); BENCH_GRAD_BF16=0
    # restores the fp32 round-2 numerics
    grad_dtype = "float32" if os.environ.get("BENCH_GRAD_BF16") == "0" else "bfloat16"
    # bf16 second moment (custom adam): +5.9% measured — the optimizer
    # state read+write is real traffic on the bandwidth-bound step;
    # BENCH_NU_BF16=0 restores fp32 nu
    nu_dtype = "float32" if os.environ.get("BENCH_NU_BF16") == "0" else "bfloat16"
    tcfg = TrainConfig(
        num_train_steps=10000, adam_mu_dtype=mu_dtype, adam_nu_dtype=nu_dtype
    )
    tx = build_optimizer(params, tcfg)
    state = TrainState.create(params, tx)
    # memory discipline matters on one 16GB chip: drop the extra params
    # reference and the grad-norm metric's transient concat
    del params
    gc.collect()
    if inner > 1:
        loop = make_train_loop(model, tx, inner, donate=True, grad_dtype=grad_dtype)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (inner,) + x.shape), batch
        )

        def run_one(state, key):
            return loop(state, stacked, key, task)

    else:
        train_step = make_train_step(
            model, tx, donate=True, with_grad_norm=False, grad_dtype=grad_dtype
        )

        def run_one(state, key):
            return train_step(state, batch, key, task)

    rng = jax.random.PRNGKey(2)
    import sys

    def note(msg):
        print(msg, file=sys.stderr, flush=True)

    if os.environ.get("BENCH_ANALYZE"):
        # Compile-only analysis: XLA's own cost model (total HBM bytes
        # accessed, flops) + executable memory footprint.  Used to rank
        # traffic levers and to check a remat variant FITS before running
        # it (an OOM poisons the shared chip's HBM — see memory notes).
        if inner > 1:
            lowered = loop.lower(state, stacked, rng, task)
        else:
            lowered = train_step.lower(state, batch, rng, task)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        ma = compiled.memory_analysis()
        out = {
            "mode": "analyze",
            "bytes_accessed_GB": round(ca.get("bytes accessed", 0.0) / 1e9, 2),
            "flops_G": round(ca.get("flops", 0.0) / 1e9, 1),
            "per_inner_step_bytes_GB": round(
                ca.get("bytes accessed", 0.0) / 1e9 / max(inner, 1), 2
            ),
            "temp_GB": round(getattr(ma, "temp_size_in_bytes", 0) / 2**30, 3),
            "arg_GB": round(getattr(ma, "argument_size_in_bytes", 0) / 2**30, 3),
            "out_GB": round(getattr(ma, "output_size_in_bytes", 0) / 2**30, 3),
            "alias_GB": round(getattr(ma, "alias_size_in_bytes", 0) / 2**30, 3),
        }
        extra = {
            k: round(float(v), 3)
            for k, v in sorted(ca.items())
            if "bytes accessed" in k and k != "bytes accessed" and float(v) > 1e8
        }
        out["bytes_accessed_breakdown_raw"] = extra
        if os.environ.get("BENCH_HLO_OUT"):
            # optimized HLO dump for the per-op HBM ranking in
            # tools/rank_hbm.py (post-fusion: each fusion's operands +
            # outputs ARE the HBM traffic)
            with open(os.environ["BENCH_HLO_OUT"], "w") as f:
                f.write(compiled.as_text())
            out["hlo_out"] = os.environ["BENCH_HLO_OUT"]
        print(json.dumps(out))
        return

    # warmup: compile + first donated-buffer step (the runtime's first
    # donation round-trip is ~100x slower than steady state)
    for w in range(2):
        t0 = time.perf_counter()
        state, metrics = run_one(state, jax.random.fold_in(rng, 1000 + w))
        _ = float(metrics["total_loss"])  # host readback = ground-truth sync
        note(f"warmup {w}: {time.perf_counter() - t0:.1f}s")

    # The driver's chip sits behind a shared tunnel whose throughput varies
    # >10x run to run (see PERF_NOTES.md); per-step min is the capability
    # estimate, mean is also reported.
    n_calls = max(10 // inner, 4)
    times = []
    for i in range(n_calls):
        t0 = time.perf_counter()
        state, metrics = run_one(state, jax.random.fold_in(rng, i))
        _ = float(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
        note(f"step {i}: {times[-1]:.3f}s")

    per_call = batch_size * inner
    sps = per_call / min(times)
    sps_mean = per_call * n_calls / sum(times)
    result = {
        "metric": (
            "valor_large_pretrain_samples_per_sec_per_chip"
            if large
            else "valor_base_pretrain_samples_per_sec_per_chip"
        ),
        "value": round(sps, 2),
        "unit": "samples/s/chip",
        # the ~30 samples/s/GPU estimate is for VALOR-base; the reference
        # publishes no large-config throughput, so a large/30 ratio would
        # be apples-to-oranges — report null there and let the measured
        # per-sample cost ratio vs base speak (PERF_NOTES.md)
        "vs_baseline": (
            None if large else round(sps / REFERENCE_SAMPLES_PER_SEC_PER_GPU, 2)
        ),
        "mean_samples_per_sec": round(sps_mean, 2),
        "batch": batch_size,
        "inner_steps": inner,
        "step_seconds": [round(t, 3) for t in times],
    }
    if res != 224 or n_frames != 4 or os.environ.get("BENCH_TASK"):
        result["regime"] = {
            "video_resolution": res,
            "n_frames": n_frames,
            "task": os.environ.get(
                "BENCH_TASK", "pt_contra%tva%tv%ta_caption%tva%tv%ta"
            ),
            "remat_scope": cfg.remat_scope,
        }
    # free the chip for any follow-on section (triple mode): drop the
    # donated state + compiled-program references
    del state
    gc.collect()
    if report:
        print(json.dumps(result))
    return result


def main_triple():
    """Default driver mode: ONE JSON line carrying all three BASELINE
    metrics (VERDICT round-3 #8) — the synthetic-input device step
    (headline, `value`), the data-inclusive BASELINE.json definition
    (JPEG decode -> mel/frames -> fwd-bwd, with the host-core caveat
    machine-readable), and the serving/generation rate.  Sections are
    individually fault-isolated so the headline always lands."""
    import sys

    result = main(report=False)
    try:
        data = main_data_inclusive(
            report=False, synth_sps=result["mean_samples_per_sec"]
        )
        result["data_inclusive"] = {
            k: data[k]
            for k in (
                "value",
                "mean_samples_per_sec",
                "n_workers",
                "host_cpu_count",
                "data_stall_vs_synth",
            )
        }
        result["data_inclusive"]["note"] = (
            "bounded by host decode on this 1-core tunnel host; workers "
            "auto-tuned to the measured-best sweep point (workers_sweep "
            "below / DATA_SWEEP_RESULT.json: worker count is monotone-"
            "down on 1 core). The >3x data-inclusive target needs a "
            "multi-core host: per-sample decode cost and the round-3 "
            "thread-scaling table (PERF_NOTES.md) put ~12 cores at "
            "parity with the device step"
        )
        # measured-once worker sweep on this host (BENCH_DATA_SWEEP=1;
        # VERDICT round-4 #1) rides along so the tuned point + table
        # travel in the driver-captured JSON
        sweep_path = os.path.join(
            os.path.dirname(__file__), "DATA_SWEEP_RESULT.json"
        )
        if os.path.exists(sweep_path):
            with open(sweep_path) as f:
                result["data_inclusive"]["workers_sweep"] = json.load(f)
    except Exception as e:  # keep the headline even if a section dies
        result["data_inclusive"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"data-inclusive section failed: {e}", file=sys.stderr)
    handles = None
    try:
        gen, handles = main_generate(report=False, return_handles=True)
        result["serving"] = {
            k: gen[k] for k in ("value", "batch", "max_len", "beam_size")
        }
        result["serving"]["unit"] = "captions/s/chip"
    except Exception as e:
        result["serving"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"serving section failed: {e}", file=sys.stderr)
    try:
        # dynamic-batching engine on the SAME model object: reuses every
        # program the serving section just compiled (zero extra compiles)
        serve = main_serve(report=False, handles=handles)
        result["serving_engine"] = {
            k: serve[k]
            for k in (
                "value", "bucket", "saturated", "moderate_load",
            )
        }
        result["serving_engine"]["unit"] = "requests/s/chip"
    except Exception as e:
        result["serving_engine"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"serving-engine section failed: {e}", file=sys.stderr)
    # measured-once VALOR-large number (BENCH_LARGE=1 run on the real
    # chip; see PERF_NOTES.md) so the large-config datapoint travels in
    # the driver-captured JSON without re-paying its compile every round
    large_path = os.path.join(os.path.dirname(__file__), "BENCH_LARGE_RESULT.json")
    if os.path.exists(large_path):
        with open(large_path) as f:
            result["large"] = json.load(f)
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_DATA_SWEEP"):
        main_workers_sweep()
    elif os.environ.get("BENCH_DATA"):
        main_data_inclusive()
    elif os.environ.get("BENCH_GEN"):
        main_generate()
    elif os.environ.get("BENCH_SERVE"):
        main_serve()
    elif os.environ.get("BENCH_LARGE") or os.environ.get("BENCH_TRIPLE") == "0":
        main()
    else:
        main_triple()
