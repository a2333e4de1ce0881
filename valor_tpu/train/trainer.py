"""Training orchestration: the conduct_train loop, TPU-native.

reference: train_utils.py:277-398 — infinite meta-loader loop, loss sum,
backward, LR ratio, clip, step, periodic validate + best-checkpoint save.
Here the inner work is one compiled function per (task, shape); the Python
loop only moves host batches and bookkeeping.

SCST finetuning (reference: model/pretrain.py:741-791) runs as a
three-phase step: device greedy rollout (baseline) -> device sampled
rollout -> host CIDEr+BLEU reward -> device REINFORCE loss/grad step.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from valor_tpu.core.config import Config
from valor_tpu.core.logging import LOGGER, RunningMeter, TB_LOGGER
from valor_tpu.core.tasks import TaskSpec, parse_task
from valor_tpu.eval.scorer import AdaptiveAlpha, Scorer
from valor_tpu.models.valor import EOS_TOKEN, VALORModel
from valor_tpu.train.step import TrainState, make_train_step


class Trainer:
    def __init__(
        self,
        cfg: Config,
        model: VALORModel,
        tx,
        state: TrainState,
        meta_loader,
        *,
        validate_fn: Optional[Callable[[Any, int], Dict[str, Dict[str, float]]]] = None,
        saver=None,
        scorer: Optional[Scorer] = None,
        mesh=None,
        prefetch: bool = True,
    ):
        self.cfg = cfg
        self.model = model
        self.tx = tx
        self.state = state
        self.mesh = mesh
        self.meta_loader = meta_loader
        # H2D overlap (reference PrefetchLoader, data/loader.py:154-212):
        # one batch is always in flight; with a mesh the put also shards the
        # batch dim over `data` so the jitted step sees global arrays.
        if prefetch and meta_loader is not None and not isinstance(meta_loader, list):
            from valor_tpu.data.loader import DevicePrefetcher

            if mesh is not None:
                from valor_tpu.parallel.mesh import shard_batch

                put = lambda b: shard_batch(mesh, b)  # noqa: E731
            else:
                put = lambda b: {  # noqa: E731
                    k: jax.device_put(v) if hasattr(v, "ndim") else v
                    for k, v in b.items()
                }
            self.meta_loader = DevicePrefetcher(iter(meta_loader), put)
        self.validate_fn = validate_fn
        self.saver = saver
        moe_aux_w = (
            cfg.model.fusion_moe_aux_weight
            if cfg.model.fusion_moe_experts > 0
            else 0.0
        )
        self.train_step = make_train_step(
            model, tx, grad_dtype=cfg.train.grad_dtype, moe_aux_weight=moe_aux_w
        )
        # fused multi-step path: groups consecutive same-task batches into
        # one lax.scan'd jit call (train/step.py make_train_loop)
        self.inner_steps = max(cfg.train.train_inner_steps, 1)
        if self.inner_steps > 1:
            from valor_tpu.train.step import make_train_loop

            self.train_loop = make_train_loop(
                model, tx, self.inner_steps, grad_dtype=cfg.train.grad_dtype,
                moe_aux_weight=moe_aux_w,
            )
        self.meters: Dict[str, RunningMeter] = {}
        self.best: Dict[str, float] = {}
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.scorer = scorer
        self.alpha = AdaptiveAlpha()
        self._task_cache: Dict[str, TaskSpec] = {}
        self._pending_metrics: list = []

    def _meter(self, name: str) -> RunningMeter:
        if name not in self.meters:
            self.meters[name] = RunningMeter(name)
        return self.meters[name]

    def _spec(self, task: str) -> TaskSpec:
        if task not in self._task_cache:
            self._task_cache[task] = parse_task(task)
        return self._task_cache[task]

    def _record(self, task_name: str, metrics: Dict[str, Any]) -> None:
        """Buffer device metrics; readback happens batched at log points.

        float(metric) per step is a device->host sync that serialises
        dispatch (~0.4 s each on the tunneled runtime); buffering keeps the
        step loop async and drains with ONE device_get per log interval."""
        self._pending_metrics.append((task_name, metrics))

    def _drain_metrics(self) -> None:
        if not self._pending_metrics:
            return
        fetched = jax.device_get([m for _, m in self._pending_metrics])
        for (name, _), vals in zip(self._pending_metrics, fetched):
            for k, v in vals.items():
                self._meter(f"{name}/{k}")(float(v))
        self._pending_metrics = []

    def run(self) -> TrainState:
        t = self.cfg.train
        accum = max(t.gradient_accumulation_steps, 1)
        # the reference counts global_step per OPTIMIZER update, not per
        # micro-batch (train_utils.py:341-363 inside the accumulation
        # gate); optax.MultiSteps likewise advances the schedule once per
        # `accum` calls, so trainer bookkeeping must agree.
        micro = int(self.state.step)
        step = micro // accum
        last_logged = step
        last_evaled = step
        t_start = time.time()
        t_window = t_start
        data_wait = 0.0  # host time blocked on the input pipeline
        self._pending_metrics: list = []
        pending: list = []  # buffered same-task batches for the fused loop
        pending_task = None
        loader_it = iter(self.meta_loader)
        while True:
            t0 = time.perf_counter()
            item = next(loader_it, None)
            data_wait += time.perf_counter() - t0
            if item is None:
                break
            name_task, batch = item
            if step >= t.num_train_steps:  # resumed-finished run
                break
            task_name, batch_task = name_task, batch
            if isinstance(name_task, tuple):
                task_name, batch_task = name_task
            spec = self._spec(task_name.split("--")[0])
            # strip host-only metadata before the device step
            device_batch = {
                k: v
                for k, v in batch_task.items()
                if k not in ("ids", "ids_txt", "sample_num", "answers", "question_ids")
            }
            if self.cfg.model.scst_finetuning and spec.family == "cap":
                metrics = self.scst_step(device_batch, batch_task.get("ids"), spec)
                micro += 1
                for k, v in metrics.items():
                    self._meter(f"{task_name}/{k}")(float(v))
            elif self.inner_steps > 1:
                if pending_task not in (None, (task_name, spec)):
                    micro = self._flush(pending, pending_task[1], micro, pending_task[0])
                    pending = []
                pending_task = (task_name, spec)
                pending.append(device_batch)
                if len(pending) < self.inner_steps:
                    continue
                import jax.numpy as _jnp

                stacked = jax.tree_util.tree_map(
                    lambda *xs: _jnp.stack(xs), *pending
                )
                self.state, metrics = self.train_loop(self.state, stacked, self.rng, spec)
                pending = []
                micro += self.inner_steps
                self._record(task_name, metrics)
            else:
                self.state, metrics = self.train_step(
                    self.state, device_batch, self.rng, spec
                )
                micro += 1
                self._record(task_name, metrics)
            step = micro // accum
            if step // 100 > last_logged // 100:
                last_logged = step
                self._drain_metrics()
                now = time.time()
                elapsed = now - t_start
                window = max(now - t_window, 1e-9)
                stall = data_wait / window  # fraction blocked on input
                t_window, data_wait = now, 0.0
                ms = {k: m.val for k, m in self.meters.items() if m.val is not None}
                LOGGER.info(
                    f"step {step}/{t.num_train_steps} ({step / max(elapsed, 1e-9):.2f} it/s, "
                    f"data_stall={stall:.1%}) "
                    + " ".join(f"{k}={v:.4f}" for k, v in ms.items())
                )
                TB_LOGGER.set_step(step)
                ms["data_stall"] = stall
                TB_LOGGER.log_scalar_dict(ms)
            if t.valid_steps and step // t.valid_steps > last_evaled // t.valid_steps:
                last_evaled = step
                self._drain_metrics()
                self.evaluate_and_save(step)
            if step >= t.num_train_steps:
                break
        # flush buffered same-task batches the fused loop never filled a
        # window for (loader exhausted / step limit hit mid-window) — a
        # finite-loader run must train on every batch it was handed
        if pending and pending_task is not None and step < t.num_train_steps:
            micro = self._flush(pending, pending_task[1], micro, pending_task[0])
            pending = []
        self._drain_metrics()
        self.evaluate_and_save(micro // accum)
        if self.saver is not None:
            self.saver.finish()  # drain any in-flight async checkpoint write
        return self.state

    def _flush(self, pending: list, spec: TaskSpec, micro: int, task_name: str) -> int:
        """Run buffered batches as single steps (task switch before a full
        fused window)."""
        for b in pending:
            self.state, metrics = self.train_step(self.state, b, self.rng, spec)
            micro += 1
            self._record(task_name, metrics)
        return micro

    def evaluate_and_save(self, step: int) -> None:
        best_name = None
        if self.validate_fn is not None:
            reports = self.validate_fn(self.state.params, step)
            for val_name, report in reports.items():
                LOGGER.info(f"eval {val_name} @ {step}: {report}")
                for metric in ("ravg", "CIDEr", "accuracy"):
                    if metric in report:
                        key = f"{val_name}/{metric}"
                        if report[metric] > self.best.get(key, -1e9):
                            self.best[key] = report[metric]
                            if self.cfg.train.save_best:
                                best_name = val_name
        if self.saver is not None:
            self.saver.save(self.state, step, best_name=best_name)

    # ------------------------------------------------------------------
    # SCST
    # ------------------------------------------------------------------
    def scst_step(self, batch, ids, spec: TaskSpec) -> Dict[str, float]:
        from valor_tpu.eval import generate as gen
        from valor_tpu.tasks.scst import make_scst_step

        assert self.scorer is not None, "SCST needs a Scorer over train annotations"
        c = self.cfg.model
        params = self.state.params
        # encode media once into fusion space through the cached jit
        # programs (round-2 rebuilt decoder closures every step -> a full
        # decode retrace per SCST step)
        generator = gen.get_generator(self.model)
        video_input = audio_input = None
        if spec.uses_video and batch.get("video_pixels") is not None:
            video_input = generator._encode_video(params, batch["video_pixels"])
        if spec.uses_audio:
            if batch.get("audio_waveforms") is not None:
                audio_input = generator._encode_audio_spans(
                    params, batch["audio_waveforms"], batch["audio_valid_frames"]
                )
            elif batch.get("audio_spectrograms") is not None:
                audio_input = generator._encode_audio(
                    params, batch["audio_spectrograms"]
                )
        prompt = batch.get("prompt_tokens_caption")
        self.rng, sub = jax.random.split(self.rng)
        metrics: Dict[str, float] = {}
        if not hasattr(self, "_scst_steps"):
            self._scst_steps = {}
        for g in spec.caption_groups:
            v = video_input if "v" in g else None
            a = audio_input if "a" in g else None
            seq_g, _ = generator._decode(
                c.caption_type, c.max_generation_len, 1, "greedy"
            )(params, prompt, v, a, None)
            seq_s, _ = generator._decode(
                c.caption_type, c.max_generation_len, 1, "sample"
            )(params, prompt, v, a, sub)
            seq_g, seq_s = np.asarray(seq_g), seq_s
            r_greedy = self.scorer(ids, [_strip(s) for s in seq_g])
            r_sample = self.scorer(ids, [_strip(s) for s in np.asarray(seq_s)])
            self.alpha.update(r_sample, r_greedy)
            rewards = jnp.asarray(r_sample - r_greedy * self.alpha.value())
            if g not in self._scst_steps:
                self._scst_steps[g] = make_scst_step(
                    self.model, self.tx, c.caption_type, g
                )
            scst_batch = {
                "video_input": v,
                "audio_input": a,
                "prompt_tokens_caption": prompt,
            }
            self.state, m = self._scst_steps[g](
                self.state, scst_batch, jnp.asarray(seq_s), rewards
            )
            metrics[f"scst_reward_{g}"] = float(np.mean(r_sample))
            metrics[f"caption_loss_{g}"] = float(m["loss"])
        return metrics


def _strip(seq: np.ndarray) -> list:
    out = []
    for t in seq.tolist():
        if t == EOS_TOKEN:
            break
        out.append(int(t))
    return out
