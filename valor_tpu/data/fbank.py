"""Kaldi-compatible log-mel filterbank, computed ON DEVICE as XLA ops.

The reference extracts features on the CPU dataloader via
torchaudio.compliance.kaldi.fbank (data/data.py:283-315) with:
  htk_compat=True, hanning window, 64 mel bins, 10 ms shift, dither=0,
  use_energy=False, then normalises (x - mean) / (2 * std).

TPU-native redesign: the waveform ships to the device and framing ->
window -> DFT -> mel projection -> log run under jit.  The DFT is done as
a real matmul against a precomputed DFT basis — on TPU a [frames, nfft] x
[nfft, nbins] matmul rides the MXU and beats an FFT for these sizes, and
it fuses with the mel projection into one chain.

Kaldi conventions implemented (parity notes):
  * snip_edges=True framing: n_frames = 1 + (n - win) // shift
  * remove_dc_offset per frame, preemphasis 0.97 (kaldi default),
  * hanning window, FFT size = next pow2 of window length,
  * power spectrum, mel scale 1127*ln(1+f/700), low=20Hz, high=nyquist,
  * log with epsilon floor.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # kaldi's flt epsilon


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def mel_banks(
    num_bins: int, nfft: int, sample_freq: float, low_freq: float = 20.0, high_freq: float = 0.0
) -> np.ndarray:
    """Triangular mel filterbank matrix [nfft//2 + 1, num_bins] (numpy, static)."""
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    mel_low, mel_high = mel(low_freq), mel(high_freq)
    delta = (mel_high - mel_low) / (num_bins + 1)
    bins = np.zeros((nfft // 2 + 1, num_bins), np.float32)
    fft_freqs = np.arange(nfft // 2 + 1) * (sample_freq / nfft)
    mel_freqs = mel(fft_freqs)
    for b in range(num_bins):
        left = mel_low + b * delta
        center = left + delta
        right = center + delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[:, b] = np.maximum(0.0, np.minimum(up, down))
    return bins


@functools.lru_cache(maxsize=8)
def _dft_mel_basis(win: int, nfft: int, num_bins: int, sr: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(window [win], cos/sin DFT bases [win, nfft//2+1] pre-windowed later,
    mel matrix [nfft//2+1, num_bins])."""
    n = np.arange(nfft)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = -2.0 * math.pi * n * k / nfft
    cos_b = np.cos(ang).astype(np.float32)[:win]
    sin_b = np.sin(ang).astype(np.float32)[:win]
    window = np.hanning(win).astype(np.float32) if win > 1 else np.ones((1,), np.float32)
    mel = mel_banks(num_bins, nfft, float(sr))
    return window, np.concatenate([cos_b, sin_b], axis=1), mel


def fbank(
    waveform: jnp.ndarray,  # [n_samples] float32 (already mean-subtracted ok)
    sample_frequency: int = 22050,
    num_mel_bins: int = 64,
    frame_shift_ms: float = 10.0,
    frame_length_ms: float = 25.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
) -> jnp.ndarray:
    """Log-mel spectrogram [n_frames, num_mel_bins], jit-friendly."""
    shift = int(sample_frequency * frame_shift_ms / 1000.0)
    win = int(sample_frequency * frame_length_ms / 1000.0)
    nfft = _next_pow2(win)
    window_np, dft_np, mel_np = _dft_mel_basis(win, nfft, num_mel_bins, sample_frequency)

    n = waveform.shape[0]
    n_frames = max(1 + (n - win) // shift, 1)
    idx = jnp.arange(n_frames)[:, None] * shift + jnp.arange(win)[None, :]
    frames = waveform[jnp.clip(idx, 0, n - 1)]  # [F, win]
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemphasis:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(window_np)

    # DFT as one matmul: [F, win] @ [win, 2*(nfft//2+1)] -> re|im
    basis = jnp.asarray(dft_np)
    reim = jnp.dot(frames, basis, precision=jax.lax.Precision.HIGHEST)
    half = nfft // 2 + 1
    power = reim[:, :half] ** 2 + reim[:, half:] ** 2
    melspec = jnp.dot(power, jnp.asarray(mel_np))
    return jnp.log(jnp.maximum(melspec, EPSILON))


def fbank_np(
    waveform: np.ndarray,
    sample_frequency: int = 22050,
    num_mel_bins: int = 64,
    frame_shift_ms: float = 10.0,
    frame_length_ms: float = 25.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
) -> np.ndarray:
    """Host (numpy) mirror of :func:`fbank` for the CPU dataloader path."""
    shift = int(sample_frequency * frame_shift_ms / 1000.0)
    win = int(sample_frequency * frame_length_ms / 1000.0)
    nfft = _next_pow2(win)
    window, dft, mel = _dft_mel_basis(win, nfft, num_mel_bins, sample_frequency)
    n = waveform.shape[0]
    n_frames = max(1 + (n - win) // shift, 1)
    idx = np.arange(n_frames)[:, None] * shift + np.arange(win)[None, :]
    frames = waveform[np.clip(idx, 0, n - 1)].astype(np.float32)
    if remove_dc_offset:
        frames -= frames.mean(axis=1, keepdims=True)
    if preemphasis:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    frames *= window
    reim = frames @ dft
    half = nfft // 2 + 1
    power = reim[:, :half] ** 2 + reim[:, half:] ** 2
    return np.log(np.maximum(power @ mel, EPSILON))


def fbank_clips(
    waveform: jnp.ndarray,
    sample_num: int,
    target_length: int = 512,
    melbins: int = 64,
    sample_frequency: int = 22050,
    frame_shift_ms: float = 10.0,
    mean: float = -4.2677393,
    std: float = 4.5689974,
    training: bool = False,
    rng: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full reference audio pipeline on device -> [sample_num, melbins, target_length].

    Mirrors data/data.py:283-315: fbank -> pad to a multiple of
    target_length -> uniform-chunk clip sampling (random in train, centre
    in eval) -> per-config (x - mean) / (2*std) normalisation -> transpose
    to (mel, time).
    """
    fb = fbank(
        waveform,
        sample_frequency=sample_frequency,
        num_mel_bins=melbins,
        frame_shift_ms=frame_shift_ms,
    )
    src = fb.shape[0]
    pad = (-src) % target_length or target_length  # reference always pads > 0
    fb = jnp.pad(fb, ((0, pad), (0, 0)))
    total = fb.shape[0] // target_length
    slice_ids = uniform_chunk_indices(total, sample_num, training, rng)
    clips = fb.reshape(total, target_length, melbins)[slice_ids]
    clips = jnp.transpose(clips, (0, 2, 1))  # [n, mel, time]
    return (clips - mean) / (2.0 * std)


def uniform_chunk_indices(
    total: int, sample_num: int, training: bool, rng: jnp.ndarray | None
):
    """split() semantics (data/data.py:240-244): pad-short-with-last, split
    into sample_num near-equal chunks, pick random (train) / centre (eval).

    `total` must be static under jit (it is: clip counts are shape-derived).
    """
    items = list(range(total))
    if total < sample_num:
        items += [items[-1]] * (sample_num - total)
    k, m = divmod(len(items), sample_num)
    chunks = [items[i * k + min(i, m) : (i + 1) * k + min(i + 1, m)] for i in range(sample_num)]
    if training and rng is not None:
        picks = []
        for i, ch in enumerate(chunks):
            r = jax.random.randint(jax.random.fold_in(rng, i), (), 0, len(ch))
            picks.append(jnp.asarray(ch)[r])
        return jnp.stack(picks)
    return jnp.asarray([ch[(len(ch) + 1) // 2 - 1] for ch in chunks])


def clip_span_samples(
    target_length: int = 512,
    sample_frequency: int = 22050,
    frame_shift_ms: float = 10.0,
    frame_length_ms: float = 25.0,
) -> int:
    """Samples covering `target_length` kaldi frames (snip_edges)."""
    shift = int(sample_frequency * frame_shift_ms / 1000.0)
    win = int(sample_frequency * frame_length_ms / 1000.0)
    return (target_length - 1) * shift + win


def fbank_clips_from_spans(
    wavs: jnp.ndarray,  # [B, n, L] float32 clip-span waveforms (zero-padded)
    valid_frames: jnp.ndarray,  # [B, n] int32: frames of real signal; -1 = audio missing
    melbins: int = 64,
    target_length: int = 512,
    sample_frequency: int = 22050,
    frame_shift_ms: float = 10.0,
    mean: float = -4.2677393,
    std: float = 4.5689974,
) -> jnp.ndarray:
    """Device-side half of the split audio pipeline -> [B, n, mel, T].

    The 1-core TPU-VM host cannot afford per-sample mel extraction
    (measured 13-16 ms/sample, PERF_NOTES.md); instead AudioMapper
    (device_fbank=True) ships fixed-length clip-span waveforms and this
    runs framing -> window -> DFT-as-matmul -> mel -> log -> zero-pad
    masking -> (x-mean)/(2*std) inside the train/eval jit.

    Exact pad semantics of the host path (reference data/data.py:283-315):
      * frames >= valid_frames are the reference's zero fb rows (they get
        normalised like everything else -> (0-mean)/(2*std)),
      * valid_frames == -1 marks missing audio: the output is exactly
        zero (the reference returns a zero tensor INSTEAD of normalised
        clips, data/data.py:272-275).
    """
    b, n, L = wavs.shape
    flat = wavs.reshape(b * n, L)
    fb = jax.vmap(
        lambda w: fbank(
            w,
            sample_frequency=sample_frequency,
            num_mel_bins=melbins,
            frame_shift_ms=frame_shift_ms,
        )
    )(flat)  # [B*n, T, mel]
    valid = valid_frames.reshape(b * n)
    frame_ok = jnp.arange(target_length)[None, :] < jnp.maximum(valid, 0)[:, None]
    fb = jnp.where(frame_ok[..., None], fb, 0.0)
    out = (fb - mean) / (2.0 * std)
    out = jnp.where((valid >= 0)[:, None, None], out, 0.0)
    return jnp.transpose(out.reshape(b, n, target_length, melbins), (0, 1, 3, 2))
