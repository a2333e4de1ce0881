"""ctypes bindings for the native C++ data-path runtime (native/).

Provides multi-threaded JPEG decode+resize+normalise and a C fbank,
replacing the reference's PIL/torchaudio loader hot path.  Falls back to
the pure-python implementations transparently when the shared library has
not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    # the explicit override must be tried FIRST or it can never override
    os.environ.get("VALOR_NATIVE_LIB", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvalor_native.so"),
]

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            lib.decode_resize_batch.restype = ctypes.c_int
            lib.decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.decode_resize_batch_u8.restype = ctypes.c_int
            lib.decode_resize_batch_u8.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.fbank.restype = ctypes.c_int
            lib.fbank.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load_library() is not None


def decode_resize_batch(
    paths: List[str], size: Tuple[int, int], mean: np.ndarray, std: np.ndarray
) -> Tuple[np.ndarray, int]:
    """paths -> [n, H, W, 3] float32 normalised; returns (array, n_failed)."""
    lib = load_library()
    assert lib is not None
    n = len(paths)
    h, w = size
    out = np.empty((n, h, w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    failures = lib.decode_resize_batch(
        c_paths,
        n,
        w,
        h,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, failures


def decode_resize_batch_u8(
    paths: List[str], size: Tuple[int, int]
) -> Tuple[np.ndarray, int]:
    """paths -> [n, H, W, 3] uint8 (PIL-parity rounding); (array, n_failed).

    The normalisation runs on the accelerator (VALORModel.encode_video
    uint8 path) — uint8 shipping quarters collate + H2D traffic, which
    matters on a 1-core host (PERF_NOTES.md)."""
    lib = load_library()
    assert lib is not None
    n = len(paths)
    h, w = size
    out = np.empty((n, h, w, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.decode_resize_batch_u8(
        c_paths, n, w, h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return out, failures


def fbank(
    wav: np.ndarray,
    sample_rate: int,
    num_bins: int = 64,
    frame_shift_ms: float = 10.0,
    frame_length_ms: float = 25.0,
    preemphasis: float = 0.97,
) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    wav = np.ascontiguousarray(wav, np.float32)
    shift = int(sample_rate * frame_shift_ms / 1000.0)
    win = int(sample_rate * frame_length_ms / 1000.0)
    n_frames = max(1 + (len(wav) - win) // shift, 0)
    out = np.empty((n_frames, num_bins), np.float32)
    got = lib.fbank(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(wav),
        sample_rate,
        num_bins,
        frame_shift_ms,
        frame_length_ms,
        preemphasis,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        raise ValueError("waveform shorter than one frame")
    return out[:got]
