"""cffi wrapper for the native fast image loader (native/fastloader.cpp).

Optional fast path for BOTH image pipelines:
  batch_load        eval/inference — decode + resize + normalize
  batch_load_train  training — decode + full augmentation (flip, color
                    jitter, grayscale, rotation, translation, random
                    erasing — the STRENGTH_PRESETS semantics) + normalize,
                    with per-image deterministic RNG streams

One native call per batch with an internal thread pool replaces the
reference's DataLoader worker processes. Falls back to the PIL path when
the shared library hasn't been built (`native/build.sh`).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from vivqa_tpu.data.augmentation import CLIP_MEAN, CLIP_STD

_LIB = None
_FFI = None

_CDEF = """
int fl_decode_resize_normalize(const unsigned char* jpeg, size_t len,
                               int s, const float* mean, const float* stdv,
                               float* out);
int fl_batch_load(const char** paths, int n, int s, const float* mean,
                  const float* stdv, float* out, int* status, int threads);
int fl_batch_load_train(const char** paths, int n, int s, const float* mean,
                        const float* stdv, float* out, int* status,
                        int threads, uint64_t seed, float flip_p,
                        float jitter, float gray_p, float rot_deg,
                        float trans, float erase_p);
"""


def _find_library() -> Optional[str]:
    candidates = [
        Path(__file__).resolve().parents[2] / "native" / "libfastloader.so",
        Path(os.environ.get("VIVQA_FASTLOADER", "")),
    ]
    for c in candidates:
        if c and Path(c).is_file():
            return str(c)
    return None


def get_fastloader():
    """Returns the (ffi, lib) pair or None if unavailable."""
    global _LIB, _FFI
    if _LIB is not None:
        return _FFI, _LIB
    path = _find_library()
    if path is None:
        return None
    try:
        import cffi
        ffi = cffi.FFI()
        ffi.cdef(_CDEF)
        lib = ffi.dlopen(path)
    except Exception:
        return None
    _FFI, _LIB = ffi, lib
    return _FFI, _LIB


def is_available() -> bool:
    return get_fastloader() is not None


def batch_load(paths: Sequence[str], image_size: int,
               mean: np.ndarray = CLIP_MEAN, std: np.ndarray = CLIP_STD,
               threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """paths -> ((N, S, S, 3) float32, status (N,) int32; 0 = ok,
    failures are zero-filled placeholders matching the PIL fallback
    semantics)."""
    handle = get_fastloader()
    if handle is None:
        raise RuntimeError("native fastloader not built — run "
                           "native/build.sh or use ImageAugmentation")
    ffi, lib = handle
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    status = np.empty((n,), np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = [ffi.new("char[]", str(p).encode()) for p in paths]
    c_path_arr = ffi.new("const char*[]", c_paths)
    if threads <= 0:
        threads = min(8, os.cpu_count() or 1)
    lib.fl_batch_load(
        c_path_arr, n, image_size,
        ffi.cast("const float*", ffi.from_buffer(mean)),
        ffi.cast("const float*", ffi.from_buffer(std)),
        ffi.cast("float*", ffi.from_buffer(out)),
        ffi.cast("int*", ffi.from_buffer(status)),
        threads)
    return out, status


def batch_load_train(paths: Sequence[str], image_size: int, preset: dict,
                     seed: int, mean: np.ndarray = CLIP_MEAN,
                     std: np.ndarray = CLIP_STD,
                     threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Training-path batch load: decode + augment (flip/jitter/grayscale/
    rotation/translation/random-erasing per the STRENGTH_PRESETS dict) +
    normalize, one native call. Deterministic given `seed` (per-image
    splitmix64 streams, independent of thread scheduling)."""
    handle = get_fastloader()
    if handle is None:
        raise RuntimeError("native fastloader not built — run "
                           "native/build.sh or use ImageAugmentation")
    ffi, lib = handle
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    status = np.empty((n,), np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = [ffi.new("char[]", str(p).encode()) for p in paths]
    c_path_arr = ffi.new("const char*[]", c_paths)
    if threads <= 0:
        threads = min(8, os.cpu_count() or 1)
    lib.fl_batch_load_train(
        c_path_arr, n, image_size,
        ffi.cast("const float*", ffi.from_buffer(mean)),
        ffi.cast("const float*", ffi.from_buffer(std)),
        ffi.cast("float*", ffi.from_buffer(out)),
        ffi.cast("int*", ffi.from_buffer(status)),
        threads, seed & 0xFFFFFFFFFFFFFFFF,
        float(preset.get("flip_p", 0.0)), float(preset.get("jitter", 0.0)),
        float(preset.get("gray_p", 0.0)), float(preset.get("rot_deg", 0.0)),
        float(preset.get("trans", 0.0)), float(preset.get("erase_p", 0.0)))
    return out, status


def decode_one(jpeg_bytes: bytes, image_size: int,
               mean: np.ndarray = CLIP_MEAN,
               std: np.ndarray = CLIP_STD) -> Optional[np.ndarray]:
    handle = get_fastloader()
    if handle is None:
        return None
    ffi, lib = handle
    out = np.empty((image_size, image_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.fl_decode_resize_normalize(
        ffi.from_buffer(jpeg_bytes), len(jpeg_bytes), image_size,
        ffi.cast("const float*", ffi.from_buffer(mean)),
        ffi.cast("const float*", ffi.from_buffer(std)),
        ffi.cast("float*", ffi.from_buffer(out)))
    return out if rc == 0 else None
