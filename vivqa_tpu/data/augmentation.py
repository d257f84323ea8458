"""Image preprocessing & augmentation (host-side, PIL + numpy).

Counterpart of src/data/augmentation.py:21-170 in the reference:
train/eval modes, strength presets light/medium/strong (flip, color
jitter, grayscale, rotation, affine translate), random erasing.
Output is a float32 NHWC array normalized with CLIP statistics
(reference GenerativeVQADataset default, generative_dataset.py:113-121).
"""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np
from PIL import Image, ImageEnhance

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

STRENGTH_PRESETS = {
    "light": dict(flip_p=0.5, jitter=0.1, gray_p=0.0, rot_deg=0, trans=0.0,
                  erase_p=0.0),
    "medium": dict(flip_p=0.5, jitter=0.2, gray_p=0.1, rot_deg=10, trans=0.05,
                   erase_p=0.1),
    "strong": dict(flip_p=0.5, jitter=0.4, gray_p=0.2, rot_deg=20, trans=0.1,
                   erase_p=0.25),
}


class ImageAugmentation:
    """Callable: PIL.Image | ndarray | path -> (H, W, 3) float32 normalized."""

    def __init__(self, image_size: int = 224, mode: str = "train",
                 strength: str = "medium", seed: int | None = None,
                 mean: Sequence[float] = CLIP_MEAN,
                 std: Sequence[float] = CLIP_STD):
        assert mode in ("train", "eval")
        if strength not in STRENGTH_PRESETS:
            raise ValueError(f"unknown strength '{strength}' "
                             f"(choices: {tuple(STRENGTH_PRESETS)})")
        self.image_size = image_size
        self.mode = mode
        self.p = STRENGTH_PRESETS[strength]
        self.rng = random.Random(seed)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def _load(self, img) -> Image.Image:
        if isinstance(img, Image.Image):
            return img.convert("RGB")
        if isinstance(img, np.ndarray):
            arr = img
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            return Image.fromarray(arr).convert("RGB")
        try:
            return Image.open(img).convert("RGB")
        except Exception:
            # black placeholder for missing/corrupt images
            # (reference dataset.py:83,102)
            return Image.new("RGB", (self.image_size, self.image_size))

    def batch(self, paths: Sequence) -> np.ndarray | None:
        """Native batch fast path: decode + (train-mode) augment + normalize
        all `paths` in one C++ call (native/fastloader.cpp). Returns None
        when the library isn't built or any input isn't a path — callers
        fall back to the per-sample PIL `__call__`. Failed decodes become
        black placeholders, matching the PIL fallback semantics."""
        if not all(isinstance(p, (str, bytes)) or hasattr(p, "__fspath__")
                   for p in paths):
            return None
        from vivqa_tpu.data import fastloader
        if not fastloader.is_available():
            return None
        if self.mode == "train":
            seed = self.rng.getrandbits(63)   # advances with each batch
            out, status = fastloader.batch_load_train(
                [str(p) for p in paths], self.image_size, self.p, seed,
                self.mean, self.std)
        else:
            out, status = fastloader.batch_load(
                [str(p) for p in paths], self.image_size, self.mean, self.std)
        for i in np.nonzero(status != 0)[0]:
            if status[i] == -3:
                # decode failure — possibly a non-JPEG (PNG etc.); give the
                # PIL path a chance before declaring the image bad
                out[i] = self(paths[i])
            else:
                # missing/unreadable file: black placeholder, matching the
                # PIL fallback (reference dataset.py:83,102) — NOT raw
                # zeros in normalized space
                out[i] = (-self.mean / self.std).astype(np.float32)
        return out

    def __call__(self, img) -> np.ndarray:
        im = self._load(img)
        s = self.image_size
        if self.mode == "train":
            p, rng = self.p, self.rng
            if rng.random() < p["flip_p"]:
                im = im.transpose(Image.FLIP_LEFT_RIGHT)
            if p["jitter"] > 0:
                for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                            ImageEnhance.Color):
                    f = 1.0 + rng.uniform(-p["jitter"], p["jitter"])
                    im = enh(im).enhance(f)
            if p["gray_p"] > 0 and rng.random() < p["gray_p"]:
                im = im.convert("L").convert("RGB")
            if p["rot_deg"] > 0:
                im = im.rotate(rng.uniform(-p["rot_deg"], p["rot_deg"]),
                               resample=Image.BILINEAR)
            if p["trans"] > 0:
                dx = rng.uniform(-p["trans"], p["trans"]) * im.width
                dy = rng.uniform(-p["trans"], p["trans"]) * im.height
                im = im.transform(im.size, Image.AFFINE, (1, 0, dx, 0, 1, dy),
                                  resample=Image.BILINEAR)
        im = im.resize((s, s), Image.BICUBIC)
        arr = np.asarray(im, np.float32) / 255.0
        if self.mode == "train" and self.p["erase_p"] > 0 \
                and self.rng.random() < self.p["erase_p"]:
            eh = self.rng.randint(s // 8, s // 4)
            ew = self.rng.randint(s // 8, s // 4)
            y = self.rng.randint(0, s - eh)
            x = self.rng.randint(0, s - ew)
            arr[y:y + eh, x:x + ew] = self.rng.random()
        return (arr - self.mean) / self.std
