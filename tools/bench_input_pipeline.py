"""Host input-pipeline throughput: PIL path vs native C++ fast loader.

Measures images/sec for the TRAINING transform (decode + augment +
normalize at 224x224) and the EVAL transform, over a realistic JPEG
corpus generated on the fly. This is the host-side budget that must keep
up with the device step (bench.py): at 832 QA-pairs/s/chip the input
pipeline needs >= 832 images/s/host or it becomes the bottleneck.

Usage:  python tools/bench_input_pipeline.py [--n 256] [--size 224]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_corpus(d: Path, n: int, hw=(480, 640)) -> list[str]:
    from PIL import Image
    rng = np.random.RandomState(0)
    # smooth-ish synthetic photos (pure noise JPEGs are unrealistically
    # expensive to decode)
    y = np.linspace(0, 1, hw[0])[:, None, None]
    x = np.linspace(0, 1, hw[1])[None, :, None]
    paths = []
    for i in range(n):
        base = 0.35 * y + 0.35 * x + 0.3 * rng.rand(1, 1, 3)
        img = np.clip(base + 0.08 * rng.rand(*hw, 3), 0, 1)
        p = d / f"img_{i:04d}.jpg"
        Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=90)
        paths.append(str(p))
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from vivqa_tpu.data import ImageAugmentation
    from vivqa_tpu.data import fastloader

    with tempfile.TemporaryDirectory() as td:
        paths = make_corpus(Path(td), args.n)
        print(f"corpus: {args.n} x 640x480 JPEG -> {args.size}x{args.size}, "
              f"batch {args.batch}")

        for mode in ("train", "eval"):
            tf = ImageAugmentation(args.size, mode=mode, strength="medium",
                                   seed=0)
            # PIL path
            t0 = time.perf_counter()
            for p in paths:
                tf(p)
            dt_pil = time.perf_counter() - t0

            if fastloader.is_available():
                t0 = time.perf_counter()
                for i in range(0, len(paths), args.batch):
                    out = tf.batch(paths[i:i + args.batch])
                    assert out is not None
                dt_nat = time.perf_counter() - t0
            else:
                dt_nat = float("nan")

            print(f"  {mode:>5}: PIL {args.n / dt_pil:7.1f} img/s   "
                  f"native {args.n / dt_nat:7.1f} img/s   "
                  f"speedup {dt_pil / dt_nat:4.1f}x")


if __name__ == "__main__":
    main()
