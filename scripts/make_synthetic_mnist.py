#!/usr/bin/env python3
"""Generate a synthetic MNIST substitute in idx-ubyte format.

This container has no egress, so the real MNIST .gz files (reference
README.md:52-59) cannot be downloaded. This renders the 10 digit classes
from a 5×7 bitmap font with per-sample geometric + photometric variation
(scale, rotation, shift, stroke intensity, blur, noise) and writes standard
``train-images-idx3-ubyte`` / ``train-labels-idx1-ubyte`` files that
``dataset_tool.py create_mnist`` / ``create_mnistrgb`` and
``scripts/train_mnist_classifier.py`` consume unmodified — so the full
stacked-MNIST mode-coverage pipeline (BASELINE.md north star: mode count
≥997/1000) runs end-to-end without external data.

Usage: python scripts/make_synthetic_mnist.py --out mnist/ --num-images 20000
"""

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy import ndimage

# classic 5×7 font, rows top→bottom, 1 = ink
FONT = {
    0: ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    1: ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    2: ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    3: ["11111", "00010", "00100", "00010", "00001", "10001", "01110"],
    4: ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    5: ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    6: ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    7: ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    8: ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    9: ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
}


def render_digit(digit: int, rnd: np.random.RandomState) -> np.ndarray:
    glyph = np.array([[int(c) for c in row] for row in FONT[digit]],
                     np.float32)  # [7,5]
    # upscale to ~20×14 with random anisotropic zoom
    zy = rnd.uniform(2.4, 3.1)
    zx = rnd.uniform(2.4, 3.1)
    img = ndimage.zoom(glyph, (zy, zx), order=1)
    img = np.clip(img, 0.0, 1.0)
    # random rotation ±12°
    img = ndimage.rotate(img, rnd.uniform(-12.0, 12.0), order=1, reshape=True)
    img = np.clip(img, 0.0, 1.0)
    # slight blur for stroke softness (MNIST-ish anti-aliasing)
    img = ndimage.gaussian_filter(img, rnd.uniform(0.4, 0.9))
    # paste into 28×28 with random shift
    canvas = np.zeros((28, 28), np.float32)
    h, w = img.shape
    h, w = min(h, 28), min(w, 28)
    max_dy, max_dx = 28 - h, 28 - w
    dy = int(round((max_dy / 2) + rnd.uniform(-1, 1) * min(3, max_dy / 2)))
    dx = int(round((max_dx / 2) + rnd.uniform(-1, 1) * min(3, max_dx / 2)))
    canvas[dy:dy + h, dx:dx + w] = img[:h, :w]
    # stroke intensity + additive noise
    canvas = canvas * rnd.uniform(0.75, 1.0)
    canvas = canvas + rnd.normal(0.0, 0.02, canvas.shape).astype(np.float32)
    return (np.clip(canvas, 0.0, 1.0) * 255.0).astype(np.uint8)


def write_idx_images(path: str, images: np.ndarray) -> None:
    n, h, w = images.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 0x00000803, n, h, w))
        f.write(images.tobytes())


def write_idx_labels(path: str, labels: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 0x00000801, labels.size))
        f.write(labels.astype(np.uint8).tobytes())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--num-images", type=int, default=20000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rnd = np.random.RandomState(args.seed)
    labels = rnd.randint(0, 10, size=args.num_images).astype(np.uint8)
    images = np.stack([render_digit(int(d), rnd) for d in labels])

    os.makedirs(args.out, exist_ok=True)
    write_idx_images(os.path.join(args.out, "train-images-idx3-ubyte"), images)
    write_idx_labels(os.path.join(args.out, "train-labels-idx1-ubyte"), labels)
    print(f"wrote {args.num_images} synthetic digits to {args.out} "
          f"(class counts: {np.bincount(labels, minlength=10).tolist()})")


if __name__ == "__main__":
    main()
