"""Dataset creation tool — capability parity with /root/reference/dataset_tool.py.

Writes the same on-disk layout the reference produces (and reads): one
``<name>-r{log2res:02d}.tfrecords`` per LOD (2×2 box-filter pyramid down to
4×4, dataset_tool.py:71-85) plus ``<name>-rxx.labels`` float32 .npy
(:87-92). Implemented on the dependency-free tfrecord codec in this package.

Creators (subcommand parity; :694+):
  create_from_images, create_mnist, create_mnistrgb (the stacked-MNIST
  1000-mode set, :307-334), create_cifar10, create_celeba (128×128 crop at
  (89,121) + 40 binary attributes, :447-486), create_from_hdf5, plus the
  display/extract/compare verification commands (:188-266).
"""

import glob
import gzip
import os
import pickle
import struct
import sys
from typing import List, Optional

import numpy as np

from . import tfrecord


class TFRecordExporter:
    def __init__(self, tfrecord_dir: str, expected_images: int,
                 print_progress: bool = True, progress_interval: int = 10):
        self.tfrecord_dir = tfrecord_dir
        self.tfr_prefix = os.path.join(tfrecord_dir,
                                       os.path.basename(tfrecord_dir))
        self.expected_images = expected_images
        self.cur_images = 0
        self.shape = None
        self.resolution_log2 = None
        self.tfr_files = []
        self.print_progress = print_progress
        self.progress_interval = progress_interval
        os.makedirs(tfrecord_dir, exist_ok=True)
        self._writers = []

    def set_shape(self, shape):
        self.shape = list(shape)
        self.resolution_log2 = int(np.log2(self.shape[1]))
        assert self.shape[0] in (1, 3)
        assert self.shape[1] == self.shape[2] == 2 ** self.resolution_log2
        for lod in range(self.resolution_log2 - 1):
            path = f"{self.tfr_prefix}-r{self.resolution_log2 - lod:02d}.tfrecords"
            self.tfr_files.append(path)
            self._writers.append(open(path, "wb"))

    def add_image(self, img: np.ndarray):
        if self.print_progress and self.cur_images % self.progress_interval == 0:
            print(f"{self.cur_images} / {self.expected_images}\r", end="",
                  flush=True)
        if self.shape is None:
            self.set_shape(img.shape)
        assert list(img.shape) == self.shape
        img = img.astype(np.float32)
        for lod, writer in enumerate(self._writers):
            if lod:
                img = (img[:, 0::2, 0::2] + img[:, 0::2, 1::2] +
                       img[:, 1::2, 0::2] + img[:, 1::2, 1::2]) * 0.25
            quant = np.rint(img).clip(0, 255).astype(np.uint8)
            tfrecord.write_record(writer, tfrecord.encode_image_example(quant))
        self.cur_images += 1

    def add_labels(self, labels: np.ndarray):
        if self.print_progress:
            print(f"{self.cur_images} / {self.expected_images}")
        assert labels.shape[0] == self.cur_images
        with open(self.tfr_prefix + "-rxx.labels", "wb") as f:
            np.save(f, labels.astype(np.float32))

    def close(self):
        for w in self._writers:
            w.close()
        self._writers = []
        if self.print_progress:
            print(f"Added {self.cur_images} images.")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Source-format readers
# ---------------------------------------------------------------------------

def _load_mnist_images(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051
        data = np.frombuffer(f.read(), np.uint8).reshape(n, rows, cols)
    return data


def _load_mnist_labels(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049
        return np.frombuffer(f.read(), np.uint8)


# ---------------------------------------------------------------------------
# Creators
# ---------------------------------------------------------------------------

def create_mnist(tfrecord_dir: str, mnist_dir: str):
    """28×28 MNIST zero-padded to 32×32, one-hot 10 labels
    (reference :269-290)."""
    images = _load_mnist_images(_find(mnist_dir, "train-images-idx3-ubyte*"))
    labels = _load_mnist_labels(_find(mnist_dir, "train-labels-idx1-ubyte*"))
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)])[:, None]  # [N,1,32,32]
    onehot = np.zeros((labels.size, 10), np.float32)
    onehot[np.arange(labels.size), labels] = 1.0
    with TFRecordExporter(tfrecord_dir, images.shape[0]) as tfr:
        for idx in range(images.shape[0]):
            tfr.add_image(images[idx])
        tfr.add_labels(onehot)


def create_mnistrgb(tfrecord_dir: str, mnist_dir: str,
                    num_images: int = 1000000, random_seed: int = 123):
    """Stacked MNIST: 3 random digits as RGB channels, 32×32, 1000-way
    one-hot label d_R + 10·d_G + 100·d_B (reference :307-334)."""
    images = _load_mnist_images(_find(mnist_dir, "train-images-idx3-ubyte*"))
    labels = _load_mnist_labels(_find(mnist_dir, "train-labels-idx1-ubyte*"))
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)])
    rnd = np.random.RandomState(random_seed)
    out_labels = np.zeros((num_images, 1000), np.float32)
    with TFRecordExporter(tfrecord_dir, num_images) as tfr:
        for idx in range(num_images):
            sel = rnd.randint(images.shape[0], size=3)
            tfr.add_image(images[sel])  # [3,32,32] = RGB stack
            mode = int(labels[sel[0]] + 10 * labels[sel[1]] + 100 * labels[sel[2]])
            out_labels[idx, mode] = 1.0
        tfr.add_labels(out_labels)


def create_cifar10(tfrecord_dir: str, cifar10_dir: str):
    """CIFAR-10 train split, one-hot 10 labels (reference :337-360)."""
    images, labels = [], []
    for batch in range(1, 6):
        with open(os.path.join(cifar10_dir, f"data_batch_{batch}"), "rb") as f:
            data = pickle.load(f, encoding="latin1")
        images.append(data["data"].reshape(-1, 3, 32, 32))
        labels.append(np.array(data["labels"], np.uint8))
    images = np.concatenate(images)
    labels = np.concatenate(labels)
    onehot = np.zeros((labels.size, 10), np.float32)
    onehot[np.arange(labels.size), labels] = 1.0
    order = np.arange(images.shape[0])
    with TFRecordExporter(tfrecord_dir, images.shape[0]) as tfr:
        for idx in order:
            tfr.add_image(images[idx])
        tfr.add_labels(onehot[order])


def create_cifar100(tfrecord_dir: str, cifar100_dir: str):
    """CIFAR-100 train split, one-hot fine labels (reference :363-381)."""
    with open(os.path.join(cifar100_dir, "train"), "rb") as f:
        data = pickle.load(f, encoding="latin1")
    images = data["data"].reshape(-1, 3, 32, 32)
    labels = np.array(data["fine_labels"], np.uint8)
    onehot = np.zeros((labels.size, 100), np.float32)
    onehot[np.arange(labels.size), labels] = 1.0
    with TFRecordExporter(tfrecord_dir, images.shape[0]) as tfr:
        for img in images:
            tfr.add_image(img)
        tfr.add_labels(onehot)


def create_svhn(tfrecord_dir: str, svhn_dir: str):
    """SVHN train split from the .mat files (reference :384-404)."""
    import scipy.io
    images, labels = [], []
    for batch in ("train_32x32.mat",):
        data = scipy.io.loadmat(os.path.join(svhn_dir, batch))
        images.append(np.transpose(data["X"], (3, 2, 0, 1)))
        labels.append(data["y"].flatten() % 10)  # '10' encodes digit 0
    images = np.concatenate(images)
    labels = np.concatenate(labels).astype(np.uint8)
    onehot = np.zeros((labels.size, 10), np.float32)
    onehot[np.arange(labels.size), labels] = 1.0
    with TFRecordExporter(tfrecord_dir, images.shape[0]) as tfr:
        for img in images:
            tfr.add_image(img)
        tfr.add_labels(onehot)


def create_lsun(tfrecord_dir: str, lmdb_dir: str, resolution: int = 256,
                max_images: Optional[int] = None):
    """LSUN bedroom-style lmdb (reference :407-444). Needs the optional
    ``lmdb`` package; center-crops to square and box-resizes to
    ``resolution``."""
    import io
    import lmdb  # gated optional dependency
    from PIL import Image
    with lmdb.open(lmdb_dir, readonly=True).begin(write=False) as txn:
        total = max_images or txn.stat()["entries"]
        with TFRecordExporter(tfrecord_dir, total) as tfr:
            for _key, value in txn.cursor():
                try:
                    img = Image.open(io.BytesIO(value))
                    img = img.convert("RGB")
                    arr = np.asarray(img)
                except Exception:
                    continue
                crop = min(arr.shape[0], arr.shape[1])
                y0 = (arr.shape[0] - crop) // 2
                x0 = (arr.shape[1] - crop) // 2
                arr = arr[y0:y0 + crop, x0:x0 + crop]
                img = Image.fromarray(arr).resize((resolution, resolution),
                                                  Image.LANCZOS)
                tfr.add_image(np.asarray(img).transpose(2, 0, 1))
                if tfr.cur_images >= total:
                    break


def create_celeba(tfrecord_dir: str, celeba_dir: str, cx: int = 89,
                  cy: int = 121, num_images: Optional[int] = None,
                  attr_file: Optional[str] = None):
    """CelebA 128×128 center crop at (cx,cy)=(89,121) with the 40 binary
    attributes as labels (reference :447-486)."""
    from PIL import Image
    glob_pattern = os.path.join(celeba_dir, "img_align_celeba", "*.jpg")
    image_filenames = sorted(glob.glob(glob_pattern))
    if not image_filenames:
        image_filenames = sorted(glob.glob(os.path.join(celeba_dir, "*.jpg")))
    assert image_filenames, f"no jpgs under {celeba_dir}"
    if num_images is not None:
        image_filenames = image_filenames[:num_images]

    attrs = None
    if attr_file is None:
        guess = os.path.join(celeba_dir, "Anno", "list_attr_celeba.txt")
        attr_file = guess if os.path.exists(guess) else None
    if attr_file is not None:
        attrs = load_celeba_attributes(attr_file)

    labels = []
    with TFRecordExporter(tfrecord_dir, len(image_filenames)) as tfr:
        for fname in image_filenames:
            img = np.asarray(Image.open(fname))
            assert img.shape[2] == 3
            img = img[cy - 64: cy + 64, cx - 64: cx + 64]
            tfr.add_image(img.transpose(2, 0, 1))
            if attrs is not None:
                labels.append(attrs[1].get(os.path.basename(fname),
                                           np.zeros(40, np.float32)))
        if labels:
            tfr.add_labels(np.stack(labels))


def load_celeba_attributes(attr_file: str):
    """Parse list_attr_celeba.txt → (attr_names, {filename: 0/1 vector})
    (used for minority-inclusion filtering, training_loop.py:175-180,416-427)."""
    with open(attr_file) as f:
        lines = f.read().splitlines()
    attr_names = lines[1].split()
    table = {}
    for line in lines[2:]:
        parts = line.split()
        if not parts:
            continue
        vals = np.array([1.0 if v == "1" else 0.0 for v in parts[1:]],
                        np.float32)
        table[parts[0]] = vals
    return attr_names, table


def create_from_images(tfrecord_dir: str, image_dir: str,
                       shuffle: bool = False, random_seed: int = 123):
    """Folder of same-sized power-of-two PNG/JPG images (reference :636-661)."""
    from PIL import Image
    image_filenames = sorted(
        glob.glob(os.path.join(image_dir, "*.png")) +
        glob.glob(os.path.join(image_dir, "*.jpg")) +
        glob.glob(os.path.join(image_dir, "*.jpeg")))
    assert image_filenames, f"no images in {image_dir}"
    order = (np.random.RandomState(random_seed).permutation(len(image_filenames))
             if shuffle else np.arange(len(image_filenames)))
    with TFRecordExporter(tfrecord_dir, len(image_filenames)) as tfr:
        for idx in order:
            img = np.asarray(Image.open(image_filenames[idx]))
            if img.ndim == 2:
                img = img[None]
            else:
                img = img.transpose(2, 0, 1)
            tfr.add_image(img)


def create_from_hdf5(tfrecord_dir: str, hdf5_filename: str,
                     shuffle: bool = False, random_seed: int = 123):
    import h5py  # gated: optional dependency
    with h5py.File(hdf5_filename, "r") as h5:
        key = max(h5.keys(), key=lambda k: np.prod(h5[k].shape[1:]))
        data = h5[key]
        order = (np.random.RandomState(random_seed).permutation(data.shape[0])
                 if shuffle else np.arange(data.shape[0]))
        with TFRecordExporter(tfrecord_dir, data.shape[0]) as tfr:
            for idx in order:
                tfr.add_image(np.asarray(data[idx]))


# ---------------------------------------------------------------------------
# Verification commands (reference :188-266)
# ---------------------------------------------------------------------------

def extract(tfrecord_dir: str, output_dir: str, num_images: Optional[int] = None):
    from PIL import Image
    from .dataset import TFRecordDataset
    ds = TFRecordDataset(tfrecord_dir, max_label_size=0)
    os.makedirs(output_dir, exist_ok=True)
    images = ds.get_all_images()
    n = len(images) if num_images is None else min(num_images, len(images))
    for idx in range(n):
        img = images[idx]
        if img.shape[0] == 1:
            Image.fromarray(img[0], "L").save(
                os.path.join(output_dir, f"img{idx:08d}.png"))
        else:
            Image.fromarray(img.transpose(1, 2, 0), "RGB").save(
                os.path.join(output_dir, f"img{idx:08d}.png"))
    print(f"Extracted {n} images to {output_dir}")


def compare(tfrecord_dir_a: str, tfrecord_dir_b: str,
            ignore_labels: bool = False) -> bool:
    from .dataset import TFRecordDataset
    da = TFRecordDataset(tfrecord_dir_a, max_label_size=0 if ignore_labels else "full")
    db = TFRecordDataset(tfrecord_dir_b, max_label_size=0 if ignore_labels else "full")
    same = (da.num_images == db.num_images and
            np.array_equal(da.get_all_images(), db.get_all_images()) and
            (ignore_labels or np.array_equal(da.get_all_labels(),
                                             db.get_all_labels())))
    print("identical" if same else "DIFFERENT")
    return same


def display(tfrecord_dir: str):
    from .dataset import TFRecordDataset
    ds = TFRecordDataset(tfrecord_dir, max_label_size="full")
    print(f"{ds.num_images} images, shape {ds.shape}, "
          f"label size {ds.label_size}")


def _find(directory: str, pattern: str) -> str:
    matches = glob.glob(os.path.join(directory, pattern))
    assert matches, f"no {pattern} in {directory}"
    return matches[0]
