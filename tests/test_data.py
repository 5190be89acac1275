"""Data pipeline tests: TFRecord codec round-trip (including cross-check
against TensorFlow's writer when available), exporter LOD pyramid, dataset
reader, compare/extract commands."""

import os

import numpy as np
import pytest

from inclusivegan_tpu.data import TFRecordDataset
from inclusivegan_tpu.data import tfrecord
from inclusivegan_tpu.data.dataset_tool import TFRecordExporter, compare


def test_example_roundtrip():
    img = np.random.RandomState(0).randint(0, 256, (3, 16, 16)).astype(np.uint8)
    payload = tfrecord.encode_image_example(img)
    out = tfrecord.decode_image_example(payload)
    np.testing.assert_array_equal(out, img)


def test_record_framing_roundtrip(tmp_path):
    path = tmp_path / "t.tfrecords"
    blobs = [os.urandom(n) for n in (1, 100, 5000)]
    with open(path, "wb") as f:
        for b in blobs:
            tfrecord.write_record(f, b)
    out = list(tfrecord.read_records(str(path), verify_crc=True))
    assert out == blobs


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes → 0x8a9136aa
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_tensorflow_can_read_our_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    img = np.random.RandomState(1).randint(0, 256, (3, 8, 8)).astype(np.uint8)
    path = str(tmp_path / "x.tfrecords")
    with open(path, "wb") as f:
        tfrecord.write_record(f, tfrecord.encode_image_example(img))
    recs = list(tf.data.TFRecordDataset(path).as_numpy_iterator())
    assert len(recs) == 1
    ex = tf.train.Example()
    ex.ParseFromString(recs[0])
    shape = list(ex.features.feature["shape"].int64_list.value)
    data = ex.features.feature["data"].bytes_list.value[0]
    np.testing.assert_array_equal(
        np.frombuffer(data, np.uint8).reshape(shape), img)


def test_exporter_and_dataset(tmp_path):
    d = str(tmp_path / "toy")
    images = np.random.RandomState(0).randint(
        0, 256, (12, 3, 16, 16)).astype(np.uint8)
    labels = np.eye(12, 5, dtype=np.float32)
    with TFRecordExporter(d, 12, print_progress=False) as tfr:
        for img in images:
            tfr.add_image(img)
        tfr.add_labels(labels)
    # LOD pyramid files: r04 (16), r03 (8), r02 (4)
    names = sorted(os.listdir(d))
    assert any("-r04.tfrecords" in n for n in names)
    assert any("-r03.tfrecords" in n for n in names)
    assert any("-r02.tfrecords" in n for n in names)
    assert any(n.endswith("-rxx.labels") for n in names)

    ds = TFRecordDataset(d, max_label_size="full")
    assert ds.resolution == 16 and ds.num_images == 12
    assert ds.label_size == 5
    np.testing.assert_array_equal(ds.get_all_images(), images)
    mb_imgs, mb_labels = ds.get_minibatch_np(8)
    assert mb_imgs.shape == (8, 3, 16, 16) and mb_labels.shape == (8, 5)

    # lower LOD is the box-filtered pyramid level
    ds8 = TFRecordDataset(d, resolution=8)
    expected = np.rint(images.astype(np.float32).reshape(
        12, 3, 8, 2, 8, 2).mean(axis=(3, 5))).clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(ds8.get_all_images(), expected)

    assert compare(d, d)


def test_minibatch_epoch_wraparound(tmp_path):
    d = str(tmp_path / "tiny")
    images = np.arange(5 * 1 * 4 * 4, dtype=np.uint8).reshape(5, 1, 4, 4)
    with TFRecordExporter(d, 5, print_progress=False) as tfr:
        for img in images:
            tfr.add_image(img)
    ds = TFRecordDataset(d, shuffle=False)
    seen = []
    for _ in range(3):
        mb, _lbl = ds.get_minibatch_np(4)
        seen.append(mb)
    # 12 draws over 5 images: every image appears at least twice
    flat = np.concatenate(seen).reshape(12, -1)
    uniq = np.unique(flat, axis=0)
    assert len(uniq) == 5


def test_create_celebahq_roundtrip(tmp_path):
    """End-to-end CelebA-HQ reconstruction on a synthetic 2-image corpus:
    landmark-oriented crop, PBKDF2+Fernet delta decryption (keyed on the
    original jpg bytes), uint8-wraparound delta application, and strict MD5
    verification (reference dataset_tool.py:490-625)."""
    import base64
    import bz2
    import hashlib
    import zipfile

    import cryptography.fernet
    import cryptography.hazmat.backends
    import cryptography.hazmat.primitives.hashes
    import cryptography.hazmat.primitives.kdf.pbkdf2
    from PIL import Image

    from inclusivegan_tpu.data.dataset_tool import create_celebahq

    n = 2
    celeba = tmp_path / "celeba"
    (celeba / "img_celeba").mkdir(parents=True)
    (celeba / "Anno").mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"{i + 1:06d}.jpg"
        names.append(name)
        Image.fromarray(
            rng.randint(0, 256, (218, 178, 3), np.uint8), "RGB").save(
            str(celeba / "img_celeba" / name), quality=95)
    # plausible frontal-face landmarks: eyes, nose, mouth corners
    lm = "70 112 108 112 89 135 72 153 106 153"
    with open(celeba / "Anno" / "list_landmarks_celeba.txt", "w") as f:
        f.write(f"{n}\nlefteye_x lefteye_y ...\n")
        for name in names:
            f.write(f"{name} {lm}\n")

    delta_dir = tmp_path / "deltas"
    delta_dir.mkdir()

    def encrypt_delta(idx, delta):
        with open(celeba / "img_celeba" / names[idx], "rb") as f:
            orig_bytes = f.read()
        kdf = cryptography.hazmat.primitives.kdf.pbkdf2.PBKDF2HMAC(
            algorithm=cryptography.hazmat.primitives.hashes.SHA256(),
            length=32, salt=names[idx].encode(), iterations=100000,
            backend=cryptography.hazmat.backends.default_backend())
        key = base64.urlsafe_b64encode(kdf.derive(orig_bytes))
        return cryptography.fernet.Fernet(key).encrypt(
            bz2.compress(delta.tobytes()))

    # pass 1: zero deltas, strict off → recover the processed (pre-delta)
    # images so we can fabricate ground-truth md5s + a nonzero delta
    zeros = np.zeros((3, 1024, 1024), np.uint8)
    with zipfile.ZipFile(delta_dir / "deltas00000.zip", "w") as zf:
        for i in range(n):
            zf.writestr(f"delta{i:05d}.dat", encrypt_delta(i, zeros))
    with open(delta_dir / "image_list.txt", "w") as f:
        f.write("idx orig_idx orig_file proc_md5 final_md5\n")
        for i in range(n):
            f.write(f"{i} {i} {names[i]} x x\n")
    out1 = str(tmp_path / "hq1")
    create_celebahq(out1, str(celeba), str(delta_dir), shuffle=False,
                    strict=False, expected_images=n, num_threads=2)
    ds = TFRecordDataset(out1, max_label_size=0)
    proc = ds.get_all_images()
    assert proc.shape == (n, 3, 1024, 1024) and proc.dtype == np.uint8

    # pass 2: real deltas + correct md5s, strict on → wraparound add verified
    delta = rng.randint(0, 256, (3, 1024, 1024), np.uint8)
    with zipfile.ZipFile(delta_dir / "deltas00000.zip", "w") as zf:
        for i in range(n):
            zf.writestr(f"delta{i:05d}.dat", encrypt_delta(i, delta))
    with open(delta_dir / "image_list.txt", "w") as f:
        f.write("idx orig_idx orig_file proc_md5 final_md5\n")
        for i in range(n):
            pm = hashlib.md5(proc[i].tobytes()).hexdigest()
            fm = hashlib.md5((proc[i] + delta).tobytes()).hexdigest()
            f.write(f"{i} {i} {names[i]} {pm} {fm}\n")
    out2 = str(tmp_path / "hq2")
    png_dir = str(tmp_path / "pngs")
    create_celebahq(out2, str(celeba), str(delta_dir), shuffle=False,
                    strict=True, expected_images=n, num_threads=2,
                    out_img_dir=png_dir)
    ds2 = TFRecordDataset(out2, max_label_size=0)
    final = ds2.get_all_images()
    np.testing.assert_array_equal(final, proc + delta)  # uint8 wraparound
    assert len(os.listdir(png_dir)) == n

    # strict mode rejects corrupted md5s
    with open(delta_dir / "image_list.txt", "w") as f:
        f.write("idx orig_idx orig_file proc_md5 final_md5\n")
        for i in range(n):
            f.write(f"{i} {i} {names[i]} bad bad\n")
    with pytest.raises(RuntimeError, match="md5 mismatch"):
        create_celebahq(str(tmp_path / "hq3"), str(celeba), str(delta_dir),
                        shuffle=False, strict=True, expected_images=n)


def test_create_mnistrgb_semantics(tmp_path):
    """Stacked-MNIST creator (reference dataset_tool.py:307-334): same
    RandomState(123) draw sequence, RGB channels are the selected padded
    digits, and the 1000-way label is d_R + 10·d_G + 100·d_B."""
    import gzip
    import struct

    from inclusivegan_tpu.data.dataset_tool import create_mnistrgb

    n_src, n_out = 40, 12
    r = np.random.RandomState(7)
    digits = r.randint(0, 256, (n_src, 28, 28), np.uint8)
    dlabels = r.randint(0, 10, n_src).astype(np.uint8)
    mdir = tmp_path / "mnist"
    mdir.mkdir()
    with gzip.open(mdir / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n_src, 28, 28) + digits.tobytes())
    with gzip.open(mdir / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, n_src) + dlabels.tobytes())

    out = str(tmp_path / "stacked")
    create_mnistrgb(out, str(mdir), num_images=n_out)

    ds = TFRecordDataset(out, max_label_size="full")
    imgs = ds.get_all_images()
    labels = ds.get_all_labels()
    assert imgs.shape == (n_out, 3, 32, 32) and labels.shape == (n_out, 1000)

    padded = np.pad(digits, [(0, 0), (2, 2), (2, 2)])
    rnd = np.random.RandomState(123)  # the creator's documented seed
    for i in range(n_out):
        sel = rnd.randint(n_src, size=3)
        np.testing.assert_array_equal(imgs[i], padded[sel])
        # plain-python arithmetic: a uint8 oracle would wrap mod 256 exactly
        # like the bug this guards against (100*d_B for d_B>=3)
        mode = (int(dlabels[sel[0]]) + 10 * int(dlabels[sel[1]])
                + 100 * int(dlabels[sel[2]]))
        assert labels[i].argmax() == mode and labels[i].sum() == 1.0


def test_create_celeba_crop_and_attrs(tmp_path):
    """CelebA creator (reference dataset_tool.py:447-486): 128×128 crop
    centered at (cx,cy)=(89,121) and 40-dim binary attribute labels parsed
    from list_attr_celeba.txt."""
    from PIL import Image

    from inclusivegan_tpu.data.dataset_tool import create_celeba

    cdir = tmp_path / "celeba" / "img_align_celeba"
    cdir.mkdir(parents=True)
    (tmp_path / "celeba" / "Anno").mkdir()
    r = np.random.RandomState(0)
    srcs = []
    names = []
    for i in range(3):
        arr = r.randint(0, 256, (218, 178, 3), np.uint8)
        srcs.append(arr)
        name = f"{i + 1:06d}.png"  # png: lossless, so crop check is exact
        names.append(name.replace(".png", ".jpg"))
        Image.fromarray(arr, "RGB").save(str(cdir / name))
        os.rename(str(cdir / name), str(cdir / names[-1]))
    attr_names = [f"attr{j}" for j in range(40)]
    attrs = r.randint(0, 2, (3, 40))
    with open(tmp_path / "celeba" / "Anno" / "list_attr_celeba.txt", "w") as f:
        f.write("3\n" + " ".join(attr_names) + "\n")
        for i, name in enumerate(names):
            f.write(name + " " + " ".join("1" if v else "-1"
                                          for v in attrs[i]) + "\n")

    out = str(tmp_path / "ds")
    create_celeba(out, str(tmp_path / "celeba"))
    ds = TFRecordDataset(out, max_label_size="full")
    imgs = ds.get_all_images()
    labels = ds.get_all_labels()
    assert imgs.shape == (3, 3, 128, 128) and labels.shape == (3, 40)
    cx, cy = 89, 121
    for i in range(3):
        expected = srcs[i][cy - 64: cy + 64, cx - 64: cx + 64].transpose(2, 0, 1)
        np.testing.assert_array_equal(imgs[i], expected)
        np.testing.assert_array_equal(labels[i], attrs[i].astype(np.float32))


def test_load_image_records_bulk_and_ragged(tmp_path):
    """The strided bulk decoder must agree with per-record protobuf decode
    on uniform shards, honour max_images, and fall back for ragged shards
    (mixed shapes break the fixed-stride assumption)."""
    from inclusivegan_tpu.data import tfrecord

    rng = np.random.RandomState(0)
    uniform = str(tmp_path / "u.tfrecords")
    imgs = [rng.randint(0, 256, (3, 8, 8), np.uint8) for _ in range(17)]
    with open(uniform, "wb") as f:
        for im in imgs:
            tfrecord.write_record(f, tfrecord.encode_image_example(im))
    out = tfrecord.load_image_records(uniform)
    np.testing.assert_array_equal(out, np.stack(imgs))
    np.testing.assert_array_equal(
        tfrecord.load_image_records(uniform, max_images=5), np.stack(imgs[:5]))

    ragged = str(tmp_path / "r.tfrecords")
    shapes = [(3, 8, 8), (3, 4, 4), (3, 8, 8)]
    rimgs = [rng.randint(0, 256, s, np.uint8) for s in shapes]
    with open(ragged, "wb") as f:
        for im in rimgs:
            tfrecord.write_record(f, tfrecord.encode_image_example(im))
    # ragged shards cannot be stacked; the fallback decodes per record, so
    # max_images restricted to a uniform prefix still works
    np.testing.assert_array_equal(
        tfrecord.load_image_records(ragged, max_images=1), rimgs[0][None])


# ------------------------------------------------------------------ prefetch

def test_prefetcher_exactly_once_in_order():
    """A full queue must BLOCK the worker, not re-invoke fn: every fn()
    result is delivered exactly once and in order, so prefetched and inline
    assembly read identical iterator streams (training_loop relies on this
    for IMLE cursor arithmetic)."""
    import itertools
    import time
    from inclusivegan_tpu.data.dataset import Prefetcher

    counter = itertools.count()
    pf = Prefetcher(lambda: next(counter), depth=2)
    time.sleep(0.6)  # queue fills; worker repeatedly hits Full and must wait
    got = [pf.get() for _ in range(10)]
    pf.close()
    assert got == list(range(10))


def test_prefetcher_close_joins_worker():
    """close() must join the worker (even when it is blocked on a full
    queue) so the caller can mutate shared state, e.g. an IMLE rebuild."""
    import time
    from inclusivegan_tpu.data.dataset import Prefetcher

    state = {"n": 0}

    def fn():
        state["n"] += 1
        return state["n"]

    pf = Prefetcher(fn, depth=1)
    time.sleep(0.3)
    pf.close()
    assert not pf._thread.is_alive()
    n = state["n"]
    time.sleep(0.3)
    assert state["n"] == n  # no assembly after close returns


def test_prefetcher_propagates_exception():
    from inclusivegan_tpu.data.dataset import Prefetcher

    def boom():
        raise ValueError("assembly failed")

    pf = Prefetcher(boom, depth=2)
    with pytest.raises(ValueError, match="assembly failed"):
        pf.get()
    pf.close()
