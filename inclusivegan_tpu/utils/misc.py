"""Small host-side utilities (reference: dnnlib/util.py, training/misc.py)."""

import os
import pickle
import re
from typing import Any, Optional, Tuple

import numpy as np


def format_time(seconds: float) -> str:
    """'1d 02h 03m' style elapsed-time formatting (util.py:111-123)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // 86400}d {(s // 3600) % 24:02d}h {(s // 60) % 60:02d}m"


def is_pickleable(obj: Any) -> bool:
    try:
        with open("/dev/null", "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
        return True
    except Exception:
        return False


def apply_mirror_augment(minibatch: np.ndarray,
                         rng: Optional[np.random.Generator] = None
                         ) -> np.ndarray:
    """Horizontally flip a random half of an NCHW minibatch (reference
    training/misc.py::apply_mirror_augment). ``rng=None`` uses the global
    legacy stream like the reference; metrics pass a seeded Generator so
    cached real statistics are reproducible."""
    rand = (np.random.rand(minibatch.shape[0]) if rng is None
            else rng.random(minibatch.shape[0]))
    mask = rand < 0.5
    minibatch = np.array(minibatch)
    minibatch[mask] = minibatch[mask, :, :, ::-1]
    return minibatch


def adjust_dynamic_range(data, drange_in, drange_out):
    """Linear range remap, e.g. uint8 [0,255] → float [-1,1]
    (reference: training/misc.py:36-41)."""
    if drange_in != drange_out:
        scale = (np.float32(drange_out[1]) - np.float32(drange_out[0])) / (
            np.float32(drange_in[1]) - np.float32(drange_in[0]))
        bias = np.float32(drange_out[0]) - np.float32(drange_in[0]) * scale
        data = data * scale + bias
    return data


def slerp_np(a: np.ndarray, b: np.ndarray, t) -> np.ndarray:
    """Spherical interpolation on host latents — exact formula parity with
    the reference (training/misc.py:196-203): inputs normalized, result
    re-normalized to the unit sphere. a, b: [..., D]."""

    def normalize(v):
        return v / np.sqrt(np.sum(np.square(v), axis=-1, keepdims=True))

    a64 = normalize(a.astype(np.float64))
    b64 = normalize(b.astype(np.float64))
    d = np.clip(np.sum(a64 * b64, axis=-1, keepdims=True), -1.0, 1.0)
    p = np.asarray(t, np.float64) * np.arccos(d)
    c = normalize(b64 - d * a64)
    out = a64 * np.cos(p) + c * np.sin(p)
    return normalize(out).astype(a.dtype)


def parse_config_for_previous_run(run_dir: str) -> dict:
    """Recover training/dataset config from a run dir's submit_config.pkl
    (reference training/misc.py:85-89) — lets metrics re-open the run's own
    dataset when dataset_args aren't given (metric_base.py:48-52)."""
    import pickle
    with open(os.path.join(run_dir, "submit_config.pkl"), "rb") as f:
        sc = pickle.load(f)
    data = getattr(sc, "run_func_kwargs", {}) or {}
    return dict(train=data, dataset=data.get("dataset_args", {}))


def parse_kimg_time_from_log(log_path: str) -> Tuple[float, float]:
    """Recover (kimg, seconds) from the last tick line of a previous run's
    log.txt — resume capability parity with ``misc.resume_kimg_time``
    (reference: training/misc.py:147-187)."""
    kimg, seconds = 0.0, 0.0
    try:
        with open(log_path) as f:
            for line in f:
                m = re.search(r"kimg ([\d.]+).*time ((?:\d+d )?(?:\d+h )?(?:\d+m )?(?:\d+s)?)", line)
                if m:
                    kimg = float(m.group(1))
                    seconds = _time_to_seconds(m.group(2))
    except FileNotFoundError:
        pass
    return kimg, seconds


def _time_to_seconds(text: str) -> float:
    total = 0.0
    for value, unit in re.findall(r"(\d+)([dhms])", text):
        total += int(value) * {"d": 86400, "h": 3600, "m": 60, "s": 1}[unit]
    return total


def convert_images_from_uint8(images, drange=(-1, 1)):
    """uint8 [0,255] → float drange (reference tfutil.py:245-252)."""
    return adjust_dynamic_range(np.asarray(images, np.float32),
                                [0, 255], list(drange))


def convert_images_to_uint8(images, drange=(-1, 1), nchw_to_nhwc=False):
    """float drange → uint8 (reference tfutil.py:255-267), optional NHWC."""
    img = adjust_dynamic_range(np.asarray(images, np.float32),
                               list(drange), [0, 255])
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    if nchw_to_nhwc:
        img = np.transpose(img, (0, 2, 3, 1))
    return img


def is_url(obj: Any) -> bool:
    return isinstance(obj, str) and "://" in obj


def open_url(url: str, cache_dir: Optional[str] = None, num_attempts: int = 10,
             verbose: bool = True):
    """Download with retry + on-disk cache, returning an open binary file
    (reference dnnlib/util.py:328-408). Kept for API parity; this build
    container has no egress, so callers should expect failures here and
    provide local files."""
    import hashlib
    import io
    import urllib.request
    assert is_url(url)
    assert num_attempts >= 1
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "inclusivegan_tpu", "downloads")
    os.makedirs(cache_dir, exist_ok=True)
    key = hashlib.md5(url.encode()).hexdigest()
    for name in os.listdir(cache_dir):
        if name.startswith(key):
            with open(os.path.join(cache_dir, name), "rb") as f:
                return io.BytesIO(f.read())
    for attempt in range(num_attempts):
        try:
            with urllib.request.urlopen(url, timeout=60) as res:
                data = res.read()
            path = os.path.join(cache_dir, f"{key}_{os.path.basename(url)[:64]}")
            with open(path, "wb") as f:
                f.write(data)
            return io.BytesIO(data)
        except Exception:
            if attempt == num_attempts - 1:
                raise
            if verbose:
                print(f"open_url retry {attempt + 1}/{num_attempts}: {url}")
    raise IOError(url)


def load_pkl(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pkl(obj: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def create_image_grid(images: np.ndarray, grid_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Tile [N,C,H,W] images into one [C,gh*H,gw*W] grid image
    (reference: training/misc.py:43-61)."""
    assert images.ndim in (3, 4)
    num, img_c, img_h, img_w = images.shape
    if grid_size is not None:
        grid_w, grid_h = grid_size
    else:
        grid_w = max(int(np.ceil(np.sqrt(num))), 1)
        grid_h = max((num - 1) // grid_w + 1, 1)
    grid = np.zeros([img_c, grid_h * img_h, grid_w * img_w], dtype=images.dtype)
    for idx in range(num):
        x = (idx % grid_w) * img_w
        y = (idx // grid_w) * img_h
        grid[:, y:y + img_h, x:x + img_w] = images[idx]
    return grid


def convert_to_uint8_pil(images: np.ndarray, drange=(-1, 1)) -> np.ndarray:
    """[C,H,W] or [N,C,H,W] float → HWC uint8 for PIL saving
    (reference: misc.py:25-41 convert_to_pil_image)."""
    img = adjust_dynamic_range(images, drange, (0, 255))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    if img.ndim == 3:
        return np.transpose(img, (1, 2, 0))
    return np.transpose(img, (0, 2, 3, 1))


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1), grid_size=None) -> None:
    from PIL import Image
    grid = create_image_grid(images, grid_size)
    hwc = convert_to_uint8_pil(grid, drange)
    if hwc.shape[-1] == 1:
        Image.fromarray(hwc[..., 0], "L").save(path)
    else:
        Image.fromarray(hwc, "RGB").save(path)
