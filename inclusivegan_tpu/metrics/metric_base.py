"""Metric framework — capability parity with
/root/reference/metrics/metric_base.py.

Reference behaviors kept: each metric evaluates a Gs snapshot loaded from a
network pkl in isolation (:61-77), real-statistics caching keyed by an md5
of the evaluation arguments (:110-117), results appended to
``metric-<name>.txt`` (:72-75), ``MetricGroup`` fan-out (:145-158) and
``DummyMetric`` (:163-166).

TPU note: a fresh jitted sampler per evaluation replaces the reference's
fresh tf.Graph+Session; generation batches run on the device mesh."""

import hashlib
import os
import pickle
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.easydict import EasyDict
from ..utils.registry import get_obj_by_name


def _cache_dir() -> str:
    d = os.environ.get("INCLUSIVEGAN_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "inclusivegan_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


class GsSampler:
    """Batched eval-mode image sampler over a snapshot's Gs.

    ``num_devices`` > 1 shards the sample batch over a 1-D data mesh — the
    TPU-native equivalent of the reference's per-GPU ``Network.run`` graph
    replication (network.py:403-428): params are placed replicated, latents
    sharded on the leading axis, and jit partitions the program SPMD."""

    def __init__(self, network_pkl: str, minibatch_size: int = 32,
                 truncation_psi: Optional[float] = None, seed: int = 1000,
                 num_devices: int = 1,
                 input_transform=None, output_transform=None):
        """``input_transform``/``output_transform`` are the TPU-native form
        of Network.run's transform hooks (reference network.py:380-393,
        used there as dotted-name funcs like convert_images_to_uint8):
        jit-traced callables applied to the latents before the mapping net
        and to the float [-1,1] images before fetch. The default output
        transform is the reference's uint8 conversion (tfutil.py:255-267);
        pass ``output_transform=lambda x: x`` for raw float images."""
        from ..training.training_loop import load_snapshot
        self.G, self.D, params = load_snapshot(network_pkl)
        self.gs_params = params["gs_params"]
        self.d_params = params["d_params"]
        self.minibatch = minibatch_size
        self.latent_size = self.G.mapping.latent_size
        self.label_size = self.G.mapping.label_size
        self.resolution = self.G.synthesis.resolution
        self.num_channels = self.G.synthesis.num_channels
        self._psi = truncation_psi
        self._key = jax.random.key(seed)

        self._z_sharding = None
        if num_devices and num_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import make_data_mesh
            mesh = make_data_mesh(num_devices)
            n_dev = mesh.devices.size
            if n_dev != num_devices:
                print(f"GsSampler: requested {num_devices} devices, "
                      f"only {n_dev} available — sharding over {n_dev}")
            # leading axis must shard evenly
            mb = max(n_dev, (self.minibatch // n_dev) * n_dev)
            if mb != self.minibatch:
                print(f"GsSampler: minibatch {self.minibatch} → {mb} "
                      f"(multiple of {n_dev} devices)")
            self.minibatch = mb
            self._z_sharding = NamedSharding(mesh, P("data"))
            self.gs_params = jax.device_put(
                self.gs_params, NamedSharding(mesh, P()))

        @jax.jit
        def sample(params, z, rng):
            if input_transform is not None:
                z = input_transform(z)
            img = self.G.apply(params, z,
                               jnp.zeros((z.shape[0], self.label_size)),
                               rng=rng,
                               truncation_psi=truncation_psi
                               if truncation_psi is not None else 1.0)
            if output_transform is not None:
                return output_transform(img)
            # default: quantize ON DEVICE (reference feeds metric nets uint8
            # images, tfutil.py:255-267): a uint8 fetch moves 4x less than
            # float32 over the device->host link, which dominates eval wall
            # time on relay-attached TPUs (BENCH_NOTES.md)
            return jnp.rint(jnp.clip((img + 1.0) * 127.5, 0, 255)
                            ).astype(jnp.uint8)

        self._sample = sample

    def run(self, latents: np.ndarray) -> np.ndarray:
        """latents [N,Z] → images [N,C,H,W]; uint8 in [0,255] under the
        default output transform, whatever the hook returns otherwise."""
        outs = []
        bs = self.minibatch
        # one-deep pipeline: dispatch batch i+1 before the blocking host
        # fetch of batch i, so transfer overlaps the next G forward
        pend = None
        for i in range(0, latents.shape[0], bs):
            z = latents[i:i + bs]
            pad = bs - z.shape[0]
            if pad > 0:
                z = np.concatenate([z, np.zeros((pad, z.shape[1]), z.dtype)])
            self._key, k = jax.random.split(self._key)
            z = jnp.asarray(z)
            if self._z_sharding is not None:
                z = jax.device_put(z, self._z_sharding)
            img = self._sample(self.gs_params, z, k)
            if pend is not None:
                outs.append(np.asarray(pend[0])[:pend[1]])
            pend = (img, bs - pad if pad else bs)
        if pend is not None:
            outs.append(np.asarray(pend[0])[:pend[1]])
        return np.concatenate(outs)[:latents.shape[0]]

    def random_images(self, num: int, seed: int = 0) -> Iterator[np.ndarray]:
        """Yields uint8 image chunks. Generation still runs in
        ``minibatch``-sized jitted batches (same shapes, same numerics),
        but many batches are dispatched per chunk so run()'s fetch pipeline
        actually overlaps transfer with compute; the latent stream is one
        contiguous seeded PCG64 draw either way (legacy RandomState.randn
        runs at ~0.3M values/s on this vCPU class — ~40 s of the old
        115 s/24k-sample eval was latent generation)."""
        rnd = np.random.Generator(np.random.PCG64(seed))
        chunk = max(self.minibatch, 1024)
        done = 0
        while done < num:
            take = min(chunk, num - done)
            yield self.run(rnd.standard_normal((take, self.latent_size),
                                               dtype=np.float32))
            done += take


def apply_in_batches(fn, images: np.ndarray, minibatch: int) -> np.ndarray:
    """Apply a jitted feature net in fixed ``minibatch``-sized slices.

    random_images yields large transfer-friendly chunks; feature nets must
    still see the metric's ``minibatch_per_gpu`` batch size — an InceptionV3
    forward over a whole 1024-image chunk at 299×299 would allocate tens of
    GB of activations."""
    outs = []
    for i in range(0, images.shape[0], minibatch):
        outs.append(fn(images[i:i + minibatch]))
    return np.concatenate(outs)


class MetricBase:
    def __init__(self, name: str):
        self.name = name
        self._results = []
        self._eval_time = 0.0
        self._network_name = ""

    # -- caching (reference :110-117) -----------------------------------
    def _get_cache_file(self, extension="pkl", **kwargs) -> str:
        md5 = hashlib.md5(repr(sorted(kwargs.items())).encode()).hexdigest()
        return os.path.join(_cache_dir(),
                            f"{md5}-{self.name}.{extension}")

    def run(self, network_pkl: str, run_dir: Optional[str] = None,
            dataset_args: dict = {}, data_dir: Optional[str] = None,
            minibatch_size: int = 32, num_devices: int = 1,
            mirror_augment: Optional[bool] = None,
            **eval_kwargs):
        self._results = []
        self._network_name = os.path.splitext(os.path.basename(network_pkl))[0]
        if mirror_augment is None and run_dir is not None:
            # recover the run's own augmentation setting so real statistics
            # match the training distribution (reference metric_base.py:49-53)
            from ..utils.misc import parse_config_for_previous_run
            try:
                mirror_augment = bool(parse_config_for_previous_run(run_dir)
                                      ["train"].get("mirror_augment", False))
            except Exception:
                mirror_augment = False
        self._mirror_augment = bool(mirror_augment or False)
        self._mirror_rng = np.random.default_rng(123)
        if not dataset_args and run_dir is not None:
            # fall back to the run's own dataset config (reference
            # metric_base.py:48-52 via misc.parse_config_for_previous_run)
            from ..utils.misc import parse_config_for_previous_run
            try:
                dataset_args = parse_config_for_previous_run(run_dir)["dataset"]
            except Exception as e:
                # dataset-less metrics (IS, PPL, mode_counts, KL) still run;
                # dataset-needing ones will fail at load_dataset — say why
                print(f"warning: no dataset config recoverable from "
                      f"{run_dir} ({e}); metrics needing reals will fail")
                dataset_args = {}
        t0 = time.time()
        sampler = GsSampler(network_pkl, minibatch_size=minibatch_size,
                            num_devices=num_devices)
        self._evaluate(sampler, dataset_args=dict(dataset_args),
                       data_dir=data_dir, **eval_kwargs)
        self._eval_time = time.time() - t0

        result_str = self.get_result_str()
        print(result_str)
        if run_dir is not None:
            with open(os.path.join(run_dir, f"metric-{self.name}.txt"), "a") as f:
                f.write(result_str + "\n")
        return {f"{self.name}{suffix}": value
                for value, suffix, _fmt in self._results}

    def get_result_str(self) -> str:
        out = f"{self._network_name:<30s} time {self._eval_time:<12.1f}"
        for value, suffix, fmt in self._results:
            out += f" {self.name}{suffix} {value:{fmt}}"
        return out

    def _report_result(self, value, suffix="", fmt="-10.4f"):
        self._results.append((value, suffix, fmt))

    def _open_dataset(self, dataset_args, data_dir):
        from ..data.dataset import load_dataset
        return load_dataset(data_dir=data_dir, shuffle=False, **dataset_args)

    def _reals_batch(self, dataset, n):
        """Real minibatch with the run's mirror augmentation applied, so
        real-side statistics see the same distribution training saw
        (reference metric_base.py:128-129)."""
        from ..utils.misc import apply_mirror_augment
        imgs, labels = dataset.get_minibatch_np(n)
        if self._mirror_augment:
            imgs = apply_mirror_augment(imgs, self._mirror_rng)
        return imgs, labels

    def _evaluate(self, sampler: GsSampler, dataset_args, data_dir, **kwargs):
        raise NotImplementedError


class DummyMetric(MetricBase):
    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        self._report_result(0.0)


class MetricGroup:
    def __init__(self, metric_arg_list):
        self.metrics = [make_metric(**args) for args in metric_arg_list]

    def run(self, *args, **kwargs):
        results = {}
        for metric in self.metrics:
            results.update(metric.run(*args, **kwargs))
        return results


def make_metric(name: str, func_name: str, **kwargs) -> MetricBase:
    cls = get_obj_by_name(func_name)
    metric = cls(name=name, **kwargs)
    return metric


def run_metric(args: dict, network_pkl: str, dataset_args: dict = {},
               data_dir: Optional[str] = None, run_dir: Optional[str] = None,
               **kwargs):
    args = dict(args)
    metric = make_metric(**args)
    return metric.run(network_pkl, run_dir=run_dir, dataset_args=dataset_args,
                      data_dir=data_dir, **kwargs)
