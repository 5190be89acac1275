"""PPL — capability parity with
/root/reference/metrics/perceptual_path_length.py: slerp in z / lerp in w
with ε=1e-4 (:60-77), shared noise per endpoint pair (:80-81), face crop +
downsample to 256 (:83-93), LPIPS/ε² (:99-101), 1–99 percentile outlier
rejection (:110-114)."""

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lpips import get_lpips_params, lpips_distance
from ..training.loss import slerp
from .metric_base import MetricBase


def crop_and_downsample(img, crop):
    """Reference :83-93: with ``crop``, keep only the face region — the
    ASYMMETRIC window rows [3c, 7c) × cols [2c, 6c), c = H//8 (faces sit
    below center in the FFHQ/CelebA framing) at ANY resolution — then
    mean-pool down to ≤256 (VGG was built for 224×224)."""
    ch = img.shape[1]
    if crop:
        c = img.shape[2] // 8
        img = img[:, :, c * 3:c * 7, c * 2:c * 6]
    factor = img.shape[2] // 256
    if factor > 1:
        img = img.reshape(-1, ch, img.shape[2] // factor, factor,
                          img.shape[3] // factor, factor).mean((3, 5))
    return img


class PPL(MetricBase):
    def __init__(self, name, num_samples=50000, epsilon=1e-4, space="w",
                 sampling="full", crop=False, minibatch_per_gpu=16,
                 lpips_weights=None, **kwargs):
        assert space in ("z", "w") and sampling in ("full", "end")
        super().__init__(name)
        self.num_samples = num_samples
        self.epsilon = epsilon
        self.space = space
        self.sampling = sampling
        self.crop = crop
        self.minibatch = minibatch_per_gpu
        self.lpips_weights = lpips_weights

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        G = sampler.G
        gs = sampler.gs_params
        lpips_params = get_lpips_params(self.lpips_weights)
        eps = self.epsilon
        num_layers = G.synthesis.num_layers

        @jax.jit
        def pair_distance(params, z01, t, rng):
            """z01: [2B, Z] endpoint latents; t: [B] positions."""
            b = t.shape[0]
            if self.space == "z":
                z0, z1 = z01[0::2], z01[1::2]
                zt0 = slerp(z0, z1, t[:, None])
                zt1 = slerp(z0, z1, t[:, None] + eps)
                w = G.mapping.apply(params["mapping"],
                                    jnp.concatenate([zt0, zt1]))
            else:
                w01 = G.mapping.apply(params["mapping"], z01)
                w0, w1 = w01[0::2], w01[1::2]
                wt0 = w0 + (w1 - w0) * t[:, None, None]
                wt1 = w0 + (w1 - w0) * (t[:, None, None] + eps)
                w = jnp.concatenate([wt0, wt1])
            # fresh BATCH-SHARED noise per minibatch (reference :79-80:
            # the noise vars are re-initialized under control_dependencies
            # once per minibatch and shared by every image in it — both
            # interpolation endpoints of a pair must see identical noise,
            # and the metric is an expectation over noise draws, not a
            # single fixed draw)
            img = G.synthesis.apply(params["synthesis"], w,
                                    noise=G.synthesis.init_noise(rng),
                                    randomize_noise=False)
            img = crop_and_downsample(img, self.crop)
            img = (img + 1.0) * 127.5
            d = lpips_distance(lpips_params, img[:b], img[b:])
            return d * (1.0 / eps ** 2)

        rnd = np.random.RandomState(123)
        dists = []
        done = 0
        key = jax.random.key(0)
        while done < self.num_samples:
            take = min(self.minibatch, self.num_samples - done)
            z01 = rnd.randn(2 * take, G.mapping.latent_size).astype(np.float32)
            if self.sampling == "full":
                t = rnd.uniform(0, 1, take).astype(np.float32)
            else:
                t = np.zeros(take, np.float32)
            key, k = jax.random.split(key)
            d = pair_distance(gs, jnp.asarray(z01), jnp.asarray(t), k)
            dists.append(np.asarray(d))
            done += take
        dists = np.concatenate(dists)

        lo = np.percentile(dists, 1, method="lower")
        hi = np.percentile(dists, 99, method="higher")
        filtered = np.extract(np.logical_and(lo <= dists, dists <= hi), dists)
        self._report_result(float(np.mean(filtered)))
