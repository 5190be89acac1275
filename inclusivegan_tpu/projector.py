"""LPIPS latent projector — capability parity with
/root/reference/projector_lpips.py (the fork's Z-space inversion used for
the IvOM metric, run_projector.py:53-57).

Semantics kept: latents variable slerp-blended with decaying random noise
(:58-61), eval-mode Gs forward, [0,255] LPIPS distance to fixed targets with
≤256 downsampling (:67-80), Adam on the latents with cosine LR ramp-up/down
and a quadratic noise ramp (:130-136). The whole optimization step (forward
+ LPIPS + grad + Adam) is ONE jitted TPU function."""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.lpips import get_lpips_params, lpips_distance
from .training.loss import slerp
from .training.optimizer import AdamState, adam_apply, init_adam


class Projector:
    def __init__(self, num_steps: int = 1000,
                 initial_learning_rate: float = 0.1,
                 initial_noise_factor: float = 0.05,
                 lr_rampdown_length: float = 0.25,
                 lr_rampup_length: float = 0.05,
                 noise_ramp_length: float = 0.75,
                 lpips_weights: Optional[str] = None,
                 verbose: bool = False):
        self.num_steps = num_steps
        self.initial_learning_rate = initial_learning_rate
        self.initial_noise_factor = initial_noise_factor
        self.lr_rampdown_length = lr_rampdown_length
        self.lr_rampup_length = lr_rampup_length
        self.noise_ramp_length = noise_ramp_length
        self.verbose = verbose
        self._lpips_weights = lpips_weights
        self._cur_step = None

    def _info(self, *args):
        if self.verbose:
            print("Projector:", *args)

    def set_network(self, G, gs_params, minibatch_size: int = 1,
                    num_steps: int = 1000,
                    initial_noise_factor: float = 0.05):
        self._G = G
        self._gs_params = gs_params
        self._minibatch = minibatch_size
        self.num_steps = num_steps
        self.initial_noise_factor = initial_noise_factor
        self._lpips_params = get_lpips_params(self._lpips_weights)
        res = G.synthesis.resolution
        self._proc_res = min(res, 256)

        def images_for(latents, noise_latents, noise_strength):
            z = slerp(latents, noise_latents, noise_strength)
            img = G.apply(self._gs_params, z,
                          jnp.zeros((latents.shape[0], G.mapping.label_size)),
                          truncation_psi=1.0, randomize_noise=False)
            return img, z

        def proc(img):
            x = (img + 1.0) * (255.0 / 2.0)
            sh = x.shape
            if sh[2] > 256:
                factor = sh[2] // 256
                x = x.reshape(-1, sh[1], sh[2] // factor, factor,
                              sh[3] // factor, factor).mean((3, 5))
            return x

        @jax.jit
        def opt_step(latents, opt_state, targets_proc, rng, noise_strength,
                     lrate):
            noise_latents = jax.random.normal(rng, latents.shape)

            def loss_fn(lat):
                img, _ = images_for(lat, noise_latents, noise_strength)
                dist = lpips_distance(self._lpips_params, proc(img),
                                      targets_proc)
                return jnp.sum(dist), dist

            (loss, dist), grads = jax.value_and_grad(loss_fn, has_aux=True)(latents)
            new_latents, new_opt, _ = adam_apply(
                {"z": latents}, {"z": grads}, opt_state, learning_rate=lrate,
                beta1=0.9, beta2=0.999, epsilon=1e-8)
            return new_latents["z"], new_opt, dist, loss

        @jax.jit
        def eval_outputs(latents, targets_proc):
            # noise strength 0: no blend. (slerp(a, a, t) is degenerate, and
            # the mapping net's pixel-norm makes the slerp's unit-norm
            # renormalization a no-op for the synthesized image anyway.)
            img = G.apply(self._gs_params, latents,
                          jnp.zeros((latents.shape[0], G.mapping.label_size)),
                          truncation_psi=1.0, randomize_noise=False)
            dist_targets = lpips_distance(self._lpips_params, proc(img),
                                          targets_proc)
            return img, latents, dist_targets

        self._opt_step = opt_step
        self._eval_outputs = eval_outputs

    def start(self, target_images, init_latents=None, seed: int = 0):
        target_images = np.asarray(target_images, np.float32)
        assert target_images.shape[0] == self._minibatch
        targets = (target_images + 1.0) * (255.0 / 2.0)
        sh = targets.shape
        if sh[2] > self._proc_res:
            factor = sh[2] // self._proc_res
            targets = targets.reshape(-1, sh[1], sh[2] // factor, factor,
                                      sh[3] // factor, factor).mean((3, 5))
        self._targets_proc = jnp.asarray(targets)
        if init_latents is None:
            init_latents = np.random.RandomState(seed).randn(
                self._minibatch, self._G.mapping.latent_size)
        self._latents = jnp.asarray(init_latents, jnp.float32)
        self._opt_state = init_adam({"z": self._latents})
        self._key = jax.random.key(seed)
        self._cur_step = 0
        self._last_dist = None

    def step(self):
        if self._cur_step >= self.num_steps:
            return
        t = self._cur_step / self.num_steps
        noise_strength = self.initial_noise_factor * max(
            0.0, 1.0 - t / self.noise_ramp_length) ** 2
        lr_ramp = min(1.0, (1.0 - t) / self.lr_rampdown_length)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, t / self.lr_rampup_length)
        learning_rate = self.initial_learning_rate * lr_ramp

        self._key, k = jax.random.split(self._key)
        self._latents, self._opt_state, dist, loss = self._opt_step(
            self._latents, self._opt_state, self._targets_proc, k,
            jnp.float32(noise_strength), jnp.float32(learning_rate))
        self._last_dist = dist
        self._cur_step += 1
        if self._cur_step == self.num_steps or self._cur_step % 10 == 0:
            self._info(f"{self._cur_step:<8d}"
                       f"{float(jnp.mean(dist)):<12g}{float(loss):<12g}")

    def run(self, target_images):
        self.start(target_images)
        while self._cur_step < self.num_steps:
            self.step()
        from .utils.easydict import EasyDict
        return EasyDict(latents=self.get_latents(), images=self.get_images(),
                        dist=self.get_dist())

    def get_cur_step(self):
        return self._cur_step

    def get_latents(self):
        return np.asarray(self._latents)

    def get_images(self):
        img, _z, _d = self._eval_outputs(self._latents, self._targets_proc)
        return np.asarray(img)

    def get_dist(self):
        _img, _z, d = self._eval_outputs(self._latents, self._targets_proc)
        return np.asarray(d)
