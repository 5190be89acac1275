#!/usr/bin/env python3
"""Image generation CLI — surface parity with
/root/reference/run_generator.py (generate-images subcommand :19-37,
flags :62-72): loads the Gs snapshot, draws latents from RandomState(0),
re-randomizes the per-layer noise variables per batch, saves %06d.png into a
numbered run dir."""

import argparse
import os
import sys

import numpy as np

from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run
from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: warm starts across processes


def generate_images(submit_config, network_pkl, num_images, minibatch_size,
                    truncation_psi=None):
    import jax
    import jax.numpy as jnp
    import PIL.Image
    from inclusivegan_tpu.training.training_loop import load_snapshot

    print(f'Loading networks from "{network_pkl}"...')
    G, _D, params = load_snapshot(network_pkl)
    gs_params = dict(params["gs_params"])
    psi = truncation_psi if truncation_psi is not None else G.truncation_psi

    @jax.jit
    def sample(p, z, rng):
        img = G.apply(p, z, jnp.zeros((z.shape[0], G.mapping.label_size)),
                      rng=rng, truncation_psi=psi, randomize_noise=False)
        img = jnp.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(jnp.uint8)
        return jnp.transpose(img, (0, 2, 3, 1))  # NHWC for PIL

    rnd = np.random.RandomState(0)
    key = jax.random.key(0)
    for image_idx in range(0, num_images, minibatch_size):
        z = rnd.randn(minibatch_size, G.mapping.latent_size).astype(np.float32)
        # re-randomize noise variables per batch (reference :33)
        noise = dict(gs_params["noise"])
        for name in noise:
            noise[name] = jnp.asarray(
                rnd.randn(*noise[name].shape).astype(np.float32))
        gs_params["noise"] = noise
        key, k = jax.random.split(key)
        images = np.asarray(sample(gs_params, jnp.asarray(z), k))
        for i in range(minibatch_size):
            if image_idx + i >= num_images:
                break
            print(f"\rGenerating images ({image_idx + i}/{num_images}) ...",
                  end="", flush=True)
            arr = images[i]
            img = (PIL.Image.fromarray(arr[..., 0], "L") if arr.shape[-1] == 1
                   else PIL.Image.fromarray(arr, "RGB"))
            img.save(os.path.join(submit_config.run_dir,
                                  f"{image_idx + i:06d}.png"))
    print()


def main():
    parser = argparse.ArgumentParser(
        description="StyleGAN2 generator (TPU-native).",
        formatter_class=argparse.RawDescriptionHelpFormatter)
    subparsers = parser.add_subparsers(help="Sub-commands", dest="command")

    p = subparsers.add_parser("generate-images", help="Generate images")
    p.add_argument("--network", dest="network_pkl", required=True)
    p.add_argument("--result-dir", default="generation", metavar="DIR")
    p.add_argument("--num-images", type=int, default=30000)
    p.add_argument("--minibatch-size", type=int, default=50)
    p.add_argument("--truncation-psi", type=float, default=None)

    args = parser.parse_args()
    kwargs = vars(args)
    subcmd = kwargs.pop("command")
    if subcmd is None:
        print("Error: missing subcommand.  Re-run with --help for usage.")
        sys.exit(1)

    sc = SubmitConfig()
    sc.run_dir_root = kwargs.pop("result_dir")
    sc.run_desc = subcmd
    func_name_map = {"generate-images": "run_generator.generate_images"}
    submit_run(sc, func_name_map[subcmd], **kwargs)


if __name__ == "__main__":
    main()
