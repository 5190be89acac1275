#!/usr/bin/env python3
"""Latent projection CLI (IvOM) — surface parity with
/root/reference/run_projector.py: project batches of dataset reals for
num_steps, snapshot image%04d-step%04d.png, report mean±std of the final
LPIPS distances (:23-57,88-92)."""

import argparse
import os
import sys

import numpy as np

from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run
from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: warm starts across processes


def project_image(proj, targets, submit_config, image_idx_base,
                  snapshot_every=100):
    from inclusivegan_tpu.utils.misc import save_image_grid
    proj.start(targets)
    while proj.get_cur_step() < proj.num_steps:
        step = proj.get_cur_step()
        if step % snapshot_every == 0:
            imgs = proj.get_images()
            for i in range(imgs.shape[0]):
                save_image_grid(
                    imgs[i:i + 1],
                    os.path.join(submit_config.run_dir,
                                 f"image{image_idx_base + i:04d}-step{step:04d}.png"))
        print(f"\r{step} / {proj.num_steps} ... ", end="", flush=True)
        proj.step()
    print(f"\r{proj.num_steps} / {proj.num_steps} ... done")
    return proj.get_dist()


def project_real_images(submit_config, network_pkl, dataset_name, data_dir,
                        num_images, num_steps, minibatch_size=10,
                        num_snapshots=5, lpips_weights=None):
    from inclusivegan_tpu.data.dataset import load_dataset
    from inclusivegan_tpu.projector import Projector
    from inclusivegan_tpu.training.training_loop import load_snapshot
    from inclusivegan_tpu.utils.misc import adjust_dynamic_range, save_image_grid

    print(f'Loading networks from "{network_pkl}"...')
    G, _D, params = load_snapshot(network_pkl)
    proj = Projector(verbose=True, lpips_weights=lpips_weights)
    proj.set_network(G, params["gs_params"], minibatch_size=minibatch_size,
                     num_steps=num_steps)

    dataset = load_dataset(data_dir=data_dir, shuffle=False,
                           tfrecord_dir=dataset_name, max_label_size="full")
    all_dists = []
    snapshot_every = max(num_steps // num_snapshots, 1)
    for idx in range(0, num_images, minibatch_size):
        print(f"Projecting images {idx}-{idx + minibatch_size}/{num_images} ...")
        images, _labels = dataset.get_minibatch_np(minibatch_size)
        images = adjust_dynamic_range(images.astype(np.float32),
                                      dataset.dynamic_range, [-1, 1])
        for i in range(minibatch_size):
            save_image_grid(images[i:i + 1],
                            os.path.join(submit_config.run_dir,
                                         f"image{idx + i:04d}-target.png"))
        dists = project_image(proj, images, submit_config, idx,
                              snapshot_every)
        all_dists.append(np.asarray(dists))
        imgs = proj.get_images()
        for i in range(minibatch_size):
            save_image_grid(imgs[i:i + 1],
                            os.path.join(submit_config.run_dir,
                                         f"image{idx + i:04d}-final.png"))
    all_dists = np.concatenate(all_dists)
    print(f"IvOM (LPIPS after {num_steps} steps over {len(all_dists)} "
          f"images): {all_dists.mean():.4f} +- {all_dists.std():.4f}")
    with open(os.path.join(submit_config.run_dir, "ivom.txt"), "a") as f:
        f.write(f"{all_dists.mean():.6f} {all_dists.std():.6f} "
                f"{len(all_dists)}\n")
    return float(all_dists.mean()), float(all_dists.std())


def main():
    parser = argparse.ArgumentParser(
        description="Project real images into latent space (TPU-native).",
        formatter_class=argparse.RawDescriptionHelpFormatter)
    subparsers = parser.add_subparsers(help="Sub-commands", dest="command")

    p = subparsers.add_parser("project-real-images",
                              help="Project real images (IvOM)")
    p.add_argument("--network", dest="network_pkl", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--dataset", dest="dataset_name", required=True)
    p.add_argument("--num-images", type=int, default=3000)
    p.add_argument("--num-steps", type=int, default=400)
    p.add_argument("--minibatch-size", type=int, default=50)
    p.add_argument("--num-snapshots", type=int, default=5)
    p.add_argument("--result-dir", default="projection", metavar="DIR")
    p.add_argument("--lpips-weights", default=None, type=str,
                   help="LPIPS npz for the projection objective (default: "
                        "discover metrics_weights/vgg16_zhang_perceptual.npz, "
                        "else the pixel-pyramid fallback)")

    args = parser.parse_args()
    kwargs = vars(args)
    subcmd = kwargs.pop("command")
    if subcmd is None:
        print("Error: missing subcommand.  Re-run with --help for usage.")
        sys.exit(1)

    sc = SubmitConfig()
    sc.run_dir_root = kwargs.pop("result_dir")
    sc.run_desc = subcmd
    submit_run(sc, "run_projector.project_real_images", **kwargs)


if __name__ == "__main__":
    main()
