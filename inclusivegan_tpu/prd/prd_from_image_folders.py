#!/usr/bin/env python3
"""PRD folder CLI — surface parity with
/root/reference/precision-recall-distributions/prd_from_image_folders.py:
embed a reference folder and N generated folders (md5-keyed embedding cache,
:53-62), compute PRD with 20 clusters / 10 runs, print the (F8, F1/8) pairs
and save the plot (:66-85). Embedder: VGGFeatureNet (see
models/feature_nets.py for the no-egress weight policy)."""

import argparse
import glob
import hashlib
import os

import numpy as np


def load_images_from_folder(folder: str, num_images: int) -> np.ndarray:
    from PIL import Image
    files = sorted(glob.glob(os.path.join(folder, "*.png")) +
                   glob.glob(os.path.join(folder, "*.jpg")))
    assert len(files) >= num_images, (folder, len(files), num_images)
    imgs = []
    for f in files[:num_images]:
        arr = np.asarray(Image.open(f))
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        imgs.append(arr)
    return np.stack(imgs).astype(np.float32)


def embed_folder(folder: str, num_images: int, cache_dir: str,
                 batch: int = 64) -> np.ndarray:
    from ..models.feature_nets import VGGFeatureNet
    net = VGGFeatureNet()
    key = hashlib.md5(f"{os.path.abspath(folder)}|{num_images}|"
                      f"{net.checksum()}".encode()).hexdigest()
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"prd_embed_{key}.npy")
    if os.path.exists(cache):
        return np.load(cache)
    imgs = load_images_from_folder(folder, num_images)
    feats = np.concatenate([net(imgs[i:i + batch])
                            for i in range(0, len(imgs), batch)])
    np.save(cache, feats)
    return feats


def main():
    from . import prd_score
    parser = argparse.ArgumentParser(
        description="Assess generative models with PRD (TPU-native).")
    parser.add_argument("--reference_dir", required=True)
    parser.add_argument("--eval_dirs", nargs="+", required=True)
    parser.add_argument("--eval_labels", nargs="+", required=True)
    parser.add_argument("--num_clusters", type=int, default=20)
    parser.add_argument("--num_angles", type=int, default=1001)
    parser.add_argument("--num_runs", type=int, default=10)
    parser.add_argument("--plot_path", default="prd.png")
    parser.add_argument("--cache_dir", default="/tmp/prd_cache")
    parser.add_argument("--num_images", type=int, default=50000)
    parser.add_argument("--silent", action="store_true")
    args = parser.parse_args()
    assert len(args.eval_dirs) == len(args.eval_labels)

    ref_feats = embed_folder(args.reference_dir, args.num_images,
                             args.cache_dir)
    prd_pairs = []
    for d in args.eval_dirs:
        eval_feats = embed_folder(d, args.num_images, args.cache_dir)
        prd_pairs.append(prd_score.compute_prd_from_embedding(
            eval_feats, ref_feats, num_clusters=args.num_clusters,
            num_angles=args.num_angles, num_runs=args.num_runs))
    f_beta_pairs = [prd_score.prd_to_max_f_beta_pair(p, r)
                    for p, r in prd_pairs]
    if not args.silent:
        print("F_8   F_1/8     model")
        for label, (f8, f1_8) in zip(args.eval_labels, f_beta_pairs):
            print(f"{f8:.3f} {f1_8:.3f}     {label}")
    prd_score.plot(prd_pairs, labels=args.eval_labels,
                   out_path=args.plot_path)


if __name__ == "__main__":
    main()
