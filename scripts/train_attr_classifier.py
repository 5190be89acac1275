#!/usr/bin/env python3
"""Train the CelebA 40-attribute classifier (the LS metric's scorer).

The reference's linear_separability metric downloads 40 frozen
per-attribute classifiers (/root/reference/metrics/linear_separability.py:25-64,
external gdrive blobs). This trains the JAX equivalent — one shared conv
trunk with 40 sigmoid heads (models/feature_nets.py::CelebAAttrClassifier)
— on a CelebA-layout TFRecord dataset whose labels are the 40 binary
attributes (dataset_tool.py create_celeba), and saves the npz the LS
metric loads by default.

Usage:
  python scripts/train_attr_classifier.py \
      --data-dir /tmp/exp/datasets --dataset celeba_synth_30k \
      --out metrics_weights/celeba_attr_classifier.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--val-frac", type=float, default=0.05)
    args = p.parse_args()

    from inclusivegan_tpu.data.dataset import TFRecordDataset
    from inclusivegan_tpu.models.feature_nets import (
        CelebAAttrClassifier, attr_classifier_logits, init_attr_classifier)
    from inclusivegan_tpu.training.optimizer import adam_apply, init_adam
    from inclusivegan_tpu.utils.compilation_cache import \
        enable_compilation_cache

    enable_compilation_cache()

    ds = TFRecordDataset(os.path.join(args.data_dir, args.dataset),
                         max_label_size="full")
    images = ds.get_all_images()           # [N,3,H,W] uint8
    labels = ds.get_all_labels()           # [N,40] float {0,1}
    assert labels.shape[1] == 40, labels.shape
    n_val = max(int(len(images) * args.val_frac), 1)
    val_x, val_y = images[:n_val], labels[:n_val]
    tr_x, tr_y = images[n_val:], labels[n_val:]
    print(f"{len(tr_x)} train / {n_val} val images, res {images.shape[2]}")

    params = init_attr_classifier(jax.random.key(0))
    opt = init_adam(params)

    @jax.jit
    def train_step(params, opt, x_u8, y):
        def loss_fn(p):
            logits = attr_classifier_logits(
                p, x_u8.astype(jnp.float32) / 255.0)
            # sigmoid BCE, mean over batch x attrs
            z = jax.nn.log_sigmoid(logits)
            zneg = jax.nn.log_sigmoid(-logits)
            return -jnp.mean(y * z + (1.0 - y) * zneg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt, _ = adam_apply(params, grads, opt,
                                    learning_rate=args.lr, beta1=0.9,
                                    beta2=0.999)
        return params, opt, loss

    @jax.jit
    def val_probs(params, x_u8):
        return jax.nn.sigmoid(attr_classifier_logits(
            params, x_u8.astype(jnp.float32) / 255.0))

    rng = np.random.RandomState(0)
    n = len(tr_x)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch + 1, args.batch):
            idx = order[i:i + args.batch]
            params, opt, loss = train_step(params, opt,
                                           jnp.asarray(tr_x[idx]),
                                           jnp.asarray(tr_y[idx]))
            losses.append(float(loss))
        preds = []
        for i in range(0, n_val, args.batch):
            preds.append(np.asarray(val_probs(
                params, jnp.asarray(val_x[i:i + args.batch]))))
        preds = np.concatenate(preds) > 0.5
        acc = (preds == (val_y[:len(preds)] > 0.5)).mean()
        per_attr = (preds == (val_y[:len(preds)] > 0.5)).mean(0)
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"val acc {acc:.4f} (worst attr {per_attr.min():.3f})",
              flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    CelebAAttrClassifier.save(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
