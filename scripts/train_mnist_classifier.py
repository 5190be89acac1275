#!/usr/bin/env python3
"""Train the stacked-MNIST mode classifier.

The reference ships a frozen ``stacked_mnist_classifier.pkl``
(/root/reference/metrics/mode_counts.py:29, not in-tree). This trains the
JAX equivalent (models/feature_nets.py: per-digit CNN) from MNIST idx files
in minutes on CPU/TPU and saves an npz consumed by the mode_counts/KL
metrics via ``classifier_weights=``.

Usage: python scripts/train_mnist_classifier.py --mnist-dir mnist/ \
           --out metrics_weights/stacked_mnist_classifier.npz
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mnist-dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    args = parser.parse_args()

    from inclusivegan_tpu.data.dataset_tool import (_find, _load_mnist_images,
                                                    _load_mnist_labels)
    from inclusivegan_tpu.models.feature_nets import (
        StackedMNISTClassifier, init_mnist_classifier,
        mnist_classifier_logits)
    from inclusivegan_tpu.training.optimizer import adam_apply, init_adam

    images = _load_mnist_images(_find(args.mnist_dir, "train-images-idx3-ubyte*"))
    labels = _load_mnist_labels(_find(args.mnist_dir, "train-labels-idx1-ubyte*"))
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)])[:, None].astype(np.float32) / 255.0

    params = init_mnist_classifier(jax.random.key(0))
    opt = init_adam(params)

    @jax.jit
    def train_step(params, opt, x, y):
        def loss_fn(p):
            logits = mnist_classifier_logits(p, x)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(y.shape[0]), y])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt, _ = adam_apply(params, grads, opt,
                                    learning_rate=args.lr, beta1=0.9,
                                    beta2=0.999)
        return params, opt, loss

    n = images.shape[0]
    rng = np.random.RandomState(0)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch + 1, args.batch):
            idx = order[i:i + args.batch]
            params, opt, loss = train_step(params, opt,
                                           jnp.asarray(images[idx]),
                                           jnp.asarray(labels[idx]))
            losses.append(float(loss))
        # train accuracy on a slice
        logits = mnist_classifier_logits(params, jnp.asarray(images[:4096]))
        acc = float((np.argmax(np.asarray(logits), 1) == labels[:4096]).mean())
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} acc {acc:.4f}")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    StackedMNISTClassifier.save(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
