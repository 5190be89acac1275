#!/usr/bin/env python3
"""One process of the two-process ``jax.distributed`` validation run.

Proves the PARITY.md claim that multi-host data parallelism is "free with
jax.distributed": the SAME mesh/shard_map training step used single-host
(training/train_step.py) runs unmodified across processes, with gradient
psums riding the cross-process collectives (gloo on CPU; ICI on a real pod).
The reference has no multi-host story at all (NCCL single-host only,
/root/reference/training/training_loop.py:258-297) — this is TPU-native
surplus, validated per VERDICT round-1 item 5.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and
``--xla_force_host_platform_device_count=N`` in the environment (set before
interpreter start — sitecustomize imports jax immediately).

Writes a JSON result: sha256 over every post-step param leaf (G, D, Gs,
pl_mean) + the psum'd loss scalars. The parent asserts both processes'
digests are identical — same params on every host after one optimizer step.
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # must precede any backend initialization (sitecustomize imports jax at
    # interpreter start, so env vars are too late — mirror tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from inclusivegan_tpu.models import Discriminator, GMain
    from inclusivegan_tpu.models.lpips import init_lpips_params
    from inclusivegan_tpu.training.train_state import create_train_state
    from inclusivegan_tpu.training.train_step import (TrainConfig,
                                                      make_train_step)

    assert jax.process_count() == args.num_processes, jax.process_count()
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("data",))

    # 16px is the smallest resolution the LPIPS trunk supports (VGG's four
    # pools reduce 8px inputs to empty maps -> NaN taps; tests use 16 too)
    res, zdim, mb = 16, 8, len(devices)
    G = GMain.create(resolution=res, num_channels=3, latent_size=zdim,
                     dlatent_size=zdim, fmap_base=64, fmap_max=8,
                     mapping_layers=1, mapping_fmaps=8)
    D = Discriminator(resolution=res, num_channels=3, fmap_base=64,
                      fmap_max=8, mbstd_group_size=1)
    # identical on every process (same seed, deterministic init)
    state = create_train_state(jax.random.key(0), G, D)

    def put(tree, spec):
        sharding = NamedSharding(mesh, spec)

        def one(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        return jax.tree_util.tree_map(one, tree)

    state = jax.tree_util.tree_map(
        lambda x: x, state)  # NamedTuple → same structure
    state = put(state, P())

    r = np.random.RandomState(1)
    batch = {
        "reals_rec_1": r.randint(0, 256, (mb, 3, res, res)).astype(np.uint8),
        "latents_rec_1": r.randn(mb, zdim).astype(np.float32),
        "labels_rec_1": np.zeros((mb, 0), np.float32),
        "reals_rec_2": r.randint(0, 256, (mb, 3, res, res)).astype(np.uint8),
        "latents_rec_2": r.randn(mb, zdim).astype(np.float32),
        "labels_rec_2": np.zeros((mb, 0), np.float32),
        "reals": r.randint(0, 256, (2 * mb, 3, res, res)).astype(np.uint8),
        "labels": np.zeros((2 * mb, 0), np.float32),
    }
    batch = put(batch, P("data"))

    step = make_train_step(G, D, init_lpips_params(seed=1), mesh,
                           TrainConfig(mirror_augment=False))
    new_state, scalars = step(state, batch, jax.random.key(2),
                              jnp.float32(0.002), jnp.float32(0.002),
                              jnp.float32(0.99), do_g_reg=True,
                              do_d_reg=True)
    jax.block_until_ready(new_state)

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(new_state._replace(step=None)):
        if leaf is None:
            continue
        h.update(np.asarray(leaf.addressable_data(0)).tobytes())
    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(devices),
        "params_sha256": h.hexdigest(),
        "scalars": {k: float(np.asarray(v.addressable_data(0)))
                    for k, v in scalars.items()},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"worker {args.process_id} OK: {out['params_sha256'][:16]}",
          flush=True)


if __name__ == "__main__":
    main()
