"""Device mesh + sharding rules.

The reference's only parallelism is single-host data parallelism with NCCL
all_sum gradient averaging and per-GPU graph clones
(/root/reference/training/training_loop.py:258-297, optimizer.py:193-201).

TPU-native equivalent: a 1-D ``data`` mesh; parameters replicated, batches
sharded on the leading axis; gradients psum'd over ICI inside the jitted
step (see training/train_step.py). Multi-host pods work unchanged — callers
initialize jax.distributed and the same mesh spans all processes. The model
is ≤30M params, so tensor/pipeline parallelism is out of scope by design
(SURVEY.md §2.3)."""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with leading axis sharded over the data mesh."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
