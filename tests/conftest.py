"""Test harness: run everything on a virtual 8-device CPU mesh so sharding /
psum code paths execute without TPU hardware (SURVEY.md §4 item 4).

Note: the container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon already in the environment, so env-var overrides here are
too late — we must go through jax.config.update instead.
"""

import os

# Hermeticity: never let ambient converted-LPIPS weights (the drop-in
# metrics_weights/vgg16_zhang_perceptual.npz discovery in models/lpips.py)
# change test behavior; individual tests pass explicit paths when needed.
os.environ.setdefault("INCLUSIVEGAN_LPIPS_WEIGHTS", "")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# CPU compiles dominate suite runtime (InceptionV3 + the 4 phase programs);
# the persistent XLA cache cuts repeat runs dramatically on a 1-CPU box.
from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
