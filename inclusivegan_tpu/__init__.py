"""inclusivegan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the ECCV 2020 "Inclusive GAN" codebase (ningyu1991/InclusiveGAN).

Re-designed from scratch for TPU:
  * compute path: pure-functional JAX, jitted train steps, Pallas kernels for
    the hot resampling op, pjit/NamedSharding over a device mesh;
  * host runtime: C++ Prioritized-DCI kNN library (ctypes binding), pure-python
    TFRecord-compatible data pipeline, run-dir harness mirroring the reference
    artifact layout (dnnlib/submission/submit.py).

Layer map (mirrors SURVEY.md §1):
  ops/       -- upfirdn2d + fused_bias_act (pure-JAX ref impls + Pallas kernels)
  models/    -- StyleGAN2 generator/discriminator + feature nets (VGG/LPIPS/Inception)
  training/  -- losses, schedule, jitted train step, IMLE orchestration
  parallel/  -- mesh + sharding rules (data parallelism via pjit; psum over ICI)
  data/      -- TFRecord-layout datasets + dataset_tool creators
  dci/       -- C++ Prioritized DCI kNN (host-side retrieval for IMLE)
  metrics/   -- FID / IS / PPL / PR / mode_counts / KL / LS
  utils/     -- EasyDict, dotted-name registry, run harness, stats collector
"""

import os as _os

# Large-allocation first-writes run ~230x slower than memcpy speed on this
# class of VM (firecracker, THP=madvise): numpy madvise(HUGEPAGE)s big
# buffers and every first-touch then stalls behind khugepaged (measured
# 254 s vs 1.1 s for a 750 MB copy). Host-side IMLE buffers, dataset loads
# and candidate pools are all such allocations, so switch it off for this
# process and for any children.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:
    import numpy as _np  # noqa: F401
    from numpy._core import multiarray as _ma  # np>=2
except ImportError:  # pragma: no cover - older numpy
    from numpy.core import multiarray as _ma  # type: ignore
if hasattr(_ma, "_set_madvise_hugepage"):
    _ma._set_madvise_hugepage(False)

from .utils.easydict import EasyDict  # noqa: F401
from .utils import registry  # noqa: F401

__version__ = "0.1.0"
