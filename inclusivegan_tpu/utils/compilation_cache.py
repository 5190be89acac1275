"""Persistent XLA compilation cache.

The phase-level train-step programs at CelebA-128 scale are large graphs
(G forward ×4 + VGG-LPIPS ×6 + full backward) and first-compile on a fresh
process is minutes-scale. Enabling JAX's persistent cache makes every
process after the first start instantly — bench.py, the CLIs and the
training loop all call this first."""

import hashlib
import os

_enabled = False


def _host_key() -> str:
    """Per-host cache-dir suffix (VERDICT r3): XLA's CPU AOT entries embed
    the compiling host's CPU features (+amx, +prefer-no-gather, ...) but
    the cache KEY does not, so entries written by one VM generation fail to
    load on the next — every lookup then pays deserialize+reject on top of
    the recompile. Keying the directory by the host's feature set keeps
    each generation's entries to itself."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    return "nocpuinfo"


def enable_compilation_cache(cache_dir: str = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax
    if cache_dir is None:
        cache_dir = os.environ.get(
            "INCLUSIVEGAN_COMP_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "inclusivegan_tpu", "xla_cache"))
        cache_dir = os.path.join(cache_dir, _host_key())
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    _enabled = True
