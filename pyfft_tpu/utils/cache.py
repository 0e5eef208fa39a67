"""Persistent compilation cache + plan warmup.

The reference's plans compiled in seconds (nvcc on a kernel string —
SURVEY.md §3.1 "hot spot"); this environment's Mosaic compiles go through a
shared service where a fresh large kernel can take minutes.  Two remedies:

* ``enable_compile_cache()`` — turns on JAX's persistent compilation cache
  so every kernel is compiled **once per machine**, not once per process.
  Called automatically by ``Plan`` on TPU backends (opt out with
  ``PYFFT_TPU_NO_CACHE=1`` or by configuring your own cache dir first).
* ``warmup(shapes, ...)`` — precompiles the kernel set for given transform
  shapes (both directions) so first real ``execute`` calls are instant;
  run it once at deploy time to populate the cache.
"""

from __future__ import annotations

import math
import os

import jax

__all__ = ["enable_compile_cache", "warmup"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pyfft_tpu", "xla_cache")

_enabled = False


def enable_compile_cache(path: str | None = None,
                         aggressive: bool = False) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use, or None if caching was declined
    (user opt-out, or a cache dir is already configured elsewhere).

    The auto-enable path (from ``Plan`` on TPU) sets ONLY the cache
    directory: JAX's default thresholds (min compile time ~1 s) already
    admit every expensive FFT kernel while keeping the host application's
    cheap compiles out of the cache.  Pass ``aggressive=True`` to also
    zero the time/size thresholds (cache absolutely everything).
    """
    global _enabled
    if _enabled:
        return jax.config.jax_compilation_cache_dir
    if os.environ.get("PYFFT_TPU_NO_CACHE"):
        return None
    if jax.config.jax_compilation_cache_dir:
        _enabled = True          # user already configured one — respect it
        return jax.config.jax_compilation_cache_dir
    path = path or os.environ.get("PYFFT_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    if aggressive:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path


def warmup(shapes, dtypes=("complex64",), batches=(1,),
           inverse_too: bool = True) -> int:
    """Precompile plan executables for the given transform shapes.

    ``shapes``: iterable of ints or tuples (as accepted by ``Plan``).
    ``batches``: leading batch sizes to trace (batch shape is part of the
    jit key; the Pallas kernels themselves are batch-size-independent, so
    one batch is usually enough to populate the kernel cache).
    Returns the number of executables compiled.
    """
    import numpy as np

    from pyfft_tpu.plan import Plan

    enable_compile_cache()
    count = 0
    for shape in shapes:
        if isinstance(shape, int):
            shape = (shape,)
        for dt in dtypes:
            dtype = np.dtype(dt)
            plan = Plan(shape, dtype=dtype)
            real = np.float32 if dtype == np.dtype("complex64") else np.float64
            for b in batches:
                lead = (b,) if b and b > 1 else ()
                ex = jax.ShapeDtypeStruct(lead + shape, real)
                dirs = (False, True) if inverse_too else (False,)
                for inv in dirs:
                    fn = plan._get_callable(lead, inv, "planar")
                    fn.lower(ex, ex).compile()   # fn is already jitted (AOT)
                    count += 1
    return count
