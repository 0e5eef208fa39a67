"""TPU backend entry point: ``from pyfft_tpu.tpu import Plan``.

Parity shim with the reference's per-backend modules (``pyfft/cuda.py`` /
``pyfft/cl.py`` — SURVEY.md §2.6/§2.7).  The heavy lifting lives in
``pyfft_tpu.plan``; this module only pins the backend choice: Pallas kernels
enabled (the default whenever a TPU is present).
"""

from __future__ import annotations

from pyfft_tpu.plan import Plan as _Plan

__all__ = ["Plan"]


class Plan(_Plan):
    def __init__(self, shape, dtype=None, **kwargs):
        import numpy as np
        kwargs.setdefault("force_xla", False)
        super().__init__(shape, dtype if dtype is not None else np.complex64,
                         **kwargs)
