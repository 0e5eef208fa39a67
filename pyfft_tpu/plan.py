"""The ``Plan`` facade — the framework's public API.

Mirrors the reference's user surface (``pyfft/cuda.py`` / ``pyfft/cl.py``
``Plan`` and ``FFTPlan.execute`` — SURVEY.md §2.9-bis) while being a thin
stateful wrapper over pure jitted functions, the idiomatic JAX shape:

    plan = Plan((1024, 1024))            # schedule + trace once
    out  = plan.execute(data)            # jitted forward
    back = plan.execute(out, inverse=True)

Differences from the reference, by design (JAX is functional):

* ``execute`` **returns** the transformed array instead of mutating a GPU
  buffer in place; ``data_out`` arguments are therefore not part of the API.
* ``stream=`` / ``queue=`` / ``context=`` are accepted for familiarity and
  only influence the async default (JAX dispatch is always async; the
  ``wait_for_finish`` semantics are preserved via ``Plan._wait``, which
  blocks for real even on backends where ``block_until_ready`` is a no-op).

Split-complex mode follows the reference's dispatch-by-arity:
``plan.execute(re, im)`` takes and returns separate real/imag planes.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.planner import AxisPass, ExecPlan, build_plan
from pyfft_tpu.reference import fft_planar

__all__ = ["Plan"]


def _on_tpu() -> bool:
    try:
        plat = jax.default_backend()
    except RuntimeError:
        return False
    return plat in ("tpu", "axon")


# Per-chunk HBM budget for the batched-transform sweep (run_planar): a
# chunk's input planes x its path's liveness fudge must fit here.  None =
# query the device (a quarter of its HBM, matching the measured-safe 4 GiB
# on a 16 GiB v5e); module level so tests can pin it to exercise chunking
# on small shapes.
_HBM_CHUNK_BUDGET: int | None = None
_HBM_BUDGET_CACHE: int | None = None


def _hbm_chunk_budget() -> int:
    """The active per-chunk budget: the module override, else HBM/4 from
    the device (``memory_stats`` is unavailable on some backends — e.g.
    this environment's tunnel — where the 4 GiB v5e constant stands)."""
    if _HBM_CHUNK_BUDGET is not None:
        return _HBM_CHUNK_BUDGET
    global _HBM_BUDGET_CACHE
    if _HBM_BUDGET_CACHE is None:
        budget = 4 << 30
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = int(stats.get("bytes_limit", 0)) if stats else 0
            if limit > 0:
                budget = limit // 4
        except Exception:
            pass
        _HBM_BUDGET_CACHE = budget
    return _HBM_BUDGET_CACHE


def _il1d_route(n: int) -> str:
    """Measured routing for single-pass interleaved 1D plans.

    "stream" = deinterleave -> planar row kernel -> reinterleave (three
    streaming HBM round trips); "fused" = the packed-layout row kernel
    (one round trip, but pays in-kernel pair relayout).  The autotune
    record ("il1d:{n}") holds the measured winner per machine; without a
    record, streaming is the calibrated default (config-2 A/B on v5e,
    r5: stream 1.735 ms vs fused 2.610 ms — 1.5x, despite 3x the HBM
    traffic, because the fused kernel's stride-2 pair relayouts run far
    below streaming speed).
    """
    from pyfft_tpu.ops.pallas_local import _tuned_factors
    v = _tuned_factors("il1d", n)
    if v:                      # stored as a 1-element list, e.g. ["fused"]
        route = v[0] if isinstance(v, (list, tuple)) else v
        if route in ("stream", "fused"):
            return route
    return "stream"


def _complex_on_device_ok() -> bool:
    """Whether complex arrays may live on the default device.

    TPU backends (including the axon tunnel in this environment) reject
    complex dtypes outright — and a failed transfer can poison the runtime,
    so this is a static decision, not a probe.  Everything still works there:
    interleaved data is bitcast to planar on the host (free: a view) and
    computed planar on device, which is the faster layout on TPU anyway.
    Only the known-complex-unsafe backends take the host view path — GPUs
    and CPUs keep complex arrays on device (no extra host round trip).
    """
    return jax.default_backend() not in ("tpu", "axon")


class Plan:
    """Batched power-of-two complex FFT plan for 1D/2D/3D transforms.

    Parameters (reference parity — SURVEY.md §2.9-bis):
      shape: int or tuple of 1–3 ints, each a power of two.
      dtype: numpy.complex64 (default) or numpy.complex128.
      normalize: inverse transform scales by 1/(x*y*z) (default True).
      scale: extra user scale folded into both directions' output.
      fast_math: True (default) = the calibrated MXU contraction chains;
        False = exact butterfly chains per axis (n <= 2048) — slower,
        measurably more accurate, both inside the documented gates
        (the reference's precise-vs-native-trig switch).
      wait_for_finish: default sync behavior of execute(); if None it is
        inferred — async when a stream/queue was supplied, sync otherwise.
      context/stream/queue: accepted for API familiarity (see module doc).
      force_xla: bypass Pallas kernels (debugging / non-TPU profiling).
      donate: reuse input buffers for outputs (in-place memory behavior;
        device-array inputs are invalidated after the call).

    On TPU the first Plan also enables JAX's persistent compilation cache
    (kernel compiles through this environment's shared service can take
    minutes cold).  This respects a cache dir the host app configured
    first and is idempotent; set ``PYFFT_TPU_NO_CACHE=1`` to opt out of
    the global-config side effect entirely (see utils/cache.py).
    """

    def __init__(self, shape, dtype=np.complex64, *, normalize: bool = True,
                 scale: float = 1.0, fast_math: bool = True,
                 wait_for_finish: bool | None = None,
                 context: Any = None, stream: Any = None, queue: Any = None,
                 force_xla: bool = False, donate: bool = False):
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        self._real_dtype = np.float32 if self.dtype == np.complex64 else np.float64
        if self._real_dtype == np.float64 and not jax.config.jax_enable_x64:
            raise ValueError(
                "complex128 plans need float64 support: enable it with "
                "jax.config.update('jax_enable_x64', True) "
                "(the TPU double-float path engages automatically on TPU)")
        self.normalize = bool(normalize)
        self.scale = float(scale)
        self.fast_math = bool(fast_math)
        if wait_for_finish is None:
            wait_for_finish = stream is None and queue is None
        self.wait_for_finish = bool(wait_for_finish)
        self._force_xla = bool(force_xla)
        # donate=True reuses input buffers for outputs (halves peak HBM for
        # huge transforms) — the analog of the reference's in-place execute,
        # which overwrote the input GPU buffer.  Device-array inputs are
        # invalidated after the call.
        self.donate = bool(donate)
        if _on_tpu():
            # persist compiled kernels across processes: cold Mosaic compiles
            # through this environment's shared service can take minutes
            from pyfft_tpu.utils.cache import enable_compile_cache
            enable_compile_cache()
        self._exec_plan: ExecPlan = build_plan(
            self.shape, self.dtype, on_tpu=_on_tpu() and not force_xla)
        self._jit_cache: dict = {}

    # ------------------------------------------------------------- executors

    def _run_axis_pass(self, re, im, p: AxisPass, sign: int, ndim: int,
                       postscale: float):
        """Dispatch one axis pass to its executor.

        Returns (re, im, scaled) — ``scaled`` reports whether the executor
        folded ``postscale`` into its final write (free in the Pallas kernel;
        a separate multiply would cost an extra HBM round trip).
        """
        axis = re.ndim - ndim + p.axis
        if p.executor == "fused2d" and not self._force_xla:
            from pyfft_tpu.ops import pallas_local
            if pallas_local.supported_2d(re):
                fy = fx = None
                if not self.fast_math:
                    fy = pallas_local.precise_factors(re.shape[-2])
                    fx = pallas_local.precise_factors(re.shape[-1])
                rr, ii = pallas_local.fft2_fused(re, im, sign,
                                                 postscale=postscale,
                                                 factors_y=fy, factors_x=fx,
                                                 alias_io=self.donate)
                return rr, ii, True
            # fallback: two XLA passes over the covered axes
            rr, ii = fft_planar(re, im, sign, axis=re.ndim - 1)
            rr, ii = fft_planar(rr, ii, sign, axis=re.ndim - 2)
            return rr, ii, False
        if p.executor == "local" and not self._force_xla:
            from pyfft_tpu.ops import pallas_local
            if (axis <= re.ndim - 3
                    and pallas_local.supported_fold(re, axis)):
                # non-minor axis with a >= 2D trail (3D z-pass, batched 2D
                # columns): the fold-store kernel writes the NATIVE layout
                # directly, sparing the output-side retiling copies the
                # plain column kernel's folded view costs in compositions
                # (measured 2.286 -> 1.844 ms on the 256^3 plan —
                # probe_3dz glue2, docs/design.md round-5 log)
                factors = (None if self.fast_math
                           else pallas_local.precise_factors(re.shape[axis]))
                rr, ii = pallas_local.fft_axis_fold(
                    re, im, sign, axis=axis, postscale=postscale,
                    factors=factors)
                return rr, ii, True
            if pallas_local.supported(re, axis):
                factors = (None if self.fast_math
                           else pallas_local.precise_factors(re.shape[axis]))
                rr, ii = pallas_local.fft_axis(re, im, sign, axis=axis,
                                               postscale=postscale,
                                               factors=factors,
                                               alias_io=self.donate)
                return rr, ii, True
        if p.executor == "fourstep" and not self._force_xla:
            from pyfft_tpu.ops import fourstep
            if fourstep.supported(re, axis):
                rr, ii = fourstep.fft_axis_large(re, im, sign, axis=axis,
                                                 postscale=postscale,
                                                 fast_math=self.fast_math)
                return rr, ii, True
            if fourstep.supported_mid(re, axis):
                rr, ii = fourstep.fft_axis_mid(re, im, sign, axis=axis,
                                               postscale=postscale,
                                               fast_math=self.fast_math)
                return rr, ii, True
        if p.executor == "huge" and not self._force_xla:
            from pyfft_tpu.ops import fourstep
            if fourstep.supported_huge(re, axis):
                rr, ii = fourstep.fft_axis_huge(re, im, sign, axis=axis,
                                                postscale=postscale,
                                                fast_math=self.fast_math)
                return rr, ii, True
        # XLA fallback: the recursive planar matmul path (covers f64, tiny
        # sizes, non-TPU backends, and axes the kernels don't take yet).
        rr, ii = fft_planar(re, im, sign, axis=axis)
        return rr, ii, False

    def _build_callable(self, batch_shape: tuple[int, ...], inverse: bool,
                        split: bool):
        ndim = len(self.shape)
        sign = +1 if inverse else -1
        norm = 1.0
        if inverse and self.normalize:
            norm /= self._exec_plan.total_n
        norm *= self.scale

        def df64_covers(shape):
            """Whether the double-float Pallas kernels cover every pass of
            a batched input of this shape (f32 hi-plane probe)."""
            from pyfft_tpu.ops import pallas_df64
            probe = jax.ShapeDtypeStruct(shape, jnp.float32)
            for p in self._exec_plan.passes:
                if p.executor not in ("local", "fourstep", "huge"):
                    return False
                axis = len(shape) - ndim + p.axis
                if not pallas_df64.supported(probe, axis):
                    return False
            return True

        def run_df64(re, im):
            """All passes through the double-float Pallas kernels, staying
            in (hi, lo) f32 quad form between passes; None if any pass
            isn't covered (caller falls back to the XLA f64 path)."""
            from pyfft_tpu.ops import pallas_df64
            from pyfft_tpu.ops.df64 import split_f64
            passes = self._exec_plan.passes
            if not df64_covers(re.shape):
                return None
            rh, rl = split_f64(re)
            ih, il = split_f64(im)
            planes = (rh, rl, ih, il)
            for idx, p in enumerate(passes):
                post = norm if idx == len(passes) - 1 else 1.0
                axis = re.ndim - ndim + p.axis
                if p.executor == "huge":
                    planes = pallas_df64.fft_axis_huge_df64(
                        planes, sign, axis=axis, postscale=post,
                        fast_math=self.fast_math)
                elif p.executor == "fourstep":
                    planes = pallas_df64.fft_axis_large_df64(
                        planes, sign, axis=axis, postscale=post,
                        fast_math=self.fast_math)
                else:
                    planes = pallas_df64.fft_axis_df64(
                        planes, sign, axis=axis, postscale=post,
                        fast_math=self.fast_math)
            rh, rl, ih, il = planes
            return (rh.astype(jnp.float64) + rl.astype(jnp.float64),
                    ih.astype(jnp.float64) + il.astype(jnp.float64))

        def run_planar_once(re, im):
            if (re.dtype == jnp.float64 and not self._force_xla
                    and _on_tpu()):
                out = run_df64(re, im)
                if out is not None:
                    return out
            scale_left = norm
            passes = self._exec_plan.passes
            for idx, p in enumerate(passes):
                is_final = idx == len(passes) - 1
                post = scale_left if is_final else 1.0
                re, im, scaled = self._run_axis_pass(re, im, p, sign, ndim, post)
                # Only the final pass is handed the real scale; a non-final
                # pass reporting scaled=True merely folded postscale=1.0, so
                # clearing scale_left there would drop the 1/N normalization
                # (and user scale) on every multi-pass plan.
                if scaled and is_final:
                    scale_left = 1.0
            if scale_left != 1.0:
                c = jnp.asarray(scale_left, dtype=re.dtype)
                re, im = re * c, im * c
            return re, im

        def run_planar(re, im):
            # HBM guard: the multi-pass XLA path materializes several
            # transform-sized temporaries; for huge batched transforms,
            # sweep the batch in chunks with lax.map (sequential on-device,
            # same compiled body per chunk) — the TPU analog of the
            # reference's per-batch kernel grid scaling without holding
            # every intermediate at once.
            bdims = re.ndim - ndim
            batch = math.prod(re.shape[:bdims]) if bdims else 1
            per_row = self._exec_plan.total_n * self._exec_plan.itemsize_plane
            # the f64 XLA recursion holds far more live temporaries than
            # f32 (measured on config 5: fudge 32 left a 16 GiB chip 135
            # MiB short at compile; fudge 64 still hit runtime OOM at
            # batch 64).  The df64 QUAD path is much leaner — its live set
            # is ~3 quad generations (48 B/elem) plus the f64 endpoints
            # (32 B/elem): probe_df64r3 runs an 8 x 2^22 four-step chain
            # (2.1 GiB of that footprint) in one program, so fudge 16
            # (chunk 8 on config 5) is measured-safe, and chunk 1 was
            # costing config 5 ~30% in per-chunk glue + conversions.
            if self._exec_plan.itemsize_plane == 8:
                fudge = (16 if not self._force_xla and _on_tpu()
                         and df64_covers(re.shape) else 128)
            else:
                fudge = 8
            budget = _hbm_chunk_budget()
            if batch <= 1 or batch * per_row * fudge <= budget:
                return run_planar_once(re, im)
            chunk = max(1, budget // (per_row * fudge))
            while batch % chunk:
                chunk -= 1
            if chunk == batch:
                return run_planar_once(re, im)
            lead = re.shape[:bdims]
            tail = re.shape[bdims:]
            rr = re.reshape(batch // chunk, chunk, *tail)
            ii = im.reshape(batch // chunk, chunk, *tail)
            orr, oii = jax.lax.map(lambda t: run_planar_once(*t), (rr, ii))
            return orr.reshape(*lead, *tail), oii.reshape(*lead, *tail)

        if split == "planar":
            def fn(re, im):
                return run_planar(re, im)
        elif split == "complex":
            def fn(x):
                re, im = run_planar(jnp.real(x), jnp.imag(x))
                return jax.lax.complex(re, im)
        else:  # "view": interleaved (..., 2N) real array, re/im in lanes
            passes = self._exec_plan.passes
            fused_1d = (len(passes) == 1 and passes[0].executor == "local"
                        and not self._force_xla)

            def fn(v):
                from pyfft_tpu.ops import interleave as il
                use_kernel = (not self._force_xla and _on_tpu()
                              and il.supported(v.shape, v.dtype))
                if fused_1d:
                    # 1D interleaved: the fused row kernel folds de/re-
                    # interleave into its load/store (one HBM round trip) —
                    # but its packed layout pays in-kernel relayout costs
                    # that the 3-pass streaming route does not (measured on
                    # config 2, r5 A/B: fused 2.610 ms vs stream 1.735 —
                    # the r4 verdict's routing-by-capability bug).  Route by
                    # the measured record (autotune kind "il1d"), falling
                    # back to streaming whenever it applies.
                    from pyfft_tpu.ops import pallas_local
                    n = v.shape[-1] // 2
                    probe = jax.ShapeDtypeStruct(v.shape[:-1] + (n,), v.dtype)
                    if pallas_local.supported(probe, v.ndim - 1) and not (
                            use_kernel
                            and _il1d_route(n) == "stream"):
                        factors = (None if self.fast_math
                                   else pallas_local.precise_factors(n))
                        return pallas_local.fft_rows_interleaved(
                            v, sign, postscale=norm, factors=factors,
                            alias_io=self.donate)
                if use_kernel:
                    # multi-pass / nd interleaved: streaming MXU selection
                    # conversions (bit-exact, ~copy speed) instead of the
                    # XLA slice/stack relayout (~10x below streaming —
                    # docs/design.md r3 interleaved log).
                    re, im = il.deinterleave(v)
                    re, im = run_planar(re, im)
                    return il.interleave(re, im)
                pairs = v.reshape(v.shape[:-1] + (v.shape[-1] // 2, 2))
                re, im = pairs[..., 0], pairs[..., 1]
                re, im = run_planar(re, im)
                out = jnp.stack([re, im], axis=-1)
                return out.reshape(v.shape)
        # De-monolith the multi-kernel df64 compile (VERDICT r4 item 6):
        # a single program holding every df64 kernel of a 2D/3D c128 plan
        # reproducibly OOM-kills this environment's shared compile helper
        # at 512^2 (verify_captures_r4.md, 3 reproductions).  The kernel
        # entry points (_fft_rows_df64/_fft_cols_df64) are individually
        # jitted, so returning the UNJITTED composition dispatches each
        # pass as its own compiled program — the helper sees one kernel
        # per request, never the monolith.  Single-pass c128 plans (e.g.
        # the config-5 four-step) keep the fused jit + donation.  Applies
        # to EVERY split form ("complex"/"view" wrap the same run_planar
        # pass chain, so a jitted wrapper would rebuild the monolith).
        if (self._real_dtype == np.float64
                and len(self._exec_plan.passes) > 1
                and _on_tpu() and not self._force_xla
                and df64_covers(batch_shape + self.shape)):
            return fn
        donate = ()
        if self.donate:
            donate = (0, 1) if split == "planar" else (0,)
        return jax.jit(fn, donate_argnums=donate)

    def _get_callable(self, batch_shape, inverse, split):
        key = (batch_shape, inverse, split)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = self._build_callable(
                batch_shape, inverse, split)
        return fn

    # ------------------------------------------------------------ data prep

    def _canonicalize(self, data, batch, planar: bool):
        """Reshape user data to (batch?, *shape); returns (array, unflatten)."""
        want_dtype = self._real_dtype if planar else self.dtype
        x = jnp.asarray(data)
        if x.dtype != want_dtype:
            x = x.astype(want_dtype)
        orig_shape = x.shape
        ndim = len(self.shape)
        if x.ndim >= ndim and x.shape[-ndim:] == self.shape:
            return x, orig_shape
        # flat buffer + batch, reference-style: execute(buf, batch=k)
        b = int(batch) if batch else 1
        if math.prod(x.shape) != b * math.prod(self.shape):
            raise ValueError(
                f"data of shape {orig_shape} does not match transform shape "
                f"{self.shape} with batch={b}")
        x = x.reshape((b,) + self.shape if b > 1 else self.shape)
        return x, orig_shape

    # -------------------------------------------------------------- execute

    def execute(self, data, data_imag=None, *, inverse: bool = False,
                batch: int | None = None, wait_for_finish: bool | None = None):
        """Run the transform.

        Interleaved mode: ``execute(x)`` with complex ``x`` → complex array.
        Split mode: ``execute(re, im)`` → ``(re, im)`` pair (dispatch by
        arity, as in the reference — SURVEY.md §3.4).
        ``batch=k`` accepts a flat buffer holding k contiguous transforms.
        """
        ndim = len(self.shape)
        if data_imag is not None:
            re, re_shape = self._canonicalize(data, batch, planar=True)
            im, _ = self._canonicalize(data_imag, batch, planar=True)
            if re.shape != im.shape:
                raise ValueError("real/imag planes must have the same shape")
            fn = self._get_callable(re.shape[:-ndim], inverse, "planar")
            rr, ii = fn(re, im)
            out = (rr.reshape(re_shape), ii.reshape(re_shape))
        elif _complex_on_device_ok():
            x, x_shape = self._canonicalize(data, batch, planar=False)
            fn = self._get_callable(x.shape[:-ndim], inverse, "complex")
            out = fn(x).reshape(x_shape)
        else:
            # Interleaved complex on a backend without complex dtypes (TPU):
            # bitcast host data to an interleaved real view, compute planar on
            # device, bitcast back.  Returns a host array in this mode.
            xc = np.ascontiguousarray(np.asarray(data, dtype=self.dtype))
            orig_shape = xc.shape
            xc, _ = self._canonicalize_host(xc, batch)
            v = xc.view(self._real_dtype)           # (..., 2N) interleaved
            if self._view_kernel_ok(v.shape, v.dtype):
                fn = self._get_callable(v.shape, inverse, "view")
                res = fn(v)
                out = np.asarray(res).view(self.dtype).reshape(orig_shape)
            else:
                # no device-native (de)interleave for this input: split to
                # planar on the host (memcpy-speed) and reuse the chunked
                # planar path — device programs stay at the proven lean
                # planar shapes (see _view_kernel_ok)
                re = np.ascontiguousarray(xc.real)
                im = np.ascontiguousarray(xc.imag)
                fn = self._get_callable(re.shape[:-ndim], inverse, "planar")
                rr, ii = fn(re, im)
                out = np.empty(xc.shape, dtype=self.dtype)
                out.real = np.asarray(rr)
                out.imag = np.asarray(ii)
                out = out.reshape(orig_shape)
        wait = self.wait_for_finish if wait_for_finish is None else wait_for_finish
        if wait:
            self._wait(out)
        return out

    @staticmethod
    def _wait(out) -> None:
        """Actually-blocking sync (reference's ``wait_for_finish`` contract).

        ``block_until_ready`` is a documented no-op on this environment's TPU
        tunnel, so after it we additionally force completion by fetching one
        element of each output through a device-side reduction
        (``utils.profiling.force``) — cheap (one scalar over the wire) and
        guaranteed to drain the dependency chain on every backend.
        """
        leaves = [a for a in jax.tree_util.tree_leaves(out)
                  if isinstance(a, jax.Array)]
        for a in leaves:
            a.block_until_ready()
        if leaves:
            from pyfft_tpu.utils.profiling import force
            force(leaves)

    def _view_kernel_ok(self, vshape: tuple[int, ...], vdtype) -> bool:
        """Whether "view" (interleaved) mode has a device-native conversion
        for this input: the fused 1D row kernel, or the streaming MXU
        selection conversions.  When neither applies (f64 views, odd
        shapes), the in-jit XLA slice/stack fallback materializes the FULL
        batch in minor-dim-2 layouts that pad 3.2x on TPU — a batch-40
        c128 2^22 input compiled to 16 GiB of HLO temps (r4i verify drive
        OOM) — so ``execute`` splits to planar on the host instead."""
        ndim = len(self.shape)
        passes = self._exec_plan.passes
        if (len(passes) == 1 and passes[0].executor == "local"
                and not self._force_xla):
            from pyfft_tpu.ops import pallas_local
            n = vshape[-1] // 2
            probe = jax.ShapeDtypeStruct(vshape[:-1] + (n,), vdtype)
            if pallas_local.supported(probe, len(vshape) - 1):
                return True
        from pyfft_tpu.ops import interleave as il
        return (not self._force_xla and _on_tpu()
                and il.supported(vshape, vdtype))

    def _canonicalize_host(self, x: np.ndarray, batch):
        ndim = len(self.shape)
        if x.ndim >= ndim and x.shape[-ndim:] == self.shape:
            return x, x.shape
        b = int(batch) if batch else 1
        if x.size != b * math.prod(self.shape):
            raise ValueError(
                f"data of shape {x.shape} does not match transform shape "
                f"{self.shape} with batch={b}")
        return x.reshape((b,) + self.shape if b > 1 else self.shape), x.shape

    # ------------------------------------------------------------- niceties

    def __repr__(self):
        kinds = ",".join(p.executor for p in self._exec_plan.passes)
        return (f"Plan(shape={self.shape}, dtype={self.dtype.name}, "
                f"passes=[{kinds}])")
