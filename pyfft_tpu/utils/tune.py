"""Autotuner: measure factor-chain candidates on the device and persist
the winners (ROADMAP item 5).

The static chain tables (``default_factors``/``COL_FACTORS``) are
measurement-calibrated for this machine's v5e; other chips (or future
Mosaic versions) may rank chains differently.  ``autotune`` times the
candidates with the congestion-robust scan-chain estimator and writes the
best per (kind, n) to a JSON file that ``pallas_local`` consults before
its static tables.

    import pyfft_tpu
    pyfft_tpu.autotune([1024, 2048, 4096])      # once per machine
    # subsequent plans pick up the tuned chains automatically
"""

from __future__ import annotations

import json
import os

__all__ = ["autotune", "tuned_path", "load_tuned"]

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "pyfft_tpu",
                        "tuned_factors.json")


def tuned_path() -> str:
    return os.environ.get("PYFFT_TPU_TUNE_FILE", _DEFAULT)


def load_tuned() -> dict:
    """{f"{kind}:{n}": [factors...]} or {} when no tuning has been run."""
    try:
        with open(tuned_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _candidates(n: int):
    """Chain candidates for length n (power of two, >= 64): radix-4 and
    radix-8 butterfly prefixes ahead of each viable MXU width (radix-8 +
    the folded last twiddle won the r3 headline probes by ~25%)."""
    from pyfft_tpu.ops.pallas_local import default_factors, row_factors
    p = n.bit_length() - 1
    cands = [default_factors(n)]
    for static in (row_factors(n),):
        if static not in cands:
            cands.append(static)
    for mxu in (32, 64, 128):
        mp = mxu.bit_length() - 1
        r = p - mp
        if r < 0 or mxu > n:
            continue
        opts = []
        if r % 2 == 0:
            opts.append((4,) * (r // 2) + (mxu,))
        else:
            opts.append((4,) * (r // 2) + (2, mxu))
        # radix-8-heavy prefixes: fewest butterfly stage/twiddle rounds
        a, rem = divmod(r, 3)
        if rem == 0:
            opts.append((8,) * a + (mxu,))
        elif rem == 1 and a >= 1:
            opts.append((8,) * a + (2, mxu))      # won col n=1024 in r3
            opts.append((8,) * (a - 1) + (4, 4) + (mxu,))
        elif rem == 2:
            opts.append((8,) * a + (4, mxu))
        for c in opts:
            if c not in cands:
                cands.append(c)
    # pure-VPU chains (no MXU stage at all): probe_parts showed the whole
    # butterfly+twiddle chain rides under the row kernel's DMA shadow and
    # HIGHEST's MXU tail is the only unhidden cost; for col kernels
    # (DMA+compute serial) trading 6 bf16 MXU passes for 1-2 extra VPU
    # stages can also win.  Capped at n<=4096: deeper chains hold ~n*lanes
    # live values that Mosaic spills (the MAX_BUTTERFLY_N concern).
    if n <= 4096:
        a, rem = divmod(p, 3)
        pure = (8,) * a + ((4,) if rem == 2 else (2,) if rem == 1 else ())
        if pure not in cands:
            cands.append(pure)
    return cands


def _split_candidates(n: int, max_local: int | None = None):
    """Valid (n1, n2) four-step decompositions of n, balanced first."""
    from pyfft_tpu.ops.pallas_local import LANES, MAX_LOCAL_N
    max_local = max_local or MAX_LOCAL_N
    p = n.bit_length() - 1
    out = []
    for p1 in range(1, p):
        n1, n2 = 1 << p1, 1 << (p - p1)
        if LANES <= n1 <= max_local and LANES <= n2 <= max_local:
            out.append((n1, n2))
    out.sort(key=lambda s: abs(s[0].bit_length() - s[1].bit_length()))
    return out


def _split3_candidates(n: int, max_local: int | None = None):
    """Valid (n1, m1, m2) six-step decompositions of n, balanced first,
    matching choose_split3's constraints (n1 and m2 each at least one lane
    tile; every factor a local-kernel size)."""
    from pyfft_tpu.ops.pallas_local import LANES, MAX_LOCAL_N
    max_local = max_local or MAX_LOCAL_N
    p = n.bit_length() - 1
    out = []
    for p1 in range(7, p):
        n1 = 1 << p1
        if n1 > max_local:
            break
        for q1 in range(7, p - p1):
            m1, m2 = 1 << q1, (n // n1) >> q1
            if m1 > max_local or m2 > max_local or m2 < LANES:
                continue
            out.append((n1, m1, m2))
    out.sort(key=lambda s: max(s) - min(s))
    return out


def autotune(ns, kinds=("row", "col"), volume: int = 1 << 24,
             trials: int = 4, verbose: bool = True) -> dict:
    """Measure candidates per (kind, n) and persist the winners.

    Kinds: ``row``/``col`` tune the local factor chains; ``split`` tunes
    the four-step (n1, n2) decomposition for n beyond the local ceiling
    (the winner lands as ``split:{n}`` and ``ops.fourstep.choose_split``
    consults it before the static cost model); ``split3`` tunes the
    two-level six-step (n1, m1, m2) decomposition for n beyond one
    four-step level (landing as ``split3:{n}`` for ``choose_split3``);
    ``dsplit`` is the df64 (complex128) analog, landing as
    ``dsplit:{n}``.  Returns the full
    tuned dict.  Runs on the current default backend — meaningful only on
    real TPU hardware.
    """
    import jax
    import jax.numpy as jnp

    from pyfft_tpu.ops import fourstep, pallas_df64, pallas_local
    from pyfft_tpu.utils.profiling import time_scan_chain

    def _measure_splits(label, cands, make_fn, args):
        best = None
        for s in cands:
            try:
                dt = time_scan_chain(make_fn(s), args, trials=trials)
            except Exception as e:              # compile ceiling etc.
                if verbose:
                    print(f"  {label} {s}: failed "
                          f"({str(e).splitlines()[0][:60]})", flush=True)
                continue
            if verbose:
                print(f"  {label} {s}: {dt*1e3:.3f} ms", flush=True)
            if best is None or dt < best[0]:
                best = (dt, s)
        return best

    tuned = load_tuned()
    for n in ns:
        n = int(n)
        if "split" in kinds and n > pallas_local.MAX_LOCAL_N:
            rows = max(1, volume // n)
            k1, k2 = jax.random.split(jax.random.PRNGKey(2))
            re = jax.random.normal(k1, (rows, n), jnp.float32)
            im = jax.random.normal(k2, (rows, n), jnp.float32)
            best = _measure_splits(
                f"split n={n}", _split_candidates(n),
                lambda s: (lambda r, i, _s=s: fourstep.fft_axis_large(
                    r, i, -1, axis=-1, split=_s)),
                (re, im))
            if best is not None:
                tuned[f"split:{n}"] = list(best[1])
        if ("split3" in kinds
                and n > pallas_local.MAX_LOCAL_N * pallas_local.MAX_LOCAL_N):
            rows = max(1, volume // n)
            k1, k2 = jax.random.split(jax.random.PRNGKey(4))
            re = jax.random.normal(k1, (rows, n), jnp.float32)
            im = jax.random.normal(k2, (rows, n), jnp.float32)
            best = _measure_splits(
                f"split3 n={n}", _split3_candidates(n),
                lambda s: (lambda r, i, _s=s: fourstep.fft_axis_huge(
                    r, i, -1, axis=-1, split3=_s)),
                (re, im))
            if best is not None:
                tuned[f"split3:{n}"] = list(best[1])
        if "dsplit" in kinds and n > pallas_df64.MAX_LOCAL_N_DF64:
            rows = max(1, volume // n)
            ks = jax.random.split(jax.random.PRNGKey(3), 4)
            quad = tuple(jax.random.normal(k, (rows, n), jnp.float32) * sc
                         for k, sc in zip(ks, (1.0, 1e-8, 1.0, 1e-8)))
            best = _measure_splits(
                f"dsplit n={n}",
                _split_candidates(n, pallas_df64.MAX_LOCAL_N_DF64),
                lambda s: (lambda *p, _s=s: pallas_df64.fft_axis_large_df64(
                    p, -1, axis=-1, split=_s)),
                quad)
            if best is not None:
                tuned[f"dsplit:{n}"] = list(best[1])
        if "il1d" in kinds and n <= pallas_local.MAX_LOCAL_N:
            # interleaved 1D route A/B (plan.py _il1d_route): the fused
            # packed row kernel (1 HBM round trip, in-kernel pair
            # relayout) vs streaming deinterleave -> planar row kernel ->
            # reinterleave (3 round trips, all at copy speed)
            from pyfft_tpu.ops import interleave as il
            rows = max(256, volume // n)
            v = jax.random.normal(jax.random.PRNGKey(5), (rows, 2 * n),
                                  jnp.float32)

            def _stream(x):
                r, i = il.deinterleave(x)
                r, i = pallas_local.fft_axis(r, i, -1, axis=-1,
                                             alias_io=True)
                return il.interleave(r, i)

            best = _measure_splits(
                f"il1d n={n}",
                ["fused", "stream"],
                lambda s: ((lambda x: pallas_local.fft_rows_interleaved(
                    x, -1, alias_io=True)) if s == "fused" else _stream),
                (v,))
            if best is not None:
                tuned[f"il1d:{n}"] = [best[1]]
        if n > pallas_local.MAX_LOCAL_N:
            continue         # row/col factor chains are local-kernel sizes
        cands = _candidates(n)
        for kind in kinds:
            if kind in ("split", "dsplit", "il1d"):
                continue
            best = None
            for c in cands:
                if kind == "row":
                    rows = max(256, volume // n)
                    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
                    re = jax.random.normal(k1, (rows, n), jnp.float32)
                    im = jax.random.normal(k2, (rows, n), jnp.float32)
                    fn = (lambda r, i, _c=c: pallas_local.fft_axis(
                        r, i, -1, axis=-1, factors=_c, alias_io=True))
                else:
                    t = max(256, volume // n)
                    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
                    re = jax.random.normal(k1, (1, n, t), jnp.float32)
                    im = jax.random.normal(k2, (1, n, t), jnp.float32)
                    fn = (lambda r, i, _c=c: pallas_local.fft_axis(
                        r, i, -1, axis=-2, factors=_c, alias_io=True))
                try:
                    dt = time_scan_chain(fn, (re, im), trials=trials)
                except Exception as e:          # compile ceiling etc.
                    if verbose:
                        print(f"  {kind} n={n} {c}: failed "
                              f"({str(e).splitlines()[0][:60]})", flush=True)
                    continue
                if verbose:
                    print(f"  {kind} n={n} {c}: {dt*1e3:.3f} ms", flush=True)
                if best is None or dt < best[0]:
                    best = (dt, c)
            if best is not None:
                tuned[f"{kind}:{n}"] = list(best[1])
    path = tuned_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(tuned, f, indent=1)
    pallas_local.reload_tuned()
    return tuned
