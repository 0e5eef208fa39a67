"""Config-5 roofline inputs (VERDICT r4 item 5): measure what this chip
actually achieves on the df64 path's two non-HBM resource classes, so the
cost model in docs/design.md ("config-5 roofline") is built from measured
achievable rates, not datasheet peaks:

  int8 MXU   one (128,128) @ (128, T) int8 x int8 -> int32 contraction,
             XLA-compiled, scan-chained — the achievable MAC rate for the
             exact-int8 tail's dot shape (K=128, the kernel's contraction
             width), plus a 27-dot chain mimicking the kernel's shift-group
             accumulation at the XLA level.
  VPU f32    a fused multiply-add chain over a resident array (16 madds
             per element per iteration) — the achievable f32 VPU rate for
             the TwoSum/butterfly arithmetic.

Both are upper bounds for what a Pallas kernel can reach on the same ops
(XLA gets the same hardware without Mosaic's scheduling constraints).
Run on real TPU; rows are load-labeled.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.utils.cache import enable_compile_cache
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

enable_compile_cache()

T = 1 << 19          # contraction batch width (lanes): 64 MiB int8 operand


def main():
    assert jax.default_backend() in ("tpu", "axon")
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randint(-127, 128, (128, 128)), jnp.int8)
    x = jnp.asarray(rng.randint(-127, 128, (128, T)), jnp.int8)

    # -- single big int8 dot: achievable MAC rate at the kernel's K=128 --
    def dot1(xv):
        y = jax.lax.dot_general(w, xv, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # cast back to int8 so the chain is type-stationary (values wrap;
        # only throughput matters)
        return y.astype(jnp.int8)

    dt = time_scan_chain(dot1, (x,), trials=4)
    macs = 128 * 128 * T
    load = copy_bandwidth_gbs(trials=2)
    print(f"int8 dot (128,128)@(128,{T}): {dt*1e3:.3f} ms  "
          f"{macs/dt/1e12:.1f} Tmac/s  copy {load:.0f} GB/s", flush=True)

    # -- 27-dot shift-group chain (the kernel's accumulation shape) --
    # 9 groups of 1-6 dots sharing an int32 sum, converted to f32 and
    # accumulated — the XLA-level twin of _mxu_stage_df64's loop.
    # DISTINCT weight matrices per dot (the first version reused one w and
    # XLA CSE'd all 27 dots into one: a fantasy 584 Tmac/s reading).  One
    # shared x operand, like the kernel (its 9 channels are VMEM-resident;
    # here one channel models the reuse class).
    groups = [6, 5, 4, 3, 2, 1, 3, 2, 1]          # 27 dots total
    ws = [jnp.asarray(rng.randint(-127, 128, (128, 128)), jnp.int8)
          for _ in range(27)]

    def dot27(xv):
        acc = None
        k = 0
        for g in groups:
            s = None
            for _ in range(g):
                y = jax.lax.dot_general(ws[k], xv, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                s = y if s is None else s + y
                k += 1
            v = s.astype(jnp.float32)
            acc = v if acc is None else acc + v
        return jnp.clip(acc, -127, 127).astype(jnp.int8)

    dt27 = time_scan_chain(dot27, (x,), trials=4)
    load = copy_bandwidth_gbs(trials=2)
    print(f"27-dot group chain: {dt27*1e3:.3f} ms  "
          f"{27*macs/dt27/1e12:.1f} Tmac/s  copy {load:.0f} GB/s", flush=True)

    # -- VPU f32 madd chain: 64 fused madds per element per iteration --
    # (x16 measured HBM-bound: 0.375 ms ~= the 256 MiB round trip at the
    # concurrent copy rate; x64 makes the chain compute-bound)
    a = jnp.asarray(rng.standard_normal((4096, 8192)), jnp.float32)

    def vpu(av):
        y = av
        for _ in range(64):
            y = y * jnp.float32(0.999999) + jnp.float32(1e-7)
        return y

    dtv = time_scan_chain(vpu, (a,), trials=4)
    flops = 2 * 64 * a.size
    load = copy_bandwidth_gbs(trials=2)
    print(f"VPU f32 madd x64: {dtv*1e3:.3f} ms  "
          f"{flops/dtv/1e12:.2f} Tflop/s  copy {load:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
