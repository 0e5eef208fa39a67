"""CPU prototype: exact int8-split MXU products for the df64 DFT stage.

Validates the numeric scheme before the Pallas kernel (ROADMAP item 3 /
VERDICT round-2 item 4):

  * x (df64: hi+lo f32 planes) is chunked into 7-bit int8 channels against
    a per-tile power-of-two alignment: 8 channels from hi (bits 1..56),
    5 from lo (bits 25..59).  Progressive extraction r -= c*2^s is exact in
    f32 (Veltkamp-style splitting), so the channels represent hi/lo exactly
    down to an absolute floor ~2^-56 of the tile max.
  * W (f-point DFT matrix, f64) is chunked into 8 channels (bits 1..56).
  * y = W @ x runs as int8 x int8 -> int32 matmuls (exact on the MXU),
    keeping chunk pairs with combined shift <= ~60 bits.
  * partial sums are regrouped by shift and accumulated hi-first (f64 here;
    (hi, lo) TwoSum chains on TPU).

Prints the relative error vs the exact f64 matmul and the matmul count.
"""
import numpy as np

F = 64           # DFT stage size
LANES = 512
B = 7            # bits per chunk
KEEP_BITS = 60   # drop products whose combined shift exceeds this


def chunk_exact(x, m, shifts, dtype=np.float32):
    """Channels c_k (int8) with x ~= sum_k c_k * 2^(m - shifts[k]);
    extraction is the exact progressive f32 subtraction the TPU will run."""
    r = np.asarray(x, dtype).astype(np.float64) * 2.0 ** (-m)
    out = []
    for s in shifts:
        sh = 2.0 ** (-s)
        c = np.clip(np.rint(r / sh), -127, 127)
        r = r - c * sh
        out.append(c.astype(np.int8))
    return out


def main():
    rng = np.random.RandomState(0)

    x64 = rng.standard_normal((F, LANES)) * \
        np.exp(rng.uniform(-8, 8, (F, LANES)))
    xhi = x64.astype(np.float32)
    xlo = (x64 - xhi).astype(np.float32)

    k = np.arange(F)
    W = np.cos(-2 * np.pi * np.outer(k, k) / F)

    ref = W @ (xhi.astype(np.float64) + xlo.astype(np.float64))

    # per-tile alignment from the hi plane
    m = int(np.floor(np.log2(np.abs(xhi).max()))) + 1

    hi_shifts = [B * (i + 1) for i in range(8)]           # bits 7..56
    lo_shifts = [24 + B * (i + 1) for i in range(5)]      # bits 31..59
    x_channels = list(zip(chunk_exact(xhi, m, hi_shifts), hi_shifts))
    x_channels += list(zip(chunk_exact(xlo, m, lo_shifts), lo_shifts))

    w_shifts = [B * (i + 1) for i in range(8)]
    w_channels = list(zip(chunk_exact(W, 0, w_shifts, np.float64), w_shifts))

    nmm = 0
    acc = {}
    for wc, ws in w_channels:
        for xc, xs in x_channels:
            s = ws + xs
            if s > KEEP_BITS + B:      # shifts are chunk-END positions
                continue
            p = wc.astype(np.int32) @ xc.astype(np.int32)
            acc[s] = acc.get(s, 0) + p.astype(np.int64)
            nmm += 1

    y = np.zeros_like(ref)
    for s in sorted(acc):
        y += acc[s].astype(np.float64) * 2.0 ** (m - s)

    rel = np.abs(y - ref).max() / np.abs(ref).max()
    print(f"matmuls={nmm}  (bf16-equiv ~{nmm / 2:.0f})")
    print(f"max rel err vs f64 matmul: {rel:.3e}  (target < 1e-13)")
    worst = max(np.abs(v).max() for v in acc.values())
    print(f"max |int accum| = {worst:.3e}  (int32 max 2.1e9)")


if __name__ == "__main__":
    main()
