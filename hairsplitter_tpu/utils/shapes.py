"""Static-shape bucketing for device calls.

Everything under jit is compiled per shape; ragged inputs (reads per window,
SNPs per contig, seeds per window) would otherwise trigger one XLA/Mosaic
compile per distinct size — on a remote-compile TPU service that costs
seconds to minutes EACH, and even locally it defeats the compile cache.
Pad every device-call operand up to a power-of-two bucket and slice the
result back; the ops are written so padding is a no-op (absent trimer code,
zero indicator rows, masked-out graph nodes).
"""

from __future__ import annotations

import numpy as np


def pow2_bucket(n: int, minimum: int = 32) -> int:
    """Smallest power of two >= n (and >= minimum)."""
    n = max(int(n), 1)
    return max(minimum, 1 << (n - 1).bit_length())


def pad_axis(arr: np.ndarray, axis: int, size: int, fill) -> np.ndarray:
    """Pad `arr` with `fill` along `axis` up to `size` (no-op if already)."""
    if arr.shape[axis] >= size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - arr.shape[axis])
    return np.pad(arr, widths, constant_values=fill)
