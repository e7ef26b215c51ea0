"""Logarithmic key<->value mapping for DDSketch.

Semantics match the reference (`/root/reference/src/mapping.rs:6-38`,
`/root/reference/src/ddsketchy.rs:163-195`) bit-for-bit on IEEE doubles:

- gamma      = 1 + 2*alpha/(1-alpha)
- ln(gamma)  computed as log1p(2*alpha/(1-alpha)) for small-alpha stability
- key(v)     = ceil(ln|v| * inv_ln_gamma), key(0) = 0
- value(k)   = exp(k * (1/inv_ln_gamma)) * 2/(1+gamma)
  (the reference recomputes ln(gamma) as the reciprocal of inv_ln_gamma at
   query time, `/root/reference/src/ddsketchy.rs:220-222`; we do the same so
   reconstructed values agree to the last bit)
- min_indexable_value = max(exp((INT32_MIN)/inv_ln_gamma + 1),
                            DBL_MIN_POSITIVE * gamma)
  (`/root/reference/src/ddsketchy.rs:175-177`)

All hot-path functions are vectorized NumPy — no per-row Python.
"""

from __future__ import annotations

import math
import sys

import numpy as np

INT32_MIN = -(2**31)
DBL_MIN_POSITIVE = sys.float_info.min  # 2.2250738585072014e-308, f64::MIN_POSITIVE


class LogMapping:
    """Derived mapping constants for a given relative-error parameter alpha."""

    __slots__ = ("alpha", "gamma", "gamma_ln", "inv_ln_gamma", "min_indexable_value")

    def __init__(self, alpha: float) -> None:
        alpha = float(alpha)
        if not math.isfinite(alpha) or alpha <= 0.0 or alpha >= 1.0:
            raise ValueError(f"alpha must be finite and in (0, 1), got {alpha!r}")
        self.alpha = alpha
        x = (2.0 * alpha) / (1.0 - alpha)
        self.gamma = 1.0 + x
        self.gamma_ln = math.log1p(x)
        self.inv_ln_gamma = 1.0 / self.gamma_ln
        min_from_range = math.exp(INT32_MIN / self.inv_ln_gamma + 1.0)
        min_from_normal = DBL_MIN_POSITIVE * self.gamma
        self.min_indexable_value = max(min_from_range, min_from_normal)

    # -- scalar paths ------------------------------------------------------

    def key(self, value: float) -> int:
        """Map a value to its bucket key (operates on |value|; key(0)=0)."""
        if value == 0.0:
            return 0
        k = math.ceil(math.log(abs(value)) * self.inv_ln_gamma)
        return _wrap_i32(int(k))

    def value(self, key: int) -> float:
        """Representative (reconstructed) value for a bucket key."""
        gamma_ln = 1.0 / self.inv_ln_gamma
        return math.exp(float(key) * gamma_ln) * (2.0 / (1.0 + self.gamma))

    # -- vectorized paths --------------------------------------------------

    def keys_for(self, values: np.ndarray) -> np.ndarray:
        """Vectorized key(v) for an array of strictly-positive magnitudes.

        Caller guarantees values >= min_indexable_value (positive-store
        magnitudes); zero/sign routing happens before this call.
        """
        buf = np.log(values)
        buf *= self.inv_ln_gamma          # in-place: same fp ops, fewer temporaries
        np.ceil(buf, out=buf)
        return buf.astype(np.int64).astype(np.int32)

    def values_for(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized value(k) for an array of keys."""
        gamma_ln = 1.0 / self.inv_ln_gamma
        return np.exp(keys.astype(np.float64) * gamma_ln) * (2.0 / (1.0 + self.gamma))

    @staticmethod
    def alpha_from_gamma(gamma: float) -> float:
        """Recover alpha from gamma: (gamma-1)/(gamma+1)."""
        return (gamma - 1.0) / (gamma + 1.0)


def _wrap_i32(k: int) -> int:
    """Two's-complement wrap of a Python int to i32, matching Rust `as i32`."""
    k &= 0xFFFFFFFF
    return k - 0x100000000 if k >= 0x80000000 else k
