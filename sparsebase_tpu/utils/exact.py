"""Exact integer totals from device reductions.

TPU reductions have no int64 (no x64 on device) and f32 sums lose
exactness once the total passes 2**24 — the failure mode the round-2
MXU triangle paths hit (reference semantics they must match:
src/sparsebase/feature/triangle_count.cc:141-205, which accumulates in
int64_t on host). The fix used here: compute the same sum twice on
device —

* ``wrapped``: an int32 sum. Integer adds wrap mod 2**32, so this is
  the exact total modulo 2**32, regardless of magnitude.
* ``approx``: an f32 sum. XLA lowers reductions as trees, so the
  absolute error is ~total * 2**-24 * log2(N) — far below 2**31 for any
  total up to ~10**13.

``combine_wrapped`` snaps the approximation to the unique integer
congruent to ``wrapped`` mod 2**32 within the error window, recovering
the exact total on host at int64+ precision.
"""

from __future__ import annotations

_TWO32 = 1 << 32


def combine_wrapped(wrapped: int, approx: float) -> int:
    """Exact integer total from (int32-wrapped sum, f32 approximate sum).

    Valid whenever the f32 sum's absolute error is < 2**31 — true for
    totals up to ~10**13 under XLA's tree reductions.
    """
    r = int(wrapped) & (_TWO32 - 1)
    k = round((float(approx) - r) / _TWO32)
    return r + int(k) * _TWO32
