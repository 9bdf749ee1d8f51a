"""Mann-Whitney U test + rank-biserial effect size (pure numpy).

Closes the reference's statistical-agreement layer
(``external/Coffer_et_al_seagrass/WorldView_seagrass/R_library/
Assess_Agreement.R:85-94``): R's ``wilcox.test(x, y, alternative=...)``
(normal approximation with tie correction and continuity correction — the
path R takes for the reference's sample sizes) and
``effectsize::rank_biserial`` (r = 2*U1/(n1*n2) - 1), plus the reference's
Negligible/Small/Moderate/Large magnitude labels (thresholds 0.1/0.3/0.5).

Two input shapes:

* :func:`mann_whitney_u` — raw sample arrays (driver-side, test oracle);
* :func:`mwu_from_histogram` — per-distinct-value counts for the two
  groups, the DISTRIBUTED shape: the engine pre-aggregates (group, value)
  counts with ``cell_count`` (in-batch partials + small shuffle) and only
  the bounded histogram reaches the driver. Ranks, U, and the effect size
  are exact functions of the histogram (average ranks are multiples of
  0.5, so float64 arithmetic is exact below 2^52 — both shapes produce
  bit-identical statistics).
"""

from __future__ import annotations

import math

import numpy as np


def rankdata_avg(v: np.ndarray) -> np.ndarray:
    """1-based average (midrank) ranks, ties sharing their mean rank."""
    v = np.asarray(v)
    order = np.argsort(v, kind="mergesort")
    sv = v[order]
    new = np.concatenate([[True], sv[1:] != sv[:-1]])
    starts = np.nonzero(new)[0]
    lens = np.diff(np.concatenate([starts, [len(sv)]]))
    avg = starts + (lens + 1) / 2.0  # run at 0-based s spans ranks s+1..s+t
    ranks = np.empty(len(v), dtype=np.float64)
    ranks[order] = np.repeat(avg, lens)
    return ranks


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def _finish(
    u1: float, n1: int, n2: int, tie_term: float, alternative: str, continuity: bool
) -> dict:
    if n1 == 0 or n2 == 0:
        raise ValueError("mann_whitney_u: both groups must be non-empty")
    N = n1 + n2
    mu = n1 * n2 / 2.0
    sigma2 = n1 * n2 / 12.0 * ((N + 1) - tie_term / (N * (N - 1)))
    sigma = math.sqrt(sigma2) if sigma2 > 0 else 0.0
    cc = 0.5 if continuity else 0.0
    if sigma == 0.0:
        z = 0.0
        p = 1.0
    elif alternative == "less":
        z = (u1 - mu + cc) / sigma
        p = _phi(z)
    elif alternative == "greater":
        z = (u1 - mu - cc) / sigma
        p = 1.0 - _phi(z)
    elif alternative == "two-sided":
        shift = min(cc, abs(u1 - mu))
        z = (u1 - mu - math.copysign(shift, u1 - mu)) / sigma
        p = min(1.0, 2.0 * (1.0 - _phi(abs(z))))
    else:
        raise ValueError(f"unknown alternative {alternative!r}")
    return {
        "u1": u1,
        "n1": n1,
        "n2": n2,
        "z": z,
        "p": p,
        "rank_biserial": 2.0 * u1 / (n1 * n2) - 1.0,
    }


def mann_whitney_u(
    x, y, alternative: str = "less", continuity: bool = True
) -> dict:
    """U test of group ``x`` vs ``y`` on raw samples.

    Returns {u1, n1, n2, z, p, rank_biserial}; ``u1`` is R's W for sample
    x — the number of (x > y) pairs plus half the ties — so
    ``alternative="less"`` (small W) asks whether x tends SMALLER than y
    (R's convention)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    both = np.concatenate([x, y])
    ranks = rankdata_avg(both)
    u1 = float(ranks[: len(x)].sum()) - len(x) * (len(x) + 1) / 2.0
    _, t = np.unique(both, return_counts=True)
    tie_term = float(((t.astype(np.float64)) ** 3 - t).sum())
    return _finish(u1, len(x), len(y), tie_term, alternative, continuity)


def mwu_from_histogram(
    values, counts_x, counts_y, alternative: str = "less", continuity: bool = True
) -> dict:
    """Same statistics from per-distinct-value group counts (the
    distributed shape; bit-identical to :func:`mann_whitney_u` on the
    expanded samples — tested)."""
    values = np.asarray(values)
    cx = np.asarray(counts_x, dtype=np.int64)
    cy = np.asarray(counts_y, dtype=np.int64)
    order = np.argsort(values, kind="mergesort")
    cx, cy = cx[order], cy[order]
    t = cx + cy
    before = np.concatenate([[0], np.cumsum(t)[:-1]])
    avg_rank = before + (t + 1) / 2.0
    n1 = int(cx.sum())
    n2 = int(cy.sum())
    r1 = float((cx * avg_rank).sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    tt = t.astype(np.float64)
    tie_term = float((tt**3 - tt).sum())
    return _finish(u1, n1, n2, tie_term, alternative, continuity)


def weighted_median(values, counts) -> float:
    """numpy ``median`` semantics over a (value, count) histogram: the
    middle order statistic, or the mean of the two middle ones."""
    values = np.asarray(values, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.int64)
    order = np.argsort(values, kind="mergesort")
    v = values[order]
    c = counts[order]
    n = int(c.sum())
    if n == 0:
        raise ValueError("weighted_median: empty histogram")
    cum = np.cumsum(c)
    if n % 2 == 1:
        return float(v[np.searchsorted(cum, n // 2 + 1)])
    lo = float(v[np.searchsorted(cum, n // 2)])
    hi = float(v[np.searchsorted(cum, n // 2 + 1)])
    return (lo + hi) / 2.0


def difference_label(r: float) -> str:
    """The reference's effect-magnitude label (Assess_Agreement.R:94)."""
    a = abs(r)
    if a < 0.1:
        return "Negligible"
    if a < 0.3:
        return "Small"
    if a < 0.5:
        return "Moderate"
    return "Large"
