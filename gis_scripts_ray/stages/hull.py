"""Distributed per-group convex hull (strict, integer-exact).

The reference derives footprint geometry from point collections
(``create_dem_tiles_from_array.py`` computes tile extents from point
extrema; ``Assess_Agreement.R`` clips to survey footprints) — the
convex hull is the canonical "footprint of a point cloud" operator the
suite was missing.

Semantics (pinned by the SQL gift-wrapping twin in ``queries.py``):

* input points are INTEGER lattice coordinates (exact cross products —
  no epsilon geometry anywhere);
* STRICT hull: collinear edge-interior points are excluded;
* output per group: vertices in COUNTER-CLOCKWISE order (interior on
  the left), ``seq`` starting at the vertex with minimum ``(y, x)``;
* degenerate groups follow through: one distinct point -> one row,
  two points / all-collinear -> the two extreme endpoints.

Scale shape: hulls compose — ``hull(A ∪ B) == hull(hull(A) ∪
hull(B))`` — so each block contributes only its PARTIAL HULL vertices
(O(h) rows, h = hull complexity: O(log n) expected for rounded point
sets, O(n^(1/3)) for uniform-in-disc) and the per-group finish shuffles
partial vertices only, never the corpus.  Inside a block, points are
first DEDUPLICATED and then Akl–Toussaint PRUNED (the classic
throw-away-the-octagon-interior filter, fully vectorized) so the
O(n log n) chain's Python loop only ever walks near-boundary points.

Per-row reference: :func:`gift_wrap` implements the O(n·h) Jarvis
march with EXACTLY the SQL twin's candidate rule (all other points
strictly left, or collinear-and-closer) — the parity oracle for both
the monotone chain and the SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _cross(o: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.int64:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Strict convex hull of DISTINCT int64 points ``(n, 2)`` as
    ``(h, 2)``, CCW, starting at the minimum-``(y, x)`` vertex
    (Andrew's monotone chain; collinear points popped)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]  # by (x, then y)
    n = len(pts)
    if n <= 2:
        hull = pts
    else:
        lower: list = []
        for p in pts:
            while len(lower) > 1 and _cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        upper: list = []
        for p in pts[::-1]:
            while len(upper) > 1 and _cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)
    # rotate the cycle to start at min (y, x) — the SQL twin's start rule
    start = np.lexsort((hull[:, 0], hull[:, 1]))[0]
    return np.roll(hull, -start, axis=0)


def gift_wrap(pts: np.ndarray) -> np.ndarray:
    """Reference Jarvis march — the SQL twin's rule verbatim: from the
    minimum-``(y, x)`` start, the next vertex ``q`` is the point for
    which NO other ``r`` lies strictly right of ``p→q`` or collinear
    beyond ``q``.  O(n·h); parity oracle only, never the hot path."""
    pts = np.unique(pts, axis=0)
    n = len(pts)
    start = np.lexsort((pts[:, 0], pts[:, 1]))[0]
    if n <= 2:
        return np.roll(pts, -start, axis=0)
    hull = [pts[start]]
    while True:
        p = hull[-1]
        q = None
        for cand in pts:
            if np.array_equal(cand, p):
                continue
            ok = True
            for r in pts:
                if np.array_equal(r, p) or np.array_equal(r, cand):
                    continue
                c = _cross(p, cand, r)
                if c < 0 or (
                    c == 0
                    and (r[0] - p[0]) ** 2 + (r[1] - p[1]) ** 2
                    > (cand[0] - p[0]) ** 2 + (cand[1] - p[1]) ** 2
                ):
                    ok = False
                    break
            if ok:
                q = cand
                break
        assert q is not None, "gift_wrap: no next vertex (degenerate input?)"
        if np.array_equal(q, pts[start]):
            return np.asarray(hull, dtype=np.int64)
        hull.append(q)


def akl_toussaint_prune(pts: np.ndarray) -> np.ndarray:
    """Drop points STRICTLY inside the octagon of the 8 directional
    extremes (min/max of x, y, x+y, x−y) — hull-preserving (a point
    strictly inside a convex polygon of hull points is never a hull
    vertex), fully vectorized, and the reason the chain's Python loop
    only ever sees O(boundary) points per block."""
    if len(pts) <= 8:
        return pts
    x, y = pts[:, 0], pts[:, 1]
    proj = np.stack([x, y, x + y, x - y], axis=1)
    idx = np.unique(
        np.concatenate([np.argmin(proj, axis=0), np.argmax(proj, axis=0)])
    )
    oct_hull = monotone_chain(np.unique(pts[idx], axis=0))
    if len(oct_hull) < 3:
        return pts
    inside = np.ones(len(pts), dtype=bool)
    for i in range(len(oct_hull)):
        a, b = oct_hull[i], oct_hull[(i + 1) % len(oct_hull)]
        cr = (b[0] - a[0]) * (y - a[1]) - (b[1] - a[1]) * (x - a[0])
        inside &= cr > 0
    return pts[~inside]


def _distinct_points(
    batch: pa.Table, group_col: str, x_col: str, y_col: str
) -> "tuple[np.ndarray, dict]":
    """(group values, {group -> (k, 2) distinct int64 points}) for one
    block, via one vectorized unique over (group, x, y)."""
    t = batch.select([group_col, x_col, y_col]).group_by(
        [group_col, x_col, y_col]
    ).aggregate([])
    groups = t[group_col].to_numpy(zero_copy_only=False)
    xy = np.stack(
        [t[x_col].to_numpy().astype(np.int64), t[y_col].to_numpy().astype(np.int64)],
        axis=1,
    )
    out: dict = {}
    order = np.argsort(groups, kind="stable")
    groups_s, xy_s = groups[order], xy[order]
    bounds = np.flatnonzero(
        np.r_[True, groups_s[1:] != groups_s[:-1], True]
    )
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        out[groups_s[lo]] = xy_s[lo:hi]
    return groups, out


def convex_hull(
    ds: ray.data.Dataset, group_col: str, x_col: str, y_col: str
) -> ray.data.Dataset:
    """Per-group strict convex hull as rows ``(group, seq, x, y)`` —
    CCW from the minimum-(y, x) vertex.  Per-block partial hulls (dedup
    → Akl–Toussaint prune → chain) shuffle O(h) vertices per group per
    block into a per-group chain finish; the corpus itself never
    shuffles."""

    def partial(batch: pa.Table) -> pa.Table:
        _, per_group = _distinct_points(batch, group_col, x_col, y_col)
        gs, xs, ys = [], [], []
        for g, pts in per_group.items():
            hull = monotone_chain(akl_toussaint_prune(pts))
            gs.extend([g] * len(hull))
            xs.extend(hull[:, 0].tolist())
            ys.extend(hull[:, 1].tolist())
        gtype = batch.schema.field(group_col).type
        return pa.table(
            {
                group_col: pa.array(gs, type=gtype),
                x_col: pa.array(xs, pa.int64()),
                y_col: pa.array(ys, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        pts = np.unique(
            np.stack(
                [
                    g[x_col].to_numpy().astype(np.int64),
                    g[y_col].to_numpy().astype(np.int64),
                ],
                axis=1,
            ),
            axis=0,
        )
        hull = monotone_chain(pts)
        gtype = g.schema.field(group_col).type
        return pa.table(
            {
                group_col: pa.array(
                    [g[group_col][0].as_py()] * len(hull), type=gtype
                ),
                "seq": pa.array(np.arange(len(hull)), pa.int64()),
                x_col: pa.array(hull[:, 0], pa.int64()),
                y_col: pa.array(hull[:, 1], pa.int64()),
            }
        )

    return partials.groupby(group_col).map_groups(finish, batch_format="pyarrow")


def hull_diameter(
    ds: ray.data.Dataset, group_col: str, x_col: str, y_col: str
) -> ray.data.Dataset:
    """Per-group exact diameter (max squared pairwise distance) +
    hull-vertex count ``(group, d2_max, n_hull)``.  The farthest pair
    of a point set is realized by hull vertices, so this rides the
    :func:`convex_hull` partial-hull plan and the final all-pairs scan
    is O(h²) over the FINISHED hull only — the corpus never pairs."""
    hull = convex_hull(ds, group_col, x_col, y_col)

    def diam(g: pa.Table) -> pa.Table:
        x = g[x_col].to_numpy().astype(np.int64)
        y = g[y_col].to_numpy().astype(np.int64)
        d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
        gtype = g.schema.field(group_col).type
        return pa.table(
            {
                group_col: pa.array([g[group_col][0].as_py()], type=gtype),
                "d2_max": pa.array([int(d2.max())], pa.int64()),
                "n_hull": pa.array([len(x)], pa.int64()),
            }
        )

    return hull.groupby(group_col).map_groups(diam, batch_format="pyarrow")
