"""Driver-contract queries + exact-match DuckDB oracle SQL.

Every entry in :data:`QUERIES` is a ``Callable[[sf_dir], Dataset | Table]``
running a Ray-Data pipeline; :data:`ORACLES` holds the ANSI-SQL twin that
DuckDB runs on the same parquet views. The driver compares row count,
schema and an order-insensitive value hash — so column NAMES and exact
values must match.

Exactness strategy (see SURVEY.md §7.5 "exact reference-output matching"):

* aggregate in the **integer domain** wherever possible — quantities are
  integer-valued; prices become cents via round(x*100); event values
  become micros. Integer sums are order-independent, so Ray's combine tree
  and DuckDB's scan order cannot diverge.
* emit cell ids / tile coords / ids / counts (ints), never raw floats,
  except where a value is a single arithmetic expression of exact inputs
  (bit-identical on both sides) or explicitly rounded.
* the geocoder table and the rectangle layer are embedded in the SQL as
  VALUES literals via ``repr`` (round-trip exact doubles).
* points are synthesized on a 0.01-degree lattice (+0.003), polygon edges
  on a 0.005 lattice, so strict vs closed boundary semantics and 1-ulp
  transcendental differences can never flip a containment or floor.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


from gis_scripts_ray.functions import wkb
from gis_scripts_ray.sources.polygons import rectangles_table
from gis_scripts_ray.sources.webpages import site_locations, urls_for_doc_ids
from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells
from gis_scripts_ray.stages.knn import knn_brute
from gis_scripts_ray.stages.pip_join import pip_join
from gis_scripts_ray.stages.scalar import condition_mask, condition_sql
from gis_scripts_ray.stages.tile_agg import cell_sum_count
from gis_scripts_ray.state.geocoder import host_geo_table

TILE_Z = 6

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

# uint64-wrapping multiplicative hashes (HUGEINT % 2**64 emulates the
# engine's uint64 wrap — plain BIGINT multiply would OVERFLOW-ERROR in
# DuckDB at doc_id > ~3.47e9 while numpy wraps silently; identical for
# all non-wrapping ids)
_WRAP64 = "18446744073709551616"
_HIDX_SQL = (
    f"CASE WHEN (CAST(doc_id AS HUGEINT)*2654435761)%{_WRAP64}%1000000 < 800000 "
    f"THEN CAST((CAST(doc_id AS HUGEINT)*40503)%{_WRAP64}%40 AS BIGINT) "
    f"ELSE CAST(40+(CAST(doc_id AS HUGEINT)*9973)%{_WRAP64}%160 AS BIGINT) END"
)


def _sql_floordiv(x: str, d: int) -> str:
    """Exact integer FLOOR division (numpy ``//`` semantics). DuckDB's
    ``//`` truncates toward zero, diverging on negative values (e.g.
    pre-1970 timestamps): -1//3600000000 is 0 in DuckDB, -1 in numpy.
    Subtracting the non-negative residue first makes the division exact,
    where trunc == floor."""
    m = f"((({x}) % {d}) + {d}) % {d}"
    return f"((({x}) - ({m})) // {d})"


def _id_shift(sf_dir: str, table: str, col: str) -> int:
    """``max(col) + 1`` — the collision-free id offset for shifted-union
    fixtures at ANY scale (a hard-coded shift collides with real ids once
    they reach it — the decontaminate bug class). Read from parquet
    row-group STATISTICS (no data scan); twinned in SQL by a
    ``(SELECT MAX(col)+1 FROM table)`` scalar subquery."""
    import pyarrow.parquet as pq_mod

    path = f"{sf_dir}/{table}.parquet"
    f = pq_mod.ParquetFile(path)
    i = f.schema_arrow.get_field_index(col)
    mx = None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(i).statistics
        if st is None or not st.has_min_max:
            mx = None
            break
        mx = st.max if mx is None else max(mx, st.max)
    if mx is None:  # stats missing: one-column driver scan
        t = pq_mod.read_table(path, columns=[col])
        mx = pc.max(t[col]).as_py()
    return int(mx) + 1


def _host_geo_values() -> str:
    t = host_geo_table()
    lat = t["lat"].to_pylist()
    lon = t["lon"].to_pylist()
    return ", ".join(f"({i}, {la!r}, {lo!r})" for i, (la, lo) in enumerate(zip(lat, lon)))


def _located_cte(cols: str = "d.*") -> str:
    """CTE chain deriving (doc_id..., lat, lon) exactly like the geocoder."""
    return (
        f"WITH hx AS (SELECT *, {_HIDX_SQL} AS hidx FROM documents), "
        f"hostgeo(hidx, lat, lon) AS (VALUES {_host_geo_values()}), "
        f"located AS (SELECT {cols}, g.lat AS lat, g.lon AS lon "
        f"FROM hx d JOIN hostgeo g ON d.hidx = g.hidx)"
    )


def _tile_sql(z: int) -> tuple[str, str]:
    n = float(1 << z)
    x = f"CAST(FLOOR((lon+180.0)/360.0*{n}) AS BIGINT)"
    y = (
        f"CAST(FLOOR((1.0 - LN(TAN(lat*(PI()/180.0)) + 1.0/COS(lat*(PI()/180.0)))/PI())"
        f"/2.0*{n}) AS BIGINT)"
    )
    return x, y


_HAVERSINE_SQL = (
    "2.0*6371008.8*ASIN(SQRT("
    "POWER(SIN((lat*(PI()/180.0)-({plat})*(PI()/180.0))/2.0),2) + "
    "COS(({plat})*(PI()/180.0))*COS(lat*(PI()/180.0))*"
    "POWER(SIN((lon*(PI()/180.0)-({plon})*(PI()/180.0))/2.0),2)))"
)


def _rect_values() -> str:
    t = rectangles_table()
    return ", ".join(
        f"({pid}, '{cls}', {x0!r}, {y0!r}, {x1!r}, {y1!r}, {prio})"
        for pid, cls, x0, y0, x1, y1, prio in zip(
            t["polygon_id"].to_pylist(),
            t["class"].to_pylist(),
            t["xmin"].to_pylist(),
            t["ymin"].to_pylist(),
            t["xmax"].to_pylist(),
            t["ymax"].to_pylist(),
            t["priority"].to_pylist(),
        )
    )


_RECT_JOIN = (
    "JOIN (VALUES {values}) AS r(polygon_id, class, xmin, ymin, xmax, ymax, priority) "
    "ON located.lat BETWEEN r.ymin AND r.ymax AND located.lon BETWEEN r.xmin AND r.xmax"
)


def rect_polygon_table() -> pa.Table:
    """The rectangle subset of the polygon layer, as WKB (engine side)."""
    t = rectangles_table()
    blobs = [
        wkb.box_wkb(x0, y0, x1, y1)
        for x0, y0, x1, y1 in zip(
            t["xmin"].to_pylist(),
            t["ymin"].to_pylist(),
            t["xmax"].to_pylist(),
            t["ymax"].to_pylist(),
        )
    ]
    return pa.table(
        {
            "polygon_id": t["polygon_id"],
            "class": t["class"],
            "wkb": pa.array(blobs, pa.binary()),
            "priority": t["priority"],
        }
    )


# ---------------------------------------------------------------------------
# engine-side building blocks
# ---------------------------------------------------------------------------


def located_documents(sf_dir: str, cols: tuple[str, ...] = ("doc_id",)) -> ray.data.Dataset:
    """documents -> url -> geocoder actor pool -> (cols..., lat, lon)."""
    from gis_scripts_ray.pipelines.flagship import geocode

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(cols))

    def add_url(batch: pa.Table) -> pa.Table:
        return batch.append_column("url", urls_for_doc_ids(batch["doc_id"].to_numpy()))

    return geocode(ds.map_batches(add_url, batch_format="pyarrow"))


from gis_scripts_ray.state.broadcast import worker_broadcast as _worker_broadcast


def _round_half_away(v: np.ndarray) -> np.ndarray:
    """Exact HALF-AWAY-FROM-ZERO rounding (C ``std::round``), matching
    DuckDB ``ROUND(double)`` on every input. ``np.round`` is half-EVEN
    (12.5 -> 12 vs ROUND's 13) and ``floor(v+0.5)`` double-rounds near
    representation boundaries — instead, adjust the half-even result
    only on EXACT .5 fractions (float comparisons are exact)."""
    r = np.round(v)
    t = np.trunc(v)
    is_half = np.abs(v - t) == 0.5
    return np.where(is_half, t + np.copysign(1.0, v), r)


def _cents(col) -> pa.Array:
    # half-away: the SQL twins use ROUND(x*100), which DuckDB evaluates
    # half-away-from-zero on doubles (np.round's half-even diverges on
    # exact .5 products, e.g. 0.125*100)
    v = np.asarray(col.to_numpy(), dtype=np.float64)
    return pa.array(_round_half_away(v * 100.0).astype(np.int64), pa.int64())


def _micros(col) -> pa.Array:
    v = np.asarray(col.to_numpy(), dtype=np.float64)
    return pa.array(_round_half_away(v * 1_000_000.0).astype(np.int64), pa.int64())


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_geo_tile_counts(sf_dir: str):
    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = encode_cells(located_documents(sf_dir), EncodeConfig(tile_z=TILE_Z))
    return cell_count(ds, ["tile_x", "tile_y"], alias="n_docs")


def _sql_geo_tile_counts() -> str:
    x, y = _tile_sql(TILE_Z)
    return (
        _located_cte("d.doc_id")
        + f" SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS n_docs FROM "
        f"(SELECT {x} AS tile_x, {y} AS tile_y FROM located) GROUP BY tile_x, tile_y"
    )


_PYRAMID_Z_MAX = 8
_PYRAMID_Z_MIN = 5


def q_tile_pyramid(sf_dir: str):
    """Multi-resolution tile aggregates (round 5 — the tiling half of the
    north rule asks for a resolution RANGE, res 5-9 style): ONE corpus
    pass aggregates at z_max, then every coarser level folds the
    previous level's AGGREGATE via the exact web-Mercator parent
    identity floor(floor(a·2^z)/2) == floor(a·2^(z-1)) — O(tiles) per
    extra level, never another corpus scan. The twin recomputes each
    level DIRECTLY from lon/lat, so the rollup identity itself is
    value-certified."""
    from gis_scripts_ray.stages.pyramid import tile_pyramid

    ds = located_documents(sf_dir, ("doc_id", "n_chars"))
    return tile_pyramid(
        ds, _PYRAMID_Z_MAX, _PYRAMID_Z_MIN, value_cols=["n_chars"]
    )


def _sql_tile_pyramid() -> str:
    parts = []
    for z in range(_PYRAMID_Z_MAX, _PYRAMID_Z_MIN - 1, -1):
        x, y = _tile_sql(z)
        parts.append(
            f"SELECT CAST({z} AS BIGINT) AS z, tile_x, tile_y, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM "
            f"(SELECT {x} AS tile_x, {y} AS tile_y, n_chars FROM located) "
            "GROUP BY tile_x, tile_y"
        )
    return _located_cte("d.doc_id, d.n_chars") + " " + " UNION ALL ".join(parts)


def q_geo_pip_class_stats(sf_dir: str):
    ds = located_documents(sf_dir, ("doc_id", "n_chars"))
    joined = pip_join(ds, rect_polygon_table(), carry_cols=["doc_id", "n_chars"])
    return cell_sum_count(joined, ["class"], ["n_chars"])


def _sql_geo_pip_class_stats() -> str:
    return (
        _located_cte("d.doc_id, d.n_chars")
        + " SELECT class, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM located "
        + _RECT_JOIN.format(values=_rect_values())
        + " GROUP BY class"
    )


def q_agreement_test(sf_dir: str):
    """Statistical-agreement layer (``Assess_Agreement.R:85-94``): the
    reference's per-zone Mann-Whitney U — here doc sizes in 'urban' zones
    (x) vs 'water' zones (y), one-sided 'less' — with the
    ``effectsize::rank_biserial`` effect size and the reference's
    Negligible/Small/Moderate/Large label. Output mirrors the reference's
    csv: one row per class (class, n, median_chars, rank_biserial,
    difference).

    Distributed shape: per-(class, value) counts via ``cell_count``
    (in-batch partials + small shuffle); only the bounded histogram
    reaches the driver, where midranks/U/medians are EXACT functions of
    it (average ranks are multiples of 0.5 — float64-exact), so the SQL
    twin's per-row window-function midranks agree bit-for-bit."""
    from gis_scripts_ray.functions.stats_tests import (
        difference_label,
        mwu_from_histogram,
        weighted_median,
    )
    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = located_documents(sf_dir, ("doc_id", "n_chars"))
    joined = pip_join(ds, rect_polygon_table(), carry_cols=["doc_id", "n_chars"])
    two = pa.array(["urban", "water"])

    def keep_two(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["class"], value_set=two)).select(
            ["class", "n_chars"]
        )

    hist = cell_count(
        joined.map_batches(keep_two, batch_format="pyarrow"), ["class", "n_chars"]
    ).to_pandas()
    hu = hist[hist["class"] == "urban"]
    hw = hist[hist["class"] == "water"]
    vals = np.union1d(hu["n_chars"].to_numpy(), hw["n_chars"].to_numpy())
    cu = np.zeros(len(vals), dtype=np.int64)
    cu[np.searchsorted(vals, hu["n_chars"].to_numpy())] = hu["n"].to_numpy()
    cw = np.zeros(len(vals), dtype=np.int64)
    cw[np.searchsorted(vals, hw["n_chars"].to_numpy())] = hw["n"].to_numpy()
    res = mwu_from_histogram(vals, cu, cw, alternative="less")
    rb = res["rank_biserial"]
    lab = difference_label(rb)
    return pa.table(
        {
            "class": pa.array(["urban", "water"], pa.string()),
            "n": pa.array([res["n1"], res["n2"]], pa.int64()),
            "median_chars": pa.array(
                [
                    weighted_median(vals[cu > 0], cu[cu > 0]),
                    weighted_median(vals[cw > 0], cw[cw > 0]),
                ],
                pa.float64(),
            ),
            "rank_biserial": pa.array([rb, rb], pa.float64()),
            "difference": pa.array([lab, lab], pa.string()),
        }
    )


def _sql_agreement_test() -> str:
    """Midranks via window functions: avg rank of a tied block =
    RANK() + (tie_count - 1)/2 — identical halves-exact arithmetic to the
    engine's histogram path."""
    rb = "(SELECT rb FROM u)"
    return (
        _located_cte("d.doc_id, d.n_chars")
        + ", j AS (SELECT r.class AS class, n_chars FROM located "
        + _RECT_JOIN.format(values=_rect_values())
        + " WHERE r.class IN ('urban', 'water')), "
        "rk AS (SELECT class, n_chars, CAST(RANK() OVER (ORDER BY n_chars) AS DOUBLE) "
        "+ (CAST(COUNT(*) OVER (PARTITION BY n_chars) AS DOUBLE) - 1.0)/2.0 AS ar FROM j), "
        "s AS (SELECT SUM(CASE WHEN class='urban' THEN ar ELSE 0 END) AS r1, "
        "CAST(SUM(CASE WHEN class='urban' THEN 1 ELSE 0 END) AS DOUBLE) AS n1, "
        "CAST(SUM(CASE WHEN class='water' THEN 1 ELSE 0 END) AS DOUBLE) AS n2 FROM rk), "
        "u AS (SELECT 2.0*(r1 - n1*(n1+1.0)/2.0)/(n1*n2) - 1.0 AS rb FROM s) "
        "SELECT class, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(MEDIAN(n_chars) AS DOUBLE) AS median_chars, "
        f"{rb} AS rank_biserial, "
        f"CASE WHEN ABS({rb}) < 0.1 THEN 'Negligible' "
        f"WHEN ABS({rb}) < 0.3 THEN 'Small' "
        f"WHEN ABS({rb}) < 0.5 THEN 'Moderate' "
        "ELSE 'Large' END AS difference "
        "FROM j GROUP BY class"
    )


def q_geo_pip_join_rows(sf_dir: str):
    ds = located_documents(sf_dir)
    joined = pip_join(ds, rect_polygon_table(), carry_cols=["doc_id"])
    return joined.select_columns(["doc_id", "polygon_id"])


def _sql_geo_pip_join_rows() -> str:
    return (
        _located_cte("d.doc_id")
        + " SELECT doc_id, CAST(r.polygon_id AS BIGINT) AS polygon_id FROM located "
        + _RECT_JOIN.format(values=_rect_values())
    )


def q_geo_source_tile_stats(sf_dir: str):
    ds = encode_cells(
        located_documents(sf_dir, ("doc_id", "source", "n_chars")),
        EncodeConfig(tile_z=TILE_Z),
    )
    return cell_sum_count(ds, ["tile_x", "tile_y", "source"], ["n_chars"])


def _sql_geo_source_tile_stats() -> str:
    x, y = _tile_sql(TILE_Z)
    return (
        _located_cte("d.doc_id, d.source, d.n_chars")
        + f" SELECT tile_x, tile_y, source, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM "
        f"(SELECT source, n_chars, {x} AS tile_x, {y} AS tile_y FROM located) "
        f"GROUP BY tile_x, tile_y, source"
    )


def q_geo_knn(sf_dir: str):
    plat, plon = site_locations()
    top = knn_brute(located_documents(sf_dir), float(plat[0]), float(plon[0]), k=25)
    return top.select(["doc_id", "rank"]).rename_columns(["doc_id", "knn_rank"])


def _sql_geo_knn() -> str:
    plat, plon = site_locations()
    hav = _HAVERSINE_SQL.format(plat=repr(float(plat[0])), plon=repr(float(plon[0])))
    return (
        _located_cte("d.doc_id")
        + f" SELECT doc_id, knn_rank FROM (SELECT doc_id, CAST(ROW_NUMBER() OVER "
        f"(ORDER BY {hav} ASC, doc_id ASC) AS BIGINT) AS knn_rank FROM located) "
        f"WHERE knn_rank <= 25"
    )


def q_lineitem_pricing_summary(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        qty = pa.array(np.round(batch["l_quantity"].to_numpy()).astype(np.int64), pa.int64())
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": qty,
                "price_cents": _cents(batch["l_extendedprice"]),
            }
        )

    return cell_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["qty", "price_cents"],
    )


def _sql_lineitem_pricing_summary() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )


_QTY_CONDS = [">4", "<10"]


def q_count_conditions(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        m = condition_mask(batch["l_quantity"], _QTY_CONDS)
        b = batch.filter(m)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "qty": pa.array(np.round(b["l_quantity"].to_numpy()).astype(np.int64), pa.int64()),
            }
        )

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["l_returnflag"], ["qty"])


def _sql_count_conditions() -> str:
    return (
        "SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
        f"WHERE {condition_sql('l_quantity', _QTY_CONDS)} GROUP BY l_returnflag"
    )


def _nation_name_index(sf_dir: str):
    """Broadcastable vectorized custkey -> nation-name lookup: a dense
    int32 index array (custkey -> slot in the name array; unknown keys
    map to a trailing null slot) + the nation-name Arrow array. Replaces
    the per-row dict ``lookup.get`` (a Python loop over every order) with
    one numpy gather + one Arrow ``take`` per batch. Callers must guard
    the size (see :func:`_orders_nation_tagged`): the dense array is
    ``max(c_custkey)+1`` int32 slots, a BROADCAST-side structure."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = nation["n_nationkey"].to_numpy()
    names = nation["n_name"].to_pylist()
    slot_of_nat = np.full(int(nkeys.max()) + 1, len(names), dtype=np.int32)
    slot_of_nat[nkeys] = np.arange(len(names), dtype=np.int32)
    name_arr = pa.array(names + [None], pa.string())
    ckey = cust["c_custkey"].to_numpy()
    cnat = cust["c_nationkey"].to_numpy()
    slot_of_cust = np.full(int(ckey.max()) + 1, len(names), dtype=np.int32)
    slot_of_cust[ckey] = slot_of_nat[cnat]
    import ray

    return ray.put((slot_of_cust, name_arr))


def _take_nation_names(custkeys: np.ndarray, ref) -> "tuple[pa.Array, np.ndarray]":
    """(names, known-mask): unknown custkeys get a null name AND a False
    mask bit — callers FILTER on the mask so both delivery paths match
    the SQL twins' INNER-join semantics (which drop such rows)."""
    slot_of_cust, name_arr = _worker_broadcast(ref)
    ck = np.clip(custkeys, 0, len(slot_of_cust) - 1)
    slots = slot_of_cust[ck]
    slots = np.where((custkeys < 0) | (custkeys >= len(slot_of_cust)),
                     np.int32(len(name_arr) - 1), slots)
    return pc.take(name_arr, pa.array(slots, pa.int32())), slots < len(name_arr) - 1


# dense custkey slots above this are no longer a sane broadcast
# (int32 bytes = 4 * slots; 16M slots = 64 MB per worker copy)
_CUSTKEY_BROADCAST_SLOTS = 16_000_000


def _orders_nation_tagged(sf_dir: str) -> ray.data.Dataset:
    """(n_name, total_cents) rows for every order with a known customer —
    adaptive dimension-join delivery:

    * customer dense-index fits the broadcast budget: worker-cached
      numpy-gather lookup inside ONE fused task stage (no shuffle);
    * else: hash-partitioned join orders x customer (two corpus-sized
      sides — the ``nation_year_revenue`` contract), then the TINY
      nation map applied by gather.

    Both paths drop unknown custkeys (INNER-join semantics, matching the
    SQL twins)."""
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    max_ck = _id_shift(sf_dir, "customer", "c_custkey") - 1
    if max_ck + 1 <= _CUSTKEY_BROADCAST_SLOTS:
        lookup_ref = _nation_name_index(sf_dir)

        def tag_nation(batch: pa.Table, ref=None) -> pa.Table:
            # worker-cached broadcast lookup (task stage — fuses)
            names, known = _take_nation_names(batch["o_custkey"].to_numpy(), ref)
            return pa.table(
                {
                    "n_name": names,
                    "total_cents": _cents(batch["o_totalprice"]),
                }
            ).filter(pa.array(known))

        return ds.map_batches(
            tag_nation, fn_kwargs={"ref": lookup_ref}, batch_format="pyarrow"
        )

    # corpus-sized customer: hash-partitioned join, tiny nation by gather
    from gis_scripts_ray.stages.joins import hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = nation["n_nationkey"].to_numpy()
    names = nation["n_name"].to_pylist()
    slot_of_nat = np.full(int(nkeys.max()) + 1, len(names), dtype=np.int32)
    slot_of_nat[nkeys] = np.arange(len(names), dtype=np.int32)
    name_arr = pa.array(names + [None], pa.string())

    def prep_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "total_cents": _cents(batch["o_totalprice"]),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    # size the join to the measured customer count: hash-shuffle
    # aggregators RESERVE CPUs per partition, and an oversized partition
    # count starves/deadlocks small CPU budgets (CLAUDE.md)
    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    npart = int(max(2, min(32, n_cust // 2_000_000 + 2)))
    joined = hash_join(
        ds.map_batches(prep_orders, batch_format="pyarrow"),
        cust,
        on="o_custkey",
        right_on="c_custkey",
        num_partitions=npart,
    )

    def add_name(batch: pa.Table) -> pa.Table:
        nk = np.clip(batch["c_nationkey"].to_numpy(), 0, len(slot_of_nat) - 1)
        return pa.table(
            {
                "n_name": pc.take(name_arr, pa.array(slot_of_nat[nk], pa.int32())),
                "total_cents": batch["total_cents"],
            }
        )

    return joined.map_batches(add_name, batch_format="pyarrow")


def q_orders_nation_rollup(sf_dir: str):
    """Dimension join orders -> customer -> nation with ADAPTIVE delivery
    (broadcast gather under a measured size budget, hash join above it —
    see :func:`_orders_nation_tagged`), then partial pre-agg + combine."""
    return cell_sum_count(
        _orders_nation_tagged(sf_dir), ["n_name"], ["total_cents"]
    )


def _sql_orders_nation_rollup() -> str:
    return (
        "SELECT n_name, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    )


def q_events_hourly(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array(hour, pa.int64()),
                "value_micros": _micros(batch["value"]),
            }
        )

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["event_type", "hour"], ["value_micros"])


def _sql_events_hourly() -> str:
    return (
        f"SELECT event_type, {_sql_floordiv('epoch_us(ts)', 3600000000)} AS hour, "
        "CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type, hour"
    )


_TOA_IRRADIANCE = 1580.0
_TOA_ZENITH_DEG = 35.0


def q_toa_reflectance(sf_dir: str):
    """§2.7 solar math (seagrass_lib.py:125-141, 301): per-event earth-sun
    distance from the timestamp's Julian day, then the reference's TOA
    remote-sensing-reflectance conversion of the value column; exact-int
    rollup per event_type."""
    from gis_scripts_ray.functions.solar import earth_sun_distance_au, toa_reflectance

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy()
        dau = earth_sun_distance_au(us)
        rrs = toa_reflectance(
            batch["value"].to_numpy(), dau, _TOA_IRRADIANCE, _TOA_ZENITH_DEG
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "rrs_milli": pa.array(np.round(rrs * 1000.0).astype(np.int64), pa.int64()),
            }
        )

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["event_type"], ["rrs_milli"])


def _sql_toa_reflectance() -> str:
    return (
        "WITH p AS (SELECT event_type, value, "
        "CAST(EXTRACT(year FROM ts) AS DOUBLE) AS yr0, "
        "CAST(EXTRACT(month FROM ts) AS DOUBLE) AS mon0, "
        "CAST(EXTRACT(day FROM ts) AS DOUBLE) AS d, "
        "CAST(EXTRACT(hour FROM ts) AS DOUBLE) "
        "+ CAST(EXTRACT(minute FROM ts) AS DOUBLE)/60.0 "
        "+ CAST(FLOOR(EXTRACT(second FROM ts)) AS DOUBLE)/3600.0 AS ut FROM events), "
        "q AS (SELECT event_type, value, "
        "CASE WHEN mon0 <= 2 THEN yr0 - 1 ELSE yr0 END AS yr, "
        "CASE WHEN mon0 <= 2 THEN mon0 + 12 ELSE mon0 END AS mon, d, ut FROM p), "
        "r AS (SELECT event_type, value, "
        "TRUNC(365.25*(yr+4716.0)) + TRUNC(30.6001*(mon+1.0)) + d + ut/24.0 "
        "+ (2.0 - TRUNC(yr/100.0) + TRUNC(TRUNC(yr/100.0)/4.0)) - 1524.5 "
        "- 2451545.0 AS dj FROM q), "
        "s AS (SELECT event_type, value, 357.529 + 0.98560028*dj AS g FROM r), "
        "t AS (SELECT event_type, value, 1.00014 - 0.01671*COS(g*(PI()/180.0)) "
        "- 0.00014*COS(2.0*g*(PI()/180.0)) AS dau FROM s) "
        # np.round is half-even — wrap the ROUND (ADVICE r2: latent
        # half-away divergence on an exact .5 tie)
        "SELECT event_type, CAST(SUM(CAST("
        + _sql_round_half_even(
            "((value*(dau*dau)*PI())"
            f"/({_TOA_IRRADIANCE!r}*COS({_TOA_ZENITH_DEG!r}*(PI()/180.0)))/PI())"
            "*10000.0*1000.0"
        )
        + " AS BIGINT)) AS BIGINT) AS sum_rrs_milli, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY event_type"
    )


def q_dos_value(sf_dir: str):
    """A6: median of the lowest 5% of prices (as cents), halved — the
    reference's ``seagrass_lib.py:344-347`` semantics on exact integers.

    The median of the lowest n//20 values is two exact ORDER STATISTICS
    (ranks ~n/40), read off a distributed value HISTOGRAM
    (``stats.value_histogram``: per-block pre-agg + adaptive combine).
    The driver holds only (distinct cents, count) rows — bounded by the
    price domain, never n/20 raw rows — and no global sort runs (the
    previous sort+limit(n/20) degenerated at scale: per-batch partial
    top-k keeps whole blocks once k exceeds the block size)."""
    from gis_scripts_ray.stages.stats import value_histogram

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(batch["l_extendedprice"])})

    values, counts = value_histogram(
        ds.map_batches(prep, batch_format="pyarrow"), "c"
    )
    n = int(counts.sum())
    k = max(n // 20, 1)
    cum = np.cumsum(counts)
    v1 = values[np.searchsorted(cum, (k - 1) // 2 + 1)]  # 0-based rank (k-1)//2
    v2 = values[np.searchsorted(cum, k // 2 + 1)]
    med = float(v1 + v2) / 2.0  # exact median of sorted ints
    return pa.table({"dos_value": pa.array([med / 200.0], pa.float64())})


def _sql_dos_value() -> str:
    return (
        "WITH cents AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c FROM lineitem), "
        "k AS (SELECT GREATEST(COUNT(*)//20, 1) AS k FROM cents), "
        "low AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM cents), "
        "sel AS (SELECT c, rn FROM low, k WHERE rn <= k.k) "
        "SELECT (CAST(a.c AS DOUBLE) + CAST(b.c AS DOUBLE))/2.0/200.0 AS dos_value "
        "FROM sel a, sel b, k "
        "WHERE a.rn = (k.k - 1)//2 + 1 AND b.rn = k.k//2 + 1"
    )


def q_distinct_langs(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    langs = sorted(ds.unique("lang"))
    return pa.table({"lang": pa.array(langs, pa.string())})


def _sql_distinct_langs() -> str:
    return "SELECT DISTINCT lang FROM documents"


def q_top_hosts(sf_dir: str):
    ds = located_documents(sf_dir)

    def add_host(batch: pa.Table) -> pa.Table:
        from gis_scripts_ray.state.geocoder import extract_host

        return pa.table({"host": extract_host(batch["url"].combine_chunks())})

    from gis_scripts_ray.stages.tile_agg import cell_count

    counts = cell_count(
        ds.map_batches(add_host, batch_format="pyarrow"), ["host"], alias="n_docs"
    )
    top = counts.sort(["n_docs", "host"], descending=[True, False]).limit(10)
    return top


def _sql_top_hosts() -> str:
    return (
        _located_cte("d.doc_id, d.hidx")
        + " SELECT printf('site%03d.example.org', CAST(hidx AS INT)) AS host, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM located GROUP BY host "
        "ORDER BY n_docs DESC, host ASC LIMIT 10"
    )


def q_dedup_exact(sf_dir: str):
    """Exact dedup over documents UNION shifted-copy: every text has >= 2
    occurrences; keep the minimum doc_id (D3 'first wins' semantics)."""
    from gis_scripts_ray.stages.dedup import dedup_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    id_shift = _id_shift(sf_dir, "documents", "doc_id")

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(batch["doc_id"], id_shift),
                "text": batch["text"],
            }
        )

    both = ds.union(ds.map_batches(shift, batch_format="pyarrow"))
    stats = dedup_stats(both, "text", "doc_id")
    return stats.select_columns(["keep_id", "n_dups"])


def _sql_dedup_exact() -> str:
    return (
        "SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_dups "
        "FROM (SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + (SELECT MAX(doc_id)+1 FROM documents), text "
        "FROM documents) GROUP BY text"
    )


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate-distinct (``stages/sketch.py``) with a
    DERIVED-INVARIANT oracle: the sketch estimate is not SQL-expressible,
    but (a) the exact distributed distinct count is a REAL engine value
    SQL-checked against ``COUNT(DISTINCT ...)``, and (b) the
    estimate-within-bound flag is implied TRUE by HLL's error bound
    (p=12 → 1.04/√4096 ≈ 1.6% standard error; the flag allows 4σ;
    measured error −1.2% / +1.3% / +0.2% at sf0.001/0.01/0.1). A broken
    register, merge, or estimator path flips the flag and diverges the
    value hash.

    Output: one row (n_exact, est_ok)."""
    from gis_scripts_ray.stages.sketch import (
        approx_distinct_column,
        exact_distinct_column,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    est, _ = approx_distinct_column(ds, "l_extendedprice")
    n_exact = exact_distinct_column(ds, "l_extendedprice")
    est_ok = abs(est - n_exact) <= max(0.065 * n_exact, 16.0)
    return pa.table(
        {
            "n_exact": pa.array([n_exact], pa.int64()),
            "est_ok": pa.array([bool(est_ok)], pa.bool_()),
        }
    )


def _sql_approx_distinct() -> str:
    return (
        "SELECT CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS n_exact, "
        "TRUE AS est_ok FROM lineitem"
    )


def q_heavy_hitters(sf_dir: str):
    """Exact phi-heavy hitters via the two-pass Misra-Gries
    sketch-then-verify (``stages/sketch.py``): pass 1 reduces each block
    to <= 256 counters and tree-folds them (mergeable-summaries guarantee:
    no key above the threshold can be missed), pass 2 recounts ONLY the
    candidate keys exactly, so the output is exact and a plain SQL
    GROUP BY/HAVING twin checks it value-for-value. The key plants
    deterministic skew over lineitem (10 hot keys at ~2% each riding a
    ~2000-key partkey tail — the regime where a naive GROUP BY shuffles
    every distinct key but the sketch shuffles 256):
    ``key = -l_quantity if l_quantity <= 10 else l_partkey``.

    Output: (key, n_exact) for keys with frequency > 1% of rows."""
    from gis_scripts_ray.stages.sketch import heavy_hitters

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def derive(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy()
        pk = batch["l_partkey"].to_numpy().astype(np.int64)
        key = np.where(q <= 10.0, -np.round(q).astype(np.int64), pk)
        return pa.table({"key": pa.array(key, pa.int64())})

    keyed = ds.map_batches(derive, batch_format="pyarrow")
    return heavy_hitters(keyed, "key", phi=0.01, capacity=256).sort("key")


def _sql_heavy_hitters() -> str:
    return (
        "WITH k AS (SELECT CASE WHEN l_quantity <= 10 "
        "THEN -CAST(l_quantity AS BIGINT) ELSE l_partkey END AS key "
        "FROM lineitem) "
        "SELECT key, CAST(COUNT(*) AS BIGINT) AS n_exact FROM k "
        "GROUP BY key HAVING COUNT(*) > 0.01 * (SELECT COUNT(*) FROM k) "
        "ORDER BY key"
    )


def q_bloom_join_revenue(sf_dir: str):
    """Runtime-filtered large x large join (``stages/joins.py``
    ``bloom_semi_join``): a Bloom filter of the selective right side's
    keys (URGENT orders, ~20%) is OR-folded from per-block partials,
    broadcast once, and prunes lineitem INSIDE the fused read stage —
    only ~matching rows (+ ~1-2% false positives, removed by the exact
    join) enter the all-to-all shuffle. False negatives are impossible,
    so the result equals the plain filtered join, which is exactly what
    the SQL twin computes. Revenue in exact integer micro-cents per
    order status."""
    from gis_scripts_ray.stages.joins import bloom_semi_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"]).to_numpy()
        disc_pct = _round_half_away(batch["l_discount"].to_numpy() * 100.0).astype(np.int64)
        rev = price_c * (100 - disc_pct)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev_microcents": pa.array(rev, pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")).drop_columns(
            ["o_orderpriority"]
        ),
        batch_format="pyarrow",
    )
    joined = bloom_semi_join(
        li.map_batches(prep_li, batch_format="pyarrow"),
        urgent,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    )
    return cell_sum_count(joined, ["o_orderstatus"], ["rev_microcents"])


def _sql_bloom_join_revenue() -> str:
    return (
        "SELECT o_orderstatus, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_rev_microcents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus"
    )


# epoch microseconds of 2024-01-01T00:00:00 — the event window's start,
# into which order dates (1995-2001, disjoint from events) are remapped
_ASOF_BASE_US = 1_704_067_200_000_000


def q_events_asof_orders(sf_dir: str):
    """Distributed backward AS-OF join (``stages/asof.py``): each event is
    matched to the latest order at-or-before its timestamp within its key
    group. Each order is deterministically remapped into the 30-day event
    window at ``(o_orderkey * 1000003) % window_us`` — the multiplier is
    coprime to the window size, so ts2 is INJECTIVE in orderkey for any
    orderkey < 2.592e12 and (key, ts2) uniqueness (the operator's tie
    contract) holds at every scale factor (a ``% 1e6`` fold collided past
    1e6 orderkeys — round-3 advice); key = o_custkey % 150 aligns the
    custkey domain with events.user_id. Engine: range-bucketed shuffle +
    per-key carry seeds + per-bucket sorted merge — oracle: DuckDB
    ``ASOF JOIN``, row-exact.

    Output: (event_id, o_orderkey) for every matched event."""
    from gis_scripts_ray.stages.asof import asof_join_backward, timestamp_to_us

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
    )

    def prep_e(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": timestamp_to_us(batch["ts"]),
            }
        )

    def prep_o(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy()
        # injectivity precondition of the coprime fold (round-4 verdict:
        # assert the uniqueness contract at fixture-build time): the fold
        # is bijective mod the window only while orderkeys stay below it
        if len(ok) and ok.max() >= 2_592_000_000_000:
            raise ValueError(
                "asof fixture: o_orderkey exceeds the 30-day fold window; "
                "(key, ts2) uniqueness no longer guaranteed"
            )
        ts2 = _ASOF_BASE_US + (ok * 1_000_003) % 2_592_000_000_000
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "key": pa.array(batch["o_custkey"].to_numpy() % 150, pa.int64()),
                "ts2_us": pa.array(ts2, pa.int64()),
            }
        )

    joined = asof_join_backward(
        events.map_batches(prep_e, batch_format="pyarrow"),
        orders.map_batches(prep_o, batch_format="pyarrow"),
        left_ts="ts_us",
        right_ts="ts2_us",
        left_by="user_id",
        right_by="key",
        carry_cols=["o_orderkey"],
        n_buckets=48,
    )
    return joined.select_columns(["event_id", "o_orderkey"]).sort("event_id")


_IVJ_LO_US = -86_400_000_000  # window: [event - 1 day, event + 1 day]
_IVJ_HI_US = 86_400_000_000


def q_events_interval_orders(sf_dir: str):
    """Distributed time-interval (band) join (``stages/intervaljoin.py``):
    each event matched to ALL orders of its key group whose remapped
    timestamp falls within +-1 day of the event — the one-to-many range
    join the as-of join's nearest-predecessor semantics can't express.
    Orders reuse the as-of fixture's collision-free coprime remap into
    the 30-day event window (key = o_custkey % 150 aligns with
    events.user_id). Engine: range-bucketed shuffle with <=2x right-row
    replication + per-bucket packed searchsorted join; the pair set then
    reduces per event through the adaptive combine (never a driver
    materialization). Oracle: a plain SQL range join + GROUP BY.

    Output: (event_id, n_orders, sum_okey, min_okey, max_okey) for every
    event with >=1 order in its window — count + sum + extrema pin the
    exact pair set in the integer domain."""
    from gis_scripts_ray.stages.asof import timestamp_to_us
    from gis_scripts_ray.stages.intervaljoin import interval_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def prep_e(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": timestamp_to_us(batch["ts"]),
            }
        )

    def prep_o(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy()
        if len(ok) and ok.max() >= 2_592_000_000_000:
            raise ValueError(
                "interval fixture: o_orderkey exceeds the 30-day fold "
                "window; the coprime remap is no longer injective"
            )
        ts2 = _ASOF_BASE_US + (ok * 1_000_003) % 2_592_000_000_000
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "key": pa.array(batch["o_custkey"].to_numpy() % 150, pa.int64()),
                "ts2_us": pa.array(ts2, pa.int64()),
            }
        )

    pairs = interval_join(
        events.map_batches(prep_e, batch_format="pyarrow"),
        orders.map_batches(prep_o, batch_format="pyarrow"),
        left_by="user_id",
        right_by="key",
        left_ts="ts_us",
        right_ts="ts2_us",
        lo=_IVJ_LO_US,
        hi=_IVJ_HI_US,
        left_cols=["event_id"],
        right_cols=["o_orderkey"],
        n_buckets=48,
    )

    def partial(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy()
        t = pa.table(
            {
                "event_id": batch["event_id"].combine_chunks().cast(pa.int64()),
                "n_orders": pa.array(np.ones(len(ok), np.int64)),
                "sum_okey": pa.array(ok, pa.int64()),
                "min_okey": pa.array(ok, pa.int64()),
                "max_okey": pa.array(ok, pa.int64()),
            }
        )
        return (
            t.group_by(["event_id"])
            .aggregate(
                [
                    ("n_orders", "sum"),
                    ("sum_okey", "sum"),
                    ("min_okey", "min"),
                    ("max_okey", "max"),
                ]
            )
            .rename_columns(
                ["event_id", "n_orders", "sum_okey", "min_okey", "max_okey"]
            )
        )

    return coalesce_shuffle_agg(
        pairs.map_batches(partial, batch_format="pyarrow"),
        ["event_id"],
        {
            "n_orders": "sum",
            "sum_okey": "sum",
            "min_okey": "min",
            "max_okey": "max",
        },
    )


def _sql_events_interval_orders() -> str:
    return (
        "WITH o2 AS (SELECT o_orderkey, o_custkey % 150 AS key, "
        "TIMESTAMP '2024-01-01 00:00:00' + to_microseconds("
        "(o_orderkey * 1000003) % 2592000000000) AS ts2 FROM orders) "
        "SELECT e.event_id, COUNT(*) AS n_orders, "
        "CAST(SUM(o2.o_orderkey) AS BIGINT) AS sum_okey, "
        "MIN(o2.o_orderkey) AS min_okey, "
        "MAX(o2.o_orderkey) AS max_okey "
        "FROM events e JOIN o2 ON e.user_id = o2.key "
        "AND o2.ts2 >= e.ts - INTERVAL 1 DAY "
        "AND o2.ts2 <= e.ts + INTERVAL 1 DAY "
        "GROUP BY e.event_id"
    )


# price-tier dimension for the broadcast range lookup: inclusive cent
# bounds, deliberately leaving the gap [15_000_000, 19_999_999] so the
# inner drop-in-gap semantics are exercised by real rows
_PRICE_TIERS = [
    ("bargain", 0, 4_999_999),
    ("mid", 5_000_000, 14_999_999),
    ("high", 20_000_000, 34_999_999),
    ("lux", 35_000_000, 999_999_999_999),
]


def q_price_tier_rollup(sf_dir: str):
    """Broadcast range-table lookup (``stages/rangelookup.py``): each
    order's exact cents mapped to its price tier via one searchsorted
    against the broadcast sorted tier table (value BETWEEN lo AND hi —
    the IP-geo / tier-table join a hash join cannot express), orders in
    the deliberate tier gap dropped, then the per-tier rollup through
    the adaptive combine. Money follows the engine-wide half-AWAY cents
    rule (``_cents`` ↔ ``ROUND(double*100)``). The twin joins the same
    VALUES table on BETWEEN.

    Output: (tier, n_orders, sum_cents), one row per non-empty tier."""
    from gis_scripts_ray.stages.rangelookup import range_lookup
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ranges = pa.table(
        {
            "tier": pa.array([t for t, _, _ in _PRICE_TIERS], pa.string()),
            "lo": pa.array([lo for _, lo, _ in _PRICE_TIERS], pa.int64()),
            "hi": pa.array([hi for _, _, hi in _PRICE_TIERS], pa.int64()),
        }
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(batch["o_totalprice"])})

    tiered = range_lookup(
        orders.map_batches(prep, batch_format="pyarrow"), "cents", ranges
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "tier": batch["tier"],
                "n_orders": pa.array(np.ones(batch.num_rows, np.int64)),
                "sum_cents": batch["cents"],
            }
        )
        return (
            t.group_by(["tier"])
            .aggregate([("n_orders", "sum"), ("sum_cents", "sum")])
            .rename_columns(["tier", "n_orders", "sum_cents"])
        )

    return coalesce_shuffle_agg(
        tiered.map_batches(partial, batch_format="pyarrow"),
        ["tier"],
        {"n_orders": "sum", "sum_cents": "sum"},
    ).sort("tier")


def _sql_price_tier_rollup() -> str:
    rows = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _PRICE_TIERS)
    return (
        f"WITH t(tier, lo, hi) AS (VALUES {rows}), "
        "o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents "
        "FROM orders) "
        "SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(cents) AS BIGINT) AS sum_cents "
        "FROM o JOIN t ON o.cents BETWEEN t.lo AND t.hi "
        "GROUP BY tier ORDER BY tier"
    )


_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_depths(sf_dir: str):
    """Ordered conversion funnel (``stages/funnel.py``): per user, the
    earliest-next resolution of view → click → purchase (each step
    strictly after the previous step's resolved time; a missing step
    cascades). ONE key-bucket shuffle, per-bucket vectorized masked
    segment minima — no per-user rows at the driver. The twin chains
    the same strict constraints through three correlated MIN joins, so
    any tie-handling or cascade defect hash-mismatches.

    Output: (user_id, depth, step1_us, step2_us, step3_us), one row per
    distinct user, unreached steps -1."""
    from gis_scripts_ray.stages.asof import timestamp_to_us
    from gis_scripts_ray.stages.funnel import funnel_steps

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": timestamp_to_us(batch["ts"]),
                "event_type": batch["event_type"],
            }
        )

    return funnel_steps(
        events.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        "us",
        "event_type",
        _FUNNEL_STEPS,
        num_buckets=48,
    )


def q_event_transitions(sf_dir: str):
    """Markov transition mining (``funnel.transition_counts``): global
    counts of consecutive event-type pairs within each user's timeline,
    ordered by the total (ts, event_id) order so timestamp collisions
    cannot make the sequence ambiguous. One key-bucket shuffle, per-
    bucket lexsort + Arrow pair counting, adaptive combine finish. The
    twin is a LEAD window over the same total order.

    Output: (from_type, to_type, n), sorted."""
    from gis_scripts_ray.stages.asof import timestamp_to_us
    from gis_scripts_ray.stages.funnel import transition_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": timestamp_to_us(batch["ts"]),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    return transition_counts(
        events.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        "us",
        "event_id",
        "event_type",
        num_buckets=48,
    )


def _sql_event_transitions() -> str:
    return """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id, event_type
  FROM events),
s AS (SELECT event_type,
        LEAD(event_type) OVER (
          PARTITION BY user_id ORDER BY us, event_id) AS nxt
      FROM e)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL
GROUP BY from_type, nxt ORDER BY from_type, to_type
"""


_SESS_GAP_US = 21_600_000_000  # 6 hours
_SESS_PATHS_K = 20


def q_session_paths_topk(sf_dir: str):
    """Top-k session paths (``funnel.session_paths_topk``): events
    sessionize per user on a 6-hour inactivity gap, each session's
    event types join into a '>'-separated path in (ts, event_id) total
    order, and the 20 most frequent paths rank (n DESC, path ASC). One
    key shuffle, vectorized per-bucket sessionize + ListArray path
    build, adaptive combine, top-k fold. The twin derives session ids
    with a LAG/SUM window cascade and builds the same ordered
    string_agg, so a boundary, ordering or tie defect hash-mismatches.

    Output: (path, n), the top 20."""
    from gis_scripts_ray.stages.asof import timestamp_to_us
    from gis_scripts_ray.stages.funnel import session_paths_topk

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": timestamp_to_us(batch["ts"]),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    return session_paths_topk(
        events.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        "us",
        "event_id",
        "event_type",
        gap_us=_SESS_GAP_US,
        k=_SESS_PATHS_K,
        num_buckets=48,
    )


def _sql_session_paths_topk() -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id, event_type
  FROM events),
d AS (SELECT *, CASE WHEN us - LAG(us) OVER w > {_SESS_GAP_US}
                     OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM d),
p AS (SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY us, event_id) AS path
      FROM s GROUP BY user_id, sid),
c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY path)
SELECT path, n FROM c ORDER BY n DESC, path ASC LIMIT {_SESS_PATHS_K}
"""


def _sql_funnel_depths() -> str:
    s1, s2, s3 = _FUNNEL_STEPS
    return f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_type
  FROM events),
u AS (SELECT DISTINCT user_id FROM e),
f1 AS (SELECT user_id, MIN(us) AS t1 FROM e
       WHERE event_type = '{s1}' GROUP BY user_id),
f2 AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e
       JOIN f1 ON e.user_id = f1.user_id AND e.us > f1.t1
       WHERE e.event_type = '{s2}' GROUP BY e.user_id),
f3 AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e
       JOIN f2 ON e.user_id = f2.user_id AND e.us > f2.t2
       WHERE e.event_type = '{s3}' GROUP BY e.user_id)
SELECT u.user_id,
  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth,
  COALESCE(t1, -1) AS step1_us,
  COALESCE(t2, -1) AS step2_us,
  COALESCE(t3, -1) AS step3_us
FROM u
LEFT JOIN f1 ON u.user_id = f1.user_id
LEFT JOIN f2 ON u.user_id = f2.user_id
LEFT JOIN f3 ON u.user_id = f3.user_id
"""


def q_topk_docs_per_host(sf_dir: str):
    """Distributed per-group top-k (``stages/topk.py``): the 3 longest
    documents (byte length, doc_id ASC tie-break — the repo's
    tie-complete-partials rule) per host bucket. The host index is the
    geocoder's doc_id hash derivation (``_HIDX_SQL``), computed
    vectorized; a global sort would shuffle every row, the partial-top-k
    path shuffles <= k rows per (group, block).

    Output: (hidx, doc_id, text_len), rank <= 3 per host."""
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        from gis_scripts_ray.sources.webpages import _host_index_for_doc

        hidx = _host_index_for_doc(batch["doc_id"].to_numpy())
        return pa.table(
            {
                "hidx": pa.array(hidx, pa.int64()),
                "doc_id": batch["doc_id"],
                "text_len": pc.cast(pc.binary_length(batch["text"]), pa.int64()),
            }
        )

    out = topk_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_col="hidx",
        value_col="text_len",
        id_col="doc_id",
        k=3,
    )
    return out.sort(["hidx", "doc_id"])


def _sql_topk_docs_per_host() -> str:
    return (
        f"WITH hx AS (SELECT doc_id, {_HIDX_SQL} AS hidx, "
        "octet_length(encode(text)) AS text_len FROM documents), "
        "r AS (SELECT hidx, doc_id, text_len, ROW_NUMBER() OVER ("
        "PARTITION BY hidx ORDER BY text_len DESC, doc_id ASC) AS rn FROM hx) "
        "SELECT hidx, doc_id, CAST(text_len AS BIGINT) AS text_len "
        "FROM r WHERE rn <= 3 ORDER BY hidx, doc_id"
    )


def q_tfidf_scores(sf_dir: str):
    """Corpus-level TF-IDF-style relevance mass
    (``stages/textstages.tfidf_integer_scores``): two streaming passes —
    distributed per-token document frequencies (per-block vocab partials
    + adaptive combine), then a broadcast weight map applied per batch.
    Integer-exact idf (``N // df``) keeps the distributed per-doc sum
    order-independent, so the SQL twin matches bit-for-bit (a float log
    idf would hash-diverge on FP addition order).

    Output: (doc_id, score) for every document."""
    from gis_scripts_ray.stages.textstages import tfidf_integer_scores

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_integer_scores(ds).sort("doc_id")


def _sql_tfidf_scores() -> str:
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok), "
        "df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents) "
        "SELECT tf.doc_id, "
        "CAST(SUM(tf.tf * ((SELECT n FROM n) // df.df)) AS BIGINT) AS score "
        "FROM tf JOIN df ON tf.tok = df.tok GROUP BY tf.doc_id ORDER BY tf.doc_id"
    )


def q_grouped_median_qty(sf_dir: str):
    """Exact per-group lower median via value compaction
    (``stages/stats.grouped_median``): the shuffle carries each block's
    distinct (group, value) pairs — bounded by |groups| x |value domain|
    (quantity is 1..50) — never the rows; the finish is an adaptive
    single-block segment scan / hash-shuffle weighted median. Integer
    domain end to end (lower median = value at rank ceil(n/2), no
    interpolation), so the distributed result is order-independent.

    Output: (l_returnflag, l_linestatus, median_qty, n)."""
    from gis_scripts_ray.stages.stats import grouped_median

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
            }
        )

    out = grouped_median(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        "qty",
        out_col="median_qty",
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def _sql_grouped_median_qty() -> str:
    # lower median spelled as an explicit window-rank formula (value at
    # ascending rank ceil(n/2)) so the semantics are pinned rather than
    # inherited from quantile_disc's definition
    return (
        "WITH s AS (SELECT l_returnflag, l_linestatus, "
        "CAST(ROUND(l_quantity) AS BIGINT) AS q FROM lineitem), "
        "r AS (SELECT l_returnflag, l_linestatus, q, "
        "ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY q) AS rn, "
        "COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n FROM s) "
        "SELECT l_returnflag, l_linestatus, "
        "MAX(CASE WHEN rn = (n + 1) // 2 THEN q END) AS median_qty, "
        "CAST(MAX(n) AS BIGINT) AS n FROM r "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    )


def q_dominant_lang_per_source(sf_dir: str):
    """Per-group mode (most frequent value): dominant language per
    source. Two scale-safe layers — per-(source, lang) counts via
    in-batch pre-agg + adaptive combine, then distributed per-group
    top-1 on the counts (``stages/topk.py``; ties broken (n DESC, lang
    ASC) inside partials). The all-to-all carries the compacted count
    table, never a document row.

    Output: (source, lang, n) — one row per source."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["source", "lang"]).aggregate([("lang", "count")])
        return out.rename_columns(["source", "lang", "n"])

    counts = coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["source", "lang"], ["n"]
    )
    mode = topk_per_group(counts, group_col="source", value_col="n", id_col="lang", k=1)
    return mode.select_columns(["source", "lang", "n"]).sort("source")


def _sql_dominant_lang_per_source() -> str:
    return (
        "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source, lang), "
        "r AS (SELECT source, lang, n, ROW_NUMBER() OVER "
        "(PARTITION BY source ORDER BY n DESC, lang ASC) AS rn FROM c) "
        "SELECT source, lang, n FROM r WHERE rn = 1 ORDER BY source"
    )


def q_customers_no_urgent(sf_dir: str):
    """Distributed anti-join (``stages/joins.hash_anti_join``): customers
    with no urgent-priority order — the exclusion-list subtraction every
    pipeline needs (docs already processed, opted-out users). The right
    side reduces to its distinct key set (per-block unique + adaptive
    combine) and the finish is adaptive: broadcast inverted ``is_in``
    when the key set is driver-sized, native ``left_anti`` hash join
    when it is not.

    Output: (c_custkey, c_nationkey) rows with no match."""
    from gis_scripts_ray.stages.joins import hash_anti_join

    left = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    right = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def urgent(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["o_orderpriority"], "1-URGENT")
        ).select(["o_custkey"])

    out = hash_anti_join(
        left,
        right.map_batches(urgent, batch_format="pyarrow"),
        on="c_custkey",
        right_on="o_custkey",
    )
    return out.sort("c_custkey")


def _sql_customers_no_urgent() -> str:
    return (
        "SELECT c_custkey, c_nationkey FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') "
        "ORDER BY c_custkey"
    )


def q_price_band_revenue(sf_dir: str):
    """Range join (``stages/joins.range_join_lookup``): lineitem prices
    against a literal table of non-overlapping price bands ``[lo, hi)``
    cents — broadcast once, vectorized searchsorted per batch, no shuffle
    of the fact stream. The top of the domain is deliberately uncovered so
    inner-drop semantics are exercised. Revenue aggregates in exact cents
    via the standard partial + adaptive combine.

    Output: (band, lo, n_items, revenue_cents) per band, ordered by lo."""
    from gis_scripts_ray.stages.joins import range_join_lookup
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    bands = pa.table(
        {
            "band": pa.array([f"b{i}" for i in range(6)]),
            "lo": pa.array(
                [0, 1_000_000, 2_500_000, 4_000_000, 6_000_000, 8_500_000],
                pa.int64(),
            ),
            "hi": pa.array(
                [1_000_000, 2_500_000, 4_000_000, 6_000_000, 8_500_000, 10_000_000],
                pa.int64(),
            ),
        }
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(batch["l_extendedprice"])})

    joined = range_join_lookup(
        ds.map_batches(prep, batch_format="pyarrow"), bands, "cents"
    )
    out = cell_sum_count(joined, ["band", "lo"], ["cents"])

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band": batch["band"],
                "lo": batch["lo"],
                "n_items": batch["n"],
                "revenue_cents": batch["sum_cents"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("lo")


def _sql_price_band_revenue() -> str:
    return (
        "WITH bands(band, lo, hi) AS (VALUES "
        "('b0', 0, 1000000), ('b1', 1000000, 2500000), "
        "('b2', 2500000, 4000000), ('b3', 4000000, 6000000), "
        "('b4', 6000000, 8500000), ('b5', 8500000, 10000000)), "
        "c AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents "
        "FROM lineitem) "
        "SELECT b.band, CAST(b.lo AS BIGINT) AS lo, "
        "CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(c.cents) AS BIGINT) AS revenue_cents "
        "FROM c JOIN bands b ON c.cents >= b.lo AND c.cents < b.hi "
        "GROUP BY b.band, b.lo ORDER BY lo"
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact per-group COUNT(DISTINCT): distinct users per event type
    (``stages/stats.grouped_count_distinct``) — two compaction levels, the
    all-to-all bounded by the distinct (type, user) pair count, never the
    event count. The exact companion to the HLL sketch query
    (``approx_distinct``).

    Output: (event_type, n_distinct) ordered by event_type."""
    from gis_scripts_ray.stages.stats import grouped_count_distinct

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    out = grouped_count_distinct(ds, ["event_type"], "user_id")
    return out.sort("event_type")


def _sql_distinct_users_per_type() -> str:
    return (
        "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct "
        "FROM events GROUP BY event_type ORDER BY event_type"
    )


def q_running_order_total(sf_dir: str):
    """Per-key cumulative window (``stages/windows.grouped_running_sum``):
    each customer's running order total in exact cents, ordered by
    (o_orderdate, o_orderkey). Prefix sums are per-key-sequential, so the
    key's history lands on one ``map_groups`` task — bounded per customer;
    the output keeps the int64 domain end to end (timestamps never
    round-trip through pandas ns).

    Output: one row per order (o_custkey, o_orderkey, cents, run_cents)."""
    from gis_scripts_ray.stages.windows import grouped_running_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "ts_us": batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                "cents": _cents(batch["o_totalprice"]),
            }
        )

    out = grouped_running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="o_custkey",
        ts_col="ts_us",
        id_col="o_orderkey",
        value_col="cents",
        out_col="run_cents",
    )
    return out.sort(["o_custkey", "o_orderkey"])


def _sql_running_order_total() -> str:
    return (
        "SELECT o_custkey, o_orderkey, "
        "CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents "
        "FROM orders ORDER BY o_custkey, o_orderkey"
    )


def q_price_p90_by_flag(sf_dir: str):
    """Exact discrete p90 per group (``stages/stats.grouped_quantile_disc``
    at q = 9/10): the rank is ``ceil(9n/10)`` computed as
    ``(9n + 9) // 10`` — an integer fraction end to end, twinned by the
    same window-rank formula in SQL. The shuffle carries the (flag, cents)
    value compaction, never rows.

    Output: (l_returnflag, p90_cents, n)."""
    from gis_scripts_ray.stages.stats import grouped_quantile_disc

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "cents": _cents(batch["l_extendedprice"]),
            }
        )

    out = grouped_quantile_disc(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag"],
        "cents",
        9,
        10,
        out_col="p90_cents",
    )
    return out.sort("l_returnflag")


def _sql_price_p90_by_flag() -> str:
    return (
        "WITH s AS (SELECT l_returnflag, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c FROM lineitem), "
        "r AS (SELECT l_returnflag, c, "
        "ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn, "
        "COUNT(*) OVER (PARTITION BY l_returnflag) AS n FROM s) "
        "SELECT l_returnflag, "
        "MAX(CASE WHEN rn = (9*n + 9) // 10 THEN c END) AS p90_cents, "
        "CAST(MAX(n) AS BIGINT) AS n FROM r "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )


def q_user_gap_stats(sf_dir: str):
    """Per-key LAG window reduced to exact gap statistics
    (``stages/windows.grouped_gap_stats``): each user's events ordered by
    (ts, event_id), consecutive int64-us differences, one exact row per
    user — the inter-arrival profile a sessionization pipeline tunes its
    gap threshold from. Per-key-sequential (bounded per-entity history).

    Output: (user_id, n_gaps, sum_gap_us, max_gap_us)."""
    from gis_scripts_ray.stages.windows import grouped_gap_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
            }
        )

    out = grouped_gap_stats(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", "us", "event_id"
    )
    return out.sort("user_id")


def _sql_user_gap_stats() -> str:
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events), "
        "g AS (SELECT user_id, us - LAG(us) OVER "
        "(PARTITION BY user_id ORDER BY us, event_id) AS gap FROM e) "
        "SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps, "
        "CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_us, "
        "CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us "
        "FROM g GROUP BY user_id ORDER BY user_id"
    )


def q_qty_discount_corr(sf_dir: str):
    """Per-group Pearson correlation from exact integer moments: quantity
    vs discount micros per return flag. The distributed part ships only
    the five product sums (q, d, qd, q2, d2 — all exact int64, order
    independent); the correlation itself is ONE float expression of those
    exact inputs, evaluated in the same operation order as the SQL twin
    (both cast to float64 first, so the IEEE results are bit-identical).

    Output: (l_returnflag, n, sum_q, sum_d, sum_qd, sum_q2, sum_d2,
    corr)."""
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch["l_quantity"]), pa.int64()).to_numpy()
        d = _micros(batch["l_discount"]).to_numpy()
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "q": pa.array(q, pa.int64()),
                "d": pa.array(d, pa.int64()),
                "qd": pa.array(q * d, pa.int64()),
                "q2": pa.array(q * q, pa.int64()),
                "d2": pa.array(d * d, pa.int64()),
            }
        )

    out = cell_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag"],
        ["q", "d", "qd", "q2", "d2"],
    )

    def fin(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy().astype(np.float64)
        sq = batch["sum_q"].to_numpy().astype(np.float64)
        sd = batch["sum_d"].to_numpy().astype(np.float64)
        sqd = batch["sum_qd"].to_numpy().astype(np.float64)
        sq2 = batch["sum_q2"].to_numpy().astype(np.float64)
        sd2 = batch["sum_d2"].to_numpy().astype(np.float64)
        corr = (n * sqd - sq * sd) / np.sqrt(
            (n * sq2 - sq * sq) * (n * sd2 - sd * sd)
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n": batch["n"],
                "sum_q": batch["sum_q"],
                "sum_d": batch["sum_d"],
                "sum_qd": batch["sum_qd"],
                "sum_q2": batch["sum_q2"],
                "sum_d2": batch["sum_d2"],
                "corr": pa.array(corr, pa.float64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("l_returnflag")


def _sql_qty_discount_corr() -> str:
    return (
        "WITH s AS (SELECT l_returnflag, "
        "CAST(ROUND(l_quantity) AS BIGINT) AS q, "
        "CAST(ROUND(l_discount*1000000) AS BIGINT) AS d FROM lineitem), "
        "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(q) AS BIGINT) AS sum_q, CAST(SUM(d) AS BIGINT) AS sum_d, "
        "CAST(SUM(q*d) AS BIGINT) AS sum_qd, "
        "CAST(SUM(q*q) AS BIGINT) AS sum_q2, "
        "CAST(SUM(d*d) AS BIGINT) AS sum_d2 "
        "FROM s GROUP BY l_returnflag) "
        "SELECT l_returnflag, n, sum_q, sum_d, sum_qd, sum_q2, sum_d2, "
        "(CAST(n AS DOUBLE)*CAST(sum_qd AS DOUBLE) - "
        "CAST(sum_q AS DOUBLE)*CAST(sum_d AS DOUBLE)) / "
        "SQRT((CAST(n AS DOUBLE)*CAST(sum_q2 AS DOUBLE) - "
        "CAST(sum_q AS DOUBLE)*CAST(sum_q AS DOUBLE)) * "
        "(CAST(n AS DOUBLE)*CAST(sum_d2 AS DOUBLE) - "
        "CAST(sum_d AS DOUBLE)*CAST(sum_d AS DOUBLE))) AS corr "
        "FROM m ORDER BY l_returnflag"
    )


def q_priority_status_pivot(sf_dir: str):
    """Pivot / wide aggregate: order counts per priority spread into one
    column per order status (O/F/P) — one-hot int columns in the fused
    prep, then the standard partial + adaptive combine; the shuffle
    carries one compact row per (priority) per block, and the pivot never
    re-shapes rows after the aggregate.

    Output: (o_orderpriority, n_open, n_finished, n_pending, n_total)."""
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        st = batch["o_orderstatus"]
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "is_o": pc.cast(pc.equal(st, "O"), pa.int64()),
                "is_f": pc.cast(pc.equal(st, "F"), pa.int64()),
                "is_p": pc.cast(pc.equal(st, "P"), pa.int64()),
            }
        )

    out = cell_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"],
        ["is_o", "is_f", "is_p"],
    )

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "n_open": batch["sum_is_o"],
                "n_finished": batch["sum_is_f"],
                "n_pending": batch["sum_is_p"],
                "n_total": batch["n"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("o_orderpriority")


def _sql_priority_status_pivot() -> str:
    return (
        "SELECT o_orderpriority, "
        "CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open, "
        "CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished, "
        "CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending, "
        "CAST(COUNT(*) AS BIGINT) AS n_total "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )


def q_nation_year_revenue(sf_dir: str):
    """TPC-H-shaped multi-join pipeline: lineitem x orders (large x large
    hash join) -> EARLY pre-aggregation to (custkey, year) partials (the
    compaction is bounded by |customers| x |years|, so the second join
    moves compacted rows, never lineitems) -> x customer (shuffle hash
    join on custkey — customer is corpus-sized at scale, NOT broadcast,
    unlike ``orders_nation_rollup``'s deliberate broadcast contrast) ->
    nation names via a 25-row broadcast map -> final re-aggregate. Exact
    integer micro-cents end to end.

    Output: (n_name, year, sum_rev_microcents, n) — n = lineitem count."""
    import pyarrow.parquet as pq

    import ray as _ray

    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import cell_sum_count, coalesce_shuffle_sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"]).to_numpy()
        disc_pct = _round_half_away(batch["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev_microcents": pa.array(price_c * (100 - disc_pct), pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def prep_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            }
        )

    joined = hash_join(
        li.map_batches(prep_li, batch_format="pyarrow"),
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    )
    # aggregate EARLY: lineitem-grain rows collapse to (custkey, year)
    # before the customer join
    per_cust = cell_sum_count(
        joined, ["o_custkey", "year"], ["rev_microcents"]
    ).materialize()
    per_cust = per_cust.repartition(max(1, -(-per_cust.count() // 4_000_000)))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    with_nat = hash_join(
        per_cust, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkeys = nation["n_nationkey"].to_numpy()
    slot_of_nat = np.full(int(nkeys.max()) + 1, len(nkeys), dtype=np.int32)
    slot_of_nat[nkeys] = np.arange(len(nkeys), dtype=np.int32)
    name_arr = pa.array(nation["n_name"].to_pylist() + [None], pa.string())
    nmap_ref = _ray.put((slot_of_nat, name_arr))

    def tag_and_partial(batch: pa.Table, ref=None) -> pa.Table:
        # vectorized nation tag: numpy gather + Arrow take, no per-row loop
        slot_of, names_pa = _worker_broadcast(ref)
        nk = batch["c_nationkey"].to_numpy()
        slots = slot_of[np.clip(nk, 0, len(slot_of) - 1)]
        t = pa.table(
            {
                "n_name": pc.take(names_pa, pa.array(slots, pa.int32())),
                "year": batch["year"],
                "sum_rev_microcents": batch["sum_rev_microcents"],
                "n": batch["n"],
            }
        )
        out = t.group_by(["n_name", "year"]).aggregate(
            [("sum_rev_microcents", "sum"), ("n", "sum")]
        )
        return out.rename_columns(["n_name", "year", "sum_rev_microcents", "n"])

    partials = with_nat.map_batches(
        tag_and_partial, fn_kwargs={"ref": nmap_ref}, batch_format="pyarrow"
    )
    out = coalesce_shuffle_sum(partials, ["n_name", "year"], ["sum_rev_microcents", "n"])
    return out.sort(["n_name", "year"])


def _sql_nation_year_revenue() -> str:
    return (
        "SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS year, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_rev_microcents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name, year ORDER BY n_name, year"
    )


def q_rollup_order_counts(sf_dir: str):
    """ROLLUP / grouping-sets aggregate from ONE pass: order counts and
    cents at (priority, status), (priority), and grand-total levels — the
    finest-level compaction is computed once (partial pre-agg + adaptive
    combine) and the coarser levels derive from the COMPACTED rows at the
    driver-free ``map_batches`` level, never from a second scan. Level
    columns use the SQL ROLLUP convention (NULL = rolled up), encoded as
    the sentinel string 'ALL' so the schema stays non-null string.

    Output: (o_orderpriority, o_orderstatus, n, sum_cents) for all three
    levels, ordered."""
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderstatus": batch["o_orderstatus"],
                "cents": _cents(batch["o_totalprice"]),
            }
        )

    fine = cell_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        ["cents"],
    ).materialize()

    def widen(batch: pa.Table) -> pa.Table:
        # each compacted fine row contributes to all three rollup levels;
        # the combine re-sums per level key (associative)
        pri = batch["o_orderpriority"].to_pylist()
        st = batch["o_orderstatus"].to_pylist()
        n = batch["n"].to_numpy()
        c = batch["sum_cents"].to_numpy()
        k = len(pri)
        return pa.table(
            {
                "o_orderpriority": pa.array(pri + pri + ["ALL"] * k, pa.string()),
                "o_orderstatus": pa.array(st + ["ALL"] * (2 * k), pa.string()),
                "n": pa.array(np.concatenate([n, n, n]), pa.int64()),
                "sum_cents": pa.array(np.concatenate([c, c, c]), pa.int64()),
            }
        )

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    out = coalesce_shuffle_sum(
        fine.map_batches(widen, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        ["n", "sum_cents"],
    )
    return out.sort(["o_orderpriority", "o_orderstatus"])


def _sql_rollup_order_counts() -> str:
    return (
        "SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
        "COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents "
        "FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus) "
        "ORDER BY o_orderpriority, o_orderstatus"
    )


def q_event_prop_stats(sf_dir: str):
    """JSON metadata extraction (``textstages.json_int_field``): the
    events ``props`` JSON column yields its integer ``k`` field in ONE
    vectorized polars pass (malformed JSON / missing / non-integer-
    literal values -> null, pinned identical in the per-row reference,
    the vectorized kernel, and the SQL twin's json_valid + regexp
    guard), then exact per-type stats via the standard partial +
    adaptive combine. Blocks where a type has no parseable value carry
    int64 min/max sentinels; the finish restores the COALESCE(..., 0)
    convention when n_k = 0.

    Output: (event_type, n, n_k, sum_k, min_k, max_k)."""
    from gis_scripts_ray.stages.textstages import json_int_field
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    I64_MAX = np.iinfo(np.int64).max
    I64_MIN = np.iinfo(np.int64).min

    def partial(batch: pa.Table) -> pa.Table:
        b = json_int_field(batch, "props", "k", "k")
        t = pa.table({"event_type": b["event_type"], "k": b["k"]})
        all_ct = t.group_by(["event_type"]).aggregate([([], "count_all")])
        all_ct = all_ct.rename_columns(["event_type", "n"])
        nz = t.filter(pc.is_valid(t["k"]))
        kagg = nz.group_by(["event_type"]).aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        kagg = kagg.rename_columns(["event_type", "n_k", "sum_k", "min_k", "max_k"])
        j = all_ct.join(kagg, keys=["event_type"], join_type="left outer")
        return pa.table(
            {
                "event_type": j["event_type"],
                "n": j["n"],
                "n_k": pc.fill_null(j["n_k"], 0),
                "sum_k": pc.fill_null(j["sum_k"], 0),
                "min_k": pc.fill_null(j["min_k"], I64_MAX),
                "max_k": pc.fill_null(j["max_k"], I64_MIN),
            }
        )

    combined = coalesce_shuffle_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        {"n": "sum", "n_k": "sum", "sum_k": "sum", "min_k": "min", "max_k": "max"},
    )

    def fin(batch: pa.Table) -> pa.Table:
        empty = pc.equal(batch["n_k"], 0)
        zero = pa.array(np.zeros(len(batch), dtype=np.int64), pa.int64())
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n": batch["n"],
                "n_k": batch["n_k"],
                "sum_k": batch["sum_k"],
                "min_k": pc.if_else(empty, zero, batch["min_k"]),
                "max_k": pc.if_else(empty, zero, batch["max_k"]),
            }
        )

    return combined.map_batches(fin, batch_format="pyarrow").sort("event_type")


def _sql_event_prop_stats() -> str:
    # the integer-literal guard (regexp on the EXTRACTED string) pins the
    # same contract as json_int_field: quoted integer strings accepted,
    # floats/bools/containers rejected — DuckDB's bare TRY_CAST would
    # accept '5.0'
    return (
        "WITH e AS (SELECT event_type, CASE WHEN json_valid(props) AND "
        "regexp_matches(COALESCE(json_extract_string(props, '$.k'), ''), '^-?\\d+$') "
        "THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k FROM events) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(k) AS BIGINT) AS n_k, "
        "CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k, "
        "CAST(COALESCE(MIN(k), 0) AS BIGINT) AS min_k, "
        "CAST(COALESCE(MAX(k), 0) AS BIGINT) AS max_k "
        "FROM e GROUP BY event_type ORDER BY event_type"
    )


def q_active_customer_ids(sf_dir: str):
    """SQL INTERSECT (``stages/joins.intersect_distinct``): ids present in
    BOTH the events log (user_id) and the orders table (o_custkey). Each
    side compacts to its distinct key set first; the finish broadcasts
    the smaller set and filters the other compacted set — no row-level
    shuffle on either side.

    Output: one sorted ``user_id`` column."""
    from gis_scripts_ray.stages.joins import intersect_distinct

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    out = intersect_distinct(ev, orders, on="user_id", right_on="o_custkey")
    return out.sort("user_id")


def _sql_active_customer_ids() -> str:
    return (
        "SELECT user_id FROM events INTERSECT "
        "SELECT o_custkey FROM orders ORDER BY user_id"
    )


def q_qty_p75_cont_by_status(sf_dir: str):
    """Interpolated per-group quantile (``stages/stats.grouped_quantile_cont``
    at q = 3/4): the 0-based position q*(n-1) decomposes in INTEGER
    arithmetic (idx = pos // 4, rem = pos % 4); the result is the one
    float expression v_lo + (v_hi - v_lo) * (rem/4) over the two
    bracketing ranks, evaluated in the same operation order as the SQL
    twin — bit-identical IEEE (numpy-percentile-linear semantics).

    Output: (l_linestatus, p75 float64, n)."""
    from gis_scripts_ray.stages.stats import grouped_quantile_cont

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_linestatus", "l_quantity"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_linestatus": batch["l_linestatus"],
                "v": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
            }
        )

    out = grouped_quantile_cont(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_linestatus"],
        "v",
        3,
        4,
        out_col="p75",
    )
    return out.sort("l_linestatus")


def _sql_qty_p75_cont_by_status() -> str:
    return (
        "WITH s AS (SELECT l_linestatus, CAST(ROUND(l_quantity) AS BIGINT) AS v "
        "FROM lineitem), "
        "r AS (SELECT l_linestatus, v, "
        "ROW_NUMBER() OVER (PARTITION BY l_linestatus ORDER BY v) AS rn, "
        "COUNT(*) OVER (PARTITION BY l_linestatus) AS n FROM s), "
        "p AS (SELECT l_linestatus, MAX(n) AS n, "
        "MAX(CASE WHEN rn = (3*(n-1)) // 4 + 1 THEN v END) AS vlo, "
        "MAX(CASE WHEN rn = (3*(n-1)) // 4 + 1 + "
        "CASE WHEN (3*(n-1)) % 4 > 0 THEN 1 ELSE 0 END THEN v END) AS vhi "
        "FROM r GROUP BY l_linestatus) "
        "SELECT l_linestatus, "
        "CAST(vlo AS DOUBLE) + (CAST(vhi AS DOUBLE) - CAST(vlo AS DOUBLE)) * "
        "(CAST((3*(n-1)) % 4 AS DOUBLE) / 4.0) AS p75, "
        "CAST(n AS BIGINT) AS n "
        "FROM p ORDER BY l_linestatus"
    )


def q_nation_revenue_share(sf_dir: str):
    """Percent-of-total (window over an aggregate): each nation's share of
    global order revenue. The per-nation aggregate is the scale-safe
    broadcast-dimension pipeline (``orders_nation_rollup``); the total is
    an exact int64 fold of the TINY materialized aggregate (<= |nations|
    rows), and share = one float64 division of exact inputs, same
    operation order as the SQL window twin.

    Output: (n_name, sum_total_cents, n, share)."""
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    agg = cell_sum_count(
        _orders_nation_tagged(sf_dir),
        ["n_name"],
        ["total_cents"],
    ).materialize()
    total = 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        total += int(np.sum(b["sum_total_cents"].to_numpy()))
    total_f = np.float64(total)

    def fin(batch: pa.Table) -> pa.Table:
        share = batch["sum_total_cents"].to_numpy().astype(np.float64) / total_f
        return pa.table(
            {
                "n_name": batch["n_name"],
                "sum_total_cents": batch["sum_total_cents"],
                "n": batch["n"],
                "share": pa.array(share, pa.float64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow").sort("n_name")


def _sql_nation_revenue_share() -> str:
    return (
        "WITH a AS (SELECT n_name, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name) "
        "SELECT n_name, sum_total_cents, n, "
        "CAST(sum_total_cents AS DOUBLE) / CAST(SUM(sum_total_cents) OVER () AS DOUBLE) AS share "
        "FROM a ORDER BY n_name"
    )


def _sql_events_asof_orders() -> str:
    return (
        "WITH o2 AS (SELECT o_orderkey, o_custkey % 150 AS key, "
        "TIMESTAMP '2024-01-01 00:00:00' + to_microseconds("
        "(o_orderkey * 1000003) % 2592000000000) AS ts2 FROM orders) "
        "SELECT e.event_id, o2.o_orderkey FROM events e "
        "ASOF JOIN o2 ON e.user_id = o2.key AND e.ts >= o2.ts2 "
        "ORDER BY e.event_id"
    )


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram (word-trigram) Jaccard as a DISTRIBUTED operator: each
    doc is paired with a deterministic perturbed copy ('PAD ' prefix,
    doc_id + 1M); shingle SETS travel as list columns and each pair's
    intersection/union sizes are exact integers — the oracle recomputes
    them from string trigram sets in SQL (hash == string-tuple equality
    modulo 64-bit collisions)."""
    from gis_scripts_ray.stages.dedup import shingle_sets

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    id_shift = _id_shift(sf_dir, "documents", "doc_id")

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        all_ids = np.concatenate([ids, ids + id_shift])
        all_texts = texts + ["PAD " + (t or "") for t in texts]
        h, off = shingle_sets(all_texts, 3)
        sh_col = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(h.astype(np.int64), pa.int64())
        )
        # pair key = the ORIGINAL doc id for both members — collision-free
        # for any id range (a modulo key would silently merge doc 0 with
        # doc 1M and drop both via the 2-member guard)
        return pa.table(
            {
                "pair": pa.array(np.concatenate([ids, ids]), pa.int64()),
                "doc_id": pa.array(all_ids, pa.int64()),
                "sh": sh_col,
            }
        )

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_inter", pa.int64()), ("n_union", pa.int64())]
    )

    def pair_jaccard(group) -> pa.Table:
        if isinstance(group, dict):
            group = pa.table(group)
        elif not isinstance(group, pa.Table):
            group = pa.Table.from_pandas(group, preserve_index=False)
        if len(group) != 2:
            return out_schema.empty_table()
        ids = group["doc_id"].to_numpy()
        o = np.argsort(ids)
        sets = group["sh"].to_pylist()
        sa = np.asarray(sets[o[0]], dtype=np.uint64)
        sb = np.asarray(sets[o[1]], dtype=np.uint64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        return pa.table(
            {
                "doc_a": pa.array([int(ids[o[0]])], pa.int64()),
                "doc_b": pa.array([int(ids[o[1]])], pa.int64()),
                "n_inter": pa.array([inter], pa.int64()),
                "n_union": pa.array([len(sa) + len(sb) - inter], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(pair_jaccard, batch_format="pyarrow")
    )


def _sql_ngram_jaccard() -> str:
    return (
        "WITH shf AS (SELECT MAX(doc_id) + 1 AS s FROM documents), "
        "both_docs AS (SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + (SELECT s FROM shf), 'PAD ' || text FROM documents), "
        "w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM both_docs), "
        "pad AS (SELECT doc_id, CASE WHEN len(ws) < 3 "
        "THEN list_concat(ws, list_transform(generate_series(1, 3 - len(ws)), x -> '')) "
        "ELSE ws END AS ws FROM w), "
        "sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws) - 2), "
        "i -> ws[i] || chr(1) || ws[i+1] || chr(1) || ws[i+2])) AS s FROM pad) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter, "
        "CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS n_union "
        "FROM sh a JOIN sh b ON b.doc_id = a.doc_id + (SELECT s FROM shf) "
        "WHERE a.doc_id < (SELECT s FROM shf)"
    )


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs: the corpus unioned with
    exact copies (vec_id + 1M), pairs with cosine >= 0.99 found by the
    banded-LSH pair pipeline (``stages/similarity.lsh_neardup_pairs`` —
    int64 (id, combo) rows shuffle, embeddings never do; exact-cosine
    verify over the candidate-volume-bounded subset only). No driver
    materialization of the corpus anywhere in the plan (round-2 verdict
    weak spot #1, closed). Every vector pairs with exactly its copy."""
    from gis_scripts_ray.stages.similarity import lsh_neardup_pairs

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    id_shift = _id_shift(sf_dir, "embeddings", "vec_id")

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": pc.add(batch["vec_id"], id_shift), "embedding": batch["embedding"]}
        )

    both = emb.union(emb.map_batches(shift, batch_format="pyarrow"))
    dim = len(emb.take(1)[0]["embedding"])
    pairs = lsh_neardup_pairs(both, dim=dim, threshold=0.99, id_col="vec_id")
    assert not pc.any(pairs["capped"]).as_py(), "hot LSH bucket truncated"
    return pa.table({"vec_a": pairs["id_a"], "vec_b": pairs["id_b"]})


def _sql_embedding_neardup() -> str:
    return (
        "WITH both_v AS (SELECT vec_id, embedding FROM embeddings "
        "UNION ALL SELECT vec_id + (SELECT MAX(vec_id)+1 FROM embeddings), "
        "embedding FROM embeddings) "
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM both_v a, both_v b "
        "WHERE a.vec_id < b.vec_id "
        "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99"
    )


def q_token_counts(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        toks = pc.add(pc.count_substring(batch["text"], " "), 1)
        return pa.table(
            {"lang": batch["lang"], "tokens": pc.cast(toks, pa.int64())}
        )

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["lang"], ["tokens"])


def _sql_token_counts() -> str:
    return (
        "SELECT lang, CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT) "
        "AS sum_tokens, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang"
    )


def q_bpe_token_counts(sf_dir: str):
    """BPE-ish pre-tokenizer counts (``textstages.bpe_token_counts``): the
    granularity LLM token budgets are quoted in — contractions, word
    pieces, digit runs, punctuation runs — via ONE vectorized polars
    ``count_matches`` per batch with a deliberately engine-portable
    (lookahead-free) pattern; the SQL twin runs the IDENTICAL regex
    through DuckDB's ``regexp_extract_all``, so the two engines' regex
    semantics are part of the pinned contract.

    Output: (lang, sum_bpe_tokens, n)."""
    from gis_scripts_ray.stages.textstages import bpe_token_counts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        b = bpe_token_counts(batch, "text")
        return pa.table({"lang": b["lang"], "bpe_tokens": b["bpe_tokens"]})

    return cell_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"), ["lang"], ["bpe_tokens"]
    )


def _sql_bpe_token_counts() -> str:
    from gis_scripts_ray.stages.textstages import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return (
        f"SELECT lang, CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) "
        "AS sum_bpe_tokens, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY lang"
    )


def q_embedding_topk(sf_dir: str):
    """Brute-force cosine top-k against a broadcast query vector."""
    from gis_scripts_ray.stages.similarity import cosine_topk, query_vector

    qv = query_vector(sf_dir, vec_id=0)
    top = cosine_topk(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]),
        qv,
        k=10,
    )
    return top.select(["vec_id"])


def _sql_embedding_topk() -> str:
    return (
        "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
        "SELECT vec_id FROM (SELECT vec_id, list_cosine_similarity(embedding, q.qv) AS sim "
        "FROM embeddings, q) ORDER BY sim DESC, vec_id ASC LIMIT 10"
    )


def q_pip_best_match(sf_dir: str):
    """Mosaic overlap resolution (D3 'last wins'): tag each doc with its
    highest-(priority, polygon_id) rectangle or (-1, null)."""
    from gis_scripts_ray.stages.pip_join import pip_tag_best

    ds = located_documents(sf_dir)
    tagged = pip_tag_best(ds, rect_polygon_table(), carry_cols=["doc_id"])
    return tagged.select_columns(["doc_id", "polygon_id"])


def _sql_pip_best_match() -> str:
    return (
        _located_cte("d.doc_id")
        + ", matches AS (SELECT doc_id, r.polygon_id, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY r.priority DESC, r.polygon_id DESC) AS rn "
        "FROM located "
        + _RECT_JOIN.format(values=_rect_values())
        + ") SELECT l.doc_id, COALESCE(m.polygon_id, -1) AS polygon_id "
        "FROM located l LEFT JOIN (SELECT doc_id, polygon_id FROM matches WHERE rn = 1) m "
        "ON l.doc_id = m.doc_id"
    )


def q_quantile_breakpoints(sf_dir: str):
    """A11: exact percentiles of integer quantity via distributed histogram."""
    from gis_scripts_ray.stages.stats import exact_quantiles_int

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    qs = exact_quantiles_int(ds, "l_quantity", [0.25, 0.5, 0.75, 0.9])
    return pa.table(
        {
            "q": pa.array([0.25, 0.5, 0.75, 0.9], pa.float64()),
            "value": pa.array(qs, pa.float64()),
        }
    )


def _sql_quantile_breakpoints() -> str:
    parts = [
        f"SELECT {q} AS q, quantile_cont(l_quantity, {q}) AS value FROM lineitem"
        for q in (0.25, 0.5, 0.75, 0.9)
    ]
    return " UNION ALL ".join(parts)


def q_source_variance(sf_dir: str):
    """A3/A8: per-source exact variance numerator (integer domain —
    n*sum(x^2) - sum(x)^2) plus count; std derivable at the consumer."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "v": pa.array(v, pa.int64()),
                "v2": pa.array(v * v, pa.int64()),
            }
        )

    sums = cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["source"], ["v", "v2"])

    def finalize(batch: pa.Table) -> pa.Table:
        # exact arbitrary-precision arithmetic on the (tiny) aggregate rows:
        # n*sum(v^2) wraps int64 silently in numpy past ~2^63 while the
        # DuckDB twin computes in HUGEINT and errors on the BIGINT cast —
        # Python ints + pa.array(..., int64) make overflow LOUD here too
        n = batch["n"].to_pylist()
        s = batch["sum_v"].to_pylist()
        s2 = batch["sum_v2"].to_pylist()
        var_num = [a * c - b * b for a, b, c in zip(n, s, s2)]
        return pa.table(
            {
                "source": batch["source"],
                "var_num": pa.array(var_num, pa.int64()),  # raises if > int64
                "n": pa.array(n, pa.int64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow")


def _sql_source_variance() -> str:
    return (
        "SELECT source, CAST(COUNT(*)*SUM(n_chars*n_chars) - SUM(n_chars)*SUM(n_chars) AS BIGINT) "
        "AS var_num, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source"
    )


def q_source_bbox_overlaps(sf_dir: str):
    """J1: O(n^2) bbox self-join over per-source extents (driver-side small
    n, like the reference's find_overlaps)."""
    ds = located_documents(sf_dir, ("doc_id", "source"))
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def partial_ext(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(["source", "lat", "lon"])
            .group_by(["source"])
            .aggregate([("lat", "min"), ("lat", "max"), ("lon", "min"), ("lon", "max")])
        )
        rename = {"lat_min": "lat0", "lat_max": "lat1", "lon_min": "lon0", "lon_max": "lon1"}
        return out.rename_columns([rename.get(c, c) for c in out.column_names])

    ext = (
        coalesce_shuffle_agg(
            ds.map_batches(partial_ext, batch_format="pyarrow"),
            ["source"],
            {"lat0": "min", "lat1": "max", "lon0": "min", "lon1": "max"},
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out_a, out_b = [], []
    for x in range(len(ext)):
        for y in range(x + 1, len(ext)):
            a, b = ext.iloc[x], ext.iloc[y]
            if (
                a.lat0 <= b.lat1
                and b.lat0 <= a.lat1
                and a.lon0 <= b.lon1
                and b.lon0 <= a.lon1
            ):
                out_a.append(a.source)
                out_b.append(b.source)
    return pa.table(
        {"source_a": pa.array(out_a, pa.string()), "source_b": pa.array(out_b, pa.string())}
    )


def _sql_source_bbox_overlaps() -> str:
    return (
        _located_cte("d.doc_id, d.source")
        + ", ext AS (SELECT source, MIN(lat) lat0, MAX(lat) lat1, MIN(lon) lon0, MAX(lon) lon1 "
        "FROM located GROUP BY source) "
        "SELECT a.source AS source_a, b.source AS source_b FROM ext a, ext b "
        "WHERE a.source < b.source AND a.lat0 <= b.lat1 AND b.lat0 <= a.lat1 "
        "AND a.lon0 <= b.lon1 AND b.lon0 <= a.lon1"
    )


def q_cells_all_sources(sf_dir: str):
    """D2 set-AND: tiles where ALL langs are present (valid-mask
    intersection analog — a cell is 'valid' only when every layer covers
    it)."""
    ds = encode_cells(
        located_documents(sf_dir, ("doc_id", "lang")), EncodeConfig(tile_z=4)
    )
    langs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang"]
    ).unique("lang")
    k = len(langs)

    from gis_scripts_ray.stages.tile_agg import cell_count

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["tile_x", "tile_y", "lang"])
            .group_by(["tile_x", "tile_y", "lang"])
            .aggregate([])
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    # distinct (tile, lang) triples, then langs per tile — both adaptive
    distinct = cell_count(pairs, ["tile_x", "tile_y", "lang"], alias="_m")
    per_cell = cell_count(
        distinct.select_columns(["tile_x", "tile_y", "lang"]),
        ["tile_x", "tile_y"],
        alias="n_langs",
    )

    def keep_full(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["n_langs"], k)
        return batch.filter(m).select(["tile_x", "tile_y"])

    return per_cell.map_batches(keep_full, batch_format="pyarrow")


def _sql_cells_all_sources() -> str:
    x, y = _tile_sql(4)
    return (
        _located_cte("d.doc_id, d.lang")
        + f" SELECT tile_x, tile_y FROM "
        f"(SELECT lang, {x} AS tile_x, {y} AS tile_y FROM located) "
        f"GROUP BY tile_x, tile_y "
        f"HAVING COUNT(DISTINCT lang) = (SELECT COUNT(DISTINCT lang) FROM documents)"
    )


def q_hash_sample(sf_dir: str):
    """O2: deterministic 10% 'sample' via multiplicative hash residue —
    order-free, partition-free, reproducible (seeded-sampling analog)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def pick(batch: pa.Table) -> pa.Table:
        # wrapping uint64 residue — same id contract as stages/sampling.py
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(100) < np.uint64(10)
        return batch.filter(pa.array(keep))

    return cell_sum_count(
        ds.map_batches(pick, batch_format="pyarrow").map_batches(
            lambda b: pa.table({"lang": b["lang"], "one": pa.array(np.ones(len(b), dtype=np.int64))}),
            batch_format="pyarrow",
        ),
        ["lang"],
        ["one"],
    ).drop_columns(["sum_one"])


def _sql_hash_sample() -> str:
    # HUGEINT mod 2^64 = the engine's wrapping uint64 (ADVICE r2)
    return (
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
        "WHERE ((CAST(doc_id AS HUGEINT)*2654435761)%18446744073709551616)%100 < 10 "
        "GROUP BY lang"
    )


def _rpc_model():
    """Deterministic synthetic RPC model sized to the fixture's lat/lon
    range, with nonzero terms at every polynomial order."""
    from gis_scripts_ray.functions.rpc import RpcModel

    def coeffs(lead: float, lin: float, quad: float, cubic: float) -> tuple:
        c = [0.0] * 20
        c[0] = lead
        c[1], c[2], c[3] = lin, -lin / 2.0, lin / 8.0
        c[4], c[7], c[8] = quad, quad / 2.0, -quad / 4.0
        c[10], c[11], c[15], c[19] = cubic, cubic / 2.0, -cubic / 4.0, cubic / 8.0
        return tuple(c)

    return RpcModel(
        long_off=0.0, long_scale=180.0,
        lat_off=0.0, lat_scale=90.0,
        height_off=0.0, height_scale=500.0,
        samp_off=2048.0, samp_scale=2048.0,
        line_off=2048.0, line_scale=2048.0,
        samp_num=coeffs(0.004, 0.95, 0.03, 0.008),
        samp_den=coeffs(1.0, 0.002, 0.0005, 0.0001),
        line_num=coeffs(-0.006, 1.05, -0.04, 0.006),
        line_den=coeffs(1.0, 0.0015, 0.0004, 0.00012),
    )


def q_rpc_tile_counts(sf_dir: str):
    """§2.7 RPC rational-polynomial eval (seagrass_lib.py:57-76): project
    located docs through a 20-coefficient cubic-ratio camera model to
    integer (col, row) pixels, count docs per 256-px pixel block."""
    from gis_scripts_ray.functions.rpc import rpc_project
    from gis_scripts_ray.stages.tile_agg import cell_count

    m = _rpc_model()
    ds = located_documents(sf_dir)

    def project(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        col, row = rpc_project(lon, lat, np.zeros(len(lat)), m)
        return pa.table(
            {
                "block_x": pa.array(col // 256, pa.int64()),
                "block_y": pa.array(row // 256, pa.int64()),
            }
        )

    return cell_count(
        ds.map_batches(project, batch_format="pyarrow"), ["block_x", "block_y"],
        alias="n_docs",
    )


def _sql_rpc_tile_counts() -> str:
    from gis_scripts_ray.functions.rpc import rpc_poly_sql

    m = _rpc_model()
    L = f"((lon - {m.long_off!r})/{m.long_scale!r})"
    P = f"((lat - {m.lat_off!r})/{m.lat_scale!r})"
    H = f"((0.0 - {m.height_off!r})/{m.height_scale!r})"
    cn = f"({rpc_poly_sql(m.samp_num, 'L', 'P', 'H')} / {rpc_poly_sql(m.samp_den, 'L', 'P', 'H')})"
    rn = f"({rpc_poly_sql(m.line_num, 'L', 'P', 'H')} / {rpc_poly_sql(m.line_den, 'L', 'P', 'H')})"
    return (
        _located_cte("d.doc_id")
        + f", norm AS (SELECT {L} AS L, {P} AS P, {H} AS H FROM located), "
        f"px AS (SELECT CAST(TRUNC({cn}*{m.samp_scale!r} + {m.samp_off!r}) AS BIGINT) AS col_, "
        f"CAST(TRUNC({rn}*{m.line_scale!r} + {m.line_off!r}) AS BIGINT) AS row_ FROM norm) "
        # numpy // floors while DuckDB // truncates — spell the floor
        "SELECT CAST(FLOOR(CAST(col_ AS DOUBLE)/256.0) AS BIGINT) AS block_x, "
        "CAST(FLOOR(CAST(row_ AS DOUBLE)/256.0) AS BIGINT) AS block_y, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM px GROUP BY block_x, block_y"
    )


# AOI for the clip-pushdown query: bounds sit OFF the host-geo lattice
# (hosts land on 0.001° multiples; .0005 offsets) so BETWEEN edges cannot
# collide with a point; covers ~48/200 hosts -> a strict partition subset
_CLIP_AOI = (-40.0005, -10.0005, 60.0005, 50.0005)  # lon0, lat0, lon1, lat1
_CLIP_STORE_Z = 3


def _geo_store_dir(sf_dir: str) -> str:
    """Deterministic per-input store location: content is a pure function
    of sf_dir (located_documents is deterministic), so a warm store is
    reusable across runs; the version token invalidates stale layouts."""
    import hashlib

    from gis_scripts_ray.stages.spatial_store import GEO_STORE_VERSION

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/graft_geo_store/v{GEO_STORE_VERSION}_{h}_z{_CLIP_STORE_Z}"


def q_clip_pushdown(sf_dir: str):
    """M8 spatial clip with STORAGE-LEVEL pushdown
    (Clip_Rasters_By_Extent.py:17-36 windowed read analog): the located
    table is persisted partitioned by coarse tile, the AOI clip reads ONLY
    the bbox's tile partitions (file-set pruned like the persisted ANN
    index), exact-refines rows, then counts docs per TILE_Z tile."""
    from gis_scripts_ray.stages.spatial_store import (
        read_clip_pushdown,
        write_geo_partitioned,
    )
    from gis_scripts_ray.stages.tile_agg import cell_count

    out = _geo_store_dir(sf_dir)
    # one-time build; a warm store drops every row before the shuffle
    write_geo_partitioned(located_documents(sf_dir), out, z=_CLIP_STORE_Z)
    lon0, lat0, lon1, lat1 = _CLIP_AOI
    clipped = read_clip_pushdown(out, _CLIP_STORE_Z, lon0, lat0, lon1, lat1)
    enc = encode_cells(clipped, EncodeConfig(tile_z=TILE_Z))
    return cell_count(enc, ["tile_x", "tile_y"], alias="n_docs")


def _sql_clip_pushdown() -> str:
    x, y = _tile_sql(TILE_Z)
    lon0, lat0, lon1, lat1 = _CLIP_AOI
    return (
        _located_cte("d.doc_id")
        + f" SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS n_docs FROM "
        f"(SELECT {x} AS tile_x, {y} AS tile_y FROM located "
        f"WHERE lon BETWEEN {lon0!r} AND {lon1!r} "
        f"AND lat BETWEEN {lat0!r} AND {lat1!r}) "
        "GROUP BY tile_x, tile_y"
    )


def q_train_val_split(sf_dir: str):
    """O3: deterministic hash-residue train/val split (order-free,
    resume-stable); per-(split, lang) counts prove both partition sizes
    and disjointness (n sums to the table size in the oracle compare)."""
    from gis_scripts_ray.stages.sampling import split_train_val

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    train, val = split_train_val(ds, "doc_id", val_pct=20)

    def counted(part: ray.data.Dataset, name: str) -> ray.data.Dataset:
        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "split": pa.array([name] * len(batch), pa.string()),
                    "lang": batch["lang"],
                    "one": pa.array(np.ones(len(batch), dtype=np.int64)),
                }
            )

        return part.map_batches(prep, batch_format="pyarrow")

    both = counted(train, "train").union(counted(val, "val"))
    return cell_sum_count(both, ["split", "lang"], ["one"]).drop_columns(["sum_one"])


def _sql_train_val_split() -> str:
    from gis_scripts_ray.stages.sampling import split_sql_predicate

    val = split_sql_predicate("doc_id", 20, val_side=True)
    return (
        f"SELECT CASE WHEN {val} THEN 'val' ELSE 'train' END AS split, lang, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY split, lang"
    )


def q_scalar_transform_sum(sf_dir: str):
    """M1+M2: value-replace then scalar-add, summed per flag (int domain)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        q = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
        q = np.where(q == 25, 0, q) + 5
        return pa.table(
            {"l_returnflag": batch["l_returnflag"], "qty_adj": pa.array(q, pa.int64())}
        )

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["l_returnflag"], ["qty_adj"])


def _sql_scalar_transform_sum() -> str:
    return (
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) = 25 THEN 0 ELSE CAST(l_quantity AS BIGINT) END + 5) AS BIGINT) AS sum_qty_adj, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag"
    )


def q_quantity_histogram(sf_dir: str):
    """A12: value histogram of integer quantity."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qty": pa.array(np.round(batch["l_quantity"].to_numpy()).astype(np.int64), pa.int64()),
                "one": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["qty"], ["one"]).drop_columns(["sum_one"])


def _sql_quantity_histogram() -> str:
    return (
        "SELECT CAST(l_quantity AS BIGINT) AS qty, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY qty"
    )


def q_multimodal_bytes(sf_dir: str):
    """Binary-column plumbing: html payload byte stats per lang. The html
    column is real binary built by the web-pages derivation; the decode
    step itself is the stubbed stage (see stages/multimodal.py)."""
    from gis_scripts_ray.sources.webpages import web_pages_from_documents

    ds = web_pages_from_documents(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        blen = pc.cast(pc.binary_length(batch["html"]), pa.int64())
        return pa.table({"lang": batch["lang"], "html_bytes": blen})

    return cell_sum_count(ds.map_batches(prep, batch_format="pyarrow"), ["lang"], ["html_bytes"])


def _sql_multimodal_bytes() -> str:
    # html = b"<html><body>" + text + b"</body></html>" -> strlen(text)+26
    # (text is single-byte... NO: text may contain non-ASCII; byte length =
    # octet_length in DuckDB)
    return (
        "SELECT lang, CAST(SUM(octet_length(encode(text)) + 26) AS BIGINT) AS sum_html_bytes, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang"
    )


_SESSION_GAP_US = 1_800_000_000  # 30 minutes


def q_value_mad(sf_dir: str):
    """Median absolute deviation per event type (round 5): the robust
    dispersion statistic — med = lower median of value cents, mad =
    lower median of |v − med| — two passes of the exact distributed
    grouped median (``stats.grouped_median``: per-group value
    histograms, order statistics read off exactly), medians delivered
    back by broadcast (the per-type table is category-bounded). Lower
    (discrete) median == DuckDB PERCENTILE_DISC(0.5) — no interpolated
    floats.

    Output: (event_type, med, mad) sorted."""
    from gis_scripts_ray.stages.stats import grouped_median

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch["event_type"], "v": _cents(batch["value"])}
        )

    vals = ds.map_batches(prep, batch_format="pyarrow").materialize()
    med = grouped_median(vals, ["event_type"], "v", out_col="med").to_pandas()
    med_of = dict(zip(med["event_type"], med["med"].astype(int)))
    med_ref = ray.put(med_of)

    def absdev(batch: pa.Table, _ref=med_ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        m = worker_broadcast(_ref)
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        lut = np.array(
            [m[t] for t in enc.dictionary.to_pylist()], dtype=np.int64
        )  # one lookup per DISTINCT type, not per row
        meds = lut[enc.indices.to_numpy(zero_copy_only=False)]
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "av": pa.array(np.abs(v - meds), pa.int64()),
            }
        )

    mad = grouped_median(
        vals.map_batches(absdev, batch_format="pyarrow"),
        ["event_type"],
        "av",
        out_col="mad",
    ).to_pandas()
    mad = mad.sort_values("event_type").reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(mad["event_type"], pa.string()),
            "med": pa.array(
                [med_of[t] for t in mad["event_type"]], pa.int64()
            ),
            "mad": pa.array(mad["mad"].astype(np.int64), pa.int64()),
        }
    )


def _sql_value_mad() -> str:
    return (
        "WITH s AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) "
        "AS v FROM events), "
        "m AS (SELECT event_type, CAST(PERCENTILE_DISC(0.5) WITHIN GROUP "
        "(ORDER BY v) AS BIGINT) AS med FROM s GROUP BY event_type), "
        "d AS (SELECT s.event_type, ABS(s.v - m.med) AS av FROM s "
        "JOIN m USING (event_type)) "
        "SELECT d.event_type, m.med, CAST(PERCENTILE_DISC(0.5) WITHIN GROUP "
        "(ORDER BY av) AS BIGINT) AS mad FROM d JOIN m USING (event_type) "
        "GROUP BY d.event_type, m.med ORDER BY d.event_type"
    )


def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval via reciprocal-rank fusion (round 5): the
    standard lexical+dense fusion of an LLM retrieval stack —
    rrf_micro = Σ_lists 10⁶ // (60 + rank) over the BM25 top-12
    (``bm25_topk``'s index-pruned integer pipeline) and the int8
    quantized-cosine top-10 (``quantized_topk``'s exact matmul), which
    share the doc/vec id space. Both rankings are deterministic
    (score DESC, id ASC), so RRF is exact integers; the fusion itself
    runs on the ≤22 winner rows. The twin nests both full pipelines'
    SQL as CTEs — the whole stack re-verifies per run.

    Output: top-10 (doc_id, rrf_micro)."""
    bm = q_bm25_topk(sf_dir).to_pandas()
    qz = q_quantized_topk(sf_dir)
    qz = qz.to_pandas() if not isinstance(qz, pa.Table) else qz.to_pandas()
    bm = bm.sort_values(["score", "doc_id"], ascending=[False, True])
    qz = qz.sort_values(["score", "vec_id"], ascending=[False, True])
    rrf: dict[int, int] = {}
    for ids in (bm["doc_id"].tolist(), qz["vec_id"].tolist()):
        for r, d in enumerate(ids, start=1):
            rrf[int(d)] = rrf.get(int(d), 0) + 1_000_000 // (60 + r)
    top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in top], pa.int64()),
            "rrf_micro": pa.array([s for _, s in top], pa.int64()),
        }
    )


def _sql_hybrid_rrf() -> str:
    return (
        f"WITH bm AS ({_sql_bm25_topk()}), qz AS ({_sql_quantized_topk()}), "
        "br AS (SELECT doc_id, ROW_NUMBER() OVER "
        "(ORDER BY score DESC, doc_id) AS r FROM bm), "
        "qr AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER "
        "(ORDER BY score DESC, vec_id) AS r FROM qz), "
        "u AS (SELECT doc_id, r FROM br UNION ALL "
        "SELECT doc_id, r FROM qr) "
        "SELECT doc_id, CAST(SUM(1000000 // (60 + r)) AS BIGINT) "
        "AS rrf_micro FROM u GROUP BY doc_id "
        "ORDER BY rrf_micro DESC, doc_id LIMIT 10"
    )


def q_token_gini(sf_dir: str):
    """Per-language token-diversity quality signal (round 5): Gini
    impurity of each doc's token distribution in exact integer micros —
    gini_micro = (10⁶ · (n² − Σc²)) // n² (entropy's log never enters,
    so the signal is float-free and twinnable; low diversity = the
    repetition the Gopher filters target). One fused vectorized pass
    per block (split → per-doc token counts via one lexsort-free
    group_by → Σc² by reduceat), then a per-language sum/count combine.

    Output: (lang, sum_gini_micro, n) per language."""
    import polars as pl

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def per_doc(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            pa.table({"doc_id": batch["doc_id"], "text": batch["text"]})
        )
        per = (
            df.with_columns(pl.col("text").str.split(" ").alias("w"))
            .explode("w")
            .group_by(["doc_id", "w"])
            .len()
            .group_by("doc_id")
            .agg(
                (pl.col("len") ** 2).sum().alias("c2"),
                pl.col("len").sum().alias("n"),
            )
            .sort("doc_id")
        )
        n = per["n"].to_numpy().astype(np.int64)
        c2 = per["c2"].to_numpy().astype(np.int64)
        gini = (1_000_000 * (n * n - c2)) // (n * n)
        docs = pa.table(
            {
                "doc_id": pa.array(per["doc_id"].to_numpy(), pa.int64()),
                "gini_micro": pa.array(gini, pa.int64()),
            }
        )
        # reattach lang (both sides of this zip are the same block)
        lang_by_doc = pa.table(
            {"doc_id": batch["doc_id"], "lang": batch["lang"]}
        ).sort_by("doc_id")
        assert lang_by_doc["doc_id"].equals(docs["doc_id"])
        return pa.table(
            {
                "lang": lang_by_doc["lang"],
                "gini_micro": docs["gini_micro"],
            }
        )

    return cell_sum_count(
        ds.map_batches(per_doc, batch_format="pyarrow"),
        ["lang"],
        ["gini_micro"],
    )


def _sql_token_gini() -> str:
    return (
        "WITH t AS (SELECT doc_id, lang, "
        "unnest(string_split(text, ' ')) AS w FROM documents), "
        "c AS (SELECT doc_id, lang, w, COUNT(*) AS cnt FROM t "
        "GROUP BY doc_id, lang, w), "
        "p AS (SELECT doc_id, lang, SUM(cnt * cnt) AS c2, SUM(cnt) AS n "
        "FROM c GROUP BY doc_id, lang), "
        "g AS (SELECT lang, (1000000 * (n * n - c2)) // (n * n) AS gm "
        "FROM p) "
        "SELECT lang, CAST(SUM(gm) AS BIGINT) AS sum_gini_micro, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY lang"
    )


def q_source_overlap(sf_dir: str):
    """Cross-source duplication matrix (round 5): for every source pair
    (s1 < s2), how many DISTINCT texts appear in both — the
    "contamination between corpus slices" diagnostic behind
    cross-corpus dedup policy. Texts never shuffle: blocks emit
    (content-hash fixed_size_binary(16), source) distinct pairs, one
    adaptive combine dedupes globally, a second per-hash pass expands
    each hash's source set into canonical pairs (per-size
    ``triu_indices``, the itemsets kernel), and a final combine counts
    per pair. MD5 collisions across ~2^64 distinct texts are the
    documented negligible-risk assumption (the exact-dedup convention).

    Fixture: the corpus texts are unique by construction, so the input
    stream is the documents table UNIONed with a rotated-source mirror
    of every third doc (source srcK -> src((K+1) mod n_sources)) — the
    repo's shifted-union convention: real cross-source duplicates with
    a closed-form twin, nothing hard-coded (n_sources is measured).

    Output: (s1, s2, n_shared) for pairs with n_shared > 0."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    import pyarrow.parquet as _pq

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    n_sources = len(
        set(
            _pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["source"]
            )["source"].to_pylist()
        )
    )

    def mirror(batch: pa.Table) -> pa.Table:
        import polars as pl

        sel = pa.array(batch["doc_id"].to_numpy() % 3 == 0)
        m = batch.filter(sel)
        src = pl.from_arrow(m["source"])
        if isinstance(src, pl.DataFrame):
            src = src.to_series()
        rot = (src.str.slice(3).cast(pl.Int64).to_numpy() + 1) % n_sources
        mirrored = pa.table(
            {
                "source": pa.array([f"src{k}" for k in rot], pa.string()),
                "text": m["text"],
            }
        )
        orig = pa.table({"source": batch["source"], "text": batch["text"]})
        return pa.concat_tables([orig, mirrored])

    ds = base.map_batches(mirror, batch_format="pyarrow")

    def hash_pairs(batch: pa.Table) -> pa.Table:
        from gis_scripts_ray.stages.dedup import content_hash_cols

        hb = content_hash_cols(batch, "text")
        t = pa.table(
            {
                "h1": hb["h1"],
                "h2": hb["h2"],
                "source": batch["source"],
                "one": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )
        return (
            t.group_by(["h1", "h2", "source"])
            .aggregate([("one", "min")])
            .rename_columns(["h1", "h2", "source", "one"])
        )

    distinct = coalesce_shuffle_agg(
        ds.map_batches(hash_pairs, batch_format="pyarrow"),
        ["h1", "h2", "source"],
        {"one": "min"},
    ).materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.sort_by(
            [
                ("h1", "ascending"),
                ("h2", "ascending"),
                ("source", "ascending"),
            ]
        )
        h1 = t["h1"].to_numpy(zero_copy_only=False)
        h2 = t["h2"].to_numpy(zero_copy_only=False)
        src = t["source"].combine_chunks()
        new = np.empty(len(h1), dtype=bool)
        if len(h1) == 0:
            return pa.table(
                {
                    "s1": pa.array([], pa.string()),
                    "s2": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(h1)]]))
        i_parts, j_parts = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            iu, ju = np.triu_indices(int(s), k=1)
            base = starts[sizes == s]
            i_parts.append((base[:, None] + iu[None, :]).ravel())
            j_parts.append((base[:, None] + ju[None, :]).ravel())
        if not i_parts:
            return pa.table(
                {
                    "s1": pa.array([], pa.string()),
                    "s2": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        ii = np.concatenate(i_parts)
        jj = np.concatenate(j_parts)
        t2 = pa.table(
            {
                "s1": src.take(pa.array(ii, pa.int64())),
                "s2": src.take(pa.array(jj, pa.int64())),
                "n_shared": pa.array(np.ones(len(ii), dtype=np.int64)),
            }
        )
        out = t2.group_by(["s1", "s2"]).aggregate([("n_shared", "sum")])
        return out.rename_columns(["s1", "s2", "n_shared"])

    # re-bucket by hash so each hash's source set is complete in one task
    def rekey(b: pa.Table) -> pa.Table:
        h1 = b["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "_bk", pa.array((h1 % np.uint64(32)).astype(np.int64), pa.int64())
        )

    grouped = distinct.map_batches(rekey, batch_format="pyarrow").groupby(
        "_bk"
    )

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        t = pa.Table.from_pandas(g, preserve_index=False)
        return pair_partial(t).to_pandas()

    pairs = grouped.map_groups(per_bucket, batch_format="pandas")
    return coalesce_shuffle_agg(
        pairs, ["s1", "s2"], {"n_shared": "sum"}
    )


def _sql_source_overlap() -> str:
    return (
        "WITH ns AS (SELECT COUNT(DISTINCT source) AS k FROM documents), "
        "stream AS (SELECT source, text FROM documents "
        "UNION ALL "
        "SELECT 'src' || CAST((CAST(SUBSTR(source, 4) AS INT) + 1) "
        "% (SELECT k FROM ns) AS VARCHAR) AS source, text "
        "FROM documents WHERE doc_id % 3 = 0), "
        "d AS (SELECT DISTINCT source, text FROM stream) "
        "SELECT a.source AS s1, b.source AS s2, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared FROM d a "
        "JOIN d b ON a.text = b.text AND a.source < b.source "
        "GROUP BY a.source, b.source"
    )


def q_burst_pairs(sf_dir: str):
    """Per-user burst-pair counts (round 5): ordered same-user event
    pairs within a 2-hour window — ``stages/burst.burst_pair_counts``
    replaces the twin's inequality self-join with ONE bucketed shuffle
    and two ``searchsorted`` calls over a per-bucket composite key (no
    JoinOperator, no pair materialization; identical timestamps never
    pair, matching the strict ``>``).

    Output: (user_id, n_pairs) for users with at least one pair."""
    from gis_scripts_ray.stages.burst import burst_pair_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    out = burst_pair_counts(ds, "user_id", "ts", 7_200_000_000)
    return out.map_batches(
        lambda b: b.filter(pc.greater(b["n_pairs"], 0)),
        batch_format="pyarrow",
    ).sort("user_id")


def _sql_burst_pairs() -> str:
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
        "p AS (SELECT a.user_id FROM e a JOIN e b ON "
        "a.user_id = b.user_id AND b.us > a.us "
        "AND b.us <= a.us + 7200000000) "
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p "
        "GROUP BY user_id ORDER BY user_id"
    )


def q_morans_i(sf_dir: str):
    """Moran's I spatial autocorrelation over the doc-count tile grid
    (round 5) — THE classic geospatial statistic, in the exact integer
    domain: with dev_i = n·x_i − S (so x_i − x̄ = dev_i / n and every
    1/n² cancels in I), the three sufficient statistics are
    W = #adjacent ordered pairs (rook), Σ dev², and Σ_{ij adj} dev_i·dev_j
    — I = (n/W)·cross/dev_sq assembles exactly from them. The analysis
    region is the OCCUPIED cells (both engines' GROUP BY produces
    exactly those). One corpus pass builds cells; one equality
    hash-join against the 4-shifted cell table finds adjacencies (never
    a theta join); scalars ride `ds.sum`.

    Output: one row (n_cells, w_pairs, dev_sq_sum, cross_sum)."""
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = encode_cells(located_documents(sf_dir), EncodeConfig(tile_z=TILE_Z))
    cells = cell_count(ds, ["tile_x", "tile_y"], alias="x").materialize()
    n = cells.count()
    s = int(cells.sum("x") or 0)

    def dev_tbl(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tx": b["tile_x"],
                "ty": b["tile_y"],
                "dev": pa.array(n * x - s, pa.int64()),
            }
        )

    dv = cells.map_batches(dev_tbl, batch_format="pyarrow").materialize()
    dev_sq = int(
        dv.map_batches(
            lambda b: pa.table(
                {
                    "d2": pa.array(
                        b["dev"].to_numpy(zero_copy_only=False) ** 2,
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("d2")
        or 0
    )

    def shifted(b: pa.Table) -> pa.Table:
        tx = b["tx"].to_numpy(zero_copy_only=False)
        ty = b["ty"].to_numpy(zero_copy_only=False)
        dev = b["dev"].to_numpy(zero_copy_only=False)
        nx = np.concatenate([tx + 1, tx - 1, tx, tx])
        ny = np.concatenate([ty, ty, ty + 1, ty - 1])
        return pa.table(
            {
                "nx": pa.array(nx, pa.int64()),
                "ny": pa.array(ny, pa.int64()),
                "da": pa.array(np.tile(dev, 4), pa.int64()),
            }
        )

    pairs = hash_join(
        dv.map_batches(shifted, batch_format="pyarrow"),
        dv,
        on=("nx", "ny"),
        right_on=("tx", "ty"),
        num_partitions=8,
    )

    def prod(b: pa.Table) -> pa.Table:
        da = b["da"].to_numpy(zero_copy_only=False)
        db = b["dev"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": pa.array(np.ones(len(da), dtype=np.int64)),
                "cr": pa.array(da * db, pa.int64()),
            }
        )

    pp = pairs.map_batches(prod, batch_format="pyarrow").materialize()
    w_pairs = int(pp.sum("w") or 0)
    cross = int(pp.sum("cr") or 0)
    return pa.table(
        {
            "n_cells": pa.array([n], pa.int64()),
            "w_pairs": pa.array([w_pairs], pa.int64()),
            "dev_sq_sum": pa.array([dev_sq], pa.int64()),
            "cross_sum": pa.array([cross], pa.int64()),
        }
    )


def _sql_morans_i() -> str:
    x, y = _tile_sql(TILE_Z)
    return (
        _located_cte("d.doc_id")
        + f", cells AS (SELECT {x} AS tx, {y} AS ty, COUNT(*) AS x "
        "FROM located GROUP BY tx, ty), "
        "m AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM cells), "
        "dv AS (SELECT tx, ty, (SELECT n FROM m) * x - (SELECT s FROM m) "
        "AS dev FROM cells), "
        "sh AS (SELECT tx + dx AS nx, ty + dy AS ny, dev FROM dv, "
        "(VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS dirs(dx, dy)), "
        "pr AS (SELECT sh.dev AS da, dv.dev AS db FROM sh "
        "JOIN dv ON dv.tx = sh.nx AND dv.ty = sh.ny) "
        "SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_cells, "
        "CAST(COALESCE(COUNT(*), 0) AS BIGINT) AS w_pairs, "
        "(SELECT CAST(SUM(dev * dev) AS BIGINT) FROM dv) AS dev_sq_sum, "
        "CAST(COALESCE(SUM(da * db), 0) AS BIGINT) AS cross_sum FROM pr"
    )


def q_triangle_count(sf_dir: str):
    """Exact triangle count of the (undirected, deduplicated) host link
    graph (round 5) — the classic two-join formulation: canonical edges
    a < b, wedges (a,b)⋈(b,c) give a < b < c, and a second join closes
    them against (a,c). The two JoinOperators are separated by a
    ``materialize()`` (one join per streaming execution — the documented
    Ray 2.49 aggregator-CPU deadlock avoidance); edge dedup rides one
    adaptive combine. The twin is the identical three-way self-join.

    Output: one row (n_wedges, n_triangles)."""
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    nh = (_id_shift(sf_dir, "documents", "doc_id") - 1) // 16 + 1
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def canon(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        src = (d // np.uint64(16)).astype(np.int64)
        dst = (
            (d * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(nh)
        ).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        t = pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "one": pa.array(np.ones(len(a), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["a", "b"])
            .aggregate([("one", "min")])
            .rename_columns(["a", "b", "one"])
        )

    e0 = (
        coalesce_shuffle_agg(
            ds.map_batches(canon, batch_format="pyarrow"),
            ["a", "b"],
            {"one": "min"},
        )
        .map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        )
        .materialize()
    )
    right = e0.map_batches(
        lambda t: pa.table({"b2": t["a"], "c": t["b"]}),
        batch_format="pyarrow",
    )
    wedges = hash_join(
        e0, right, on="b", right_on="b2", num_partitions=8
    ).materialize()  # ONE JoinOperator per execution
    n_wedges = wedges.count()
    closer = e0.map_batches(
        lambda t: pa.table({"a2": t["a"], "c2": t["b"]}),
        batch_format="pyarrow",
    )
    closed = hash_join(
        wedges.map_batches(
            lambda t: t.select(["a", "c"]), batch_format="pyarrow"
        ),
        closer,
        on=("a", "c"),
        right_on=("a2", "c2"),
        num_partitions=8,
    )
    n_tri = closed.count()
    return pa.table(
        {
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
        }
    )


def _sql_triangle_count() -> str:
    return (
        "WITH nh AS (SELECT MAX(doc_id) // 16 + 1 AS n FROM documents), "
        "raw AS (SELECT doc_id // 16 AS src, "
        "CAST(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) "
        "% (SELECT n FROM nh) AS BIGINT) AS dst FROM documents), "
        "e0 AS (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM raw WHERE src <> dst), "
        "w AS (SELECT x.a, x.b, y.b AS c FROM e0 x "
        "JOIN e0 y ON y.a = x.b) "
        "SELECT (SELECT COUNT(*) FROM w) AS n_wedges, "
        "(SELECT COUNT(*) FROM w JOIN e0 z ON z.a = w.a AND z.b = w.c) "
        "AS n_triangles"
    )


def q_link_reciprocity(sf_dir: str):
    """Reciprocity of the directed host link graph (round 5): of all
    unordered host pairs connected in at least one direction, how many
    are connected in BOTH — the graph-health metric crawl scheduling
    reads next to PageRank. Join-free (contrast ``triangle_count``'s
    two-join plan): each directed edge maps to its canonical pair
    (lo, hi) with per-direction presence bits, an in-batch ``group_by``
    max pre-agg + ONE adaptive combine collapses the stream to distinct
    pairs (all-to-all bounded by the distinct-pair count), and the
    reciprocal flag is the product of the two bits. Same synthetic
    edge rule as ``triangle_count``/``pagerank_hosts``
    (src = doc_id//16, dst = Knuth hash mod n_hosts).

    Output: one row (n_pairs, n_reciprocal)."""
    from ray.data.aggregate import Sum

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    nh = (_id_shift(sf_dir, "documents", "doc_id") - 1) // 16 + 1
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        src = (d // np.uint64(16)).astype(np.int64)
        dst = (
            (d * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(nh)
        ).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        fwd = src < dst
        t = pa.table(
            {
                "lo": pa.array(np.minimum(src, dst)),
                "hi": pa.array(np.maximum(src, dst)),
                "h0": pa.array(fwd.astype(np.int64)),
                "h1": pa.array((~fwd).astype(np.int64)),
            }
        )
        return (
            t.group_by(["lo", "hi"])
            .aggregate([("h0", "max"), ("h1", "max")])
            .rename_columns(["lo", "hi", "h0", "h1"])
        )

    pairs = coalesce_shuffle_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lo", "hi"],
        {"h0": "max", "h1": "max"},
    ).materialize()

    def flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "recip": pc.multiply(batch["h0"], batch["h1"]),
            }
        )

    row = pairs.map_batches(flag, batch_format="pyarrow").aggregate(
        Sum("one"), Sum("recip")
    )
    return pa.table(
        {
            "n_pairs": pa.array([int(row["sum(one)"])], pa.int64()),
            "n_reciprocal": pa.array([int(row["sum(recip)"])], pa.int64()),
        }
    )


def _sql_link_reciprocity() -> str:
    return (
        "WITH nh AS (SELECT MAX(doc_id) // 16 + 1 AS n FROM documents), "
        "raw AS (SELECT doc_id // 16 AS src, "
        "CAST(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) "
        "% (SELECT n FROM nh) AS BIGINT) AS dst FROM documents), "
        "p AS (SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi, "
        "MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS h0, "
        "MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS h1 "
        "FROM raw WHERE src <> dst GROUP BY 1, 2) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(h0 * h1) AS BIGINT) AS n_reciprocal FROM p"
    )


def q_frequent_pairs(sf_dir: str):
    """Apriori k=2 frequent token pairs (round 5): pairs of tokens
    co-occurring in at least n_docs // 5 documents —
    ``stages/itemsets.frequent_token_pairs`` (distinct-per-doc document
    frequencies, measured-broadcast frequent set, per-size
    ``triu_indices`` pair expansion, adaptive combine). The twin is the
    definitional distinct-unnest self-join with HAVING.

    Output: (w1, w2, support), w1 < w2, support >= minsup."""
    import pyarrow.parquet as pq

    from gis_scripts_ray.stages.itemsets import frequent_token_pairs

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return frequent_token_pairs(ds, "doc_id", "text", n_docs // 5)


def _sql_frequent_pairs() -> str:
    return (
        "WITH ms AS (SELECT COUNT(*) // 5 AS m FROM documents), "
        "d AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "df AS (SELECT w, COUNT(*) AS c FROM d GROUP BY w), "
        "f AS (SELECT w FROM df WHERE c >= (SELECT m FROM ms)), "
        "dd AS (SELECT doc_id, w FROM d WHERE w IN (SELECT w FROM f)), "
        "p AS (SELECT a.w AS w1, b.w AS w2 FROM dd a "
        "JOIN dd b ON a.doc_id = b.doc_id AND a.w < b.w) "
        "SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS support FROM p "
        "GROUP BY w1, w2 HAVING COUNT(*) >= (SELECT m FROM ms)"
    )


def q_value_outliers(sf_dir: str):
    """Per-user sigma-rule outlier counts in the exact integer domain
    (round 5): |v − μ| > 2σ evaluated as (n·v − Σ)² > 4·(n·Σv² − Σ²) —
    no float ever computed, so the flag is bit-reproducible and fully
    twinnable. ``stages/outliers.sigma_outlier_counts``: mergeable
    moments + adaptive (worker-map broadcast / hash-join) delivery back
    to the event stream. Money cents via half-away ROUND.

    Output: (user_id, n, n_outliers) sorted."""
    from gis_scripts_ray.stages.outliers import sigma_outlier_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": batch["user_id"], "v": _cents(batch["value"])}
        )

    out = sigma_outlier_counts(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", "v", k=2
    )
    return out.map_batches(
        lambda b: pa.table(
            {"user_id": b["key"], "n": b["n"], "n_outliers": b["n_outliers"]}
        ),
        batch_format="pyarrow",
    ).sort("user_id")


def _sql_value_outliers() -> str:
    return (
        "WITH s AS (SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS v "
        "FROM events WHERE value IS NOT NULL), "
        "m AS (SELECT user_id, COUNT(*) AS n, SUM(v) AS sv, "
        "SUM(v * v) AS svv FROM s GROUP BY user_id) "
        "SELECT s.user_id, CAST(m.n AS BIGINT) AS n, "
        "CAST(COUNT(*) FILTER (WHERE "
        "(m.n * s.v - m.sv) * (m.n * s.v - m.sv) > "
        "4 * (m.n * m.svv - m.sv * m.sv)) AS BIGINT) AS n_outliers "
        "FROM s JOIN m USING (user_id) GROUP BY s.user_id, m.n "
        "ORDER BY s.user_id"
    )


def q_grouped_ols_slope(sf_dir: str):
    """Per-group OLS slope as an EXACT RATIONAL (round 5): the
    regression companion of A8's coefficient-of-variation — slope =
    (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over (x = quantity, y = price
    cents) per l_returnflag. The five moments are classic mergeable
    partials (one in-block pre-agg + one adaptive combine); the driver
    sees only per-group moment rows and finishes with PYTHON INTS
    (no int64 ceiling on the cross products), reducing num/den by gcd
    with a canonical positive-denominator convention. The twin computes
    the identical reduced fraction in HUGEINT and DuckDB's gcd().

    Output: (l_returnflag, n, slope_num, slope_den)."""
    import math

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
        y = _cents(batch["l_extendedprice"]).to_numpy()
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )
        out = t.group_by(["l_returnflag"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx")]
        )
        return out.rename_columns(
            ["l_returnflag", "n", "sx", "sy", "sxy", "sxx"]
        )

    agg = coalesce_shuffle_agg(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {c: "sum" for c in ("n", "sx", "sy", "sxy", "sxx")},
    ).to_pandas()

    flags, ns, nums, dens = [], [], [], []
    for r in agg.itertuples():
        n, sx, sy, sxy, sxx = (
            int(r.n), int(r.sx), int(r.sy), int(r.sxy), int(r.sxx),
        )
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        g = math.gcd(num, den)
        if g:
            num, den = num // g, den // g
        if den < 0:
            num, den = -num, -den
        flags.append(r.l_returnflag)
        ns.append(n)
        nums.append(num)
        dens.append(den)
    order = np.argsort(np.array(flags, dtype=object), kind="stable")
    return pa.table(
        {
            "l_returnflag": pa.array([flags[i] for i in order], pa.string()),
            "n": pa.array([ns[i] for i in order], pa.int64()),
            "slope_num": pa.array([nums[i] for i in order], pa.int64()),
            "slope_den": pa.array([dens[i] for i in order], pa.int64()),
        }
    )


def _sql_grouped_ols_slope() -> str:
    return (
        "WITH m AS (SELECT l_returnflag, COUNT(*) AS n, "
        "SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sx, "
        "SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) "
        "AS sy, "
        "SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) * "
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy, "
        "SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) * "
        "CAST(l_quantity AS BIGINT)) AS sxx "
        "FROM lineitem GROUP BY l_returnflag), "
        "f AS (SELECT l_returnflag, n, n * sxy - sx * sy AS num, "
        "n * sxx - sx * sx AS den FROM m), "
        "r AS (SELECT l_returnflag, n, "
        "CASE WHEN gcd(num, den) <> 0 THEN num // gcd(num, den) "
        "ELSE num END AS num2, "
        "CASE WHEN gcd(num, den) <> 0 THEN den // gcd(num, den) "
        "ELSE den END AS den2 FROM f) "
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
        "CAST(CASE WHEN den2 < 0 THEN -num2 ELSE num2 END AS BIGINT) "
        "AS slope_num, "
        "CAST(CASE WHEN den2 < 0 THEN -den2 ELSE den2 END AS BIGINT) "
        "AS slope_den FROM r ORDER BY l_returnflag"
    )


def q_chi_square_contingency(sf_dir: str):
    """Chi-square independence cells for the (lang, source) contingency
    table (round 5) — the categorical companion of A14's Mann-Whitney
    agreement test, in the EXACT integer domain: contribution_micro =
    (o·N − rs·cs)² · 10⁶ // (N · rs · cs) per cell. Cell/margin counts
    are distributed (one in-block pre-agg + adaptive combine); the
    contingency table itself is category-bounded, so the exact finish
    runs driver-side in PYTHON INTS (the cross products overflow int64
    at corpus scale; the twin uses HUGEINT).

    Output: (lang, source, o, contrib_micro) + the margins, sorted."""
    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    cells = cell_count(ds, ["lang", "source"], alias="o").to_pandas()
    # margins from the cells (exact; the cell table is category-bounded)
    rs = cells.groupby("lang")["o"].sum().to_dict()
    cs = cells.groupby("source")["o"].sum().to_dict()
    n_tot = int(cells["o"].sum())
    cells = cells.sort_values(["lang", "source"]).reset_index(drop=True)
    contrib = [
        (int(o) * n_tot - int(rs[la]) * int(cs[so])) ** 2
        * 1_000_000
        // (n_tot * int(rs[la]) * int(cs[so]))
        for la, so, o in zip(cells["lang"], cells["source"], cells["o"])
    ]
    return pa.table(
        {
            "lang": pa.array(cells["lang"], pa.string()),
            "source": pa.array(cells["source"], pa.string()),
            "o": pa.array(cells["o"].astype(np.int64), pa.int64()),
            "contrib_micro": pa.array(contrib, pa.int64()),
        }
    )


def _sql_chi_square_contingency() -> str:
    return (
        "WITH c AS (SELECT lang, source, COUNT(*) AS o FROM documents "
        "GROUP BY lang, source), "
        "r AS (SELECT lang, SUM(o) AS rs FROM c GROUP BY lang), "
        "s AS (SELECT source, SUM(o) AS cs FROM c GROUP BY source), "
        "n AS (SELECT SUM(o) AS nt FROM c), "
        "d AS (SELECT c.lang, c.source, c.o, "
        "CAST(c.o AS HUGEINT) * nt - rs * cs AS dev, "
        "CAST(nt AS HUGEINT) * rs * cs AS denom "
        "FROM c JOIN r USING (lang) JOIN s USING (source) CROSS JOIN n) "
        # dev*dev, not dev ** 2: DuckDB's power operator returns DOUBLE
        "SELECT lang, source, CAST(o AS BIGINT) AS o, "
        "CAST((dev * dev * 1000000) // denom AS BIGINT) AS contrib_micro "
        "FROM d ORDER BY lang, source"
    )


def q_salient_terms(sf_dir: str):
    """Per-source salient terms (round 5): the "what is distinctive
    about this source" corpus diagnostic. Within a source, ranking by
    c_ts / c_t IS the PMI/lift ranking (the N/N_s factor is constant per
    source), so the score stays a single int64-safe floor ratio
    (ratio_ppm = c_ts * 1e6 // c_t, support c_ts >= 20). (source, token)
    and token-total counts each ride one adaptive combine; totals join
    back by ONE sized hash-join on the token (vocab-bounded); the top-5
    per source rides the distributed per-group top-k on EXACT counts,
    tie order (ratio DESC, token ASC) = the twin's ROW_NUMBER order.

    Output: (source, w, c_ts, c_t, ratio_ppm, rank), 5 rows/source."""
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(
            np.repeat(batch["source"].to_numpy(zero_copy_only=False), reps)
        )
        t = pa.table({"source": src, "w": toks.flatten()})
        out = t.group_by(["source", "w"]).aggregate([([], "count_all")])
        return out.rename_columns(["source", "w", "c_ts"])

    st = coalesce_shuffle_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["source", "w"],
        {"c_ts": "sum"},
    ).materialize()

    def tok_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"w": batch["w"], "c_t": batch["c_ts"]})
        out = t.group_by(["w"]).aggregate([("c_t", "sum")])
        return out.rename_columns(["w", "c_t"])

    tt = coalesce_shuffle_agg(
        st.map_batches(tok_partial, batch_format="pyarrow"),
        ["w"],
        {"c_t": "sum"},
    )
    joined = hash_join(
        st, tt.repartition(4), on="w", num_partitions=4
    )

    def score(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater_equal(batch["c_ts"], 20))
        c_ts = f["c_ts"].to_numpy(zero_copy_only=False)
        c_t = f["c_t"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": f["source"],
                "w": f["w"],
                "c_ts": f["c_ts"],
                "c_t": f["c_t"],
                "ratio_ppm": pa.array(c_ts * 1_000_000 // c_t, pa.int64()),
            }
        )

    top = topk_per_group(
        joined.map_batches(score, batch_format="pyarrow"),
        group_col="source",
        value_col="ratio_ppm",
        id_col="w",
        k=5,
    ).to_pandas()
    top = top.sort_values(
        ["source", "ratio_ppm", "w"], ascending=[True, False, True]
    ).reset_index(drop=True)
    src = top["source"].to_numpy()
    new = np.concatenate([[True], src[1:] != src[:-1]])
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(src)), 0))
    top["rank"] = np.arange(len(src)) - run_start + 1
    return pa.Table.from_pandas(top, preserve_index=False)


def _sql_salient_terms() -> str:
    return (
        "WITH p AS (SELECT source, unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "st AS (SELECT source, w, COUNT(*) AS c_ts FROM p "
        "GROUP BY source, w), "
        "tt AS (SELECT w, COUNT(*) AS c_t FROM p GROUP BY w), "
        "r AS (SELECT source, st.w, c_ts, c_t, "
        "c_ts * 1000000 // c_t AS ratio_ppm "
        "FROM st JOIN tt USING (w) WHERE c_ts >= 20), "
        "k AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source "
        "ORDER BY ratio_ppm DESC, w) AS rk FROM r) "
        "SELECT source, w, CAST(c_ts AS BIGINT) AS c_ts, "
        "CAST(c_t AS BIGINT) AS c_t, CAST(ratio_ppm AS BIGINT) AS ratio_ppm, "
        "CAST(rk AS BIGINT) AS rank FROM k WHERE rk <= 5"
    )


def q_hist_equalization(sf_dir: str):
    """Global histogram equalization (round 5): the exact-integer member
    of the reference's radiometric-enhancement family (piecewise stretch
    = ``stretch_breakpoints``, local matching = ``local_match``; this is
    the global-CDF remap, ``Local_Histogram_Match.R``'s global cousin).
    The value histogram is distributed (per-block pre-agg + adaptive
    combine — the ``dos_value`` machinery); the driver holds only
    (distinct value, count) rows bounded by the value DOMAIN, computes
    the standard eq(v) = (cdf(v) - cdf_min) * 255 // (n - cdf_min) LUT,
    and emits the mapping with its cell counts. Quantity convention:
    half-even ↔ CAST(double AS BIGINT).

    Output: (v, eq, n_cells) — the equalization map over the domain."""
    from gis_scripts_ray.stages.stats import value_histogram

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        q = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
        return pa.table({"v": pa.array(q, pa.int64())})

    values, counts = value_histogram(
        ds.map_batches(prep, batch_format="pyarrow"), "v"
    )
    n = int(counts.sum())
    cdf = np.cumsum(counts)
    cmin = int(cdf[0]) if len(cdf) else 0
    denom = n - cmin
    eq = (
        ((cdf - cmin) * 255) // denom
        if denom > 0
        else np.zeros(len(cdf), dtype=np.int64)
    )
    return pa.table(
        {
            "v": pa.array(values, pa.int64()),
            "eq": pa.array(eq.astype(np.int64), pa.int64()),
            "n_cells": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _sql_hist_equalization() -> str:
    return (
        "WITH q AS (SELECT CAST(l_quantity AS BIGINT) AS v FROM lineitem), "
        "h AS (SELECT v, COUNT(*) AS n_cells FROM q GROUP BY v), "
        "c AS (SELECT v, n_cells, SUM(n_cells) OVER (ORDER BY v) AS cdf "
        "FROM h), "
        "m AS (SELECT (SELECT MIN(cdf) FROM c) AS cmin, "
        "(SELECT SUM(n_cells) FROM h) AS n) "
        "SELECT v, CAST(COALESCE(((cdf - cmin) * 255) // "
        "NULLIF(n - cmin, 0), 0) AS BIGINT) AS eq, "
        "CAST(n_cells AS BIGINT) AS n_cells FROM c, m"
    )


def q_edit_distance_hist(sf_dir: str):
    """Exact edit-distance verification over candidate near-dup pairs
    (round 5): pairs = consecutive doc_ids on the same host (doc_id//16
    — the link-graph host convention), distance =
    ``stages/editdist.levenshtein_batch`` (UTF-8 byte domain, matching
    DuckDB's ``levenshtein`` exactly — the twin uses the ENGINE'S OWN
    primitive, a genuinely independent implementation). One sized
    hash-join builds the pair stream; the DP kernel is vectorized
    across pairs (the only Python loop is over byte positions).

    Output: (bucket = lev // 16, n_pairs, sum_lev)."""
    from gis_scripts_ray.stages.editdist import edit_distances
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def left_side(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(
            pc.bit_wise_and(b["doc_id"], pa.scalar(15, pa.int64())), 15
        )
        f = b.filter(keep)
        return pa.table(
            {"k": f["doc_id"], "text_a": f["text"]}
        )

    def right_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.subtract(b["doc_id"], pa.scalar(1, pa.int64())),
                "text_b": b["text"],
            }
        )

    pairs = hash_join(
        ds.map_batches(left_side, batch_format="pyarrow"),
        ds.map_batches(right_side, batch_format="pyarrow"),
        on="k",
        num_partitions=16,
    )
    scored = edit_distances(pairs, "text_a", "text_b", out_col="lev")

    def partial(b: pa.Table) -> pa.Table:
        lev = b["lev"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "bucket": pa.array(lev // 16, pa.int64()),
                "n_pairs": pa.array(np.ones(len(lev), dtype=np.int64)),
                "sum_lev": pa.array(lev, pa.int64()),
            }
        )
        return (
            t.group_by(["bucket"])
            .aggregate([("n_pairs", "sum"), ("sum_lev", "sum")])
            .rename_columns(["bucket", "n_pairs", "sum_lev"])
        )

    return coalesce_shuffle_agg(
        scored.map_batches(partial, batch_format="pyarrow"),
        ["bucket"],
        {"n_pairs": "sum", "sum_lev": "sum"},
    )


def _sql_edit_distance_hist() -> str:
    return (
        "WITH p AS (SELECT levenshtein(d1.text, d2.text) AS lev "
        "FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1 "
        "WHERE d1.doc_id % 16 <> 15) "
        "SELECT lev // 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(lev) AS BIGINT) AS sum_lev FROM p GROUP BY bucket"
    )


def q_part_skyline(sf_dir: str):
    """Pareto skyline of parts (round 5): minimize (price_cents, p_size)
    — ``stages/skyline.py``'s self-reducing bounded-coalesce plan (per-
    block sweep, re-sweep merged frontiers, measured single-block
    finish). The twin is the DEFINITIONAL quadratic NOT EXISTS dominance
    query — deliberately not a re-implementation of the sweep — so the
    kernel's dominance rule (<= both, strict somewhere; equal points
    coexist) is pinned semantically. Money in cents (half-away ROUND).

    Output: (p_partkey, price_cents, p_size), the frontier rows."""
    from gis_scripts_ray.stages.skyline import skyline_2d

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "price_cents": _cents(batch["p_retailprice"]),
                "p_size": pc.cast(batch["p_size"], pa.int64()),
            }
        )

    return skyline_2d(
        ds.map_batches(prep, batch_format="pyarrow"), "price_cents", "p_size"
    )


def _sql_part_skyline() -> str:
    return (
        "WITH pts AS (SELECT p_partkey, "
        "CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents, "
        "CAST(p_size AS BIGINT) AS p_size FROM part) "
        "SELECT a.p_partkey, a.price_cents, a.p_size FROM pts a "
        "WHERE NOT EXISTS (SELECT 1 FROM pts b "
        "WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size "
        "AND (b.price_cents < a.price_cents OR b.p_size < a.p_size))"
    )


def q_bigram_collocations(sf_dir: str):
    """Top-50 bigram collocations with exact integer lift (round 5): the
    PMI-style corpus-statistics pass of an LLM data pipeline, kept in
    the exact integer domain (lift_micro = pair_n * N * 1e6 //
    (w1_n * w2_n) — the log is monotone, so ranking by lift needs no
    floats). ONE pass emits union-typed partials (kind 0 = bigram pair,
    kind 1 = unigram) so pairs and unigrams share a single adaptive
    combine; the global top-50 rides the distributed top-k (pair counts
    are EXACT before selection — per-block top-k over partial counts
    would be wrong); only the ≤50 winners and their ≤100 unigram rows
    ever reach the driver. Tie order (n DESC, w1, w2) matches the
    concatenated-key order because ' ' sorts below every token char.

    Output: (w1, w2, pair_n, w1_n, w2_n, lift_micro) — 50 rows."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        vals = toks.flatten()
        offs = toks.offsets.to_numpy()
        n_v = len(vals)
        mask = np.ones(max(n_v - 1, 0), dtype=bool)
        ends = offs[1:] - 1
        mask[ends[(ends >= 0) & (ends < n_v - 1)]] = False
        w1 = vals.slice(0, max(n_v - 1, 0)).filter(pa.array(mask))
        w2 = vals.slice(1, max(n_v - 1, 0)).filter(pa.array(mask))
        pairs = pa.table(
            {
                "kind": pa.array(np.zeros(len(w1), dtype=np.int64)),
                "w1": w1,
                "w2": w2,
            }
        )
        unis = pa.table(
            {
                "kind": pa.array(np.ones(n_v, dtype=np.int64)),
                "w1": vals,
                "w2": pa.array([""] * n_v, pa.string()),
            }
        )
        both = pa.concat_tables([pairs, unis])
        out = (
            both.group_by(["kind", "w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["kind", "w1", "w2", "n"])

    agg = coalesce_shuffle_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["kind", "w1", "w2"],
        {"n": "sum"},
    ).materialize()

    def pairs_only(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["kind"], 0))
        key = pc.binary_join_element_wise(f["w1"], f["w2"], " ")
        return pa.table(
            {
                "g": pa.array(np.zeros(f.num_rows, dtype=np.int64)),
                "pair": key,
                "w1": f["w1"],
                "w2": f["w2"],
                "n": f["n"],
            }
        )

    top = topk_per_group(
        agg.map_batches(pairs_only, batch_format="pyarrow"),
        group_col="g",
        value_col="n",
        id_col="pair",
        k=50,
    ).to_pandas()
    top = top.sort_values(["n", "pair"], ascending=[False, True]).reset_index(
        drop=True
    )

    words = sorted(set(top["w1"]) | set(top["w2"]))
    words_ref = ray.put(pa.array(words, pa.string()))

    def uni_hits(b: pa.Table, _ref=words_ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        f = b.filter(pc.equal(b["kind"], 1))
        f = f.filter(pc.is_in(f["w1"], value_set=worker_broadcast(_ref)))
        return pa.table({"w": f["w1"], "n_w": f["n"]})

    uni = agg.map_batches(uni_hits, batch_format="pyarrow").to_pandas()
    def uni_sum(b: pa.Table) -> pa.Table:
        s = pc.sum(b.filter(pc.equal(b["kind"], 1))["n"]).as_py() or 0
        return pa.table({"t": pa.array([s], pa.int64())})

    n_total = int(agg.map_batches(uni_sum, batch_format="pyarrow").sum("t"))
    n_of = dict(zip(uni["w"], uni["n_w"].astype(int)))
    w1n = [int(n_of[w]) for w in top["w1"]]
    w2n = [int(n_of[w]) for w in top["w2"]]
    lift = [
        int(p) * n_total * 1_000_000 // (a * b)
        for p, a, b in zip(top["n"], w1n, w2n)
    ]
    return pa.table(
        {
            "w1": pa.array(top["w1"], pa.string()),
            "w2": pa.array(top["w2"], pa.string()),
            "pair_n": pa.array(top["n"].astype(np.int64), pa.int64()),
            "w1_n": pa.array(w1n, pa.int64()),
            "w2_n": pa.array(w2n, pa.int64()),
            "lift_micro": pa.array(lift, pa.int64()),
        }
    )


def _sql_bigram_collocations() -> str:
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "p AS (SELECT doc_id, unnest(toks) AS w, "
        "unnest(range(1, len(toks) + 1)) AS pos FROM t), "
        "b AS (SELECT a.w AS w1, c.w AS w2 FROM p a "
        "JOIN p c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1), "
        "pc2 AS (SELECT w1, w2, COUNT(*) AS pair_n FROM b GROUP BY w1, w2), "
        "uc AS (SELECT w, COUNT(*) AS n_w FROM p GROUP BY w), "
        "nn AS (SELECT COUNT(*) AS n FROM p), "
        "top AS (SELECT * FROM pc2 ORDER BY pair_n DESC, w1, w2 LIMIT 50) "
        "SELECT top.w1, top.w2, CAST(top.pair_n AS BIGINT) AS pair_n, "
        "CAST(u1.n_w AS BIGINT) AS w1_n, CAST(u2.n_w AS BIGINT) AS w2_n, "
        "CAST((CAST(top.pair_n AS HUGEINT) * (SELECT n FROM nn) * 1000000) "
        "// (CAST(u1.n_w AS HUGEINT) * u2.n_w) AS BIGINT) AS lift_micro "
        "FROM top JOIN uc u1 ON u1.w = top.w1 JOIN uc u2 ON u2.w = top.w2 "
        "ORDER BY pair_n DESC, top.w1, top.w2"
    )


def q_retention_cohorts(sf_dir: str):
    """Retention-cohort triangle (round 5): cohort = a user's first
    activity week (epoch-week of MIN(ts)); for every (cohort_week,
    weeks_since_cohort) cell, the EXACT count of distinct active users.
    Plan: per-user first-timestamp via in-block partial + adaptive
    combine; the (user -> first_us) table is delivered back to the event
    stream adaptively on its MEASURED size (worker-built searchsorted
    map below the broadcast limit — the ``graphcc`` delivery — else one
    hash-join); the distinct count rides
    ``stats.grouped_count_distinct`` (all-to-all bounded by distinct
    (cell, user) pairs, never event rows). Weeks are integer floor
    divisions of nonnegative epoch micros — exact in both engines.

    Output: (cohort_wk, wk_off, n_users) sorted."""
    from gis_scripts_ray.stages.graphcc import _build_label_map
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.stats import grouped_count_distinct
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    week = 3_600_000_000  # cohort grain: one hour
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def first_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "first_us": pc.cast(batch["ts"], pa.int64()),
            }
        )
        return (
            t.group_by(["user_id"])
            .aggregate([("first_us", "min")])
            .rename_columns(["user_id", "first_us"])
        )

    firsts = coalesce_shuffle_agg(
        ds.map_batches(first_partial, batch_format="pyarrow"),
        ["user_id"],
        {"first_us": "min"},
    ).materialize()

    if firsts.count() <= 2_000_000:
        refs = [
            br
            for bundle in firsts.map_batches(
                lambda b: pa.table(
                    {"node": b["user_id"], "label": b["first_us"]}
                ),
                batch_format="pyarrow",
            )
            .materialize()
            .iter_internal_ref_bundles()
            for br in bundle.block_refs
        ]
        map_ref = _build_label_map.remote(*refs)

        def tag(batch: pa.Table, _ref=map_ref) -> pa.Table:
            from gis_scripts_ray.state.broadcast import worker_broadcast

            keys, firsts_np = worker_broadcast(_ref)
            uid = batch["user_id"].to_numpy(zero_copy_only=False)
            us = pc.cast(batch["ts"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            fu = firsts_np[np.searchsorted(keys, uid)]
            cohort = fu // week
            return pa.table(
                {
                    "cohort_wk": pa.array(cohort, pa.int64()),
                    "wk_off": pa.array(us // week - cohort, pa.int64()),
                    "user_id": batch["user_id"],
                }
            )

        tagged = ds.map_batches(tag, batch_format="pyarrow")
    else:
        joined = hash_join(
            ds.map_batches(
                lambda b: pa.table(
                    {
                        "user_id": b["user_id"],
                        "us": pc.cast(b["ts"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            firsts.repartition(16),
            on="user_id",
            num_partitions=16,
        )

        def tag_joined(batch: pa.Table) -> pa.Table:
            fu = batch["first_us"].to_numpy(zero_copy_only=False)
            us = batch["us"].to_numpy(zero_copy_only=False)
            cohort = fu // week
            return pa.table(
                {
                    "cohort_wk": pa.array(cohort, pa.int64()),
                    "wk_off": pa.array(us // week - cohort, pa.int64()),
                    "user_id": batch["user_id"],
                }
            )

        tagged = joined.map_batches(tag_joined, batch_format="pyarrow")

    out = grouped_count_distinct(
        tagged, ["cohort_wk", "wk_off"], "user_id", out_col="n_users"
    )
    return out.sort(["cohort_wk", "wk_off"])


def _sql_retention_cohorts() -> str:
    return (
        "WITH f AS (SELECT user_id, MIN(epoch_us(ts)) AS first_us "
        "FROM events GROUP BY user_id), "
        "w AS (SELECT e.user_id, f.first_us // 3600000000 AS cohort_wk, "
        "epoch_us(e.ts) // 3600000000 - f.first_us // 3600000000 "
        "AS wk_off FROM events e JOIN f USING (user_id)) "
        "SELECT cohort_wk, wk_off, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM w GROUP BY cohort_wk, wk_off ORDER BY cohort_wk, wk_off"
    )


def q_interval_coverage(sf_dir: str):
    """Per-user interval-union coverage (round 5): each event becomes an
    interval [ts, ts + (event_id % 9 + 1) * 5e9 us] (durations straddle
    the measured median inter-event gap, so islands genuinely merge);
    ``stages/intervals.py`` merges per-block partials then one bucketed
    final sweep. The twin is the classic gaps-and-islands window stack
    (running MAX(e) OVER 1 PRECEDING, strict > for a new island), so the
    merge rule — touching intervals coalesce — is value-hash pinned.

    Output: (user_id, n_intervals, n_islands, covered)."""
    from gis_scripts_ray.stages.intervals import interval_coverage

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def iv(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        dur = (eid % 9 + 1) * 5_000_000_000
        return pa.table(
            {
                "user_id": batch["user_id"],
                "s": pa.array(us, pa.int64()),
                "e": pa.array(us + dur, pa.int64()),
            }
        )

    return interval_coverage(
        ds.map_batches(iv, batch_format="pyarrow"), "user_id", "s", "e"
    )


def _sql_interval_coverage() -> str:
    return (
        "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
        "epoch_us(ts) + (event_id % 9 + 1) * 5000000000 AS e FROM events), "
        "m AS (SELECT user_id, s, e, MAX(e) OVER (PARTITION BY user_id "
        "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        "AS pm FROM iv), "
        "g2 AS (SELECT user_id, s, e, CASE WHEN pm IS NULL OR s > pm "
        "THEN 1 ELSE 0 END AS is_new FROM m), "
        "isl AS (SELECT user_id, s, e, SUM(is_new) OVER (PARTITION BY "
        "user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island FROM g2), "
        "per AS (SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me, "
        "COUNT(*) AS cnt FROM isl GROUP BY user_id, island) "
        "SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_intervals, "
        "CAST(COUNT(*) AS BIGINT) AS n_islands, "
        "CAST(SUM(me - ms) AS BIGINT) AS covered "
        "FROM per GROUP BY user_id"
    )


def q_sessionize(sf_dir: str):
    from gis_scripts_ray.stages.windows import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    return sessionize(ds, "user_id", "ts", "event_id", _SESSION_GAP_US)


def _sql_sessionize() -> str:
    return (
        "WITH marked AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
        "CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL "
        f"OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_SESSION_GAP_US} "
        "THEN 1 ELSE 0 END AS is_new FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT user_id, us, SUM(is_new) OVER "
        "(PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_id "
        "FROM marked) "
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us "
        "FROM sess GROUP BY user_id, session_id"
    )


def q_sliding_value_sum(sf_dir: str):
    """1-hour windows sliding by 15 min over event value micros."""
    from gis_scripts_ray.stages.windows import sliding_window_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "ts": batch["ts"],
                "value_micros": _micros(batch["value"]),
            }
        )

    return sliding_window_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type",
        "ts",
        "value_micros",
        window_us=3_600_000_000,
        slide_us=900_000_000,
    )


def _sql_sliding_value_sum() -> str:
    return (
        "WITH hops AS (SELECT i AS h FROM range(4) t(i)), "
        "e AS (SELECT event_type, epoch_us(ts) AS us, "
        "CAST(ROUND(value*1000000) AS BIGINT) AS vm FROM events) "
        "SELECT event_type, window_start_us, "
        "CAST(SUM(vm) AS BIGINT) AS sum_value_micros, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM (SELECT event_type, vm, {_sql_floordiv('us', 900000000)}*900000000 - h*900000000 AS window_start_us, us "
        "FROM e, hops) WHERE us < window_start_us + 3600000000 "
        "GROUP BY event_type, window_start_us"
    )


def q_order_lineitem_revenue(sf_dir: str):
    """Large x large hash-partitioned equi-join (lineitem x orders on
    orderkey), revenue per order priority — exact integer micro-cents:
    ``price_cents * (100 - discount_pct)``."""
    from gis_scripts_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"]).to_numpy()
        disc_pct = _round_half_away(batch["l_discount"].to_numpy() * 100.0).astype(np.int64)
        rev = price_c * (100 - disc_pct)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev_microcents": pa.array(rev, pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_join(
        li.map_batches(prep_li, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    )
    return cell_sum_count(joined, ["o_orderpriority"], ["rev_microcents"])


def _sql_order_lineitem_revenue() -> str:
    return (
        "SELECT o_orderpriority, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_rev_microcents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority"
    )


_STRETCH_SPEC = {"10%": 0.0, "50%": 0.5, "90%": 1.0}


def q_stretch_breakpoints(sf_dir: str):
    """M4/A11 two-pass stretch: resolved percentile breakpoints + the count
    of rows at or below each source breakpoint (exact ints)."""
    from gis_scripts_ray.stages.stretch import stretch_column

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    _, bps = stretch_column(ds, "l_quantity", _STRETCH_SPEC)
    srcs = sorted(bps)
    n_le = []
    for s in srcs:
        n_le.append(
            ds.map_batches(
                lambda b, _s=s: b.filter(pc.less_equal(b["l_quantity"], _s)),
                batch_format="pyarrow",
            ).count()
        )
    return pa.table(
        {
            "src_value": pa.array(srcs, pa.float64()),
            "dst_value": pa.array([bps[s] for s in srcs], pa.float64()),
            "n_le": pa.array(n_le, pa.int64()),
        }
    )


def _sql_stretch_breakpoints() -> str:
    parts = []
    for spec_key, dst in sorted(_STRETCH_SPEC.items(), key=lambda kv: float(kv[0][:-1])):
        q = float(spec_key[:-1]) / 100.0
        parts.append(
            f"SELECT quantile_cont(l_quantity, {q}) AS src_value, "
            f"CAST({dst} AS DOUBLE) AS dst_value, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem "
            f"WHERE l_quantity <= (SELECT quantile_cont(l_quantity, {q}) FROM lineitem)) AS n_le "
            f"FROM lineitem"
        )
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# SQL twins for the geo cell packings (round-2: moved from rows-only to
# full oracle rows — the hex axial transform and the S2 Morton packing are
# spelled out in exact-arithmetic SQL)
# ---------------------------------------------------------------------------


def _sql_round_half_even(x: str) -> str:
    """DuckDB expression for numpy's banker's rounding of ``x``.

    DuckDB ROUND is half-away-from-zero; exact halves are overridden:
    floor even -> floor, floor odd -> floor + 1 (correct for negatives
    too: -2.5 -> floor -3 odd -> -2 == np.round(-2.5))."""
    return (
        f"CASE WHEN ({x}) - FLOOR({x}) = 0.5 THEN "
        f"CASE WHEN CAST(FLOOR({x}) AS BIGINT) % 2 = 0 THEN FLOOR({x}) "
        f"ELSE FLOOR({x}) + 1.0 END ELSE ROUND({x}) END"
    )


def _sql_hex_cell_counts(res: int = 6) -> str:
    """Axial hex binning with exact cube rounding, matching
    functions/geo.py lonlat_to_hex_cell op for op (constants embedded via
    repr for bit-identity)."""
    from gis_scripts_ray.functions import geo

    s = repr(float(geo.hex_edge_deg(res)))
    c1 = repr(float(np.sqrt(3.0) / 3.0))
    c2 = repr(float(2.0 / 3.0))
    off = 1 << 26  # _HEX_COORD_OFFSET
    res_term = res << 54
    return (
        _located_cte("d.doc_id")
        + f", hex1 AS (SELECT ({c1}*lon - lat/3.0)/{s} AS qf, "
        f"({c2}*lat)/{s} AS rf FROM located), "
        "hex2 AS (SELECT qf, rf, -qf-rf AS sf FROM hex1), "
        f"hex3 AS (SELECT qf, rf, sf, {_sql_round_half_even('qf')} AS q0, "
        f"{_sql_round_half_even('rf')} AS r0, {_sql_round_half_even('sf')} AS s0 FROM hex2), "
        "hex4 AS (SELECT "
        "CASE WHEN ABS(q0-qf) > ABS(r0-rf) AND ABS(q0-qf) > ABS(s0-sf) "
        "THEN -r0-s0 ELSE q0 END AS q, "
        "CASE WHEN NOT (ABS(q0-qf) > ABS(r0-rf) AND ABS(q0-qf) > ABS(s0-sf)) "
        "AND ABS(r0-rf) > ABS(s0-sf) THEN -q0-s0 ELSE r0 END AS r FROM hex3) "
        f"SELECT CAST({res_term} + (CAST(q AS BIGINT)+{off})*134217728 "
        f"+ (CAST(r AS BIGINT)+{off}) AS BIGINT) AS hex_cell, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM hex4 GROUP BY hex_cell"
    )


def _sql_s2_cell_counts(level: int = 10) -> str:
    """S2-style cell id (face + quadratic ST + Morton position) in exact
    SQL, matching functions/geo.py lonlat_to_s2_cell + the engine's
    uint64 -> int64 wrap-cast."""
    rad = "(PI()/180.0)"
    # quadratic ST projection, same op order as geo._uv_to_st
    def st(u: str) -> str:
        return (
            f"CASE WHEN {u} >= 0.0 THEN 0.5*SQRT(1.0 + 3.0*ABS({u})) "
            f"ELSE 1.0 - 0.5*SQRT(1.0 + 3.0*ABS({u})) END"
        )

    n30 = 1 << 30
    shift = 1 << (30 - level)  # i30 -> i_level truncation divisor
    # morton interleave of the level-bit i/j
    terms = []
    for k in range(level):
        terms.append(f"((i10//{1 << k})%2)*{1 << (2 * k)}")
        terms.append(f"((j10//{1 << k})%2)*{1 << (2 * k + 1)}")
    morton = " + ".join(terms)
    pos_shift = 2 * (30 - level) + 1  # morton bits sit above the trailing 1
    lsb = 1 << (2 * (30 - level))
    return (
        _located_cte("d.doc_id")
        + f", xyz AS (SELECT COS(lat*{rad})*COS(lon*{rad}) AS x, "
        f"COS(lat*{rad})*SIN(lon*{rad}) AS y, SIN(lat*{rad}) AS z FROM located), "
        "fuv AS (SELECT CASE "
        "WHEN ABS(x) >= ABS(y) AND ABS(x) >= ABS(z) THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END "
        "WHEN ABS(y) >= ABS(z) THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END "
        "ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS face, x, y, z FROM xyz), "
        "uv AS (SELECT face, "
        "CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z "
        "WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u, "
        "CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z "
        "WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v FROM fuv), "
        f"ij AS (SELECT face, "
        f"LEAST(GREATEST(CAST(FLOOR(({st('u')})*{n30}.0) AS BIGINT), 0), {n30 - 1}) AS i, "
        f"LEAST(GREATEST(CAST(FLOOR(({st('v')})*{n30}.0) AS BIGINT), 0), {n30 - 1}) AS j "
        "FROM uv), "
        f"lvl AS (SELECT face, i//{shift} AS i10, j//{shift} AS j10 FROM ij), "
        f"cid AS (SELECT CAST(face AS HUGEINT)*2305843009213693952 "
        f"+ CAST({morton} AS HUGEINT)*{1 << pos_shift} + {lsb} AS c FROM lvl) "
        "SELECT CAST(CASE WHEN c >= 9223372036854775808 "
        "THEN c - 18446744073709551616 ELSE c END AS BIGINT) AS s2_cell, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM cid GROUP BY s2_cell"
    )


def _sql_knn_cell_ring() -> str:
    """knn_cell_ring is exact-equal to brute-force kNN (proven by the
    coverage bound + tests) — the SQL twin checks the RESULT via the same
    haversine ROW_NUMBER as geo_knn, at the ring query's probe site."""
    plat, plon = site_locations()
    hav = _HAVERSINE_SQL.format(plat=repr(float(plat[3])), plon=repr(float(plon[3])))
    return (
        _located_cte("d.doc_id")
        + f" SELECT doc_id, knn_rank FROM (SELECT doc_id, CAST(ROW_NUMBER() OVER "
        f"(ORDER BY {hav} ASC, doc_id ASC) AS BIGINT) AS knn_rank FROM located) "
        f"WHERE knn_rank <= 15"
    )


def _idw_probes() -> tuple[np.ndarray, np.ndarray]:
    """The 16 z4-tile-center probes of q_idw_grid (shared with the SQL twin)."""
    from gis_scripts_ray.functions import geo

    plat0, plon0 = site_locations()
    x0, y0 = geo.lonlat_to_tile(
        np.array([float(plon0[0])]), np.array([float(plat0[0])]), 4
    )
    xs, ys = np.meshgrid(np.arange(4) + x0[0] - 1, np.arange(4) + y0[0] - 1)
    lon_min, lat_min, lon_max, lat_max = geo.tile_bounds(4, xs.ravel(), ys.ravel())
    return (lat_min + lat_max) / 2.0, (lon_min + lon_max) / 2.0


def _sql_idw_grid(k: int = 8) -> str:
    """IDW interpolation twin: per probe, the k nearest rows by
    (haversine, doc_id) — identical tie semantics to knn_multi_brute —
    then sum(v/d^2)/sum(1/d^2) (zero-distance rows take the plain mean).
    Float caveat: the 8-term sums may differ from numpy in the last ulp
    under a different addition order; the r4 rounding absorbs it."""
    plats, plons = _idw_probes()
    values = ", ".join(
        f"({i}, {repr(float(la))}, {repr(float(lo))})"
        for i, (la, lo) in enumerate(zip(plats, plons))
    )
    hav = _HAVERSINE_SQL.format(plat="plat", plon="plon")
    return (
        _located_cte("d.doc_id, d.n_chars")
        + f", probes(p, plat, plon) AS (VALUES {values}), "
        f"ranked AS (SELECT p, n_chars, {hav} AS dm, "
        f"ROW_NUMBER() OVER (PARTITION BY p ORDER BY {hav} ASC, doc_id ASC) AS rn "
        "FROM located, probes), "
        f"sel AS (SELECT p, CAST(n_chars AS DOUBLE) AS v, dm FROM ranked WHERE rn <= {k}) "
        "SELECT CAST(p AS BIGINT) AS probe, "
        # np.round(x, 4) is half-even at the 4th digit — mirror it exactly
        # (ADVICE r2): scale by 1e4, banker's-round, scale back
        "(" + _sql_round_half_even(
            "(CASE WHEN SUM(CASE WHEN dm <= 0 THEN 1 ELSE 0 END) > 0 "
            "THEN SUM(CASE WHEN dm <= 0 THEN v END)/SUM(CASE WHEN dm <= 0 THEN 1.0 END) "
            "ELSE SUM(v/(dm*dm))/SUM(1.0/(dm*dm)) END)*10000.0"
        ) + ")/10000.0 AS idw_r4, "
        "CAST(COUNT(*) AS BIGINT) AS n_neighbors FROM sel GROUP BY p"
    )


def _sql_segment_replace() -> str:
    """Connected components as SQL: recursive label propagation (a cell
    reaches every label in its 8-connected component; MIN over reached
    labels == the engine's min-packed-cell canonical label), then dense
    rank — exactly q_segment_replace's output."""
    x, y = _tile_sql(4)
    return (
        "WITH RECURSIVE "
        + _located_cte("d.doc_id")[len("WITH ") :]
        + f", cells AS (SELECT tile_x AS x, tile_y AS y, COUNT(*) AS n FROM "
        f"(SELECT {x} AS tile_x, {y} AS tile_y FROM located) GROUP BY x, y), "
        "reach(x, y, l) AS ("
        "SELECT x, y, x*4294967296 + y FROM cells "
        "UNION "
        "SELECT c.x, c.y, r.l FROM reach r JOIN cells c "
        "ON ABS(c.x - r.x) <= 1 AND ABS(c.y - r.y) <= 1), "
        "comp AS (SELECT x, y, MIN(l) AS root FROM reach GROUP BY x, y), "
        "agg AS (SELECT root, CAST(COUNT(*) AS BIGINT) AS n_tiles, "
        "CAST(SUM(c.n) AS BIGINT) AS n_docs FROM comp JOIN cells c USING (x, y) "
        "GROUP BY root) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY root) - 1 AS BIGINT) AS component, "
        "n_tiles, n_docs FROM agg"
    )


def _sql_multimodal_decode() -> str:
    """Routing oracle for the decode stage's metadata columns: every
    payload derived from documents is html (sniffed by magic bytes), and
    payload bytes = octet_length(text) + 26 wrapper bytes. The decode
    KERNEL itself is oracle-checked by multimodal_thumbnails."""
    return (
        "SELECT 'html' AS media_type, "
        "CAST(SUM(octet_length(encode(text)) + 26) AS BIGINT) AS sum_payload_bytes, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM documents"
    )


def _sql_langid_pred_counts() -> str:
    """The heuristic classifier spelled in SQL: RE2 ``[\\p{L}\\p{N}_']+``
    tokens (== Python ``[\\w']+`` for word characters), first-200 marker
    hits per language via list_filter, CJK ratio via regexp_replace, and
    the first-max CASE reproducing the dict-order tie-break. Validated
    row-exact against LangIdScorer.classify on both SFs + edge fixtures."""
    from gis_scripts_ray.stages.textstages import _LANG_MARKERS

    def marker_col(lang: str) -> str:
        ws = ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang]))
        return f"len(list_filter(wl[1:200], w -> w IN ({ws}))) AS h_{lang}"

    langs = list(_LANG_MARKERS)
    cols = ", ".join(marker_col(lang) for lang in langs)
    g = "GREATEST(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN h_{lang} = {g} THEN '{lang}'" for lang in langs)
    return (
        "WITH w AS (SELECT lang, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}_'']+') AS wl, "
        "length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk, "
        "length(text) AS nch FROM documents), "
        f"h AS (SELECT lang, len(wl) AS nw, cjk, nch, {cols} FROM w), "
        "p AS (SELECT lang, CASE WHEN nw = 0 THEN 'und' "
        "WHEN cjk > nch*0.1 THEN 'zh' "
        f"WHEN {g} = 0 THEN 'und' {case} ELSE 'und' END AS lang_pred FROM h) "
        "SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "GROUP BY lang, lang_pred"
    )


def _sql_checkpoint_resume() -> str:
    """After crash + resume, every partition's manifest row count must
    equal the true per-lang count — the resume contract is the oracle."""
    return (
        "SELECT lang AS part_key, CAST(COUNT(*) AS BIGINT) AS n_rows "
        "FROM documents GROUP BY lang"
    )


# ---------------------------------------------------------------------------
# non-SQL-expressible operators (rows-only driver check; python-oracle
# coverage lives in tests/)
# ---------------------------------------------------------------------------


def q_local_match(sf_dir: str):
    """Local histogram matching (flagship composite): per-(source, tile)
    mean of the matched value — sources pulled toward the cross-source
    reference tile map."""
    from gis_scripts_ray.pipelines.local_match import local_histogram_match

    ds = encode_cells(
        located_documents(sf_dir, ("doc_id", "source", "n_chars")),
        EncodeConfig(tile_z=4),
    )

    def prep(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        # fractional tile coords at z4 (continuous tile-space position)
        n = float(1 << 4)
        fx = (lon + 180.0) / 360.0 * n - 0.5
        rad = np.radians(lat)
        fy = (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n - 0.5
        return (
            batch.append_column("frac_x", pa.array(fx, pa.float64()))
            .append_column("frac_y", pa.array(fy, pa.float64()))
            .append_column("v", pc.cast(batch["n_chars"], pa.float64()))
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    matched = local_histogram_match(prepped, "v", "source")
    out = cell_sum_count(
        matched.select_columns(["source", "tile_x", "tile_y", "v_matched"]),
        ["source", "tile_x", "tile_y"],
        ["v_matched"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        mean = pc.divide(batch["sum_v_matched"], pc.cast(batch["n"], pa.float64()))
        return batch.drop_columns(["sum_v_matched"]).append_column(
            "mean_matched_r4", pc.round(mean, ndigits=4)
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def q_idw_grid(sf_dir: str):
    """M15 vector->raster: IDW-interpolated n_chars surface at the 16
    z4-tile centers covering the densest region (PDAL writers.gdal
    semantics: k-nearest inverse-distance-weighted aggregate per cell)."""
    from gis_scripts_ray.stages.knn import idw_interpolate

    ds = located_documents(sf_dir, ("doc_id", "n_chars"))

    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column("v", pc.cast(batch["n_chars"], pa.float64()))

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    # probes: centers of a 4x4 z4-tile window around the first site
    plats, plons = _idw_probes()
    out = idw_interpolate(prepped, plats, plons, k=8, value_col="v").to_pandas()
    out["idw_r4"] = np.round(out["idw_value"], 4)
    return pa.table(
        {
            "probe": pa.array(out["probe"].to_numpy(), pa.int64()),
            "idw_r4": pa.array(out["idw_r4"].to_numpy(), pa.float64()),
            "n_neighbors": pa.array(out["n_neighbors"].to_numpy(), pa.int64()),
        }
    )


def q_segment_replace(sf_dir: str):
    """M3 analog: DISTRIBUTED connected components over occupied z4 tiles
    (per-stripe union-find + boundary merge — stages/components.py); emit
    per-label tile counts (components smaller than min_size would be
    'replaced'). part_width=4 forces multiple stripes at z4 so the
    boundary-merge round is genuinely exercised."""
    from gis_scripts_ray.stages.components import distributed_components

    ds = encode_cells(located_documents(sf_dir), EncodeConfig(tile_z=4))
    tiles = cell_sum_count(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "tile_x": b["tile_x"],
                    "tile_y": b["tile_y"],
                    "one": pa.array(np.ones(len(b), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["tile_x", "tile_y"],
        ["one"],
    ).drop_columns(["sum_one"])
    labeled = distributed_components(tiles, connectivity=8, part_width=4).to_pandas()
    comp = (
        labeled.groupby("component")
        .agg(n_tiles=("component", "size"), n_docs=("n", "sum"))
        .reset_index()
        .sort_values("component")
        .reset_index(drop=True)
    )
    # dense-rank the canonical packed labels for a stable readable output
    return pa.table(
        {
            "component": pa.array(np.arange(len(comp), dtype=np.int64), pa.int64()),
            "n_tiles": pa.array(comp["n_tiles"].to_numpy(), pa.int64()),
            "n_docs": pa.array(comp["n_docs"].to_numpy(), pa.int64()),
        }
    )


def q_knn_cell_ring(sf_dir: str):
    """Cell-ring-pruned kNN — exact-equal to brute force (tested), but the
    pruning logic itself is not SQL-expressible."""
    from gis_scripts_ray.stages.knn import knn_cell_ring

    plat, plon = site_locations()
    ds = encode_cells(located_documents(sf_dir), EncodeConfig(hex_res=6)).materialize()
    out = knn_cell_ring(ds, float(plat[3]), float(plon[3]), 15, hex_res=6)
    return out.select(["doc_id", "rank"]).rename_columns(["doc_id", "knn_rank"])


def q_hex_cell_counts(sf_dir: str):
    """Hex (H3-style) cell binning via axial cube-rounding."""
    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = encode_cells(located_documents(sf_dir), EncodeConfig(hex_res=6))
    return cell_count(ds.select_columns(["hex_cell"]), ["hex_cell"], alias="n_docs")


def q_s2_cell_counts(sf_dir: str):
    """S2-style cell binning at level 10."""
    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = encode_cells(located_documents(sf_dir), EncodeConfig(s2_level=10))

    def to_int(batch: pa.Table) -> pa.Table:
        cells = batch["s2_cell"].to_numpy().astype(np.int64)
        return pa.table({"s2_cell": pa.array(cells, pa.int64())})

    return cell_count(
        ds.map_batches(to_int, batch_format="pyarrow"), ["s2_cell"], alias="n_docs"
    )


def q_minhash_clusters(sf_dir: str):
    """MinHash-LSH candidates over documents + an exact id-shifted copy,
    promoted to a DERIVED-INVARIANT oracle (the ``harmonize_params``
    pattern): the near-dup pair set itself has recall < 1 by design, but
    its restriction to exact-text groups is fully determined by LSH
    semantics — identical texts produce identical signatures, so every
    unordered pair within an exact-text group of the union MUST surface as
    a candidate matching in ALL ``bands`` bands. The engine columns are
    MEASURED from the real distributed candidate table (a dropped band,
    broken key fold, or lost pair diverges the value hash); the SQL twin
    derives each group's size and implied pair count from the raw table.
    Cross-group (true near-dup) candidates remain covered by the
    planted-pair/hot-group tests in tests/test_dedup.py.

    Output: one row per exact-text group —
    (group_id, g_union, n_pairs, n_pairs_full)."""
    from gis_scripts_ray.stages.dedup import minhash_lsh_candidates
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    bands = 16
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shift_id = _id_shift(sf_dir, "documents", "doc_id")

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.add(batch["doc_id"], shift_id), "text": batch["text"]}
        )

    both = ds.union(ds.map_batches(shift, batch_format="pyarrow"))
    pairs_tbl = minhash_lsh_candidates(
        both, "doc_id", "text", bands=bands, concurrency=2
    )
    # the SQL twin's C(g_union, 2) is only valid below the pipeline's
    # max_group truncation cap — make a capped bucket a LOUD failure (the
    # q_embedding_neardup guard), never a silent value-hash divergence
    assert not pc.any(pairs_tbl["capped"]).as_py(), "group exceeded max_group"

    # pair -> exact-text-group mapping WITHOUT a driver corpus map: the
    # candidate-id SET (driver-sized, same contract as the pair table
    # itself) broadcasts into ONE fused pass over the union that emits
    # (doc_id, composite text hash) for CANDIDATE ids only — corpus text
    # never leaves the workers, and the collected mapping is bounded by
    # 2x the pair count, never the corpus.
    import ray as _ray

    cand_ids = pc.unique(
        pa.concat_arrays(
            [pairs_tbl["id_a"].combine_chunks(), pairs_tbl["id_b"].combine_chunks()]
        )
    )
    cand_ref = _ray.put(cand_ids)

    def hash_rows(batch: pa.Table, ref=None) -> pa.Table:
        keep = pc.is_in(batch["doc_id"], value_set=_worker_broadcast(ref))
        b = batch.filter(keep)
        h1, h2 = _text_hash_cols(b["text"])
        return pa.table({"doc_id": b["doc_id"], "h1": h1, "h2": h2})

    idmap = both.map_batches(
        hash_rows, fn_kwargs={"ref": cand_ref}, batch_format="pyarrow"
    ).to_pandas()
    pairs = pairs_tbl.select(["id_a", "id_b", "n_bands"]).to_pandas()
    pairs = pairs.merge(
        idmap.rename(columns={"doc_id": "id_a", "h1": "h1a", "h2": "h2a"}), on="id_a"
    ).merge(
        idmap.rename(columns={"doc_id": "id_b", "h1": "h1b", "h2": "h2b"}), on="id_b"
    )
    wp = pairs[(pairs["h1a"] == pairs["h1b"]) & (pairs["h2a"] == pairs["h2b"])]
    within = (
        wp.assign(
            n_pairs=np.ones(len(wp), dtype=np.int64),
            n_pairs_full=(wp["n_bands"] == bands).to_numpy().astype(np.int64),
        )
        .groupby(["h1a", "h2a"], as_index=False)[["n_pairs", "n_pairs_full"]]
        .sum()
        .rename(columns={"h1a": "h1", "h2a": "h2"})
    )

    # per-group (group_id, size) from the ORIGINAL docs, distributed
    def grp_partial(batch: pa.Table) -> pa.Table:
        h1, h2 = _text_hash_cols(batch["text"])
        t = pa.table(
            {
                "h1": h1,
                "h2": h2,
                "group_id": batch["doc_id"],
                "gsize": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        out = t.group_by(["h1", "h2"]).aggregate(
            [("group_id", "min"), ("gsize", "sum")]
        )
        ren = {"group_id_min": "group_id", "gsize_sum": "gsize"}
        return out.rename_columns([ren.get(c, c) for c in out.column_names])

    grp = coalesce_shuffle_agg(
        ds.map_batches(grp_partial, batch_format="pyarrow"),
        ["h1", "h2"],
        {"group_id": "min", "gsize": "sum"},
    ).to_pandas()
    m = grp.merge(within, on=["h1", "h2"], how="left").sort_values("group_id")
    return pa.table(
        {
            "group_id": pa.array(m["group_id"].to_numpy().astype(np.int64), pa.int64()),
            "g_union": pa.array(2 * m["gsize"].to_numpy().astype(np.int64), pa.int64()),
            "n_pairs": pa.array(
                m["n_pairs"].fillna(0).to_numpy().astype(np.int64), pa.int64()
            ),
            "n_pairs_full": pa.array(
                m["n_pairs_full"].fillna(0).to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def _sql_minhash_clusters() -> str:
    # identical texts => identical signatures => a candidate pair in every
    # band: the within-group pair count implied by the raw table is
    # C(g_union, 2), full-band. Valid while no union group exceeds the
    # query's max_group pair-expansion cap (fixture max group is 2 docs ->
    # g_union 4 -> 6 pairs, far under 64).
    return (
        "WITH g AS (SELECT MIN(doc_id) AS group_id, COUNT(*) * 2 AS g_union "
        "FROM documents GROUP BY text) "
        "SELECT CAST(group_id AS BIGINT) AS group_id, "
        "CAST(g_union AS BIGINT) AS g_union, "
        "CAST((g_union * (g_union - 1)) // 2 AS BIGINT) AS n_pairs, "
        "CAST((g_union * (g_union - 1)) // 2 AS BIGINT) AS n_pairs_full "
        "FROM g ORDER BY group_id"
    )


def _text_hash_cols(texts) -> "tuple[pa.Array, pa.Array]":
    """Two independent 64-bit text hashes (polars xxhash, seeds 17/23) —
    a composite 128-bit exact-text group key for distributed grouping
    without shuffling text (collision odds ~n^2/2^128, the same
    hash-equality contract the decontaminate/ngram twins document)."""
    import polars as pl

    s = pl.from_arrow(texts)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    h1 = s.hash(seed=17).to_numpy().astype(np.int64)  # wrapping view
    h2 = s.hash(seed=23).to_numpy().astype(np.int64)
    return pa.array(h1, pa.int64()), pa.array(h2, pa.int64())


def _fingerprint_group_summary(
    rows_ds: ray.data.Dataset,
    shift_id: int,
    fp_col: str,
    distinct_col: str,
    aux_col: str,
) -> pa.Table:
    """Per exact-text-group summary computed DISTRIBUTED (replaces the
    round-3 driver corpus map): groups key on the composite text hash
    (``_text_hash_cols``); group_id = min ORIGINAL doc id (shifted-copy
    ids unfold in the partial), n_docs / min-aux via per-block partials
    + the adaptive combine, distinct-fingerprint counts via
    :func:`stats.grouped_count_distinct`. Only the two RESULT-SIZED
    per-group aggregates reach the driver (merged there) — never
    fingerprint rows or corpus text."""
    import pandas as pd  # noqa: F401  (module convention)

    from gis_scripts_ray.stages.stats import grouped_count_distinct
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    rows_ds = rows_ds.materialize()  # two passes share the blocks

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        base = np.where(ids >= shift_id, ids - shift_id, ids)
        t = pa.table(
            {
                "h1": batch["h1"],
                "h2": batch["h2"],
                "group_id": pa.array(base, pa.int64()),
                "n_docs": pa.array(np.ones(len(ids), dtype=np.int64)),
                aux_col: batch[aux_col],
            }
        )
        out = t.group_by(["h1", "h2"]).aggregate(
            [("group_id", "min"), ("n_docs", "sum"), (aux_col, "min")]
        )
        ren = {
            "group_id_min": "group_id",
            "n_docs_sum": "n_docs",
            f"{aux_col}_min": aux_col,
        }
        return out.rename_columns([ren.get(c, c) for c in out.column_names])

    stats = coalesce_shuffle_agg(
        rows_ds.map_batches(partial, batch_format="pyarrow"),
        ["h1", "h2"],
        {"group_id": "min", "n_docs": "sum", aux_col: "min"},
    ).to_pandas()
    nd = grouped_count_distinct(
        rows_ds.select_columns(["h1", "h2", fp_col]),
        ["h1", "h2"],
        fp_col,
        out_col=distinct_col,
    ).to_pandas()
    m = stats.merge(nd, on=["h1", "h2"]).sort_values("group_id")
    return pa.table(
        {
            c: pa.array(m[c].to_numpy().astype(np.int64), pa.int64())
            for c in ["group_id", "n_docs", distinct_col, aux_col]
        }
    )


def q_simhash_fingerprints(sf_dir: str):
    """SimHash fingerprints, promoted to a DERIVED-INVARIANT oracle: the
    64-bit fingerprints are not SQL-expressible (byte-level FNV + bit
    votes), but content-purity is — identical texts MUST simhash
    identically. The corpus is unioned with an id-shifted exact copy (the
    copies land in different blocks/workers), fingerprints computed by the
    distributed stage, and the engine reports the MEASURED distinct
    fingerprints per exact-text group (implied 1 by the SQL twin) plus the
    engine-side character count (a real varying value, SQL-checked).
    Raw fingerprint values stay covered by the bit-exactness parity tests
    (TestTextKernelParity).

    Output: (group_id, n_docs, n_distinct_sim, n_chars_text) per group."""
    from gis_scripts_ray.stages.dedup import simhash_rows

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shift_id = _id_shift(sf_dir, "documents", "doc_id")

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.add(batch["doc_id"], shift_id), "text": batch["text"]}
        )

    both = ds.union(ds.map_batches(shift, batch_format="pyarrow"))

    def rows(batch: pa.Table) -> pa.Table:
        out = simhash_rows(batch, "doc_id", "text")
        h1, h2 = _text_hash_cols(batch["text"])
        return (
            out.append_column(
                "n_chars_text", pc.cast(pc.utf8_length(batch["text"]), pa.int64())
            )
            .append_column("h1", h1)
            .append_column("h2", h2)
        )

    return _fingerprint_group_summary(
        both.map_batches(rows, batch_format="pyarrow"),
        shift_id,
        fp_col="simhash",
        distinct_col="n_distinct_sim",
        aux_col="n_chars_text",
    )


def _sql_simhash_fingerprints() -> str:
    return (
        "SELECT CAST(MIN(doc_id) AS BIGINT) AS group_id, "
        "CAST(COUNT(*) * 2 AS BIGINT) AS n_docs, "
        "CAST(1 AS BIGINT) AS n_distinct_sim, "
        "CAST(MIN(LENGTH(text)) AS BIGINT) AS n_chars_text "
        "FROM documents GROUP BY text ORDER BY group_id"
    )


def q_langid_pred_counts(sf_dir: str):
    """Heuristic language-ID stage; prediction counts per true lang."""
    from gis_scripts_ray.stages.textstages import langid_rows

    from gis_scripts_ray.stages.tile_agg import cell_count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    scored = ds.map_batches(langid_rows, batch_format="pyarrow")
    return cell_count(
        scored.select_columns(["lang", "lang_pred"]), ["lang", "lang_pred"], alias="n"
    )


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate nearest neighbors — now FULLY
    oracle-checked: the whole probe is deterministic given the seeded
    hyperplane matrix (bucket = sign bits of ``emb @ planes``, probe =
    buckets within Hamming 2, refine = exact cosine top-k), and the plane
    matrix is embeddable as SQL literals the same way the RPC term table
    and shapefile VALUES twins are. Recall < 1 versus brute force remains
    BY DESIGN — the twin reproduces the algorithm, not exhaustive search.
    Sign-flip risk audited: min |dot| over every fixture is >= 2.4e-05
    (sf0.1) vs ~1e-15 summation-order noise; top-k boundary margins are
    >= 0.003 (FIXTURES.md discipline: no decision within float noise)."""
    from gis_scripts_ray.stages.similarity import ann_lsh_topk, query_vector

    qv = query_vector(sf_dir, vec_id=0)
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = ann_lsh_topk(emb, qv, 10, dim=len(qv))
    return out.select(["vec_id", "rank"]).rename_columns(["vec_id", "ann_rank"])


def _sql_ann_lsh(dim: int = 64, n_planes: int = 12, seed: int = 42) -> str:
    """Plane weights are transcribed constants from the same public seeded
    generator the engine uses (numpy PCG64 standard_normal) — the twin
    checks the DISTRIBUTED pipeline (bucketing, Hamming-2 probe set,
    filter, exact-cosine top-k refine), like the RPC00B term-table twin."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    rows = ", ".join(
        f"({i}, {j}, {planes[i, j]!r})" for i in range(dim) for j in range(n_planes)
    )
    return (
        f"WITH planes(i, j, w) AS (VALUES {rows}), "
        "dots AS (SELECT e.vec_id, p.j, SUM(CAST(e.embedding[p.i + 1] AS DOUBLE) * p.w) AS d "
        "FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.j), "
        "buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) "
        "ELSE 0 END) AS BIGINT) AS bucket FROM dots GROUP BY vec_id), "
        "qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0), "
        "qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0), "
        "cand AS (SELECT b.vec_id FROM buckets b, qb "
        "WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 2), "
        "scored AS (SELECT c.vec_id, list_cosine_similarity(e.embedding, qv.v) AS sim "
        "FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id, qv) "
        "SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) "
        "AS ann_rank FROM scored ORDER BY sim DESC, vec_id LIMIT 10"
    )


def q_ann_ivf(sf_dir: str):
    """IVF (k-means-bucketed) approximate nearest neighbors — the second
    scale path for similarity search (recall < 1 by design; the centroid
    fit, assignment and probe are all broadcast map_batches stages)."""
    from gis_scripts_ray.stages.similarity import (
        build_ivf_index,
        ivf_query,
        query_vector,
    )

    qv = query_vector(sf_dir, vec_id=0)
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    index, cents = build_ivf_index(emb, dim=len(qv), k=8, iters=5)
    out = ivf_query(index, cents, qv, 10, nprobe=3)
    return out.select(["vec_id", "rank"]).rename_columns(["vec_id", "ann_rank"])


def q_multimodal_decode(sf_dir: str):
    """Binary-payload decode plumbing (stubbed decoder, real schema/batching)."""
    from gis_scripts_ray.sources.webpages import web_pages_from_documents
    from gis_scripts_ray.stages.multimodal import decode_media

    ds = web_pages_from_documents(sf_dir).select_columns(["url", "html", "lang"])
    decoded = decode_media(ds, concurrency=2)
    return cell_sum_count(
        decoded.select_columns(["media_type", "payload_bytes"]),
        ["media_type"],
        ["payload_bytes"],
    )


def q_multimodal_thumbnails(sf_dir: str):
    """REAL image decode end-to-end: deterministic 8x8 RGB images (pixel
    byte p of doc d = (d*7 + p) % 256) are encoded — doc_id % 3 == 0 as
    uncompressed BMP, == 1 as zlib-compressed PNG with the row filters
    cycling 0-4, == 2 as LZW-compressed GIF (interlace and local-palette
    variants cycling by doc_id) — shipped through the binary column,
    decoded by the pure-numpy BMP/PNG/GIF readers in the decode stage,
    and checksummed. The SQL twin recomputes the per-doc pixel sum in
    closed form, so any encode/decode/unfilter/LZW bug in ANY codec
    breaks the hash."""
    from gis_scripts_ray.stages.multimodal import (
        decode_media,
        encode_bmp,
        encode_gif,
        encode_png,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def make_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        p = np.arange(192, dtype=np.int64)

        def enc(d: int, img: np.ndarray) -> bytes:
            if d % 3 == 0:
                return encode_bmp(img)
            if d % 3 == 1:
                return encode_png(img)
            return encode_gif(
                img, interlace=(d % 2 == 0), local_palette=(d % 4 < 2)
            )

        blobs = [
            enc(int(d), (((int(d) * 7 + p) % 256).astype(np.uint8)).reshape(8, 8, 3))
            for d in ids
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "html": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_payload, batch_format="pyarrow")
    decoded = decode_media(payloads, payload_col="html", concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table({"lang": batch["lang"], "pixel_sum": batch["pixel_sum"]})

    return cell_sum_count(
        decoded.map_batches(slim, batch_format="pyarrow"), ["lang"], ["pixel_sum"]
    )


def _sql_multimodal_thumbnails() -> str:
    # sum_{p=0}^{191} (d7+p) % 256 with d7 = (doc_id*7) % 256:
    #   d7 <= 64 : no wrap  -> 192*d7 + 191*192/2
    #   d7 >  64 : wraps    -> sum(d7..255) + sum(0..d7-65)
    return (
        "WITH px AS (SELECT lang, (doc_id*7) % 256 AS d7 FROM documents) "
        "SELECT lang, CAST(SUM(CASE WHEN d7 <= 64 THEN 192*d7 + 18336 "
        "ELSE (255+d7)*(256-d7)//2 + (d7-65)*(d7-64)//2 END) AS BIGINT) AS sum_pixel_sum, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM px GROUP BY lang"
    )


# per-process fixture-payload memos (encode once per distinct pattern;
# see make_payload notes in q_jpeg_decode / q_mjpeg_video_sample)
_JPEG_PAYLOAD_MEMO: dict = {}
_MJPEG_PAYLOAD_MEMO: dict = {}
_MP4_PAYLOAD_MEMO: dict = {}
_MKV_PAYLOAD_MEMO: dict = {}


def q_jpeg_decode(sf_dir: str):
    """REAL baseline-JPEG decode end-to-end: each doc gets a 32x32 image
    of sixteen flat 8x8 gray blocks (block b of doc d = (d*7 + b*16) %
    256), Huffman-entropy-encoded with all-ones quant tables — chroma
    subsampling cycling 4:4:4 / 4:2:2 / 4:2:0 by doc_id and restart
    markers every 2 MCUs on odd doc_ids — shipped through the binary
    column and decoded by the pure-numpy baseline JPEG reader. Flat
    blocks under unit quantizers survive DCT->quant->IDCT EXACTLY (the
    spectra are DC-only integers and gray keeps Cb=Cr=128 through every
    subsampling mode), so the SQL twin recomputes the per-doc pixel sum
    in closed form and any Huffman/bitstream/IDCT/upsampling defect
    breaks the value hash."""
    from gis_scripts_ray.stages.multimodal import decode_media, encode_jpeg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def make_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        b16 = 16 * np.arange(16, dtype=np.int64)
        # the payload is a pure function of (d%256, d%3, d%2): the gray
        # pattern has period 256 in doc_id and the mode flags cycle — so
        # encode each of the <=1536 distinct payloads ONCE per worker
        # (fixture generation must scale like everything else; a per-doc
        # Huffman encode dominated the sf0.1 sweep probe at 9.8 s)
        memo: dict = _JPEG_PAYLOAD_MEMO
        blobs = []
        for d in ids:
            d = int(d)
            key = (d % 256, d % 3, d % 2)
            pay = memo.get(key)
            if pay is None:
                g = ((d * 7 + b16) % 256).astype(np.uint8).reshape(4, 4)
                img = np.repeat(np.repeat(g, 8, 0), 8, 1)
                pay = encode_jpeg(
                    np.repeat(img[:, :, None], 3, 2),
                    quant=1,
                    subsampling=("444", "422", "420")[d % 3],
                    restart_interval=2 if d % 2 else 0,
                )
                memo[key] = pay
            blobs.append(pay)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "html": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_payload, batch_format="pyarrow")
    decoded = decode_media(payloads, payload_col="html", concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        assert pc.all(pc.equal(batch["media_type"], "jpeg")).as_py() in (True, None)
        return pa.table({"lang": batch["lang"], "pixel_sum": batch["pixel_sum"]})

    return cell_sum_count(
        decoded.map_batches(slim, batch_format="pyarrow"), ["lang"], ["pixel_sum"]
    )


def _sql_jpeg_decode() -> str:
    # per block b in 0..15: 64 pixels x 3 channels x gray (d*7 + b*16) % 256
    return (
        "WITH per AS (SELECT d.lang, d.doc_id, "
        "SUM(192*((d.doc_id*7 + t.b*16) % 256)) AS ps "
        "FROM documents d, range(16) t(b) GROUP BY d.lang, d.doc_id) "
        "SELECT lang, CAST(SUM(ps) AS BIGINT) AS sum_pixel_sum, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY lang"
    )


def q_video_frame_sample(sf_dir: str):
    """REAL video-frame sampling end-to-end: each doc gets a deterministic
    GVID container (3 + doc_id % 4 frames; frame f's 8x8 RGB pixel byte p
    = (doc_id*7 + f*31 + p) % 256, encoded as real BMPs), the actor-pool
    ``sample_frames`` stage parses the framing, keeps every 2nd frame,
    decodes each with the pure-numpy BMP reader, and fans out one row per
    sampled frame — the SQL twin recomputes the per-frame pixel sum in
    closed form over the sampled frame indices, so any framing, stride,
    or decode bug breaks the hash.

    Output: (lang, sum_pixel_sum, n) with n = sampled frame count."""
    from gis_scripts_ray.stages.multimodal import encode_bmp, encode_gvid, sample_frames

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_video(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        p = np.arange(192, dtype=np.int64)
        blobs = []
        for d in ids:
            frames = [
                encode_bmp(
                    (((int(d) * 7 + f * 31 + p) % 256).astype(np.uint8)).reshape(8, 8, 3)
                )
                for f in range(3 + int(d) % 4)
            ]
            blobs.append(encode_gvid(frames))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "video": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_video, batch_format="pyarrow")
    sampled = sample_frames(payloads, payload_col="video", stride=2, concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table({"lang": batch["lang"], "pixel_sum": batch["pixel_sum"]})

    return cell_sum_count(
        sampled.map_batches(slim, batch_format="pyarrow"), ["lang"], ["pixel_sum"]
    )


def _sql_video_frame_sample() -> str:
    # per sampled frame fi in {0, 2, 4}, fi < 3 + doc_id % 4:
    # b = (doc_id*7 + fi*31) % 256; sum_{p=0}^{191} (b+p) % 256 =
    #   b <= 64 : 192*b + 18336 ; else (255+b)*(256-b)//2 + (b-65)*(b-64)//2
    return (
        "WITH d AS (SELECT doc_id, lang, 3 + doc_id % 4 AS nf FROM documents), "
        "f AS (SELECT d.lang, (d.doc_id*7 + r.range*31) % 256 AS b "
        "FROM d, range(0, 6, 2) r WHERE r.range < d.nf) "
        "SELECT lang, CAST(SUM(CASE WHEN b <= 64 THEN 192*b + 18336 "
        "ELSE (255+b)*(256-b)//2 + (b-65)*(b-64)//2 END) AS BIGINT) AS sum_pixel_sum, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY lang"
    )


def q_mjpeg_video_sample(sf_dir: str):
    """REAL interchange-format video end-to-end (round 5): each doc gets
    a RIFF-AVI container of (2 + doc_id % 3) Motion-JPEG frames; frame f
    is a 16x16 image of four flat 8x8 gray blocks (block b gray =
    (doc_id*13 + f*37 + b*16) % 256), Huffman-encoded at quant=1 with
    chroma subsampling cycling 4:4:4/4:2:2/4:2:0 by doc_id. The
    actor-pool ``sample_frames`` stage walks the RIFF chunks, keeps every
    2nd frame, and entropy-decodes each kept frame with the baseline JPEG
    reader. Flat blocks at quant=1 round-trip exactly, so the SQL twin
    recomputes per-frame pixel sums in closed form — any RIFF-walk,
    idx1, stride, Huffman, or IDCT defect breaks the value hash."""
    from gis_scripts_ray.stages.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        sample_frames,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_video(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        b4 = 16 * np.arange(4, dtype=np.int64)
        # container is a pure function of (d%256, d%3): frame grays have
        # period 256 in doc_id, frame count and subsampling cycle d%3 —
        # encode each distinct container once per worker (fixture
        # generation must scale; see q_jpeg_decode)
        memo: dict = _MJPEG_PAYLOAD_MEMO
        blobs = []
        for d in ids:
            d = int(d)
            key = (d % 256, d % 3)
            pay = memo.get(key)
            if pay is None:
                frames = []
                for f in range(2 + d % 3):
                    g = ((d * 13 + f * 37 + b4) % 256).astype(np.uint8).reshape(2, 2)
                    img = np.repeat(np.repeat(g, 8, 0), 8, 1)
                    frames.append(
                        encode_jpeg(
                            np.repeat(img[:, :, None], 3, 2),
                            quant=1,
                            subsampling=("444", "422", "420")[d % 3],
                        )
                    )
                pay = encode_avi_mjpeg(frames, size=(16, 16))
                memo[key] = pay
            blobs.append(pay)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "video": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_video, batch_format="pyarrow")
    sampled = sample_frames(payloads, payload_col="video", stride=2, concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table({"lang": batch["lang"], "pixel_sum": batch["pixel_sum"]})

    return cell_sum_count(
        sampled.map_batches(slim, batch_format="pyarrow"), ["lang"], ["pixel_sum"]
    )


def _sql_mjpeg_video_sample() -> str:
    # sampled frames f in {0, 2}, f < 2 + doc_id % 3; per frame: 4 blocks
    # of 64 px x 3 channels at gray (doc_id*13 + f*37 + b*16) % 256
    return (
        "WITH per AS (SELECT d.lang, d.doc_id, f.range AS f, "
        "SUM(192*((d.doc_id*13 + f.range*37 + t.range*16) % 256)) AS ps "
        "FROM documents d, range(0, 4, 2) f, range(4) t "
        "WHERE f.range < 2 + d.doc_id % 3 "
        "GROUP BY d.lang, d.doc_id, f.range) "
        "SELECT lang, CAST(SUM(ps) AS BIGINT) AS sum_pixel_sum, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY lang"
    )


def q_mp4_video_sample(sf_dir: str):
    """ISO-BMFF (mp4) Motion-JPEG video end-to-end (round 5, the second
    real interchange container after RIFF-AVI): each doc gets an mp4 of
    (2 + doc_id % 3) JPEG samples muxed through a full sample table
    (stsd/stts/stsc/stsz/stco); frame f is a 16x16 image of four flat
    8x8 gray blocks (block b gray = (doc_id*19 + f*41 + b*16) % 256),
    Huffman-encoded at quant=1 with chroma subsampling cycling by
    doc_id. ``sample_frames`` walks the box tree, reconstructs sample
    offsets from stsc x stsz x stco, keeps every 2nd sample, and
    entropy-decodes each with the baseline JPEG reader. Flat blocks at
    quant=1 round-trip exactly, so the twin recomputes per-frame pixel
    sums in closed form — any box-walk, sample-table, stride, Huffman,
    or IDCT defect breaks the value hash."""
    from gis_scripts_ray.stages.multimodal import (
        encode_jpeg,
        encode_mp4_mjpeg,
        sample_frames,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_video(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        b4 = 16 * np.arange(4, dtype=np.int64)
        # pure function of (d%256, d%3): memoized per worker so fixture
        # generation scales with pattern count, not corpus size
        memo: dict = _MP4_PAYLOAD_MEMO
        blobs = []
        for d in ids:
            d = int(d)
            key = (d % 256, d % 3)
            pay = memo.get(key)
            if pay is None:
                frames = []
                for f in range(2 + d % 3):
                    g = ((d * 19 + f * 41 + b4) % 256).astype(np.uint8).reshape(2, 2)
                    img = np.repeat(np.repeat(g, 8, 0), 8, 1)
                    frames.append(
                        encode_jpeg(
                            np.repeat(img[:, :, None], 3, 2),
                            quant=1,
                            subsampling=("444", "422", "420")[d % 3],
                        )
                    )
                pay = encode_mp4_mjpeg(frames, size=(16, 16))
                memo[key] = pay
            blobs.append(pay)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "video": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_video, batch_format="pyarrow")
    sampled = sample_frames(payloads, payload_col="video", stride=2, concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table({"lang": batch["lang"], "pixel_sum": batch["pixel_sum"]})

    return cell_sum_count(
        sampled.map_batches(slim, batch_format="pyarrow"), ["lang"], ["pixel_sum"]
    )


def _sql_mp4_video_sample() -> str:
    # sampled frames f in {0, 2}, f < 2 + doc_id % 3; per frame: 4 blocks
    # of 64 px x 3 channels at gray (doc_id*19 + f*41 + b*16) % 256
    return (
        "WITH per AS (SELECT d.lang, d.doc_id, f.range AS f, "
        "SUM(192*((d.doc_id*19 + f.range*41 + t.range*16) % 256)) AS ps "
        "FROM documents d, range(0, 4, 2) f, range(4) t "
        "WHERE f.range < 2 + d.doc_id % 3 "
        "GROUP BY d.lang, d.doc_id, f.range) "
        "SELECT lang, CAST(SUM(ps) AS BIGINT) AS sum_pixel_sum, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY lang"
    )


def q_webm_video_sample(sf_dir: str):
    """Matroska/WebM (EBML) Motion-JPEG video end-to-end (round 5, the
    third real interchange container): each doc gets a webm-doctype
    Matroska file of (2 + doc_id % 3) V_MJPEG SimpleBlocks, one Cluster
    per frame; frame f is a 16x16 image of four flat 8x8 gray blocks
    (block b gray = (doc_id*23 + f*43 + b*16) % 256), Huffman-encoded at
    quant=1 with chroma subsampling cycling by doc_id. ``sample_frames``
    walks the EBML tree (variable-length ids/sizes), filters blocks to
    the video track, keeps every 2nd frame, and entropy-decodes each.
    Flat blocks at quant=1 round-trip exactly, so the twin recomputes
    per-frame pixel sums in closed form — any EBML-walk, block-header,
    stride, Huffman, or IDCT defect breaks the value hash."""
    from gis_scripts_ray.stages.multimodal import (
        encode_jpeg,
        encode_mkv_mjpeg,
        sample_frames,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_video(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        b4 = 16 * np.arange(4, dtype=np.int64)
        # pure function of (d%256, d%3): memoized per worker so fixture
        # generation scales with pattern count, not corpus size
        memo: dict = _MKV_PAYLOAD_MEMO
        blobs = []
        for d in ids:
            d = int(d)
            key = (d % 256, d % 3)
            pay = memo.get(key)
            if pay is None:
                frames = []
                for f in range(2 + d % 3):
                    g = ((d * 23 + f * 43 + b4) % 256).astype(np.uint8).reshape(2, 2)
                    img = np.repeat(np.repeat(g, 8, 0), 8, 1)
                    frames.append(
                        encode_jpeg(
                            np.repeat(img[:, :, None], 3, 2),
                            quant=1,
                            subsampling=("444", "422", "420")[d % 3],
                        )
                    )
                pay = encode_mkv_mjpeg(frames, size=(16, 16), doctype="webm")
                memo[key] = pay
            blobs.append(pay)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "video": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_video, batch_format="pyarrow")
    sampled = sample_frames(payloads, payload_col="video", stride=2, concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table({"lang": batch["lang"], "pixel_sum": batch["pixel_sum"]})

    return cell_sum_count(
        sampled.map_batches(slim, batch_format="pyarrow"), ["lang"], ["pixel_sum"]
    )


def _sql_webm_video_sample() -> str:
    # sampled frames f in {0, 2}, f < 2 + doc_id % 3; per frame: 4 blocks
    # of 64 px x 3 channels at gray (doc_id*23 + f*43 + b*16) % 256
    return (
        "WITH per AS (SELECT d.lang, d.doc_id, f.range AS f, "
        "SUM(192*((d.doc_id*23 + f.range*43 + t.range*16) % 256)) AS ps "
        "FROM documents d, range(0, 4, 2) f, range(4) t "
        "WHERE f.range < 2 + d.doc_id % 3 "
        "GROUP BY d.lang, d.doc_id, f.range) "
        "SELECT lang, CAST(SUM(ps) AS BIGINT) AS sum_pixel_sum, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY lang"
    )


_TERM_QUERY_TERMS = ["sort", "merge", "window"]
_TEXT_INDEX_BUCKETS = 32


def _text_index_dir(sf_dir: str) -> str:
    """Deterministic per-input index location (the `_geo_store_dir`
    pattern): content is a pure function of sf_dir, so a warm index is
    reusable; the version token invalidates stale layouts."""
    import hashlib

    from gis_scripts_ray.stages.text_index import TEXT_INDEX_VERSION

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return (
        f"/tmp/graft_text_index/v{TEXT_INDEX_VERSION}_{h}_"
        f"b{_TEXT_INDEX_BUCKETS}"
    )


def q_term_search_pushdown(sf_dir: str):
    """Inverted-index term search with STORAGE-LEVEL pushdown (round 5 —
    the text analog of ``clip_pushdown``'s windowed-read pruning,
    Clip_Rasters_By_Extent.py:17-36): postings are persisted partitioned
    by token hash bucket, and a 3-term AND reads ONLY the terms' bucket
    partitions (~3/32 of the index here; ~3/n_buckets at scale — never
    the corpus), then counts matched distinct terms per doc
    distributedly. The twin tokenizes the corpus directly in SQL, so any
    bucket-routing, dedup, or counting defect surfaces as a missing or
    phantom doc_id."""
    from gis_scripts_ray.stages.text_index import term_and_query, write_token_index

    out = _text_index_dir(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # one-time build; a warm index drops every row before the shuffle
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)
    return term_and_query(out, _TERM_QUERY_TERMS, n_buckets=_TEXT_INDEX_BUCKETS)


def _sql_term_search_pushdown() -> str:
    terms = ", ".join(f"'{t}'" for t in _TERM_QUERY_TERMS)
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents) "
        f"SELECT doc_id FROM toks WHERE tok IN ({terms}) "
        f"GROUP BY doc_id HAVING COUNT(DISTINCT tok) = {len(_TERM_QUERY_TERMS)}"
    )


_PHRASE_QUERY = ["sort", "merge"]
_OR_TOPK_TERMS = ["sort", "merge", "window", "scan"]
_OR_TOPK_K = 15


def q_term_or_topk(sf_dir: str):
    """Ranked OR retrieval over the positional inverted index (round 5):
    top-k docs by matched distinct terms with the engine-wide
    deterministic tie rule (value DESC, doc_id ASC) — folded through the
    distributed per-group top-k machinery, never a global sort, reading
    only the terms' bucket partitions. The twin's ORDER BY ... LIMIT
    with the same tie-break selects the identical row SET, so the value
    hash pins ranking and counting both."""
    from gis_scripts_ray.stages.text_index import term_or_topk, write_token_index

    out = _text_index_dir(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)
    return term_or_topk(
        out, _OR_TOPK_TERMS, k=_OR_TOPK_K, n_buckets=_TEXT_INDEX_BUCKETS
    )


def _sql_term_or_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in _OR_TOPK_TERMS)
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents), "
        f"m AS (SELECT doc_id, COUNT(DISTINCT tok) AS nm FROM toks "
        f"WHERE tok IN ({terms}) GROUP BY doc_id) "
        "SELECT doc_id, CAST(nm AS BIGINT) AS n_matched FROM m "
        f"ORDER BY nm DESC, doc_id LIMIT {_OR_TOPK_K}"
    )


def q_phrase_search_pushdown(sf_dir: str):
    """Exact PHRASE search over the positional inverted index (round 5 —
    the v2 index stores 1-based token positions): slot k of the phrase
    maps each occurrence of term_k to candidate start pos-k; a
    (doc, start) holding all slots is an occurrence. Reads ONLY the
    phrase terms' bucket partitions. The twin re-derives positions in
    SQL (w[i] with generate_series — the same 1-based indexing the store
    writes), so position bookkeeping, slot fan-out, and the two counting
    combines are all value-hash pinned. Output: (doc_id, n_occurrences)
    for docs containing the phrase."""
    from gis_scripts_ray.stages.text_index import phrase_query, write_token_index

    out = _text_index_dir(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)
    return phrase_query(out, _PHRASE_QUERY, n_buckets=_TEXT_INDEX_BUCKETS)


def _sql_phrase_search_pushdown() -> str:
    slots = ", ".join(f"('{t}', {k})" for k, t in enumerate(_PHRASE_QUERY))
    return (
        "WITH toks AS (SELECT doc_id, "
        "string_split(COALESCE(text, ''), ' ') AS w FROM documents), "
        "pos AS (SELECT doc_id, i, w[i] AS tok FROM (SELECT doc_id, w, "
        "unnest(generate_series(1, len(w))) AS i FROM toks)), "
        f"cand AS (SELECT p.doc_id, p.i - t.k AS start FROM pos p "
        f"JOIN (VALUES {slots}) t(term, k) ON p.tok = t.term "
        "WHERE p.i - t.k >= 1), "
        "occ AS (SELECT doc_id, start FROM cand GROUP BY doc_id, start "
        f"HAVING COUNT(*) = {len(_PHRASE_QUERY)}) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences "
        "FROM occ GROUP BY doc_id"
    )


_INCR_MERGE_TERMS = ["scan", "window"]


def q_index_incremental_merge(sf_dir: str):
    """Incremental index maintenance (round 5): build the inverted index
    from the EVEN-doc_id half of the corpus, then merge the odd half in
    as a crawl-delta increment (``merge_token_index`` — only the delta
    shuffles; touched buckets are atomically replaced with the
    applied-increment marker in the parquet footer, untouched buckets
    are never read), and run a term AND over the merged index. The twin
    queries the WHOLE corpus directly in SQL, so any lost, duplicated,
    or mis-routed delta posting surfaces as a row/hash mismatch —
    merge == rebuild, value-certified. Rerun-safe: a warm index skips
    the base build via the manifest and the merge via footer markers."""
    from gis_scripts_ray.stages.text_index import (
        merge_token_index,
        term_and_query,
        write_token_index,
    )

    out = _text_index_dir(sf_dir) + "_incr"
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _half(parity: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["doc_id"], 1), parity)
            )

        return f

    write_token_index(
        ds.map_batches(_half(0), batch_format="pyarrow"),
        out,
        n_buckets=_TEXT_INDEX_BUCKETS,
    )
    merge_token_index(
        out,
        ds.map_batches(_half(1), batch_format="pyarrow"),
        "odd-half",
        n_buckets=_TEXT_INDEX_BUCKETS,
    )
    return term_and_query(out, _INCR_MERGE_TERMS, n_buckets=_TEXT_INDEX_BUCKETS)


def q_index_docs_delete(sf_dir: str):
    """Takedown deletes over the partitioned inverted index (round 5):
    deletes are doc-keyed while postings are token-bucketed, so eager
    removal would rewrite every bucket per request — instead
    ``delete_docs`` commits an atomic tombstone set (queries anti-filter
    it immediately, adaptive broadcast/join delivery) and
    ``compact_token_index`` later rewrites each bucket once with the
    footer-marker protocol, then garbage-collects fully-applied sets.
    This query runs the SAME term AND in both phases — phase 0 masked
    (tombstones live), phase 1 after physical compaction — and the twin
    applies the delete predicate in SQL for both phases, so a doc
    surviving the mask, escaping the rewrite, or being over-deleted all
    hash-mismatch."""
    from gis_scripts_ray.stages.text_index import (
        compact_token_index,
        delete_docs,
        term_and_query,
        write_token_index,
    )

    out = _text_index_dir(sf_dir) + "_del"
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)

    def dead_only(batch: pa.Table) -> pa.Table:
        # doc_id >= 0, so numpy % matches SQL % exactly
        keep = batch["doc_id"].to_numpy(zero_copy_only=False) % 7 == 3
        return batch.select(["doc_id"]).filter(pa.array(keep))

    delete_docs(
        out,
        ds.map_batches(dead_only, batch_format="pyarrow"),
        "takedown7m3",
    )

    def _tag(phase: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "phase": pa.array(
                        np.full(batch.num_rows, phase, np.int64)
                    ),
                    "doc_id": batch["doc_id"],
                }
            )

        return f

    masked = term_and_query(
        out, _INCR_MERGE_TERMS, n_buckets=_TEXT_INDEX_BUCKETS
    ).map_batches(_tag(0), batch_format="pyarrow").materialize()
    compact_token_index(out)
    compacted = term_and_query(
        out, _INCR_MERGE_TERMS, n_buckets=_TEXT_INDEX_BUCKETS
    ).map_batches(_tag(1), batch_format="pyarrow")
    return masked.union(compacted)


def _sql_index_docs_delete() -> str:
    terms = ", ".join(f"'{t}'" for t in _INCR_MERGE_TERMS)
    one = (
        "SELECT doc_id FROM toks WHERE tok IN ({terms}) "
        "GROUP BY doc_id HAVING COUNT(DISTINCT tok) = {n}"
    ).format(terms=terms, n=len(_INCR_MERGE_TERMS))
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents), "
        f"hits AS ({one}) "
        "SELECT CAST(p AS BIGINT) AS phase, doc_id FROM hits, "
        "(VALUES (0), (1)) ph(p) WHERE (doc_id % 7) <> 3"
    )


def _sql_index_incremental_merge() -> str:
    terms = ", ".join(f"'{t}'" for t in _INCR_MERGE_TERMS)
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents) "
        f"SELECT doc_id FROM toks WHERE tok IN ({terms}) "
        f"GROUP BY doc_id HAVING COUNT(DISTINCT tok) = {len(_INCR_MERGE_TERMS)}"
    )


_BM25_TERMS = ["sort", "merge", "window", "hash"]
_BM25_K = 12


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval over the inverted index (round 5): top-k
    docs for a 4-term query, scored in the EXACT integer domain — tf
    from the terms' bucket partitions only, df a |terms|-row aggregate,
    doc lengths one vectorized corpus pass Bloom-prefiltered to
    candidates before the single hash join, per-doc score sums
    distributed, final ranking through the per-group top-k fold with the
    (score DESC, doc_id ASC) tie rule. The twin recomputes the identical
    fixed-point arithmetic in SQL (all operands positive, so `//`
    truncation == floor in both engines), so any tf/df/dl bookkeeping or
    ranking defect value-hash-mismatches."""
    from gis_scripts_ray.stages.text_index import bm25_topk, write_token_index

    out = _text_index_dir(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)
    return bm25_topk(out, ds, _BM25_TERMS, k=_BM25_K)


def _sql_bm25_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS d, SUM(dl) AS l FROM dl),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       WHERE tok IN ({terms}) GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
       WHERE tok IN ({terms}) GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
    CAST(SUM(
      (((2 * (s.d - df.df) + 1) * 1000) // (2 * df.df + 1))
      * ((tf.tf * 2200000 * 1000000) //
         (tf.tf * 1000000 +
          (1200000 * (1000000 - 750000 + (750000 * dl.dl * s.d) // s.l))
          // 1000000))
    ) AS BIGINT) AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.tok = df.tok
  CROSS JOIN stats s
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {_BM25_K}
"""


_KWIC_TERM = "window"
_KWIC_W = 3


def q_kwic_snippets(sf_dir: str):
    """Keyword-in-context snippets (``text_index.kwic_snippets``): the 3
    tokens either side of the FIRST occurrence of the query term, for
    every doc containing it as a whole token. Candidates come from the
    inverted index (term-bucket pruned read), the corpus Bloom-semi-joins
    down to candidates before tokenizing, and the snippet kernel is one
    vectorized split + reduceat + ListArray rebuild. The twin recomputes
    each snippet analytically with DuckDB list functions
    (``list_position`` is 1-based first occurrence; ``list_slice`` is
    inclusive and clamps), so the FULL snippet string of every matching
    doc value-hash-compares."""
    from gis_scripts_ray.stages.text_index import kwic_snippets, write_token_index

    out = _text_index_dir(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)
    return kwic_snippets(out, ds, _KWIC_TERM, window=_KWIC_W)


def _sql_kwic_snippets() -> str:
    return f"""
WITH c AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents),
m AS (SELECT doc_id, toks, list_position(toks, '{_KWIC_TERM}') AS p FROM c)
SELECT doc_id, array_to_string(
  list_slice(toks, greatest(p - {_KWIC_W}, 1), p + {_KWIC_W}), ' ') AS snippet
FROM m WHERE p > 0
"""


_PROX_A, _PROX_B, _PROX_K = "sort", "hash", 15


def q_proximity_topk(sf_dir: str):
    """Proximity retrieval over the POSITIONAL inverted index
    (``text_index.proximity_topk``): the 15 docs where the two query
    terms occur closest together (min |pos_a - pos_b| per doc, gap ASC
    then doc_id ASC). Reads only the two terms' bucket partitions, one
    doc-hash shuffle, per-bucket vectorized adjacent-pair minima, the
    engine's top-k fold. The twin recomputes every pairwise distance
    from token positions in SQL, so a straddled-batch, adjacency or
    tie-rule defect hash-mismatches."""
    from gis_scripts_ray.stages.text_index import proximity_topk, write_token_index

    out = _text_index_dir(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    write_token_index(ds, out, n_buckets=_TEXT_INDEX_BUCKETS)
    return proximity_topk(out, _PROX_A, _PROX_B, k=_PROX_K)


def _sql_proximity_topk() -> str:
    return f"""
WITH c AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents),
t AS (SELECT doc_id, UNNEST(toks) AS tok,
             generate_subscripts(toks, 1) AS p FROM c),
a AS (SELECT doc_id, p FROM t WHERE tok = '{_PROX_A}'),
b AS (SELECT doc_id, p FROM t WHERE tok = '{_PROX_B}'),
g AS (SELECT a.doc_id, CAST(MIN(ABS(a.p - b.p)) AS BIGINT) AS gap
      FROM a JOIN b ON a.doc_id = b.doc_id GROUP BY a.doc_id)
SELECT doc_id, gap FROM g ORDER BY gap ASC, doc_id ASC LIMIT {_PROX_K}
"""


_SPLIT_QUERY_TERMS = ["hash", "join", "group"]
_SPLIT_BASE_BUCKETS = 16


def q_index_split(sf_dir: str):
    """Linear-hashing index growth (round 5): build the inverted index at
    16 buckets, DOUBLE it to 32 with ``split_token_index`` — every bucket
    splits LOCALLY (md5 mod 2n of a token in bucket b is b or b+n, so no
    posting crosses the network; at 100 TB the alternative is
    re-shuffling the whole index), with the routing flip one atomic meta
    write — then run a 3-term AND routed by the index's OWN persisted
    meta. The twin tokenizes the corpus directly in SQL, so a posting
    lost or duplicated by the split, or a term mis-routed under the
    doubled layout, surfaces as a row/hash mismatch. Rerun-safe:
    ``from_buckets`` makes the split idempotent on a warm
    (already-split) index, and a pending crashed split settles first."""
    from gis_scripts_ray.stages.text_index import (
        index_n_buckets,
        split_token_index,
        term_and_query,
        write_token_index,
    )

    out = _text_index_dir(sf_dir) + "_split"
    if index_n_buckets(out) is None:
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        write_token_index(ds, out, n_buckets=_SPLIT_BASE_BUCKETS)
    split_token_index(out, from_buckets=_SPLIT_BASE_BUCKETS)
    return term_and_query(out, _SPLIT_QUERY_TERMS)


def _sql_index_split() -> str:
    terms = ", ".join(f"'{t}'" for t in _SPLIT_QUERY_TERMS)
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents) "
        f"SELECT doc_id FROM toks WHERE tok IN ({terms}) "
        f"GROUP BY doc_id HAVING COUNT(DISTINCT tok) = {len(_SPLIT_QUERY_TERMS)}"
    )


def q_lm_quality_scores(sf_dir: str):
    """Corpus-LM quality scoring (round 5 — the CCNet model-based filter
    shape): a bigram conditional-probability model is fit on the corpus
    itself in ONE pass (per-block partials, one adaptive combine over
    the unbounded bigram key space) and delivered back adaptively
    (measured broadcast / sized hash-joins) to score every document in
    the FIXED-POINT integer domain: per bigram occurrence
    p = (1e6 * c2(w1,w2)) // c1(w1), summed per doc — the exact-integer
    stand-in for KenLM log-perplexity that a float could never
    value-hash. Output: per-language totals of score mass, bigram count,
    and scored-doc count."""
    from gis_scripts_ray.stages.lmscore import lm_bigram_scores

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    scored = lm_bigram_scores(ds, carry_cols=["lang"])
    return cell_sum_count(
        scored.map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "p_sum_micro": b["p_sum_micro"],
                    "n_bigrams": b["n_bigrams"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["lang"],
        ["p_sum_micro", "n_bigrams"],
    )


def _sql_lm_quality_scores() -> str:
    return (
        "WITH toks AS (SELECT doc_id, lang, "
        "string_split(COALESCE(text, ''), ' ') AS w FROM documents), "
        "bgs AS (SELECT doc_id, lang, w[i] AS w1, "
        "w[i] || ' ' || w[i + 1] AS bg FROM (SELECT doc_id, lang, w, "
        "unnest(generate_series(1, len(w) - 1)) AS i FROM toks)), "
        "c2 AS (SELECT bg, COUNT(*) AS c FROM bgs GROUP BY bg), "
        "c1 AS (SELECT w1, COUNT(*) AS c FROM bgs GROUP BY w1), "
        "per AS (SELECT b.doc_id, b.lang, "
        "SUM((1000000 * c2.c) // c1.c) AS ps, COUNT(*) AS nb "
        "FROM bgs b JOIN c2 ON c2.bg = b.bg JOIN c1 ON c1.w1 = b.w1 "
        "GROUP BY b.doc_id, b.lang) "
        "SELECT lang, CAST(SUM(ps) AS BIGINT) AS sum_p_sum_micro, "
        "CAST(SUM(nb) AS BIGINT) AS sum_n_bigrams, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY lang"
    )


def q_pagerank_hosts(sf_dir: str):
    """Distributed fixed-point PageRank over a derived host link graph
    (round 5): host h = doc_id // 16; each doc emits one directed edge
    h -> (doc_id * 2654435761 mod 2^32) mod n_hosts (Knuth multiplicative
    scatter — hub skew arises naturally). Three exact integer power steps
    (micro-unit ranks, damping 0.85) via ``stages/pagerank.py``'s
    broadcast-or-join delivery; the SQL twin unrolls the same recurrence
    as three CTE rounds in the identical integer domain, so every edge
    derivation, out-degree, quota floor, and damping floor is value-hash
    pinned. n_hosts derives from MAX(doc_id) (the ``_id_shift`` pattern —
    never a hard-coded modulus)."""
    from gis_scripts_ray.stages.pagerank import pagerank_fixed_point

    nh = (_id_shift(sf_dir, "documents", "doc_id") - 1) // 16 + 1
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        src = (d // np.uint64(16)).astype(np.int64)
        dst = (
            (d * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(nh)
        ).astype(np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    pr = pagerank_fixed_point(
        ds.map_batches(edges, batch_format="pyarrow"), n_nodes=nh, iters=3
    )
    return pr.map_batches(
        lambda b: pa.table({"host": b["node"], "pagerank_micro": b["rank"]}),
        batch_format="pyarrow",
    )


def _sql_pagerank_hosts() -> str:
    # same integer recurrence unrolled: r_{k+1} = 150000 + (850000*s)//1e6,
    # s = sum over in-edges of r_k(src)//deg(src); HUGEINT guards the
    # damp*s product (the Ray side decomposes it equivalently)
    rounds = []
    prev = "r0"
    for k in (1, 2, 3):
        rounds.append(
            f"c{k} AS (SELECT e.dst AS node, "
            f"SUM(CAST({prev}.r // dg.deg AS HUGEINT)) AS s "
            f"FROM e JOIN dg ON dg.node = e.src "
            f"JOIN {prev} ON {prev}.node = e.src GROUP BY e.dst), "
            f"r{k} AS (SELECT u.node, CAST(150000 + "
            f"(850000 * COALESCE(c{k}.s, 0)) // 1000000 AS BIGINT) AS r "
            f"FROM u LEFT JOIN c{k} ON c{k}.node = u.node)"
        )
        prev = f"r{k}"
    return (
        "WITH nh AS (SELECT MAX(doc_id) // 16 + 1 AS n FROM documents), "
        "e AS (SELECT doc_id // 16 AS src, "
        "CAST(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) "
        "% (SELECT n FROM nh) AS BIGINT) AS dst FROM documents), "
        "u AS (SELECT unnest(generate_series(0, (SELECT n - 1 FROM nh))) "
        "AS node), "
        "dg AS (SELECT u.node, COUNT(e.src) AS deg FROM u "
        "LEFT JOIN e ON e.src = u.node GROUP BY u.node), "
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM u), "
        + ", ".join(rounds)
        + " SELECT node AS host, r AS pagerank_micro FROM r3"
    )


def q_crawl_depths(sf_dir: str):
    """Distributed BFS crawl depth over the derived host link graph
    (round 5): the SAME edge derivation as ``pagerank_hosts`` (host =
    doc_id // 16, Knuth-scatter destination), seeds = every 63rd host,
    8 directed hops max. ``stages/bfs.py`` runs frontier-only rounds
    (adaptive broadcast/join message delivery, one combine per round,
    exact newly-labeled convergence count); the twin is a bounded
    recursive CTE whose UNION-dedup + MIN(depth) is the same BFS.

    Output: (depth, n_hosts) — the reachability histogram."""
    from gis_scripts_ray.stages.bfs import bfs_depths
    from gis_scripts_ray.stages.tile_agg import cell_count

    nh = (_id_shift(sf_dir, "documents", "doc_id") - 1) // 16 + 1
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        src = (d // np.uint64(16)).astype(np.int64)
        dst = (
            (d * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(nh)
        ).astype(np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def seed_batch(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        return pa.table({"node": pa.array(ids[ids % 63 == 0], pa.int64())})

    seeds = ray.data.range(nh).map_batches(seed_batch, batch_format="pyarrow")
    dep = bfs_depths(
        ds.map_batches(edges, batch_format="pyarrow"),
        seeds,
        max_rounds=8,
    )
    return cell_count(dep, ["depth"], alias="n_hosts")


def _sql_crawl_depths() -> str:
    return (
        "WITH RECURSIVE "
        "nh AS (SELECT MAX(doc_id) // 16 + 1 AS n FROM documents), "
        "e AS (SELECT doc_id // 16 AS src, "
        "CAST(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) "
        "% (SELECT n FROM nh) AS BIGINT) AS dst FROM documents), "
        "seeds AS (SELECT node FROM (SELECT unnest(generate_series(0, "
        "(SELECT n - 1 FROM nh))) AS node) WHERE node % 63 = 0), "
        "bfs AS (SELECT node, 0 AS depth FROM seeds "
        "UNION "
        "SELECT e.dst AS node, bfs.depth + 1 AS depth "
        "FROM bfs JOIN e ON e.src = bfs.node WHERE bfs.depth < 8), "
        "md AS (SELECT node, MIN(depth) AS depth FROM bfs GROUP BY node) "
        "SELECT CAST(depth AS BIGINT) AS depth, "
        "CAST(COUNT(*) AS BIGINT) AS n_hosts FROM md GROUP BY depth"
    )


def q_audio_features(sf_dir: str):
    """REAL audio parse end-to-end: each doc gets a deterministic mono
    16-bit PCM WAV (64 samples, s_i = ((doc_id*13 + i*7) % 65536) -
    32768) — PCM is not entropy-coded, so BOTH the writer and the
    chunk-walking parser are real pure numpy (no stub). The actor-pool
    ``audio_features`` stage extracts exact integer features (energy =
    sum of squares, strict-sign zero crossings); the SQL twin RECOMPUTES
    the samples with range(0, 64) and a LAG window, so any header,
    byte-order, or feature bug breaks the hash.

    Output: (lang, sum_sq, sum_zc, n) per language."""
    from gis_scripts_ray.stages.multimodal import audio_features, encode_wav_pcm16

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_audio(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        i = np.arange(64, dtype=np.int64)
        blobs = [
            encode_wav_pcm16(((int(d) * 13 + i * 7) % 65536 - 32768).astype(np.int16))
            for d in ids
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "audio": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_audio, batch_format="pyarrow")
    feats = audio_features(payloads, payload_col="audio", concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table(
            {
                "lang": batch["lang"],
                "sq": batch["sum_sq"],
                "zc": batch["n_zero_cross"],
            }
        )

    return cell_sum_count(
        feats.map_batches(slim, batch_format="pyarrow"), ["lang"], ["sq", "zc"]
    )


def _sql_audio_features() -> str:
    return (
        "WITH s AS (SELECT doc_id, lang, r.range AS si, "
        "((doc_id*13 + r.range*7) % 65536) - 32768 AS v "
        "FROM documents, range(0, 64) r), "
        "w AS (SELECT doc_id, lang, si, v, "
        "LAG(v) OVER (PARTITION BY doc_id ORDER BY si) AS pv FROM s), "
        "f AS (SELECT doc_id, lang, CAST(SUM(v*v) AS BIGINT) AS sq, "
        "CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0)) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS zc FROM w GROUP BY doc_id, lang) "
        "SELECT lang, CAST(SUM(sq) AS BIGINT) AS sum_sq, "
        "CAST(SUM(zc) AS BIGINT) AS sum_zc, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY lang"
    )


def q_audio_formats_features(sf_dir: str):
    """Multi-format audio parse end-to-end (round 5): even doc_ids ship
    AIFF (big-endian PCM16, 80-bit-extended sample rate in COMM) with
    samples s_i = ((doc_id*11 + i*17) % 4001) - 2000; odd doc_ids ship
    G.711 mu-law WAV (format tag 7) whose 8-bit CODES are c_i =
    (doc_id*7 + i*13) % 256 — the REAL companding expansion runs in the
    engine while the SQL twin spells the same segment arithmetic
    ((m*8+132) << e) - 132 on the complemented code, so any byte-order,
    chunk-walk, 80-bit-float, or expansion defect breaks the hash.

    Output: (lang, sum_sq, sum_zc, n) per language."""
    from gis_scripts_ray.stages.multimodal import (
        audio_features,
        encode_aiff_pcm16,
        encode_wav_mulaw,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_audio(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        i = np.arange(48, dtype=np.int64)
        blobs = []
        for d in ids:
            d = int(d)
            if d % 2 == 0:
                s = ((d * 11 + i * 17) % 4001 - 2000).astype(np.int16)
                blobs.append(encode_aiff_pcm16(s))
            else:
                c = ((d * 7 + i * 13) % 256).astype(np.uint8)
                blobs.append(encode_wav_mulaw(c))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "audio": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_audio, batch_format="pyarrow")
    feats = audio_features(payloads, payload_col="audio", concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table(
            {
                "lang": batch["lang"],
                "sq": batch["sum_sq"],
                "zc": batch["n_zero_cross"],
            }
        )

    return cell_sum_count(
        feats.map_batches(slim, batch_format="pyarrow"), ["lang"], ["sq", "zc"]
    )


def _sql_audio_formats_features() -> str:
    # even docs: AIFF PCM16 samples; odd docs: G.711 mu-law expansion of
    # the complemented code u (e = (u//16)%8, m = u%16, all non-negative
    # so DuckDB // truncation == floor)
    return (
        "WITH b AS (SELECT doc_id, lang, r.range AS si, "
        "255 - ((doc_id*7 + r.range*13) % 256) AS u "
        "FROM documents, range(0, 48) r), "
        "s AS (SELECT doc_id, lang, si, "
        "CASE WHEN doc_id % 2 = 0 THEN ((doc_id*11 + si*17) % 4001) - 2000 "
        "ELSE (CASE WHEN u >= 128 THEN -1 ELSE 1 END) * "
        "((((u % 16)*8 + 132) << ((u // 16) % 8)) - 132) END AS v FROM b), "
        "w AS (SELECT doc_id, lang, si, v, "
        "LAG(v) OVER (PARTITION BY doc_id ORDER BY si) AS pv FROM s), "
        "f AS (SELECT doc_id, lang, CAST(SUM(v*v) AS BIGINT) AS sq, "
        "CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0)) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS zc FROM w GROUP BY doc_id, lang) "
        "SELECT lang, CAST(SUM(sq) AS BIGINT) AS sum_sq, "
        "CAST(SUM(zc) AS BIGINT) AS sum_zc, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY lang"
    )


_WDS_SHARDS = 6


def _wds_fixture_dir(sf_dir: str) -> str:
    import hashlib

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/graft_wds/v1_{h}_s{_WDS_SHARDS}"


def _build_wds_fixture(sf_dir: str, out: str) -> None:
    """Materialize documents as {_WDS_SHARDS} WebDataset tar shards
    ({key}.txt + {key}.cls members, adjacent per key) — built
    distributed (per-row member bytes, per-shard ordered group write),
    warm-cached behind a _DONE marker."""
    from gis_scripts_ray.sources.webdataset import encode_tar

    if os.path.exists(f"{out}/_DONE"):
        return
    os.makedirs(out, exist_ok=True)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    trailer = 2 * 512

    def to_members(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        shard, member = [], []
        for d, lang, text in zip(ids, langs, texts):
            d = int(d)
            key = f"{d:012d}"
            pair = encode_tar(
                [
                    (f"{key}.txt", (text or "").encode("utf-8")),
                    (f"{key}.cls", (lang or "").encode("utf-8")),
                ]
            )[:-trailer]  # member blocks only; trailer added per shard
            member.append(pair)
            shard.append(d % _WDS_SHARDS)
        return pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "doc_id": batch["doc_id"],
                "member": pa.array(member, pa.binary()),
            }
        )

    members = ds.map_batches(to_members, batch_format="pyarrow")

    def write_shard(g: pa.Table) -> pa.Table:
        g = g.sort_by("doc_id")
        s = g["shard"][0].as_py()
        tmp = f"{out}/part-{s:04d}.tar.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            for m in g["member"]:
                f.write(m.as_py())
            f.write(b"\x00" * trailer)
        os.replace(tmp, f"{out}/part-{s:04d}.tar")
        return pa.table({"shard": pa.array([s], pa.int64())})

    n = (
        members.groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .count()
    )
    assert n == _WDS_SHARDS, f"wds fixture wrote {n} shards"
    with open(f"{out}/_DONE", "w") as f:
        f.write("ok\n")


def q_webdataset_read(sf_dir: str):
    """WebDataset tar source end-to-end (round 5): documents
    materialize as 6 tar shards of adjacent {key}.txt/{key}.cls member
    pairs (pure-stdlib ustar writer, checksummed headers, mtime-0
    deterministic bytes); ``read_webdataset`` walks the headers back
    (checksum-verified), groups members into samples, and the query
    aggregates text BYTE lengths per class label recovered from the
    .cls member. The twin recomputes from documents directly — any
    header/checksum/padding/grouping defect breaks the value hash.

    Output: (lang, sum_blen, n) per language."""
    import glob as _glob

    from gis_scripts_ray.sources.webdataset import read_webdataset

    out = _wds_fixture_dir(sf_dir)
    _build_wds_fixture(sf_dir, out)
    files = sorted(_glob.glob(f"{out}/part-*.tar"))
    ds = read_webdataset(files, extensions=["txt", "cls"])

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": pc.cast(batch["cls"], pa.string()),
                "blen": pc.cast(pc.binary_length(batch["txt"]), pa.int64()),
            }
        )

    return cell_sum_count(
        ds.map_batches(slim, batch_format="pyarrow"), ["lang"], ["blen"]
    )


def _sql_webdataset_read() -> str:
    return (
        "SELECT lang, CAST(SUM(strlen(COALESCE(text, ''))) AS BIGINT) "
        "AS sum_blen, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang"
    )


def q_sequence_packing(sf_dir: str):
    """Sample packing for LLM pretraining (round 5): documents
    concatenate in doc-id order into fixed 2048-token windows; each doc
    reports the pack it starts in and its offset — a DISTRIBUTED
    ORDERED PREFIX SUM (range-bucketed per-bucket totals -> broadcast
    exclusive bucket prefix -> per-bucket sorted cumsum finish; the
    only driver traffic is the n_buckets-row prefix table). The twin is
    the SUM() OVER (ORDER BY doc_id) window, so any bucket-boundary,
    prefix, or cumsum defect breaks the hash.

    Output: (doc_id, n_tokens, pack_id, pack_offset) for every doc."""
    from gis_scripts_ray.stages.packing import sequence_packing

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return sequence_packing(ds, window=2048).sort("doc_id")


def _sql_sequence_packing() -> str:
    return (
        "WITH t AS (SELECT doc_id, "
        "len(string_split(COALESCE(text, ''), ' ')) AS n FROM documents), "
        "c AS (SELECT doc_id, n, COALESCE(SUM(n) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM t) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, "
        "CAST(cum // 2048 AS BIGINT) AS pack_id, "
        "CAST(cum % 2048 AS BIGINT) AS pack_offset FROM c ORDER BY doc_id"
    )


def q_substr_dedup(sf_dir: str):
    """ExactSubstr-shape duplicated-substring removal (round 5, Lee et
    al. 2022): every token extent covered by a word 5-gram occurring
    MORE THAN ONCE in the corpus (cross-doc or within-doc) is removed
    from every document. Distributed plan: one count pass (per-batch
    n-gram hash partials -> adaptive combine -> count>1 set), then an
    adaptive-delivery rewrite pass (broadcast ``is_in`` + difference-
    array coverage + polars reassembly; hash-join fallback equivalence-
    tested). The twin removes the same extents by matching n-gram
    STRINGS, so the full REWRITTEN TEXT of every doc is value-hashed.

    Output: (doc_id, dedup_text) for every document."""
    from gis_scripts_ray.stages.substrdedup import substr_dedup_rows

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return substr_dedup_rows(ds, n=5).sort("doc_id")


def _sql_substr_dedup() -> str:
    return (
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        "cg AS (SELECT doc_id, i, array_to_string(list_slice(w, i, i + 4), ' ') AS g "
        "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i FROM ws)), "
        "dup AS (SELECT g FROM cg GROUP BY g HAVING COUNT(*) > 1), "
        "cov AS (SELECT DISTINCT c.doc_id, c.i + o.range AS q "
        "FROM cg c JOIN dup USING (g), range(5) o), "
        "tok AS (SELECT doc_id, i AS pos, w[i] AS tk "
        "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM ws)), "
        "kept AS (SELECT t.doc_id, t.pos, t.tk FROM tok t "
        "LEFT JOIN cov ON t.doc_id = cov.doc_id AND t.pos = cov.q "
        "WHERE cov.q IS NULL), "
        "agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS t2 "
        "FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(a.t2, '') AS dedup_text "
        "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"
    )


_BLOCKLIST_DOMAINS = ["b3.example.org", "spam.net", "a1.b7.example.org"]


def q_html_text_extract(sf_dir: str):
    """HTML text extraction end-to-end (round 5): each doc gets a real
    HTML page (head/title, style and script subtrees, headings,
    paragraphs, an entity) built from doc_id; ``HtmlTextStage`` runs the
    stdlib-tokenizer extractor (suppressed subtrees, block-tag
    newlines, entity decoding, newline collapsing) and the twin
    constructs the EXPECTED EXTRACTED TEXT directly in SQL — the full
    output string of every doc is value-hashed, so any tokenizer-state,
    suppression, entity, or collapsing defect breaks the hash.

    Output: (doc_id, html_text) for every document."""
    from gis_scripts_ray.stages.htmltext import html_texts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_html(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        blobs = []
        for d in ids:
            d = int(d)
            blobs.append(
                (
                    f"<html><head><title>T{d % 100}</title>"
                    "<style>body { color: red; }</style></head>"
                    f"<body><h1>H{d % 50}</h1>"
                    f"<p>alpha {d % 7} <b>beta</b></p>"
                    "<script>var x = '<p>not text</p>';</script>"
                    f"<p>gamma &amp; delta {d % 11}</p></body></html>"
                ).encode("utf-8")
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "html": pa.array(blobs, pa.binary()),
            }
        )

    pages = ds.map_batches(make_html, batch_format="pyarrow")
    texts = html_texts(pages, payload_col="html", concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table(
            {"doc_id": batch["doc_id"], "html_text": batch["html_text"]}
        )

    return texts.map_batches(slim, batch_format="pyarrow").sort("doc_id")


def _sql_html_text_extract() -> str:
    return (
        "SELECT doc_id, "
        "'T' || CAST(doc_id % 100 AS VARCHAR) || chr(10) || "
        "'H' || CAST(doc_id % 50 AS VARCHAR) || chr(10) || "
        "'alpha ' || CAST(doc_id % 7 AS VARCHAR) || ' beta' || chr(10) || "
        "'gamma & delta ' || CAST(doc_id % 11 AS VARCHAR) AS html_text "
        "FROM documents ORDER BY doc_id"
    )


def q_html_link_graph(sf_dir: str):
    """Hyperlink extraction + RFC 3986 resolution (round 5): each doc
    gets a page at https://h{hid}.example.com/d{doc_id%5}/p.html
    (hid = doc_id // 16, the pagerank host derivation) carrying one
    absolute link, one up-path-relative link (../rel{k}.html), one
    root-relative link (/root{k}), a fake <a> inside a <script> body
    (CDATA to the tokenizer — must NOT be collected), and — for
    doc_id % 11 == 0 — a <base href> pointing at a CDN origin that
    re-roots both relative links. ``HtmlLinkStage`` explodes pages into
    (doc_id, link_no, link_url) rows; the twin constructs every
    expected resolved URL analytically, so base-tag honoring, dot-segment
    removal, root-relative resolution, document order, and script-CDATA
    suppression are all value-hash pinned.

    Output: (doc_id, link_no, link_url), one row per link."""
    from gis_scripts_ray.stages.htmltext import html_links

    nh = (_id_shift(sf_dir, "documents", "doc_id") - 1) // 16 + 1
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls, blobs = [], []
        for d in ids:
            d = int(d)
            hid = d // 16
            base = (
                f'<base href="https://cdn.example.org/b{d % 4}/">'
                if d % 11 == 0
                else ""
            )
            urls.append(f"https://h{hid}.example.com/d{d % 5}/p.html")
            blobs.append(
                (
                    f"<html><head>{base}<title>t</title></head><body>"
                    f'<a href="https://h{(hid + 1) % nh}.example.com/abs{d % 9}">a</a>'
                    f'<p><a href="../rel{d % 3}.html">r</a></p>'
                    "<script>document.write('<a href=\"https://evil.example.com/x\">');"
                    "</script>"
                    f'<a href="/root{d % 7}">q</a></body></html>'
                ).encode("utf-8")
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": pa.array(urls, pa.string()),
                "html": pa.array(blobs, pa.binary()),
            }
        )

    pages = ds.map_batches(make_pages, batch_format="pyarrow")
    return html_links(pages, payload_col="html", url_col="url", concurrency=2).sort(
        ["doc_id", "link_no"]
    )


def _sql_html_link_graph() -> str:
    nh = "(SELECT MAX(doc_id) // 16 + 1 FROM documents)"
    return (
        "WITH expect AS ("
        "SELECT doc_id, 0 AS link_no, "
        f"'https://h' || CAST((doc_id // 16 + 1) % {nh} AS VARCHAR) || "
        "'.example.com/abs' || CAST(doc_id % 9 AS VARCHAR) AS link_url "
        "FROM documents "
        "UNION ALL "
        "SELECT doc_id, 1, "
        "CASE WHEN doc_id % 11 = 0 THEN 'https://cdn.example.org/rel' "
        "ELSE 'https://h' || CAST(doc_id // 16 AS VARCHAR) || '.example.com/rel' "
        "END || CAST(doc_id % 3 AS VARCHAR) || '.html' FROM documents "
        "UNION ALL "
        "SELECT doc_id, 2, "
        "CASE WHEN doc_id % 11 = 0 THEN 'https://cdn.example.org/root' "
        "ELSE 'https://h' || CAST(doc_id // 16 AS VARCHAR) || '.example.com/root' "
        "END || CAST(doc_id % 7 AS VARCHAR) FROM documents) "
        "SELECT doc_id, link_no, link_url FROM expect ORDER BY doc_id, link_no"
    )


def q_charset_decode(sf_dir: str):
    """Charset sniff + decode + text extraction (round 5): payloads
    cycle four encodings by doc_id % 4 — (0) plain UTF-8 with no
    declaration (strict-probe path), (1) windows-1252 whose EURO SIGN
    0x80 lead byte is invalid UTF-8 (fallback path, web-1252 table),
    (2) UTF-16-LE with BOM (BOM path, BOM stripped from content),
    (3) latin-1 bytes behind ``<meta charset="iso-8859-1">`` (prescan
    path; the label normalizes to windows-1252 per WHATWG). Decoded
    text runs through ``html_to_text`` and the twin writes the expected
    final string of every doc with literal non-ASCII characters, so the
    sniff order, label normalization, C1 table, and BOM stripping are
    all value-hash pinned.

    Output: (doc_id, encoding, enc_source, text)."""
    from gis_scripts_ray.stages.charset import decode_charsets
    from gis_scripts_ray.stages.htmltext import html_to_text

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_payloads(batch: pa.Table) -> pa.Table:
        import codecs as _codecs

        blobs = []
        for d in batch["doc_id"].to_numpy():
            d = int(d)
            mode = d % 4
            if mode == 0:
                blobs.append(f"<p>café {d % 7} naïve</p>".encode("utf-8"))
            elif mode == 1:
                blobs.append(f"<p>€uro {d % 9} café</p>".encode("cp1252"))
            elif mode == 2:
                blobs.append(
                    _codecs.BOM_UTF16_LE
                    + f"<p>wide {d % 5} ✓</p>".encode("utf-16-le")
                )
            else:
                blobs.append(
                    f'<meta charset="iso-8859-1"><p>café {d % 11}</p>'.encode(
                        "latin-1"
                    )
                )
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(blobs, pa.binary())}
        )

    decoded = decode_charsets(
        ds.map_batches(make_payloads, batch_format="pyarrow"), concurrency=2
    )

    def finish(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "encoding": batch["encoding"],
                "enc_source": batch["enc_source"],
                "text": pa.array(
                    [html_to_text(t) for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return decoded.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def _sql_charset_decode() -> str:
    return (
        "SELECT doc_id, "
        "CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1252' "
        "WHEN 2 THEN 'utf-16-le' ELSE 'windows-1252' END AS encoding, "
        "CASE doc_id % 4 WHEN 0 THEN 'utf8-valid' WHEN 1 THEN 'fallback' "
        "WHEN 2 THEN 'bom' ELSE 'meta' END AS enc_source, "
        "CASE doc_id % 4 "
        "WHEN 0 THEN 'café ' || CAST(doc_id % 7 AS VARCHAR) || ' naïve' "
        "WHEN 1 THEN '€uro ' || CAST(doc_id % 9 AS VARCHAR) || ' café' "
        "WHEN 2 THEN 'wide ' || CAST(doc_id % 5 AS VARCHAR) || ' ✓' "
        "ELSE 'café ' || CAST(doc_id % 11 AS VARCHAR) END AS text "
        "FROM documents ORDER BY doc_id"
    )


def q_robots_filter(sf_dir: str):
    """robots.txt politeness gate (round 5, RFC 9309): every host
    (hid = doc_id // 16) serves a robots body whose ``badbot`` group
    disallows everything (must NOT govern our agent 'graftbot' — pins
    group selection) and whose ``*`` group carries prefix, longest-match
    Allow-override, ``*``-wildcard and ``$``-anchored rules; hosts with
    hid % 3 == 0 add one host-specific anchored rule. Paths cycle six
    shapes by doc_id % 6 exercising every precedence branch (prefix
    block, Allow longer than Disallow, $-anchor hit AND $-anchor miss,
    wildcard). The twin derives the expected verdict per doc
    analytically.

    Output: (doc_id, path, allowed) for every document."""
    from gis_scripts_ray.stages.robots import robots_filter

    nh = (_id_shift(sf_dir, "documents", "doc_id") - 1) // 16 + 1
    base = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Disallow: /*.pdf$\nDisallow: /tmp*\n"
    )
    robots_by_host = {
        f"h{h}.example.com": base
        + ("Disallow: /public/a7$\n" if h % 3 == 0 else "")
        for h in range(nh)
    }

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_urls(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        hosts, paths = [], []
        for d in ids:
            d = int(d)
            hosts.append(f"h{d // 16}.example.com")
            k = d % 13
            mode = d % 6
            paths.append(
                [
                    f"/public/a{k}",
                    f"/private/p{k}",
                    f"/private/ok{k}",
                    f"/doc{k}.pdf",
                    f"/doc{k}.pdfx",
                    f"/tmp{k}",
                ][mode]
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "host": pa.array(hosts, pa.string()),
                "path": pa.array(paths, pa.string()),
            }
        )

    urls = ds.map_batches(make_urls, batch_format="pyarrow")
    out = robots_filter(urls, robots_by_host, agent="graftbot", concurrency=2)
    return out.select_columns(["doc_id", "path", "allowed"]).sort("doc_id")


def _sql_robots_filter() -> str:
    return (
        "SELECT doc_id, "
        "CASE doc_id % 6 "
        "WHEN 0 THEN '/public/a' || CAST(doc_id % 13 AS VARCHAR) "
        "WHEN 1 THEN '/private/p' || CAST(doc_id % 13 AS VARCHAR) "
        "WHEN 2 THEN '/private/ok' || CAST(doc_id % 13 AS VARCHAR) "
        "WHEN 3 THEN '/doc' || CAST(doc_id % 13 AS VARCHAR) || '.pdf' "
        "WHEN 4 THEN '/doc' || CAST(doc_id % 13 AS VARCHAR) || '.pdfx' "
        "ELSE '/tmp' || CAST(doc_id % 13 AS VARCHAR) END AS path, "
        "CASE doc_id % 6 "
        "WHEN 0 THEN NOT ((doc_id // 16) % 3 = 0 AND doc_id % 13 = 7) "
        "WHEN 1 THEN FALSE WHEN 2 THEN TRUE WHEN 3 THEN FALSE "
        "WHEN 4 THEN TRUE ELSE FALSE END AS allowed "
        "FROM documents ORDER BY doc_id"
    )


def q_sitemap_urls(sf_dir: str):
    """Sitemap discovery end-to-end (round 5): every host (doc_id//16,
    doc_ids contiguous 0..N-1 — asserted via _id_shift) publishes a
    <sitemapindex> naming two child sitemaps; child k lists the host's
    docs with doc_id % 2 == k as <url> entries carrying loc, lastmod
    (2025-01-{d%28+1}) and priority (0.{d%10}, xs:decimal). The plan is
    index parse → hash-join fetch of child XML on its loc → urlset
    parse: all streaming, no driver-side sitemap walk. The twin derives
    every loc/lastmod/priority analytically from documents, so XML
    construction, namespace-lenient parsing, the join fetch, and exact
    Decimal priority conversion are all value-hash pinned.

    Output: (host, url, lastmod, priority_tenths) ordered by url."""
    from gis_scripts_ray.sources.sitemap import sitemap_urls

    shift = _id_shift(sf_dir, "documents", "doc_id")
    nh = (shift - 1) // 16 + 1
    hosts_base = ray.data.range(nh)

    def make_index(batch: pa.Table) -> pa.Table:
        hs, xmls = [], []
        for h in batch["id"].to_numpy():
            h = int(h)
            kids = "".join(
                f"<sitemap><loc>https://h{h}.example.com/sm{k}.xml</loc>"
                "</sitemap>"
                for k in range(2)
            )
            hs.append(f"h{h}.example.com")
            xmls.append(
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{kids}</sitemapindex>'
            )
        return pa.table(
            {"host": pa.array(hs, pa.string()), "xml": pa.array(xmls, pa.string())}
        )

    def make_children(batch: pa.Table) -> pa.Table:
        locs, xmls = [], []
        for h in batch["id"].to_numpy():
            h = int(h)
            for k in range(2):
                entries = "".join(
                    f"<url><loc>https://h{h}.example.com/d{d % 5}/p{d}.html"
                    f"</loc><lastmod>2025-01-{d % 28 + 1:02d}</lastmod>"
                    f"<priority>0.{d % 10}</priority></url>"
                    for d in range(h * 16, min(h * 16 + 16, shift))
                    if d % 2 == k
                )
                locs.append(f"https://h{h}.example.com/sm{k}.xml")
                xmls.append(f"<urlset>{entries}</urlset>")
        return pa.table(
            {
                "loc": pa.array(locs, pa.string()),
                "xml": pa.array(xmls, pa.string()),
            }
        )

    urls = sitemap_urls(
        hosts_base.map_batches(make_index, batch_format="pyarrow"),
        hosts_base.map_batches(make_children, batch_format="pyarrow"),
    )
    return urls.select_columns(
        ["host", "url", "lastmod", "priority_tenths"]
    ).sort("url")


def _sql_sitemap_urls() -> str:
    return (
        "SELECT 'h' || CAST(doc_id // 16 AS VARCHAR) || '.example.com' AS host, "
        "'https://h' || CAST(doc_id // 16 AS VARCHAR) || '.example.com/d' || "
        "CAST(doc_id % 5 AS VARCHAR) || '/p' || CAST(doc_id AS VARCHAR) || "
        "'.html' AS url, "
        "'2025-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') "
        "AS lastmod, "
        "doc_id % 10 AS priority_tenths "
        "FROM documents ORDER BY url"
    )


def q_blocklist_filter(sf_dir: str):
    """Domain-blocklist URL filtering (round 5, crawl hygiene): hosts
    derive deterministically from doc_id (three shapes cycling by
    doc_id % 3: deep subdomain, registrable-domain page, spam host);
    the blocklist blocks a registrable domain AND every subdomain but
    never a non-boundary lookalike — the reversed-label-prefix kernel
    (`functions/blocklist.py`, per-distinct-host ancestor walk). The
    twin spells the same semantics as NOT EXISTS (= OR LIKE '%.'||d),
    so every kept (doc_id, host) row value-hashes.

    Output: kept (doc_id, host) rows."""
    from gis_scripts_ray.functions.blocklist import blocked_mask, build_blocklist

    keys = build_blocklist(_BLOCKLIST_DOMAINS)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def filt(batch: pa.Table) -> pa.Table:
        import polars as pl

        d = pl.from_arrow(batch["doc_id"])
        if isinstance(d, pl.DataFrame):
            d = d.to_series()
        host = (
            pl.when(d % 3 == 0)
            .then(
                "a" + (d % 4).cast(pl.Utf8) + ".b" + (d % 10).cast(pl.Utf8)
                + ".example.org"
            )
            .when(d % 3 == 1)
            .then("b" + (d % 10).cast(pl.Utf8) + ".example.org")
            .otherwise("site" + (d % 20).cast(pl.Utf8) + ".spam.net")
        )
        host = pl.select(host.alias("h"))["h"]
        hosts = host.to_arrow()
        keep = ~blocked_mask(hosts, keys)
        out = pa.table({"doc_id": batch["doc_id"], "host": hosts})
        return out.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow").sort("doc_id")


def _sql_blocklist_filter() -> str:
    vals = ", ".join(f"('{d}')" for d in _BLOCKLIST_DOMAINS)
    return (
        "WITH h AS (SELECT doc_id, CASE "
        "WHEN doc_id % 3 = 0 THEN 'a' || CAST(doc_id % 4 AS VARCHAR) || "
        "'.b' || CAST(doc_id % 10 AS VARCHAR) || '.example.org' "
        "WHEN doc_id % 3 = 1 THEN 'b' || CAST(doc_id % 10 AS VARCHAR) || "
        "'.example.org' "
        "ELSE 'site' || CAST(doc_id % 20 AS VARCHAR) || '.spam.net' END AS host "
        "FROM documents), "
        f"b(d) AS (VALUES {vals}) "
        "SELECT doc_id, host FROM h WHERE NOT EXISTS "
        "(SELECT 1 FROM b WHERE h.host = b.d OR h.host LIKE '%.' || b.d) "
        "ORDER BY doc_id"
    )


_WARC_SHARDS = 8


def _warc_fixture_dir(sf_dir: str) -> str:
    import hashlib

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/graft_warc/v2_{h}_s{_WARC_SHARDS}"


def _build_warc_fixture(sf_dir: str, out: str) -> None:
    """Materialize the documents table as {_WARC_SHARDS} member-per-
    record .warc.gz shards (the CommonCrawl layout) — built
    DISTRIBUTED (per-batch record encode, per-shard group write with
    tmp+rename), warm-cached behind a _DONE marker."""
    from gis_scripts_ray.sources.warc import encode_warc_gz, http_response

    if os.path.exists(f"{out}/_DONE"):
        return
    os.makedirs(out, exist_ok=True)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_members(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        shard, member = [], []
        for d in ids:
            d = int(d)
            host = f"h{d % 50}.example"
            uri = f"http://{host}/d{d}"
            status = 404 if d % 7 == 0 else 200
            body = b"x" * (1 + d % 97)
            recs = [
                {
                    "headers": {
                        "WARC-Type": "response",
                        "WARC-Target-URI": uri,
                        "WARC-Record-ID": f"<urn:uuid:{d:032x}>",
                    },
                    "payload": http_response(status, body),
                }
            ]
            if d % 11 == 0:  # interleaved non-response records
                recs.append(
                    {
                        "headers": {
                            "WARC-Type": "request",
                            "WARC-Target-URI": uri,
                        },
                        "payload": f"GET /d{d} HTTP/1.1\r\n\r\n".encode(),
                    }
                )
            member.append(encode_warc_gz(recs))
            shard.append(d % _WARC_SHARDS)
        return pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "doc_id": batch["doc_id"],
                "member": pa.array(member, pa.binary()),
            }
        )

    members = ds.map_batches(to_members, batch_format="pyarrow")

    def write_shard(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        g = g.sort_by("doc_id")
        s = g["shard"][0].as_py()
        path = f"{out}/part-{s:04d}.warc.gz"
        tmp = f"{path}.tmp-{os.getpid()}"
        offs, lens, uris = [], [], []
        pos = 0
        with open(tmp, "wb") as f:
            for did, m in zip(g["doc_id"].to_pylist(), g["member"]):
                blob = m.as_py()
                f.write(blob)
                offs.append(pos)
                lens.append(len(blob))
                uris.append(f"http://h{did % 50}.example/d{did}")
                pos += len(blob)
        os.replace(tmp, path)
        # CDX-style member index: (uri, shard file, byte offset, length)
        idx = pa.table(
            {
                "target_uri": pa.array(uris, pa.string()),
                "warc_file": pa.array([path] * len(offs), pa.string()),
                "offset": pa.array(offs, pa.int64()),
                "length": pa.array(lens, pa.int64()),
            }
        )
        itmp = f"{out}/index-{s:04d}.parquet.tmp-{os.getpid()}"
        pq.write_table(idx, itmp)
        os.replace(itmp, f"{out}/index-{s:04d}.parquet")
        return pa.table({"shard": pa.array([s], pa.int64())})

    n = (
        members.groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .count()
    )
    assert n == _WARC_SHARDS, f"warc fixture wrote {n} shards"
    with open(f"{out}/_DONE", "w") as f:
        f.write("ok\n")


def q_warc_host_stats(sf_dir: str):
    """WARC source end-to-end (round 5): the documents table
    materializes as 8 member-per-record .warc.gz shards (the
    CommonCrawl layout — each record its own gzip member, so records
    split without decompressing the shard), then ``read_warc`` streams
    the members back (one task per shard file, the web-archive parallel
    unit), parses WARC headers + embedded HTTP status lines, filters to
    response records, and aggregates per host. The twin recomputes
    host/status/body-length from documents in closed form — any gzip-
    member walk, header framing, Content-Length, or HTTP parse defect
    breaks the value hash.

    Output: (host, sum_blen, sum_is404, n) per host."""
    import glob as _glob

    import polars as pl

    from gis_scripts_ray.sources.warc import read_warc

    out = _warc_fixture_dir(sf_dir)
    _build_warc_fixture(sf_dir, out)
    files = sorted(_glob.glob(f"{out}/part-*.warc.gz"))
    ds = read_warc(files)

    def slim(batch: pa.Table) -> pa.Table:
        resp = batch.filter(pc.equal(batch["warc_type"], "response"))
        s = pl.from_arrow(resp["target_uri"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        host = s.str.extract(r"^http://([^/]+)/", 1)
        return pa.table(
            {
                "host": pa.array(host.to_list(), pa.string()),
                "blen": pc.cast(pc.binary_length(resp["body"]), pa.int64()),
                "is404": pc.cast(
                    pc.equal(resp["http_status"], 404), pa.int64()
                ),
            }
        )

    return cell_sum_count(
        ds.map_batches(slim, batch_format="pyarrow"), ["host"], ["blen", "is404"]
    )


def _sql_warc_host_stats() -> str:
    return (
        "WITH f AS (SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example' "
        "AS host, 1 + doc_id % 97 AS blen, "
        "CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS is404 FROM documents) "
        "SELECT host, CAST(SUM(blen) AS BIGINT) AS sum_blen, "
        "CAST(SUM(is404) AS BIGINT) AS sum_is404, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY host"
    )


def q_warc_record_fetch(sf_dir: str):
    """CDX-style record-level random access (round 5 — the payoff of
    member-per-record gzip and the third storage-pushdown path after
    ``clip_pushdown`` and ``term_search_pushdown``): fetch ONLY the
    docs with doc_id % 37 == 0 from the WARC shards via the byte-offset
    index written at fixture-build time — the index filters first, then
    each shard task seeks to exactly the hit members' offsets and
    decompresses those members alone (bytes read = the hits' lengths,
    never the corpus; asserted in tests/test_warc.py). The twin
    recomputes the same docs from documents in closed form.

    Output: (host, sum_blen, sum_is404, n) over the fetched subset."""
    import glob as _glob

    import polars as pl

    from gis_scripts_ray.sources.warc import fetch_warc_records

    out = _warc_fixture_dir(sf_dir)
    _build_warc_fixture(sf_dir, out)
    index = ray.data.read_parquet(sorted(_glob.glob(f"{out}/index-*.parquet")))
    wanted = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def to_uris(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sel = ids[ids % 37 == 0]
        return pa.table(
            {
                "u": pa.array(
                    [f"http://h{int(d) % 50}.example/d{int(d)}" for d in sel],
                    pa.string(),
                )
            }
        )

    uris = [
        u
        for b in wanted.map_batches(to_uris, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        for u in b["u"].to_pylist()
    ]  # the probe set is small by construction (1/37 of ids)
    ds = fetch_warc_records(index, uris)

    def slim(batch: pa.Table) -> pa.Table:
        resp = batch.filter(pc.equal(batch["warc_type"], "response"))
        s = pl.from_arrow(resp["target_uri"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        host = s.str.extract(r"^http://([^/]+)/", 1)
        return pa.table(
            {
                "host": pa.array(host.to_list(), pa.string()),
                "blen": pc.cast(pc.binary_length(resp["body"]), pa.int64()),
                "is404": pc.cast(
                    pc.equal(resp["http_status"], 404), pa.int64()
                ),
            }
        )

    return cell_sum_count(
        ds.map_batches(slim, batch_format="pyarrow"), ["host"], ["blen", "is404"]
    )


def _sql_warc_record_fetch() -> str:
    return (
        "WITH f AS (SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example' "
        "AS host, 1 + doc_id % 97 AS blen, "
        "CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS is404 FROM documents "
        "WHERE doc_id % 37 = 0) "
        "SELECT host, CAST(SUM(blen) AS BIGINT) AS sum_blen, "
        "CAST(SUM(is404) AS BIGINT) AS sum_is404, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY host"
    )


def q_pdf_text_tokens(sf_dir: str):
    """PDF text extraction end-to-end (round 5): each doc gets a REAL
    single-page PDF (FlateDecode-compressed content stream for even
    doc_ids, raw for odd — both real paths) whose text layer carries 12
    tokens t_k = 't' || ((doc_id*31 + k*17) % 1000), newline every 4
    tokens, plus a hostile constant line 'h(x)\\\\y' that exercises the
    paren/backslash escape machinery. ``PdfTextStage`` extracts the text
    (object scan, zlib inflate, content-operator string scanner); a
    vectorized polars pass parses the token values back and sums them
    per doc. The twin recomputes the sums in closed form — any object/
    stream/escape/operator defect breaks the value hash.

    Output: (lang, sum_val, n) per language."""
    import polars as pl

    from gis_scripts_ray.stages.pdftext import encode_pdf_text, pdf_texts

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def make_pdf(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        blobs = []
        for d in ids:
            d = int(d)
            toks = [f"t{(d * 31 + k * 17) % 1000}" for k in range(12)]
            lines = [" ".join(toks[j : j + 4]) for j in range(0, 12, 4)]
            text = "\n".join(lines) + "\nh(x)\\y"
            # doc_id%3==2 rows ship ENCRYPTED (standard security
            # handler, cycling rev 2/3 RC4, rev 4 AESV2, rev 5 AESV3
            # via (d//3)%4) — decoded_ok is asserted downstream, so the
            # oracle proves real decryption on all four cipher paths
            # (rev 6's hardened ~1 s/doc KDF stays unit-test-covered)
            blobs.append(
                encode_pdf_text(
                    text,
                    compress=(d % 2 == 0),
                    encrypt_rev=(2, 3, 4, 5)[(d // 3) % 4]
                    if d % 3 == 2
                    else None,
                )
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "pdf": pa.array(blobs, pa.binary()),
            }
        )

    payloads = ds.map_batches(make_pdf, batch_format="pyarrow")
    texts = pdf_texts(payloads, payload_col="pdf", concurrency=2)

    def slim(batch: pa.Table) -> pa.Table:
        assert pc.all(batch["decoded_ok"]).as_py() in (True, None)
        if len(batch):
            # the escape-machinery canary must have survived extraction
            assert pc.all(
                pc.match_substring(batch["pdf_text"], "h(x)\\y")
            ).as_py()
        s = pl.from_arrow(batch["pdf_text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        vals = (
            s.str.extract_all(r"t\d+")
            .list.eval(pl.element().str.slice(1).cast(pl.Int64))
            .list.sum()
        )
        return pa.table(
            {
                "lang": batch["lang"],
                "val": pa.array(vals.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return cell_sum_count(
        texts.map_batches(slim, batch_format="pyarrow"), ["lang"], ["val"]
    )


def _sql_pdf_text_tokens() -> str:
    return (
        "WITH per AS (SELECT doc_id, lang, "
        "SUM((doc_id*31 + k.range*17) % 1000) AS v "
        "FROM documents, range(0, 12) k GROUP BY doc_id, lang) "
        "SELECT lang, CAST(SUM(v) AS BIGINT) AS sum_val, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY lang"
    )


_STRAT_RATES_BP = {"en": 2500, "de": 7500, "fr": 10000, "es": 500, "zh": 0}


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling (``sampling.sample_stratified``):
    per-language keep rates in basis points — the class-balancing
    resample (downsample the dominant class, keep rare classes whole,
    drop one entirely). Row-exact, order-free, RNG-free: the SQL twin
    spells the identical wrapping HUGEINT arithmetic, so the surviving
    ROW SET (not just counts) must match.

    Output: every surviving (doc_id, lang) row."""
    from gis_scripts_ray.stages.sampling import sample_stratified

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = sample_stratified(ds, "lang", _STRAT_RATES_BP, id_col="doc_id")
    return out.sort("doc_id")


def _sql_stratified_sample() -> str:
    from gis_scripts_ray.stages.sampling import stratified_sql_predicate

    return (
        "SELECT doc_id, lang FROM documents WHERE "
        + stratified_sql_predicate("lang", _STRAT_RATES_BP, "doc_id")
        + " ORDER BY doc_id"
    )


def q_harmonize_params(sf_dir: str):
    """Mosaic harmonization with a DERIVED-INVARIANT oracle (round-2
    verdict #9): the lstsq gain/offset values themselves are not
    SQL-expressible (planted-distortion recovery is proven in
    tests/test_pipelines.py), but two consequences are checkable:

    * ``n_cells`` — the distinct z4 cells each source occupies, which the
      solve's constraint graph is built from (REAL values, SQL-checked);
    * ``resid_improved`` — the weighted least-squares objective at the
      solved params is <= the identity-params objective (identity is a
      feasible point of the minimization, so a correct solver can never
      violate this; a broken one would).

    Output: one row per source (source, n_cells, resid_improved)."""
    from gis_scripts_ray.pipelines.mosaic import solve_source_adjustments
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    ds = encode_cells(
        located_documents(sf_dir, ("doc_id", "source", "n_chars")),
        EncodeConfig(tile_z=4),
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": pc.add(pc.multiply(batch["tile_x"], 100), batch["tile_y"]),
                "source": batch["source"],
                "v": pc.cast(batch["n_chars"], pa.float64()),
            }
        )

    slim = ds.map_batches(prep, batch_format="pyarrow")
    stats = pa.Table.from_pandas(
        cell_sum_count(slim, ["cell", "source"], ["v"]).to_pandas(),
        preserve_index=False,
    )
    assert set(stats.column_names) == {"cell", "source", "sum_v", "n"}
    params = solve_source_adjustments(stats)

    df = stats.to_pandas()
    df["mean"] = df["sum_v"] / df["n"]
    df = df.sort_values(["cell", "source"], kind="mergesort").reset_index(drop=True)

    def objective(p: dict) -> float:
        tot = 0.0
        for _, cg in df.groupby("cell", sort=True):
            if len(cg) < 2:
                continue
            rows = list(cg.itertuples())
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    a_i, b_i = p[rows[i].source]
                    a_j, b_j = p[rows[j].source]
                    w = np.sqrt(min(rows[i].n, rows[j].n))
                    tot += (
                        w * (a_i * rows[i].mean + b_i - a_j * rows[j].mean - b_j)
                    ) ** 2
        for a, b in p.values():
            tot += (a - 1.0) ** 2 + b**2  # anchor rows (anchor_weight=1)
        return tot

    identity = {s: (1.0, 0.0) for s in params}
    improved = objective(params) <= objective(identity) + 1e-9
    per_source = (
        df.groupby("source")["cell"].nunique().sort_index()
    )
    return pa.table(
        {
            "source": pa.array(per_source.index.to_list(), pa.string()),
            "n_cells": pa.array(per_source.to_numpy().astype(np.int64), pa.int64()),
            "resid_improved": pa.array(
                np.full(len(per_source), int(improved), dtype=np.int64), pa.int64()
            ),
        }
    )


def _sql_harmonize_params() -> str:
    """Twin of the derived invariant: per-source distinct-cell counts from
    the same z4 cell key; a correct solver always satisfies the residual
    inequality, so its flag is the constant 1."""
    x, y = _tile_sql(4)
    return (
        _located_cte("d.doc_id, d.source")
        + f" SELECT source, CAST(COUNT(DISTINCT ({x})*100 + ({y})) AS BIGINT) AS n_cells, "
        "CAST(1 AS BIGINT) AS resid_improved FROM located GROUP BY source"
    )


def q_train_eval(sf_dir: str):
    """T1 analog: deterministic split -> distributed full-batch softmax
    regression on the embeddings table (per-epoch gradient partials x
    blocks, model broadcast back) -> per-class val confusion counts.

    DERIVED-INVARIANT oracle (round-2 verdict #9): the trained
    ``n_correct`` values are iterative-GD state, not SQL-expressible
    (generalization floor asserted in tests/test_train.py on a planted
    label function) — but the per-label VAL TOTALS are exactly the
    hash-residue split the ``train_val_split`` twin already proves in
    SQL, and the confusion counts must sit in [0, n_total]. Output:
    (label, n_total, correct_in_range)."""
    from gis_scripts_ray.pipelines.train import train_eval

    out = train_eval(sf_dir, epochs=20)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    ok = (df["n_correct"].to_numpy() >= 0) & (
        df["n_correct"].to_numpy() <= df["n_total"].to_numpy()
    )
    return pa.table(
        {
            "label": pa.array(df["label"].to_numpy(), pa.int64()),
            "n_total": pa.array(df["n_total"].to_numpy(), pa.int64()),
            "correct_in_range": pa.array(ok.astype(np.int64), pa.int64()),
        }
    )


def _sql_train_eval() -> str:
    """Twin of the derived invariant: per-label val-split counts (the
    same HUGEINT-mod-2^64 residue as train_val_split's proven twin);
    a correct trainer's confusion counts are always in range (flag 1)."""
    from gis_scripts_ray.stages.sampling import split_sql_predicate

    return (
        "SELECT label, CAST(COUNT(*) AS BIGINT) AS n_total, "
        "CAST(1 AS BIGINT) AS correct_in_range FROM embeddings "
        f"WHERE {split_sql_predicate('vec_id', 20, val_side=True)} GROUP BY label"
    )


def q_train_eval_conv(sf_dir: str):
    """T1 with the REAL conv architecture (round-4 closure of the last
    partial): deterministic 8x8 uint8 images (bright 2x2 blob in
    quadrant ``doc_id % 4`` over integer-hash noise — no RNG anywhere)
    -> deterministic split -> distributed full-batch GD on the
    pure-numpy 2-conv + GAP + softmax net (``pipelines/convnet.py``;
    per-epoch gradient partials x blocks, flat parameter vector
    broadcast back) -> per-class val confusion counts.

    Same DERIVED-INVARIANT oracle shape as ``train_eval``: trained
    ``n_correct`` is iterative-GD state (gradient exactness + planted-
    pattern generalization proven in tests/test_convnet.py); the
    per-label VAL TOTALS are the SQL-provable hash-residue split over
    ``doc_id % 4`` labels. Output: (label, n_total, correct_in_range)."""
    from gis_scripts_ray.pipelines.convnet import predict_convnet, train_convnet
    from gis_scripts_ray.stages.sampling import split_train_val
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        n = len(ids)
        p = np.arange(64, dtype=np.int64)
        noise = ((ids[:, None] * 2654435761 + p[None, :] * 40503) % 97) * 51 // 97
        imgs = noise.astype(np.uint8).reshape(n, 8, 8)
        labels = (ids % 4).astype(np.int64)
        r = (labels >= 2) * 4
        c = (labels % 2) * 4
        rows = np.arange(n)
        for dr in (1, 2):
            for dc in (1, 2):
                imgs[rows, r + dr, c + dc] = 230
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "thumb": pa.FixedSizeListArray.from_arrays(
                    pa.array(imgs.reshape(-1), pa.uint8()), 64
                ),
                "label": pa.array(labels, pa.int64()),
            }
        )

    imgs = ds.map_batches(make_images, batch_format="pyarrow")
    train, val = split_train_val(imgs, "doc_id", val_pct=20)
    _, flat = train_convnet(
        train.materialize(), epochs=12, n_classes=4, seed=7
    )
    scored = predict_convnet(val, {"n_classes": 4, "seed": 7}, flat)

    def prep(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy().astype(np.int64)
        pred = batch["pred"].to_numpy()
        return pa.table(
            {
                "label": pa.array(lab, pa.int64()),
                "correct": pa.array((lab == pred).astype(np.int64), pa.int64()),
            }
        )

    out = cell_sum_count(
        scored.map_batches(prep, batch_format="pyarrow"), ["label"], ["correct"]
    )
    df = out.to_pandas()
    ok = (df["sum_correct"].to_numpy() >= 0) & (
        df["sum_correct"].to_numpy() <= df["n"].to_numpy()
    )
    return pa.table(
        {
            "label": pa.array(df["label"].to_numpy(), pa.int64()),
            "n_total": pa.array(df["n"].to_numpy(), pa.int64()),
            "correct_in_range": pa.array(ok.astype(np.int64), pa.int64()),
        }
    )


def _sql_train_eval_conv() -> str:
    """Twin of the derived invariant: per-(doc_id % 4) val-split counts
    via the proven hash-residue predicate; a correct trainer's confusion
    counts are always in range (flag 1)."""
    from gis_scripts_ray.stages.sampling import split_sql_predicate

    return (
        "SELECT doc_id % 4 AS label, CAST(COUNT(*) AS BIGINT) AS n_total, "
        "CAST(1 AS BIGINT) AS correct_in_range FROM documents "
        f"WHERE {split_sql_predicate('doc_id', 20, val_side=True)} GROUP BY doc_id % 4"
    )


def _pii_planted(sf_dir: str):
    """Documents with a deterministic planted-PII suffix (the synthetic
    corpus contains none): doc d gains one email, one phone and one IPv4
    derived from doc_id — reproduced verbatim by string concat in SQL."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        d = pc.cast(batch["doc_id"], pa.string())
        oct_ = pa.array((ids % 256).astype(str), pa.string())
        suffix_parts = [
            pa.array(np.full(len(ids), " reach user"), pa.string()), d,
            pa.array(np.full(len(ids), "@example.com or 555-123-4567 via 10.0."), pa.string()),
            oct_, pa.array(np.full(len(ids), "."), pa.string()), oct_,
        ]
        text = pc.binary_join_element_wise(
            pc.fill_null(batch["text"], ""), *suffix_parts, ""
        )
        return pa.table({"doc_id": batch["doc_id"], "lang": batch["lang"], "text": text})

    return ds.map_batches(plant, batch_format="pyarrow")


_PII_SUFFIX_SQL = (
    "COALESCE(text, '') || ' reach user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or 555-123-4567 via 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR)"
)


def q_pii_scan_counts(sf_dir: str):
    """PII scan (stages/pii.py): per-lang totals of email/phone/IPv4
    matches over the planted-PII corpus — one fused vectorized-regex
    pass, partial pre-agg, adaptive combine. Output: (lang, sum_n_email,
    sum_n_phone, sum_n_ipv4, n)."""
    from gis_scripts_ray.stages.pii import pii_scan

    counts = pii_scan(_pii_planted(sf_dir))
    return cell_sum_count(
        counts.select_columns(["lang", "n_email", "n_phone", "n_ipv4"]),
        ["lang"],
        ["n_email", "n_phone", "n_ipv4"],
    )


def _sql_pii_scan_counts() -> str:
    from gis_scripts_ray.stages.pii import PII_PATTERNS

    cols = ", ".join(
        f"CAST(SUM(len(regexp_extract_all(t, '{pat}'))) AS BIGINT) AS sum_n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    return (
        f"WITH p AS (SELECT lang, {_PII_SUFFIX_SQL} AS t FROM documents) "
        f"SELECT lang, {cols}, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY lang"
    )


def q_pii_redact(sf_dir: str):
    """PII redaction (stages/pii.py): the redacted TEXT itself is the
    oracle payload — the SQL twin applies the identical patterns in the
    identical order via nested regexp_replace, so the value hash covers
    every byte of every scrubbed document. Output: (doc_id, text)."""
    from gis_scripts_ray.stages.pii import pii_redact

    out = pii_redact(_pii_planted(sf_dir))
    return out.select_columns(["doc_id", "text"])


def _sql_pii_redact() -> str:
    from gis_scripts_ray.stages.pii import PII_PATTERNS

    expr = _PII_SUFFIX_SQL
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def q_doc_chunks(sf_dir: str):
    """Document chunking (stages/chunking.py): 64-word windows every 48
    words, one row per chunk, chunk TEXT itself oracle-hashed (the SQL
    twin rebuilds every chunk with generate_series x array_slice).
    Output: (doc_id, chunk_idx, n_words, chunk_text)."""
    from gis_scripts_ray.stages.chunking import chunk_documents

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return chunk_documents(ds, chunk_size=64, stride=48)


def _sql_doc_chunks() -> str:
    from gis_scripts_ray.stages.chunking import chunk_sql_twin

    return chunk_sql_twin(chunk_size=64, stride=48)


def q_quantized_topk(sf_dir: str):
    """Int8-quantized retrieval (stages/quantize.py): per-vector
    symmetric quantization with a cross-engine bit-exact rule
    (float64 ``floor((v*127)/max|v|)``), then top-10 by INTEGER dot
    product against vec 0's quantized vector — per-block partial top-k
    with (score DESC, id ASC) ties, integer domain end to end. The SQL
    twin quantizes identically (list_transform + floor) and scores with
    list_dot_product (exact: |dot| <= 64 * 127^2 << 2^53).
    Output: (vec_id, score)."""
    import pyarrow.parquet as pq

    from gis_scripts_ray.stages.quantize import quantize_row, quantized_topk

    path = f"{sf_dir}/embeddings.parquet"
    row0 = pq.read_table(path, columns=["vec_id", "embedding"], filters=[("vec_id", "=", 0)])
    q0 = np.array(quantize_row(row0["embedding"][0].as_py()), dtype=np.int32)
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return quantized_topk(ds, q0, k=10)


def _sql_quantized_topk() -> str:
    from gis_scripts_ray.stages.quantize import quantize_sql_expr

    expr = quantize_sql_expr("embedding")
    return (
        f"WITH qt AS (SELECT vec_id, {expr} AS qv FROM embeddings), "
        "q0 AS (SELECT qv AS q FROM qt WHERE vec_id = 0) "
        "SELECT qt.vec_id, CAST(list_dot_product("
        "list_transform(qt.qv, x -> CAST(x AS DOUBLE)), "
        "list_transform(q0.q, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score "
        "FROM qt, q0 ORDER BY score DESC, vec_id LIMIT 10"
    )


def q_smoothed_grid(sf_dir: str):
    """Distributed nodata-aware grid smoothing (stages/smoothing.py —
    M13 at grid scale): events hash into a sparse 89x97 cell grid
    (collisions pre-aggregated by cell_sum_count), then ONE
    halo-replicated stripe shuffle runs the separable binomial
    [1,4,6,4,1] convolution of value and mask per stripe. Integer
    kernel keeps (num, den) exact int64, so the SQL twin (present-cell
    neighbor join against the weight VALUES table) hash-matches.
    Output: (y, x, num, den) per present cell."""
    from gis_scripts_ray.stages.smoothing import smooth_grid_distributed

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )

    def to_cells(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "y": pa.array((eid // 97) % 89, pa.int64()),
                "x": pa.array(eid % 97, pa.int64()),
                "v": pa.array(
                    batch["user_id"].to_numpy().astype(np.int64) % 1000, pa.int64()
                ),
            }
        )

    cells = cell_sum_count(ds.map_batches(to_cells, batch_format="pyarrow"), ["y", "x"], ["v"])
    return smooth_grid_distributed(
        cells,
        np.array([1, 4, 6, 4, 1], dtype=np.int64),
        height=89,
        width=97,
        stripe=16,
        value_col="sum_v",
    )


def _sql_smoothed_grid() -> str:
    return (
        "WITH cells AS (SELECT (event_id // 97) % 89 AS y, event_id % 97 AS x, "
        "SUM(user_id % 1000) AS v FROM events GROUP BY 1, 2), "
        "w(d, wt) AS (SELECT * FROM (VALUES (-2, 1), (-1, 4), (0, 6), (1, 4), (2, 1)) t) "
        "SELECT a.y, a.x, CAST(SUM(wy.wt * wx.wt * b.v) AS BIGINT) AS num, "
        "CAST(SUM(wy.wt * wx.wt) AS BIGINT) AS den "
        "FROM cells a CROSS JOIN w wy CROSS JOIN w wx "
        "JOIN cells b ON b.y = a.y + wy.d AND b.x = a.x + wx.d "
        "GROUP BY a.y, a.x"
    )


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/decontam.py): docs with
    doc_id % 101 == 0 form the benchmark set; the corpus is documents
    UNION a shifted copy (doc_id + max(doc_id)+1, same text — so
    contamination includes true CROSS-doc n-gram sharing, not just
    self-hits, and shifted ids can never collide with originals at ANY
    scale — a hard-coded shift would); every
    corpus doc sharing >= 1 word 8-gram with the benchmark is flagged
    with its distinct-shared-ngram count. Ray matches 64-bit rolling
    n-gram hashes (the scale path); the SQL twin matches the n-gram
    STRINGS (equal strings <=> equal word sequences <=> equal hashes,
    collision odds ~1e-12 here). Output: (doc_id, n_hits)."""
    from ray.data.aggregate import Max

    from gis_scripts_ray.stages.decontam import decontaminate_hits

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # shift = max(doc_id)+1, derived from the data exactly like the SQL
    # twin's scalar subquery (id-column-only scan, driver gets one int)
    id_shift = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .aggregate(Max("doc_id"))["max(doc_id)"]
        + 1
    )

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.add(batch["doc_id"], id_shift), "text": batch["text"]}
        )

    corpus = docs.union(docs.map_batches(shift, batch_format="pyarrow"))

    def bench_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return batch.filter(pa.array(ids % 101 == 0))

    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    return decontaminate_hits(corpus, bench, n=8)


def _sql_decontaminate() -> str:
    return (
        "WITH sh AS (SELECT MAX(doc_id) + 1 AS s FROM documents), "
        "corp AS (SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + (SELECT s FROM sh), text FROM documents), "
        "ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM corp), "
        "cg AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 7), ' ') AS g "
        "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i FROM ws)), "
        "bg AS (SELECT DISTINCT g FROM cg "
        "WHERE doc_id % 101 = 0 AND doc_id < (SELECT s FROM sh)) "
        "SELECT c.doc_id, CAST(COUNT(DISTINCT c.g) AS BIGINT) AS n_hits "
        "FROM cg c JOIN bg ON c.g = bg.g GROUP BY c.doc_id"
    )


def q_checkpoint_resume(sf_dir: str):
    """Resumable partitioned write: writes, drops one partition, resumes;
    returns per-partition manifest rows (n partitions x n_rows)."""
    import os
    import shutil
    import tempfile

    from gis_scripts_ray.state.checkpoint import (
        Manifest,
        write_partitioned_resumable,
    )

    out_dir = os.path.join(tempfile.gettempdir(), "graft_ckpt_query")
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def part_fn(batch: pa.Table) -> pa.Array:
        return pc.cast(batch["lang"], pa.string())

    write_partitioned_resumable(ds, out_dir, part_fn, lineage="q1")
    man = Manifest(out_dir)
    os.remove(os.path.join(man.manifest_dir, "part-de.json"))
    shutil.rmtree(man.partition_dir("de"))
    write_partitioned_resumable(ds, out_dir, part_fn, lineage="q2")
    done = man.completed()
    keys = sorted(done)
    return pa.table(
        {
            "part_key": pa.array(keys, pa.string()),
            "n_rows": pa.array([done[k].n_rows for k in keys], pa.int64()),
        }
    )


def q_text_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints, promoted to a DERIVED-INVARIANT
    oracle (same pattern as ``simhash_fingerprints``): identical texts
    MUST fingerprint identically, so over documents + an id-shifted exact
    copy the engine-measured distinct-fingerprint count per exact-text
    group is 1, and the engine tokenizer's token count is SQL-checkable
    against the space-count expression (the ``token_counts`` twin's form).
    Raw fingerprint values stay covered by TestTextKernelParity.

    Output: (group_id, n_docs, n_distinct_fp, n_tokens) per group."""
    from gis_scripts_ray.stages.textstages import rolling_fingerprint

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shift_id = _id_shift(sf_dir, "documents", "doc_id")

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.add(batch["doc_id"], shift_id), "text": batch["text"]}
        )

    both = ds.union(ds.map_batches(shift, batch_format="pyarrow"))

    def rows(batch: pa.Table) -> pa.Table:
        out = rolling_fingerprint(batch)
        toks = pc.cast(pc.add(pc.count_substring(batch["text"], " "), 1), pa.int64())
        h1, h2 = _text_hash_cols(batch["text"])
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "fingerprint": out["fingerprint"],
                "n_tokens": toks,
                "h1": h1,
                "h2": h2,
            }
        )

    return _fingerprint_group_summary(
        both.map_batches(rows, batch_format="pyarrow"),
        shift_id,
        fp_col="fingerprint",
        distinct_col="n_distinct_fp",
        aux_col="n_tokens",
    )


def _sql_text_fingerprints() -> str:
    return (
        "SELECT CAST(MIN(doc_id) AS BIGINT) AS group_id, "
        "CAST(COUNT(*) * 2 AS BIGINT) AS n_docs, "
        "CAST(1 AS BIGINT) AS n_distinct_fp, "
        "CAST(MIN(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT) "
        "AS n_tokens FROM documents GROUP BY text ORDER BY group_id"
    )


def q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition quality counters per document (duplicate
    tokens, most-frequent-bigram count, duplicate trigrams) — the
    integer numerators/denominators of the published repetition filters,
    so the distributed result is order-independent and the float rules
    are single divisions of exact values. Per-doc metric: embarrassingly
    parallel ``map_batches``, zero shuffle at any scale."""
    from gis_scripts_ray.stages.textstages import repetition_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(repetition_stats, batch_format="pyarrow")


def _sql_gopher_repetition() -> str:
    return """
WITH toks AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l FROM documents
), tok AS (
  SELECT doc_id, unnest(l) AS w FROM toks
), tok_counts AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
), big AS (
  SELECT doc_id, unnest(list_zip(l, l[2:])) AS z FROM toks
), bigram_counts AS (
  SELECT doc_id, z[1] || ' ' || z[2] AS g, COUNT(*) AS c
  FROM big WHERE z[2] IS NOT NULL GROUP BY doc_id, g
), tri AS (
  SELECT doc_id, unnest(list_zip(l, l[2:], l[3:])) AS z FROM toks
), trigram_counts AS (
  SELECT doc_id, z[1] || ' ' || z[2] || ' ' || z[3] AS g, COUNT(*) AS c
  FROM tri WHERE z[3] IS NOT NULL GROUP BY doc_id, g
)
SELECT t.doc_id,
  CAST(SUM(c) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_tokens,
  CAST(COALESCE((SELECT MAX(c) FROM bigram_counts b WHERE b.doc_id = t.doc_id), 0)
       AS BIGINT) AS max_bigram_n,
  CAST(COALESCE((SELECT SUM(CASE WHEN c >= 2 THEN c ELSE 0 END)
                 FROM trigram_counts x WHERE x.doc_id = t.doc_id), 0)
       AS BIGINT) AS dup_trigram_n
FROM tok_counts t GROUP BY t.doc_id
"""


def q_boilerplate_ngrams(sf_dir: str):
    """Corpus boilerplate detection: top-20 word 5-grams by DOCUMENT
    frequency (an n-gram shared verbatim across many documents is
    navigation chrome / licence text). Plan: in-batch distinct-per-doc
    partial df counts -> adaptive combine sum -> PER-BLOCK top-k prune
    (valid once each ngram is globally unique; same (df DESC, ngram ASC)
    total order as the finish) -> global sort+limit over k rows per
    block, so the final sort never sees the full ngram table."""
    from gis_scripts_ray.stages.textstages import boilerplate_ngram_partials
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    k = 20
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = ds.map_batches(boilerplate_ngram_partials, batch_format="pyarrow")
    summed = coalesce_shuffle_sum(partials, ["ngram"], ["df"])

    def block_topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch,
            sort_keys=[("df", "descending"), ("ngram", "ascending")],
        )
        return batch.take(order[:k])

    pruned = summed.map_batches(block_topk, batch_format="pyarrow")
    return pruned.sort(["df", "ngram"], descending=[True, False]).limit(k)


def _sql_boilerplate_ngrams() -> str:
    return """
WITH toks AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l FROM documents
), five AS (
  SELECT doc_id, unnest(list_zip(l, l[2:], l[3:], l[4:], l[5:])) AS z FROM toks
), grams AS (
  SELECT DISTINCT doc_id,
         z[1] || ' ' || z[2] || ' ' || z[3] || ' ' || z[4] || ' ' || z[5] AS g
  FROM five WHERE z[5] IS NOT NULL
)
SELECT g AS ngram, CAST(COUNT(*) AS BIGINT) AS df
FROM grams GROUP BY g ORDER BY df DESC, ngram ASC LIMIT 20
"""


def q_vocab_coverage(sf_dir: str):
    """CCNet-style vocabulary-coverage scoring: per-doc token
    occurrences, occurrences inside the corpus top-16 vocabulary
    ((count DESC, token ASC) total order pinned cross-engine) and
    distinct out-of-vocabulary types. Plan: vocab via partial counts ->
    adaptive combine -> per-block top-v prune -> 16-row finish; the
    16-row vocab broadcasts once (``ray.put`` + per-worker cache) into
    ONE fused per-doc pass — zero shuffle of document rows at any
    scale (the vocab is a bounded config, like decontam's eval set)."""
    import ray as _ray

    from gis_scripts_ray.stages.textstages import vocab_coverage_batch, vocab_topv
    from gis_scripts_ray.state.broadcast import worker_broadcast

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    vocab = tuple(
        vocab_topv(ds, v=16).to_pandas()["token"].tolist()
    )  # 16 rows — bounded by config, not by data
    ref = _ray.put(vocab)

    def fused(batch: pa.Table) -> pa.Table:
        return vocab_coverage_batch(batch, worker_broadcast(ref))

    return ds.map_batches(fused, batch_format="pyarrow")


def _sql_vocab_coverage() -> str:
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w FROM documents
), cnt AS (
  SELECT w, COUNT(*) AS c FROM tok GROUP BY w
), vocab AS (
  SELECT w FROM cnt ORDER BY c DESC, w ASC LIMIT 16
)
SELECT t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
  CAST(COUNT(DISTINCT CASE WHEN v.w IS NULL THEN t.w END) AS BIGINT) AS n_oov_types
FROM tok t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
"""


def q_zipf_histogram(sf_dir: str):
    """Frequency spectrum (Zipf histogram) of word bigrams: bucket =
    bit length of each bigram's global occurrence count, with per-bucket
    type and occurrence totals — the corpus-statistics profile a
    pretraining pipeline reads before choosing filter thresholds.
    Double aggregation: per-block bigram partials -> adaptive combine
    (globally unique bigrams; the only wide step) -> in-block bucket
    partials -> tiny (<= 64 buckets) second combine. Bit length via
    ``frexp`` exponent (exact < 2^53) == DuckDB
    ``length(printf('%b', c))``."""
    from gis_scripts_ray.stages.textstages import (
        ngram_occurrence_partials,
        zipf_bucket_partial,
    )
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    counts = coalesce_shuffle_sum(
        ds.map_batches(ngram_occurrence_partials, batch_format="pyarrow"),
        ["g"],
        ["c"],
    )
    buckets = counts.map_batches(zipf_bucket_partial, batch_format="pyarrow")
    return coalesce_shuffle_sum(buckets, ["bucket"], ["n_types", "n_occ"]).sort(
        "bucket"
    )


def _sql_zipf_histogram() -> str:
    return """
WITH toks AS (
  SELECT string_split(COALESCE(text, ''), ' ') AS l FROM documents
), big AS (
  SELECT unnest(list_zip(l, l[2:])) AS z FROM toks
), cnt AS (
  SELECT z[1] || ' ' || z[2] AS g, COUNT(*) AS c
  FROM big WHERE z[2] IS NOT NULL GROUP BY g
)
SELECT CAST(length(printf('%b', c)) AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(SUM(c) AS BIGINT) AS n_occ
FROM cnt GROUP BY bucket ORDER BY bucket
"""


def q_span_dedup(sf_dir: str):
    """Global duplicate-span removal (stages/spandedup.py — the C4 /
    RefinedWeb exact line-dedup shape over non-overlapping 3-word
    spans): each distinct span survives only at its globally first
    (doc_id, span_idx) occurrence; documents are rebuilt from their
    kept spans. One partial pass (24 bytes per distinct span per block
    shuffled — text never shuffles), adaptive combine, measured
    broadcast of the duplicated-span keeper map into a fused rebuild
    pass (hash-join fallback above the limit). Output:
    (doc_id, clean_text, n_spans, n_removed) — the oracle hash covers
    the rebuilt TEXT, not just counts."""
    from gis_scripts_ray.stages.spandedup import span_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return span_dedup(ds, w=3)


def _sql_span_dedup() -> str:
    return """
WITH toks AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l,
         len(string_split(COALESCE(text, ''), ' ')) AS n
  FROM documents
), spans AS (
  SELECT doc_id, gs.k AS si,
         array_to_string(array_slice(l, gs.k*3 + 1, gs.k*3 + 3), ' ') AS span
  FROM toks, LATERAL (
    SELECT unnest(generate_series(0, CAST((n + 2) // 3 AS BIGINT) - 1)) AS k
  ) gs
), ranked AS (
  SELECT doc_id, si, span,
         ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, si) AS rn
  FROM spans
)
SELECT doc_id,
  COALESCE(string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY si), '')
    AS clean_text,
  CAST(COUNT(*) AS BIGINT) AS n_spans,
  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM ranked GROUP BY doc_id
"""


def q_canonical_url_dedup(sf_dir: str):
    """Canonical-URL dedup (functions/urlnorm.py — the CommonCrawl "same
    page, many spellings" discipline; reference analogy: the D1 skip-if-done
    download dedup of ``seagrass_lib.py``, keyed on the web-corpus URL).

    Synthesizes four deterministic messy spelling variants per doc
    (scheme/case/www/port/query/fragment/trailing-slash noise), runs the
    REAL vectorized normalizer over them, keeps the minimum doc_id per
    canonical URL (first-wins), and rolls the kept set up per host. The SQL
    twin derives the canonical form ANALYTICALLY (``host/p{doc_id // 3}``;
    exact on non-negative ids where trunc == floor) — an independent
    derivation, so any normalizer defect hash-mismatches rather than being
    mirrored in the oracle.

    Scale shape: only (curl, min_id, count) partials ever shuffle (tens of
    bytes per distinct URL per block); the per-host rollup is a second
    bounded combine. No driver materialization at any step."""
    from gis_scripts_ray.functions.urlnorm import (
        canonicalize_urls,
        variant_urls_for_docs,
    )
    from gis_scripts_ray.sources.webpages import _host_index_for_doc, host_names
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    host_pool = pa.array(host_names(), pa.string())

    def url_partial(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        hosts = pc.take(host_pool, pa.array(_host_index_for_doc(d)))
        curl = canonicalize_urls(variant_urls_for_docs(d, hosts))
        t = pa.table({"curl": curl, "doc_id": pa.array(d)})
        out = t.group_by(["curl"]).aggregate([("doc_id", "min"), ([], "count_all")])
        names = {"doc_id_min": "keep_id", "count_all": "n_variants"}
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    kept = coalesce_shuffle_agg(
        ds.map_batches(url_partial, batch_format="pyarrow"),
        ["curl"],
        {"keep_id": "min", "n_variants": "sum"},
    )

    def host_partial(batch: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            batch["curl"].combine_chunks(), r"(?s)/.*$", ""
        )
        t = pa.table(
            {
                "host": host,
                "keep_id": batch["keep_id"],
                "n_variants": batch["n_variants"],
            }
        )
        out = t.group_by(["host"]).aggregate(
            [("keep_id", "sum"), ("n_variants", "sum"), ([], "count_all")]
        )
        names = {
            "keep_id_sum": "sum_keep_id",
            "n_variants_sum": "n_docs",
            "count_all": "n_kept",
        }
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    rolled = coalesce_shuffle_agg(
        kept.map_batches(host_partial, batch_format="pyarrow"),
        ["host"],
        {"sum_keep_id": "sum", "n_docs": "sum", "n_kept": "sum"},
    )
    return rolled.sort("host")


def q_lang_median_filter(sf_dir: str):
    """Per-language median-length quality gate (the CCNet-style "judge each
    document against its OWN language's distribution" filter): compute the
    exact lower median of n_chars per language (``stages/stats.
    grouped_median`` — value-compacted shuffle, never the rows), broadcast
    the tiny per-language threshold table (|languages| is bounded by the
    world's language codes — a contract, not a guess), and keep documents
    with ``n_chars >= median(their lang)``. Output: per-language kept count,
    kept character total, and kept doc_id checksum — integer domain end to
    end.

    Pipeline shape exercised: aggregate -> broadcast -> filter -> aggregate,
    with the filter threshold derived from the data itself (two passes over
    the input, no row ever shuffles)."""
    from gis_scripts_ray.stages.stats import grouped_median
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    med = grouped_median(
        ds.map_batches(
            lambda b: b.select(["lang", "n_chars"]), batch_format="pyarrow"
        ),
        ["lang"],
        "n_chars",
        out_col="med",
    )
    # |languages| rows — a compacted aggregate, bounded by the world's
    # language codes; driver materialization is the contract here.
    med_pd = med.to_pandas()
    langs = pa.array(med_pd["lang"].tolist(), pa.string())
    thr = med_pd["med"].to_numpy(dtype=np.int64)

    def filter_partial(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["lang"].combine_chunks(), langs).to_numpy(
            zero_copy_only=False
        )
        n_chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        keep = n_chars >= thr[idx.astype(np.int64)]
        t = pa.table(
            {
                "lang": pc.array_filter(batch["lang"].combine_chunks(), pa.array(keep)),
                "n_chars": pa.array(n_chars[keep]),
                "doc_id": pc.array_filter(
                    batch["doc_id"].combine_chunks(), pa.array(keep)
                ),
            }
        )
        out = t.group_by(["lang"]).aggregate(
            [("n_chars", "sum"), ("doc_id", "sum"), ([], "count_all")]
        )
        names = {
            "n_chars_sum": "sum_chars",
            "doc_id_sum": "sum_doc_id",
            "count_all": "n_kept",
        }
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    rolled = coalesce_shuffle_sum(
        ds.map_batches(filter_partial, batch_format="pyarrow"),
        ["lang"],
        ["sum_chars", "sum_doc_id", "n_kept"],
    )
    return rolled.sort("lang")


def _sql_lang_median_filter() -> str:
    # lower median pinned as the explicit window-rank formula (value at
    # ascending rank ceil(n/2)) — same convention as grouped_median_qty
    return (
        "WITH rk AS (SELECT lang, n_chars, "
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, "
        "COUNT(*) OVER (PARTITION BY lang) AS n FROM documents), "
        "med AS (SELECT lang, MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) "
        "AS med FROM rk GROUP BY lang) "
        "SELECT d.lang, CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars, "
        "CAST(SUM(d.doc_id) AS BIGINT) AS sum_doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_kept "
        "FROM documents d JOIN med m ON d.lang = m.lang "
        "WHERE d.n_chars >= m.med GROUP BY d.lang ORDER BY d.lang"
    )


_STAR_BCAST_LIMIT = 2_000_000  # neardup_clusters star-edge map broadcast guard

_MIX_WEIGHTS = {"en": 4, "de": 2, "ja": 2}  # ELSE 1; weight-sum constant 10
_MIX_WSUM = 10
_MIX_D = 1_000_000


def q_mixture_rebalance(sf_dir: str):
    """Training-mix rebalancing — deterministically subsample each language
    toward a target mixture (the "data mixing" step of LLM corpus prep:
    upweight/downweight languages to fixed proportions). Target output size
    is half the corpus, allocated by integer weights; each language gets an
    integer acceptance threshold ``t = min(D, desired * D // n_lang)`` and
    keeps exactly the rows whose multiplicative-hash residue clears it (the
    ``hash_sample`` wrap convention — order-free, partition-free,
    reproducible across engines).

    Two passes: a per-language count (bounded aggregate -> driver threshold
    table, |languages| rows), then one fused filter + partial-aggregate
    pass. All threshold arithmetic is integer (exact on both engines);
    output: (lang, n_avail, n_kept, sum_kept_id)."""
    from gis_scripts_ray.stages.tile_agg import cell_count, coalesce_shuffle_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    cnt_pd = cell_count(ds, ["lang"], alias="n").to_pandas()
    n_by_lang = dict(zip(cnt_pd["lang"].tolist(), (int(x) for x in cnt_pd["n"])))
    total = sum(n_by_lang.values())
    target = total // 2
    thr = {
        lang: min(
            _MIX_D,
            (_MIX_WEIGHTS.get(lang, 1) * target // _MIX_WSUM) * _MIX_D // n,
        )
        for lang, n in n_by_lang.items()
    }

    lang_keys = pa.array(list(thr.keys()), pa.string())
    thr_vals = np.fromiter(thr.values(), dtype=np.uint64, count=len(thr))

    def filter_partial(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["lang"].combine_chunks(), lang_keys).to_numpy(
            zero_copy_only=False
        )
        t = thr_vals[idx.astype(np.int64)]
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(_MIX_D) < t
        kept = batch.filter(pa.array(keep))
        tt = pa.table({"lang": kept["lang"], "doc_id": kept["doc_id"]})
        out = tt.group_by(["lang"]).aggregate([("doc_id", "sum"), ([], "count_all")])
        names = {"doc_id_sum": "sum_kept_id", "count_all": "n_kept"}
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    rolled = coalesce_shuffle_sum(
        ds.map_batches(filter_partial, batch_format="pyarrow"),
        ["lang"],
        ["sum_kept_id", "n_kept"],
    )

    def add_avail(batch: pa.Table) -> pa.Table:
        avail = pa.array(
            [n_by_lang[x] for x in batch["lang"].to_pylist()], pa.int64()
        )
        return pa.table(
            {
                "lang": batch["lang"],
                "n_avail": avail,
                "n_kept": batch["n_kept"],
                "sum_kept_id": batch["sum_kept_id"],
            }
        )

    return rolled.map_batches(add_avail, batch_format="pyarrow").sort("lang")


def _sql_mixture_rebalance() -> str:
    case = "CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'ja' THEN 2 ELSE 1 END"
    return (
        "WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang), "
        "tot AS (SELECT SUM(n) AS total FROM cnt), "
        f"thr AS (SELECT lang, n, LEAST({_MIX_D}, "
        f"(({case}) * ((SELECT total FROM tot) // 2) // {_MIX_WSUM}) "
        f"* {_MIX_D} // n) AS t FROM cnt) "
        "SELECT d.lang, CAST(MAX(th.n) AS BIGINT) AS n_avail, "
        "CAST(COUNT(*) AS BIGINT) AS n_kept, "
        "CAST(SUM(d.doc_id) AS BIGINT) AS sum_kept_id "
        "FROM documents d JOIN thr th ON d.lang = th.lang "
        f"WHERE ((CAST(d.doc_id AS HUGEINT)*2654435761)%{_WRAP64})%{_MIX_D} < th.t "
        "GROUP BY d.lang ORDER BY d.lang"
    )


def q_text_normalize(sf_dir: str):
    """Unicode text normalization (the C4/CCNet cleaning step —
    ``stages/textstages.normalize_text``): NFC composition, whitespace-run
    collapse, space trim, one fused map_batches, no shuffle. The oracle
    hash covers the normalized TEXT itself (DuckDB ``nfc_normalize`` +
    ``regexp_replace`` — verified byte-identical across engines incl.
    combining-character composition), so any kernel drift hash-mismatches.
    Output: (doc_id, clean_text, n_chars_clean)."""
    from gis_scripts_ray.stages.textstages import normalize_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def norm(batch: pa.Table) -> pa.Table:
        clean = normalize_text(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_chars_clean": pc.utf8_length(clean).cast(pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def _sql_text_normalize() -> str:
    return (
        "SELECT doc_id, trim(regexp_replace(nfc_normalize(COALESCE(text, '')), "
        "'[ \\t\\n\\r]+', ' ', 'g'), ' ') AS clean_text, "
        "CAST(length(trim(regexp_replace(nfc_normalize(COALESCE(text, '')), "
        "'[ \\t\\n\\r]+', ' ', 'g'), ' ')) AS BIGINT) AS n_chars_clean "
        "FROM documents"
    )


def q_incremental_dedup(sf_dir: str):
    """Incremental crawl dedup — subtract an already-ingested corpus by
    CONTENT, not id (the "only process documents we have never seen"
    discipline of a recurring crawl; reference analogy: D1 skip-if-done,
    keyed on the text itself). The reference corpus is the deterministic
    fixture slice ``doc_id % 7 == 0``; the new crawl is the full table (in
    production these are two distinct file sets — here both derive from one
    table, so the read runs once per side).

    Content key: the 128-bit text hash packed as ``fixed_size_binary(16)``
    (the Acero-safe composite-key carrier, see similarity.py). The
    subtraction is :func:`joins.hash_anti_join` — right side reduces to its
    distinct key set (the all-to-all never carries text), then a MEASURED
    broadcast or native ``left_anti`` finish. Output per language:
    (lang, sum_doc_id, n) over the surviving rows."""
    from gis_scripts_ray.stages.dedup import content_hash_cols
    from gis_scripts_ray.stages.joins import hash_anti_join
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    def keyed(batch: pa.Table) -> pa.Table:
        b = content_hash_cols(batch, "text")
        h1 = b["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = b["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hh = np.column_stack([h1, h2]).astype("<u8")
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(16), len(b), [None, pa.py_buffer(hh.tobytes())]
        )
        return pa.table(
            {"hk": packed, "doc_id": batch["doc_id"], "lang": batch["lang"]}
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    left = ds.map_batches(keyed, batch_format="pyarrow")

    def seen_filter(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(d % 7 == 0)).select(["hk"])

    seen = left.map_batches(seen_filter, batch_format="pyarrow")
    fresh = hash_anti_join(left, seen, on="hk")
    return cell_sum_count(
        fresh.map_batches(
            lambda b: b.select(["lang", "doc_id"]), batch_format="pyarrow"
        ),
        ["lang"],
        ["doc_id"],
    ).sort("lang")


def _sql_incremental_dedup() -> str:
    return (
        "SELECT d.lang, CAST(SUM(d.doc_id) AS BIGINT) AS sum_doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM documents b "
        "WHERE b.doc_id % 7 = 0 AND b.text = d.text) "
        "GROUP BY d.lang ORDER BY d.lang"
    )


def _neardup_label_ds(sf_dir: str):
    """Shared near-dup cluster formation (``q_neardup_clusters`` /
    ``q_cluster_canonical``): documents ∪ two id-shifted copies, star
    edges linking each doc to its exact-text group minimum plus
    cross-copy chain edges ``d — d+S — d+2S``, labeled by
    ``graphcc.connected_components`` (iterative min-label propagation).
    A cluster = one exact-text group across all three copies. Returns the
    (node, root) label dataset."""
    from gis_scripts_ray.stages.dedup import content_hash_cols
    from gis_scripts_ray.stages.graphcc import connected_components
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    shift = _id_shift(sf_dir, "documents", "doc_id")

    def hashed_partial(batch: pa.Table) -> pa.Table:
        b = content_hash_cols(batch, "text")
        return b.select(["h1", "h2", "doc_id"])

    hashed = ds.map_batches(hashed_partial, batch_format="pyarrow")

    def min_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["h1", "h2"]).aggregate([("doc_id", "min")])
        names = {"doc_id_min": "keep_id"}
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    stats = coalesce_shuffle_agg(
        hashed.map_batches(min_partial, batch_format="pyarrow"),
        ["h1", "h2"],
        {"keep_id": "min"},
    ).materialize()
    n_stats = stats.count()
    if n_stats <= _STAR_BCAST_LIMIT:
        # measured-size fast path: ship the sorted (h1,h2)->keep_id map once
        # (structured-dtype searchsorted — lexicographic over both hash
        # words, exact) instead of spawning join aggregators
        import ray as _ray

        dt = np.dtype([("a", "<u8"), ("b", "<u8")])
        keys = np.empty(n_stats, dtype=dt)
        keep = np.empty(n_stats, dtype=np.int64)
        i = 0
        for p in stats.iter_batches(batch_format="pyarrow"):
            n = p.num_rows
            keys["a"][i : i + n] = p["h1"].to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            keys["b"][i : i + n] = p["h2"].to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            keep[i : i + n] = p["keep_id"].to_numpy(zero_copy_only=False)
            i += n
        order = np.argsort(keys)
        ref = _ray.put((keys[order], keep[order]))

        def star_lookup(batch: pa.Table, _ref=ref) -> pa.Table:
            from gis_scripts_ray.state.broadcast import worker_broadcast

            keys_s, keep_s = worker_broadcast(_ref)
            q = np.empty(batch.num_rows, dtype=keys_s.dtype)
            q["a"] = batch["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
            q["b"] = batch["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(keys_s, q)
            return pa.table({"a": batch["doc_id"], "b": pa.array(keep_s[pos])})

        star = hashed.map_batches(star_lookup, batch_format="pyarrow")
    else:
        star = hash_join(
            hashed, stats.repartition(16), on=("h1", "h2")
        ).map_batches(
            lambda b: pa.table({"a": b["doc_id"], "b": b["keep_id"]}),
            batch_format="pyarrow",
        )

    def copy_chain(batch: pa.Table) -> pa.Table:
        # copy 1 for every doc; copy 2 only for doc_id % 3 == 0 — cluster
        # sizes 2 and 3 (and larger where texts repeat naturally), so the
        # rollup has a real size distribution to hash
        d = batch["doc_id"].combine_chunks().cast(pa.int64())
        d1 = pc.add(d, shift).cast(pa.int64())
        dn = d.to_numpy(zero_copy_only=False)
        d3 = pa.array(dn[dn % 3 == 0])
        d3_1 = pc.add(d3, shift).cast(pa.int64())
        d3_2 = pc.add(d3, 2 * shift).cast(pa.int64())
        return pa.table(
            {
                "a": pa.concat_arrays([d, d3_1]),
                "b": pa.concat_arrays([d1, d3_2]),
            }
        )

    edges = star.union(ds.map_batches(copy_chain, batch_format="pyarrow"))
    return connected_components(edges)


def q_neardup_clusters(sf_dir: str):
    """Duplicate-CLUSTER formation — the transitive-closure step that turns
    dedup pairs into clusters (the final hop of the Dolma/SlimPajama dedup
    shape; ``stages/graphcc.connected_components``, iterative min-label
    propagation, one hash-join + one adaptive combine per round).

    Fixture: documents ∪ two id-shifted copies (``_neardup_label_ds``).
    The edge set deliberately SPANS construction tasks so the merge is
    genuinely distributed: star edges link each original doc to its
    exact-text group minimum (one (h1,h2) join), while cross-copy chain
    edges link ``d — d+S — d+2S`` (a plain map_batches, different tasks).
    A cluster = one exact-text group across all three copies; min label
    needs ≤3 hops to reach every node, so propagation converges in ~4
    measured rounds.

    The SQL twin derives each cluster ANALYTICALLY (GROUP BY text over the
    union — no graph at all), so a propagation defect (dropped edge, lost
    round, bad min combine) hash-mismatches. Output: per-cluster-size
    rollup (cluster_size, n_clusters, sum_roots, sum_nodes)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    labels = _neardup_label_ds(sf_dir)

    def root_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"root": batch["root"], "node": batch["node"]})
        out = t.group_by(["root"]).aggregate([("node", "sum"), ([], "count_all")])
        names = {"node_sum": "sum_nodes", "count_all": "sz"}
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    per_cluster = coalesce_shuffle_agg(
        labels.map_batches(root_partial, batch_format="pyarrow"),
        ["root"],
        {"sum_nodes": "sum", "sz": "sum"},
    )

    def size_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cluster_size": batch["sz"],
                "root": batch["root"],
                "sum_nodes": batch["sum_nodes"],
            }
        )
        out = t.group_by(["cluster_size"]).aggregate(
            [("root", "sum"), ("sum_nodes", "sum"), ([], "count_all")]
        )
        names = {
            "root_sum": "sum_roots",
            "sum_nodes_sum": "sum_nodes",
            "count_all": "n_clusters",
        }
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    rolled = coalesce_shuffle_agg(
        per_cluster.map_batches(size_partial, batch_format="pyarrow"),
        ["cluster_size"],
        {"sum_roots": "sum", "sum_nodes": "sum", "n_clusters": "sum"},
    )
    return rolled.sort("cluster_size")


def _sql_neardup_clusters() -> str:
    shift = "(SELECT MAX(doc_id) + 1 FROM documents)"
    return (
        f"WITH u AS (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + {shift}, text FROM documents "
        f"UNION ALL SELECT doc_id + 2 * {shift}, text FROM documents "
        f"WHERE doc_id % 3 = 0), "
        "g AS (SELECT MIN(doc_id) AS root, COUNT(*) AS sz, "
        "SUM(doc_id) AS sum_nodes FROM u GROUP BY text) "
        "SELECT CAST(sz AS BIGINT) AS cluster_size, "
        "CAST(COUNT(*) AS BIGINT) AS n_clusters, "
        "CAST(SUM(root) AS BIGINT) AS sum_roots, "
        "CAST(SUM(sum_nodes) AS BIGINT) AS sum_nodes "
        "FROM g GROUP BY sz ORDER BY cluster_size"
    )


def q_cluster_canonical(sf_dir: str):
    """Canonical-document retention — the step AFTER cluster formation in
    a dedup pipeline: per near-dup cluster keep the single best doc by a
    quality score (argmax, doc_id ASC tie-break), instead of the naive
    min-id keep. Clusters come from the shared ``_neardup_label_ds``
    propagation; the quality score is the engine's wrapping-uint64
    multiplicative hash of the node id (deterministic, intra-cluster
    distinct by injectivity of the id shift); the argmax folds through
    ``topk_per_group(k=1)`` under the engine-wide (value DESC, id ASC)
    tie rule — no per-cluster rows ever reach the driver. The SQL twin
    derives clusters analytically (window over text) and recomputes the
    identical HUGEINT-wrapped score, so a propagation or ranking defect
    hash-mismatches.

    Output: (root, canonical_id, score), one row per cluster."""
    from gis_scripts_ray.stages.topk import topk_per_group

    labels = _neardup_label_ds(sf_dir)

    def score_partial(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy().astype(np.uint64)
        score = (node * np.uint64(2654435761)) % np.uint64(1_000_000)
        return pa.table(
            {
                "root": batch["root"].combine_chunks().cast(pa.int64()),
                "node": batch["node"].combine_chunks().cast(pa.int64()),
                "score": pa.array(score.astype(np.int64), pa.int64()),
            }
        )

    scored = labels.map_batches(score_partial, batch_format="pyarrow")
    top = topk_per_group(scored, "root", "score", "node", k=1)
    return top.map_batches(
        lambda b: pa.table(
            {
                "root": b["root"].combine_chunks().cast(pa.int64()),
                "canonical_id": b["node"].combine_chunks().cast(pa.int64()),
                "score": b["score"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("root")


def _sql_cluster_canonical() -> str:
    shift = "(SELECT MAX(doc_id) + 1 FROM documents)"
    return (
        f"WITH u AS (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + {shift}, text FROM documents "
        f"UNION ALL SELECT doc_id + 2 * {shift}, text FROM documents "
        f"WHERE doc_id % 3 = 0), "
        f"s AS (SELECT doc_id, text, CAST((CAST(doc_id AS HUGEINT) * "
        f"2654435761) % {_WRAP64} % 1000000 AS BIGINT) AS score FROM u), "
        "r AS (SELECT doc_id, score, "
        "MIN(doc_id) OVER (PARTITION BY text) AS root, "
        "ROW_NUMBER() OVER (PARTITION BY text "
        "ORDER BY score DESC, doc_id ASC) AS rn FROM s) "
        "SELECT root, doc_id AS canonical_id, score FROM r "
        "WHERE rn = 1 ORDER BY root"
    )


def _sql_canonical_url_dedup() -> str:
    return (
        f"WITH hx AS (SELECT doc_id, {_HIDX_SQL} AS hidx FROM documents), "
        "canon AS (SELECT printf('site%03d.example.org/p%d', "
        "CAST(hidx AS INT), doc_id // 3) AS curl, doc_id FROM hx), "
        "kept AS (SELECT curl, MIN(doc_id) AS keep_id, COUNT(*) AS n_variants "
        "FROM canon GROUP BY curl) "
        "SELECT split_part(curl, '/', 1) AS host, "
        "CAST(COUNT(*) AS BIGINT) AS n_kept, "
        "CAST(SUM(n_variants) AS BIGINT) AS n_docs, "
        "CAST(SUM(keep_id) AS BIGINT) AS sum_keep_id "
        "FROM kept GROUP BY host ORDER BY host"
    )


_DBSCAN_EPS_M = 1_500_000.0
# eps sits 32.7 km clear of EVERY realized inter-host great-circle distance
# (host_geo_table is fixed at seed 42; verified by tests/test_dbscan.py), so
# a cross-engine haversine ULP difference can never flip a <=eps decision.


def q_spatial_dbscan(sf_dir: str):
    """Distributed weighted DBSCAN over the geocoded host locations —
    density clustering of the corpus geography (the vector-side sibling of
    the M3 raster components; reference clusters rasters by adjacency in
    ``stages/components.py``'s source scripts).

    Docs aggregate to DISTINCT locations first (weight = doc count — the
    number of distinct geocoded sites is bounded by geography, not corpus
    size), then the grid-bucketed stage clusters the weighted site table:
    core site = within-1500km doc weight >= corpus//200 (exact integer
    domain), clusters = min-id connected components of core sites, border
    sites take the min core-neighbor cluster, noise = -1. Equivalent to
    classic per-doc DBSCAN because co-located docs share neighborhoods
    (pinned in tests/test_dbscan.py).
    """
    import pyarrow.parquet as pq_mod

    from gis_scripts_ray.stages.dbscan import dbscan
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    total = pq_mod.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = located_documents(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lat": b["lat"],
                "lon": b["lon"],
                "site_id": b["doc_id"].cast(pa.int64()),
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    sites = coalesce_shuffle_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["lat", "lon"],
        {"site_id": "min", "n_docs": "sum"},
    )
    res = dbscan(
        sites,
        eps_m=_DBSCAN_EPS_M,
        min_weight=total // 200,
        id_col="site_id",
        weight_col="n_docs",
    )
    return res.map_batches(
        lambda b: pa.table(
            {
                "site_id": b["id"],
                "n_docs": b["weight"],
                "is_core": b["is_core"],
                "cluster": b["cluster"],
            }
        ),
        batch_format="pyarrow",
    )


_PAIR_HAVERSINE_SQL = (
    "2.0*6371008.8*ASIN(SQRT("
    "POWER(SIN((b.lat*(PI()/180.0)-a.lat*(PI()/180.0))/2.0),2) + "
    "COS(a.lat*(PI()/180.0))*COS(b.lat*(PI()/180.0))*"
    "POWER(SIN((b.lon*(PI()/180.0)-a.lon*(PI()/180.0))/2.0),2)))"
)


def _sql_spatial_dbscan() -> str:
    """Full analytic twin: neighbor self-join + recursive-CTE min-label
    transitive closure (DuckDB computes the same clusters independently)."""
    return (
        _located_cte("d.doc_id").replace("WITH ", "WITH RECURSIVE ", 1)
        + ", sites AS (SELECT MIN(doc_id) AS site_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, lat, lon FROM located "
        "GROUP BY lat, lon)"
        f", nbr AS (SELECT a.site_id AS sa, b.site_id AS sb, b.n_docs AS nb "
        f"FROM sites a JOIN sites b ON {_PAIR_HAVERSINE_SQL} <= {_DBSCAN_EPS_M!r})"
        ", deg AS (SELECT sa, SUM(nb) AS within FROM nbr GROUP BY sa)"
        ", core AS (SELECT sa AS node FROM deg WHERE within >= "
        "(SELECT COUNT(*) // 200 FROM documents))"
        ", ce AS (SELECT n.sa, n.sb FROM nbr n WHERE n.sa IN "
        "(SELECT node FROM core) AND n.sb IN (SELECT node FROM core))"
        ", reach(node, lab) AS (SELECT node, node FROM core UNION "
        "SELECT ce.sb, reach.lab FROM reach JOIN ce ON ce.sa = reach.node)"
        ", roots AS (SELECT node, MIN(lab) AS root FROM reach GROUP BY node)"
        ", border AS (SELECT n.sa AS node, MIN(r.root) AS root FROM nbr n "
        "JOIN roots r ON n.sb = r.node WHERE n.sa NOT IN "
        "(SELECT node FROM core) GROUP BY n.sa)"
        " SELECT s.site_id, s.n_docs, "
        "CAST(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_core, "
        "CAST(COALESCE(r.root, b2.root, -1) AS BIGINT) AS cluster "
        "FROM sites s LEFT JOIN core c ON s.site_id = c.node "
        "LEFT JOIN roots r ON s.site_id = r.node "
        "LEFT JOIN border b2 ON s.site_id = b2.node"
    )


def q_geo_knn_join(sf_dir: str):
    """Radius-bounded kNN SELF-JOIN over the geocoded host locations:
    each site's 2 nearest other sites within 150 km (same-site host
    lattices — inter-site gaps start at 485 km). One grid-bucketed
    shuffle total; each point's top-k is final inside its own cell (see
    ``knn.knn_join``). Fixture margins (radius 123 km clear of every
    pair distance, 122 m between distinct neighbor distances) pinned in
    tests/test_dbscan.py make the float order cross-engine-stable; exact
    symmetric ties fall to the id tiebreak on both engines."""
    from gis_scripts_ray.stages.knn import knn_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = located_documents(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lat": b["lat"],
                "lon": b["lon"],
                "site_id": b["doc_id"].cast(pa.int64()),
            }
        )

    sites = coalesce_shuffle_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["lat", "lon"],
        {"site_id": "min"},
    )
    return knn_join(sites, radius_m=150_000.0, k=2, id_col="site_id")


def _sql_geo_knn_join() -> str:
    return (
        _located_cte("d.doc_id")
        + ", sites AS (SELECT MIN(doc_id) AS site_id, lat, lon FROM located "
        "GROUP BY lat, lon)"
        ", pairs AS (SELECT a.site_id AS src_id, b.site_id AS nbr_id, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY a.site_id ORDER BY "
        f"{_PAIR_HAVERSINE_SQL} ASC, b.site_id ASC) AS BIGINT) AS knn_rank "
        f"FROM sites a JOIN sites b ON a.site_id <> b.site_id "
        f"AND {_PAIR_HAVERSINE_SQL} <= 150000.0)"
        " SELECT src_id, nbr_id, knn_rank FROM pairs WHERE knn_rank <= 2"
    )


def q_crawl_schedule(sf_dir: str):
    """Crawl-frontier politeness scheduling: every URL gets a per-host
    fetch slot — rank r within its host (discovery order = doc_id) is
    dispatched at (r-1) x the host's crawl delay (hot hosts 1 s, long-tail
    hosts 5 s — the per-host crawl-delay directive a polite crawler reads
    from robots.txt). The distributed per-key ordered rank runs through
    ``grouped_running_sum`` (value=1 => dense rank; hot-key presplit
    engages automatically past 2M rows/host at open-web scale); the delay
    table is a broadcast small-side lookup, never a shuffle."""
    from gis_scripts_ray.sources.webpages import host_names
    from gis_scripts_ray.stages.windows import grouped_running_sum
    from gis_scripts_ray.state.geocoder import extract_host

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def prep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        urls = urls_for_doc_ids(ids)
        return pa.table(
            {
                "host": extract_host(urls),
                "ord": pa.array(ids, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    ranked = grouped_running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="host",
        ts_col="ord",
        id_col="doc_id",
        value_col="one",
        out_col="fetch_rank",
    )
    # zero-padded host names sort lexicographically == numerically, so the
    # sorted-array searchsorted lookup recovers the host index exactly
    hosts_sorted = np.array(sorted(host_names()), dtype=object)

    def sched(b: pa.Table) -> pa.Table:
        host = b["host"].to_numpy(zero_copy_only=False)
        rank = b["fetch_rank"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(hosts_sorted, host)
        delay = np.where(idx < 40, 1_000_000, 5_000_000).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "host": b["host"],
                "fetch_rank": b["fetch_rank"],
                "sched_us": pa.array((rank - 1) * delay, pa.int64()),
            }
        )

    return ranked.map_batches(sched, batch_format="pyarrow")


def _sql_crawl_schedule() -> str:
    return (
        f"WITH hx AS (SELECT doc_id, {_HIDX_SQL} AS hidx FROM documents), "
        "r AS (SELECT doc_id, hidx, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY hidx ORDER BY doc_id) AS BIGINT) AS fetch_rank FROM hx) "
        "SELECT doc_id, printf('site%03d.example.org', CAST(hidx AS INT)) "
        "AS host, fetch_rank, "
        "CAST((fetch_rank - 1) * (CASE WHEN hidx < 40 THEN 1000000 "
        "ELSE 5000000 END) AS BIGINT) AS sched_us FROM r"
    )


def q_cms_freq_est(sf_dir: str):
    """Count-Min sketch point-frequency estimation (round 5): the
    mergeable-counter answer to "how often does this token appear in the
    100-TB corpus" WITHOUT shuffling the vocabulary — each block reduces
    to a fixed d x width register table (``sketch.cms_counters``), plain
    integer sums merge them, and point queries read d registers. The
    sketch is DETERMINISTIC (hash rows = the four 32-bit words of one md5
    digest), so DuckDB rebuilds the identical registers and the twin is
    exact — est defects (hash, bucketing, merge) and truth defects both
    surface as value mismatches. Probe set: distinct tokens with 64-bit
    md5 prefix == 0 mod 331 (corpus-independent, ~1/331 of the
    vocabulary), each carrying its exact count so the CMS overestimate
    invariant (est >= n_true, equality unless buckets collide) is
    visible row-by-row. (The fixture corpus has a ~31-token vocabulary,
    so the probe modulus here is 3 — 13 probes; an open-web run passes
    ``probe_mod`` in the hundreds for the same ~1/mod sample.)

    Output: (token, n_true, est) per probe token."""
    from gis_scripts_ray.state.broadcast import worker_broadcast
    from gis_scripts_ray.stages.sketch import (
        _CMS_D,
        _cms_words,
        cms_counters,
        cms_probe_counts,
    )

    width = 1024
    docs = f"{sf_dir}/documents.parquet"
    regs = cms_counters(
        ray.data.read_parquet(docs, columns=["text"]), "text", width
    ).take_all()  # fixed-size register set (<= d*width rows) — the one
    # driver materialization, same convention as the HLL/MG sketches
    dense = np.zeros((_CMS_D, width), dtype=np.int64)
    for r in regs:
        dense[r["row"], r["bucket"]] = r["c"]
    import ray as _ray

    ref = _ray.put(dense)

    probes = cms_probe_counts(
        ray.data.read_parquet(docs, columns=["text"]), "text", probe_mod=3
    )

    def add_est(batch: pa.Table) -> pa.Table:
        C = worker_broadcast(ref)
        toks = batch["token"].to_pylist()
        est = np.zeros(len(toks), dtype=np.int64)
        if toks:
            words = _cms_words(toks)
            est = C[0][(words[:, 0] % np.uint64(width)).astype(np.int64)]
            for r in range(1, _CMS_D):
                est = np.minimum(
                    est, C[r][(words[:, r] % np.uint64(width)).astype(np.int64)]
                )
        return pa.table(
            {
                "token": batch["token"],
                "n_true": batch["n_true"],
                "est": pa.array(est, pa.int64()),
            }
        )

    return probes.map_batches(add_est, batch_format="pyarrow")


def _sql_cms_freq_est() -> str:
    # the twin REBUILDS the sketch: same md5 words, same buckets, same
    # integer sums — LEAST over the four counter lookups is the estimate
    return (
        "WITH tok AS (SELECT unnest(string_split(COALESCE(text, ''), ' ')) "
        "AS w FROM documents), "
        "hb AS (SELECT w, "
        "CAST(('0x'||substr(md5(w),1,8))::UBIGINT % 1024 AS BIGINT) AS b0, "
        "CAST(('0x'||substr(md5(w),9,8))::UBIGINT % 1024 AS BIGINT) AS b1, "
        "CAST(('0x'||substr(md5(w),17,8))::UBIGINT % 1024 AS BIGINT) AS b2, "
        "CAST(('0x'||substr(md5(w),25,8))::UBIGINT % 1024 AS BIGINT) AS b3 "
        "FROM tok), "
        "c0 AS (SELECT b0 AS b, COUNT(*) AS c FROM hb GROUP BY b0), "
        "c1 AS (SELECT b1 AS b, COUNT(*) AS c FROM hb GROUP BY b1), "
        "c2 AS (SELECT b2 AS b, COUNT(*) AS c FROM hb GROUP BY b2), "
        "c3 AS (SELECT b3 AS b, COUNT(*) AS c FROM hb GROUP BY b3), "
        "probes AS (SELECT w, COUNT(*) AS n_true, MIN(b0) AS b0, "
        "MIN(b1) AS b1, MIN(b2) AS b2, MIN(b3) AS b3 FROM hb "
        "WHERE ('0x'||substr(md5(w),1,16))::UBIGINT % 3 = 0 GROUP BY w) "
        "SELECT p.w AS token, CAST(p.n_true AS BIGINT) AS n_true, "
        "CAST(LEAST(c0.c, c1.c, c2.c, c3.c) AS BIGINT) AS est "
        "FROM probes p JOIN c0 ON c0.b = p.b0 JOIN c1 ON c1.b = p.b1 "
        "JOIN c2 ON c2.b = p.b2 JOIN c3 ON c3.b = p.b3"
    )


def q_image_phash_dedup(sf_dir: str):
    """Perceptual near-duplicate IMAGE grouping (round 5): the image-side
    sibling of minhash text dedup. Every doc ships a small gradient
    image through the binary column — pixel ``idx`` of doc ``d`` is
    ``(d*7 + (d//256)%3 + idx*11) % 256`` (R=G=B) — encoded BMP /
    PNG / GIF cycling by ``d % 3``, and every fifth doc ships the
    2x-UPSCALED 18x16 rendition instead of the native 9x8. So the same
    picture arrives as byte-level DIFFERENT files (different codec,
    different resolution, brightness-shifted by the ``(d//256)%3``
    term); exact hashes split them, the 64-bit dHash
    (``stages/phash.py``: real decode -> integer-mean grayscale ->
    exact box-mean 8x9 -> row-gradient bits) collapses them. The twin
    recomputes every hash bit arithmetically from the pattern — any
    codec, grayscale, box-mean or bit-packing defect shifts a hash and
    breaks the row set.

    Output: (dhash_hi, dhash_lo, n_docs, min_doc) per perceptual
    cluster."""
    from gis_scripts_ray.stages.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
    )
    from gis_scripts_ray.stages.phash import dhash_images
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    idx = np.arange(72, dtype=np.int64)

    def make_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()

        def enc(d: int) -> bytes:
            gray = ((d * 7 + (d // 256) % 3 + idx * 11) % 256).astype(np.uint8)
            img = np.repeat(gray.reshape(8, 9, 1), 3, axis=2)
            if d % 5 == 0:  # 2x-upscaled rendition — exercises box-mean
                img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
            if d % 3 == 0:
                return encode_bmp(img)
            if d % 3 == 1:
                return encode_png(img)
            return encode_gif(img)

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "html": pa.array([enc(int(d)) for d in ids], pa.binary()),
            }
        )

    hashed = dhash_images(
        ds.map_batches(make_payload, batch_format="pyarrow"), "html"
    )

    def partial(batch: pa.Table) -> pa.Table:
        assert pc.min(batch["phash_ok"]).as_py() in (True, None)
        n = len(batch)
        return pa.table(
            {
                "dhash_hi": batch["dhash_hi"],
                "dhash_lo": batch["dhash_lo"],
                "n_docs": pa.array(np.ones(n, dtype=np.int64)),
                "min_doc": batch["doc_id"],
            }
        )

    return coalesce_shuffle_agg(
        hashed.map_batches(partial, batch_format="pyarrow"),
        ["dhash_hi", "dhash_lo"],
        {"n_docs": "sum", "min_doc": "min"},
    )


def _sql_image_phash_dedup() -> str:
    # the twin REBUILDS the hash arithmetically: gray(idx) =
    # (v + idx*11) % 256 with v = (doc_id*7 + (doc_id//256)%3) % 256;
    # bit r*8+c set iff gray(r*9+c) > gray(r*9+c+1); halves pack
    # little-endian by bit position (each half < 2^32 — BIGINT-safe)
    return (
        "WITH v AS (SELECT doc_id, "
        "(doc_id*7 + (doc_id//256)%3) % 256 AS v FROM documents), "
        "bits AS (SELECT doc_id, r.r*8 + c.c AS bitpos, "
        "CASE WHEN (v + (r.r*9+c.c)*11) % 256 > (v + (r.r*9+c.c+1)*11) % 256 "
        "THEN 1 ELSE 0 END AS bit "
        "FROM v, generate_series(0,7) AS r(r), generate_series(0,7) AS c(c)), "
        "h AS (SELECT doc_id, "
        "SUM(CASE WHEN bitpos < 32 THEN bit * (1::BIGINT << bitpos) "
        "ELSE 0 END) AS dhash_lo, "
        "SUM(CASE WHEN bitpos >= 32 THEN bit * (1::BIGINT << (bitpos-32)) "
        "ELSE 0 END) AS dhash_hi FROM bits GROUP BY doc_id) "
        "SELECT CAST(dhash_hi AS BIGINT) AS dhash_hi, "
        "CAST(dhash_lo AS BIGINT) AS dhash_lo, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(MIN(doc_id) AS BIGINT) AS min_doc "
        "FROM h GROUP BY dhash_hi, dhash_lo"
    )


# ---------------------------------------------------------------------------
# tabular interchange sources: NDJSON(.gz) / CSV / ORC round-trips
# ---------------------------------------------------------------------------

_TAB_SHARDS = 8


def _tabular_fixture_dir(sf_dir: str, kind: str) -> str:
    import hashlib

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/graft_tab/v1_{h}_{kind}_s{_TAB_SHARDS}"


def _build_tabular_fixture(
    sf_dir: str,
    out: str,
    table: str,
    key_col: str,
    prep,
    encode,
    ext: str,
) -> None:
    """Materialize one testdata table as {_TAB_SHARDS} shards of an
    interchange format — built DISTRIBUTED (per-batch prep, per-shard
    group encode+write with tmp+rename), warm-cached behind a _DONE
    marker.  ``prep(batch) -> batch`` adapts columns to what the format
    can carry; ``encode(table) -> bytes`` is the byte-deterministic
    serializer from :mod:`gis_scripts_ray.sources.tabular`."""
    if os.path.exists(f"{out}/_DONE"):
        return
    os.makedirs(out, exist_ok=True)
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")

    def to_shard(batch: pa.Table) -> pa.Table:
        batch = prep(batch)
        shard = batch[key_col].to_numpy() % _TAB_SHARDS
        return batch.append_column(
            "shard", pa.array(shard.astype(np.int64), pa.int64())
        )

    def write_shard(g: pa.Table) -> pa.Table:
        s = g["shard"][0].as_py()
        g = g.sort_by(key_col).drop_columns(["shard"])
        path = f"{out}/part-{s:04d}.{ext}"
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(encode(g))
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([s], pa.int64())})

    n = (
        ds.map_batches(to_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .count()
    )
    assert n == _TAB_SHARDS, f"tabular fixture wrote {n} shards"
    with open(f"{out}/_DONE", "w") as f:
        f.write("ok\n")


def q_jsonl_events_stats(sf_dir: str):
    """NDJSON-gz source end-to-end (round 5): the events table
    materializes as 8 ``.jsonl.gz`` shards (the API-dump / event-log
    convention — timestamps as int64 micros, doubles as
    shortest-round-trip decimals), then the NATIVE
    ``ray.data.read_json`` streams them back (file-per-task, gzip
    inferred from the extension, Arrow JSON parse) and aggregates per
    (event_type, hour) in the integer domain.  The twin reads the
    parquet events view directly — any serialization loss (a float
    that fails to round-trip, a dropped row, a shifted timestamp)
    breaks the value hash.

    Output: (event_type, hour, sum_vmic, sum_ts_us, n)."""
    import glob as _glob

    from gis_scripts_ray.sources.tabular import encode_ndjson_gz

    out = _tabular_fixture_dir(sf_dir, "jsonl")

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64())
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts_us": ts_us,
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )

    _build_tabular_fixture(
        sf_dir, out, "events", "event_id", prep, encode_ndjson_gz, "jsonl.gz"
    )
    files = sorted(_glob.glob(f"{out}/part-*.jsonl.gz"))
    ds = ray.data.read_json(files)

    def agg_prep(batch: pa.Table) -> pa.Table:
        us = batch["ts_us"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array(us // 3_600_000_000, pa.int64()),
                "vmic": _micros(batch["value"]),
                "ts_us": batch["ts_us"].cast(pa.int64()),
            }
        )

    return cell_sum_count(
        ds.map_batches(agg_prep, batch_format="pyarrow"),
        ["event_type", "hour"],
        ["vmic", "ts_us"],
    )


def _sql_jsonl_events_stats() -> str:
    return (
        f"SELECT event_type, {_sql_floordiv('epoch_us(ts)', 3600000000)} AS hour, "
        "CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS sum_vmic, "
        "CAST(SUM(epoch_us(ts)) AS BIGINT) AS sum_ts_us, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type, hour"
    )


def q_csv_orders_stats(sf_dir: str):
    """CSV source end-to-end (round 5): the orders table materializes
    as 8 header-bearing CSV shards (vendor-export convention —
    ISO-8601 timestamps, shortest-round-trip doubles), then the NATIVE
    ``ray.data.read_csv`` streams them back with an EXPLICIT declared
    schema (per-block type inference is the classic at-scale CSV
    failure; see ``tabular.csv_convert_options``) and aggregates per
    (o_orderstatus, o_orderpriority) in cents.  The twin reads the
    parquet orders view directly.

    Output: (o_orderstatus, o_orderpriority, sum_cents, sum_date_us, n)."""
    import glob as _glob

    from gis_scripts_ray.sources.tabular import csv_convert_options, encode_csv

    out = _tabular_fixture_dir(sf_dir, "csv")
    _build_tabular_fixture(
        sf_dir, out, "orders", "o_orderkey", lambda b: b, encode_csv, "csv"
    )
    files = sorted(_glob.glob(f"{out}/part-*.csv"))
    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    ds = ray.data.read_csv(files, convert_options=csv_convert_options(schema))

    def agg_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "cents": _cents(batch["o_totalprice"]),
                "date_us": batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    return cell_sum_count(
        ds.map_batches(agg_prep, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        ["cents", "date_us"],
    )


def _sql_csv_orders_stats() -> str:
    return (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents, "
        "CAST(SUM(epoch_us(o_orderdate)) AS BIGINT) AS sum_date_us, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority"
    )


def q_orc_lineitem_stats(sf_dir: str):
    """ORC source end-to-end (round 5): the lineitem table materializes
    as 8 ORC shards, then :func:`sources.tabular.read_orc` streams them
    back — one file per task with ``columns=`` pruned INSIDE the ORC
    stripe reader (4 of 11 columns decode; the others' streams are never
    decompressed) — and aggregates the pricing summary per
    (l_returnflag, l_linestatus).  The twin reads the parquet lineitem
    view directly.

    Output: (l_returnflag, l_linestatus, sum_qty, sum_price_cents, n)."""
    import glob as _glob

    from gis_scripts_ray.sources.tabular import encode_orc, read_orc

    out = _tabular_fixture_dir(sf_dir, "orc")
    _build_tabular_fixture(
        sf_dir, out, "lineitem", "l_orderkey", lambda b: b, encode_orc, "orc"
    )
    files = sorted(_glob.glob(f"{out}/part-*.orc"))
    ds = read_orc(
        files,
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def agg_prep(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(qty, pa.int64()),
                "price_cents": _cents(batch["l_extendedprice"]),
            }
        )

    return cell_sum_count(
        ds.map_batches(agg_prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["qty", "price_cents"],
    )


def _sql_orc_lineitem_stats() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )


# ---------------------------------------------------------------------------
# per-source convex hull (strict, integer-exact, gift-wrapping twin)
# ---------------------------------------------------------------------------


def q_convex_hull(sf_dir: str):
    """Per-source footprint hull (round 5 — the reference derives tile
    extents / survey footprints from point extrema; the convex hull is
    the exact footprint of a point cloud): located docs → integer
    centi-degree lattice coords → distributed strict hull
    (:mod:`stages.hull`: per-block dedup + Akl–Toussaint prune +
    monotone chain partials, per-group chain finish — hulls compose, so
    only O(h) vertices per block ever shuffle).  The twin re-derives
    the SAME hull by Jarvis gift wrapping in a recursive CTE (next
    vertex = the candidate no other point lies strictly right of, or
    collinear beyond), so vertex SET, CCW ORDER and the min-(y,x)
    start rule are all value-certified.

    Output: (source, seq, ilon, ilat) — hull vertices CCW."""
    from gis_scripts_ray.stages.hull import convex_hull

    ds = located_documents(sf_dir, cols=("doc_id", "source"))

    def to_int_coords(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        return pa.table(
            {
                "source": batch["source"],
                "ilon": pa.array(
                    _round_half_away(lon * 100.0).astype(np.int64), pa.int64()
                ),
                "ilat": pa.array(
                    _round_half_away(lat * 100.0).astype(np.int64), pa.int64()
                ),
            }
        )

    pts = ds.map_batches(to_int_coords, batch_format="pyarrow")
    return convex_hull(pts, "source", x_col="ilon", y_col="ilat")


def _sql_hull_walk_ctes() -> str:
    """Shared WITH-RECURSIVE chain: located -> distinct centi-degree
    pts -> gift-wrap next-edge table -> ``walk`` (per-source hull
    vertices, CCW from the min-(y, x) start)."""
    # cross(p, q, r) — strictly-right test for the gift-wrap candidate rule
    cr = "((c.qx-c.px)*(r.y-c.py) - (c.qy-c.py)*(r.x-c.px))"
    d_r = "((r.x-c.px)*(r.x-c.px) + (r.y-c.py)*(r.y-c.py))"
    d_q = "((c.qx-c.px)*(c.qx-c.px) + (c.qy-c.py)*(c.qy-c.py))"
    return (
        "WITH RECURSIVE "
        + _located_cte("d.source")[5:]  # strip the leading "WITH "
        + ", pts AS (SELECT DISTINCT source, "
        "CAST(ROUND(CAST(lon AS DOUBLE)*100) AS BIGINT) AS x, "
        "CAST(ROUND(CAST(lat AS DOUBLE)*100) AS BIGINT) AS y FROM located), "
        "nxt AS (SELECT c.source, c.px, c.py, c.qx, c.qy FROM "
        "(SELECT a.source, a.x AS px, a.y AS py, b.x AS qx, b.y AS qy "
        "FROM pts a JOIN pts b ON a.source = b.source "
        "AND NOT (a.x = b.x AND a.y = b.y)) c "
        "WHERE NOT EXISTS (SELECT 1 FROM pts r WHERE r.source = c.source "
        "AND NOT (r.x = c.px AND r.y = c.py) "
        "AND NOT (r.x = c.qx AND r.y = c.qy) "
        f"AND ({cr} < 0 OR ({cr} = 0 AND {d_r} > {d_q})))), "
        "start AS (SELECT source, x, y FROM (SELECT pts.*, ROW_NUMBER() "
        "OVER (PARTITION BY source ORDER BY y, x) AS rn FROM pts) WHERE rn = 1), "
        "walk(source, seq, x, y) AS ("
        "SELECT source, 0, x, y FROM start "
        "UNION ALL "
        "SELECT w.source, w.seq + 1, n.qx, n.qy FROM walk w "
        "JOIN nxt n ON n.source = w.source AND n.px = w.x AND n.py = w.y "
        "WHERE NOT EXISTS (SELECT 1 FROM start s WHERE s.source = w.source "
        "AND s.x = n.qx AND s.y = n.qy))"
    )


def _sql_convex_hull() -> str:
    return (
        _sql_hull_walk_ctes()
        + " SELECT source, CAST(seq AS BIGINT) AS seq, "
        "CAST(x AS BIGINT) AS ilon, CAST(y AS BIGINT) AS ilat FROM walk"
    )


def q_source_diameter(sf_dir: str):
    """Per-source footprint diameter (round 5 — the reference sizes
    tile grids from point extrema; the exact diameter is the honest
    "how wide is this survey" scalar): rides the hull plan — the
    farthest pair of a point set is realized by hull vertices, so only
    partial-hull vertices shuffle and the all-pairs scan is O(h²) on
    the finished hull.  The twin computes the diameter DEFINITIONALLY
    (max over the full distinct-point self-join) and the hull size via
    the recursive gift-wrap walk — so the "diameter lives on the hull"
    identity itself is value-certified.

    Output: (source, d2_max, n_hull) — centi-degree² / vertex count."""
    from gis_scripts_ray.stages.hull import hull_diameter

    ds = located_documents(sf_dir, cols=("doc_id", "source"))

    def to_int_coords(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        return pa.table(
            {
                "source": batch["source"],
                "ilon": pa.array(
                    _round_half_away(lon * 100.0).astype(np.int64), pa.int64()
                ),
                "ilat": pa.array(
                    _round_half_away(lat * 100.0).astype(np.int64), pa.int64()
                ),
            }
        )

    pts = ds.map_batches(to_int_coords, batch_format="pyarrow")
    return hull_diameter(pts, "source", x_col="ilon", y_col="ilat")


def _sql_source_diameter() -> str:
    return (
        _sql_hull_walk_ctes()
        + ", nh AS (SELECT source, COUNT(*) AS n_hull FROM walk GROUP BY source), "
        "dm AS (SELECT a.source, "
        "MAX((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS d2_max "
        "FROM pts a JOIN pts b ON a.source = b.source GROUP BY a.source) "
        "SELECT nh.source AS source, CAST(d2_max AS BIGINT) AS d2_max, "
        "CAST(n_hull AS BIGINT) AS n_hull FROM nh JOIN dm ON nh.source = dm.source"
    )


_LATENESS_US = 300_000_000  # 5 min allowed disorder
_JITTER_MOD_S = 86_400  # ingest delay drawn from [0, 1 day) in whole seconds


def q_late_events(sf_dir: str):
    """Streaming watermark replay (round 5): each event arrives at the
    ingest after a deterministic per-event delivery delay (Knuth
    multiplicative hash of event_id, up to one day — the fixture's
    bounded-disorder model; events' raw ts is MONOTONE per user, so
    un-jittered replay would make the late flag vacuous); per user,
    the exclusive running max of event TIME over all strictly earlier
    ARRIVALS is the WATERMARK, and an event is LATE when it is older
    than watermark − 5 min — the audit a streaming ingest runs before
    choosing its allowed lateness.  :mod:`stages/watermark`: bucketed
    segmented exclusive cummax (C speed), (arr, event_id) tie-break,
    measured hot-key guard routing to the arrival-range presplit plan.
    The twin is the window definition verbatim (``MAX(us) OVER
    (PARTITION BY user ORDER BY arr, event_id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``; NULL-first-row comparison agrees
    with the engine's minus-infinity sentinel).

    Output: (event_type, sum_late, sum_wm_s, n)."""
    from gis_scripts_ray.stages.watermark import _NEG, grouped_watermark_late

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = batch["event_id"].to_numpy().astype(np.uint64)
        jit_s = (
            (eid * np.uint64(2654435761))
            % np.uint64(4294967296)
            % np.uint64(_JITTER_MOD_S)
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "arr": pa.array(us + jit_s * 1_000_000, pa.int64()),
                "ts_us": pa.array(us, pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    flagged = grouped_watermark_late(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id",
        arr_col="arr",
        ts_col="ts_us",
        lateness=_LATENESS_US,
        carry_cols=("event_type",),
        tie_col="event_id",
    )

    def agg_prep(batch: pa.Table) -> pa.Table:
        wm = batch["wm"].to_numpy()
        valid = wm != _NEG
        wm_s = np.where(valid, wm // 1_000_000, 0)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "late": batch["late"],
                "wm_s": pa.array(wm_s, pa.int64()),
            }
        )

    return cell_sum_count(
        flagged.map_batches(agg_prep, batch_format="pyarrow"),
        ["event_type"],
        ["late", "wm_s"],
    )


def _sql_late_events() -> str:
    return (
        "WITH j AS (SELECT event_type, user_id, event_id, "
        "epoch_us(ts) AS us, epoch_us(ts) + "
        "CAST(((CAST(event_id AS HUGEINT) * 2654435761) % 4294967296) "
        f"% {_JITTER_MOD_S} AS BIGINT) * 1000000 AS arr FROM events), "
        "w AS (SELECT event_type, us, "
        "MAX(us) OVER (PARTITION BY user_id ORDER BY arr, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM j) "
        f"SELECT event_type, CAST(SUM(CASE WHEN us + {_LATENESS_US} < wm "
        "THEN 1 ELSE 0 END) AS BIGINT) AS sum_late, "
        "CAST(SUM(CASE WHEN wm IS NULL THEN 0 ELSE wm // 1000000 END) "
        "AS BIGINT) AS sum_wm_s, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY event_type"
    )


def q_row_number(sf_dir: str):
    """Global consecutive row numbering (round 5,
    ``stages/rownumber.zip_with_index``): every document gets its
    1-based rank in a deterministic shuffle order (injective 64-bit
    multiplicative hash of doc_id) — the zipWithIndex primitive behind
    stable shard ids and resumable cursors. Two-pass prefix-offset
    plan: sort range-partitions, pass 1 lifts O(blocks) (min key,
    count) stats, pass 2 broadcasts the tiny base map and assigns
    ``base + local rank`` vectorized — the corpus never reaches the
    driver. The twin is ``ROW_NUMBER() OVER (ORDER BY hash)``.

    Output: (doc_id, rn)."""
    from gis_scripts_ray.stages.rownumber import zip_with_index

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "_h": pa.array(d * np.uint64(2654435761), pa.uint64()),
            }
        )

    out = zip_with_index(
        ds.map_batches(add_hash, batch_format="pyarrow"), key_col="_h"
    )
    return out.select_columns(["doc_id", "rn"]).sort("doc_id")


def _sql_row_number() -> str:
    return (
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY "
        f"(CAST(doc_id AS HUGEINT) * 2654435761) % {_WRAP64}) AS BIGINT) AS rn "
        "FROM documents ORDER BY doc_id"
    )


def q_quota_sample(sf_dir: str):
    """Exact per-stratum QUOTA sample (round 5): the k = 25 documents
    with the smallest injective doc hash WITHIN EACH LANGUAGE — the
    fixed-size-per-group companion to rate-based
    ``stratified_sample`` (quota sampling guarantees every stratum is
    represented with exactly min(k, |stratum|) rows, reproducibly).
    Rides ``stages/topk.topk_per_group`` (per-block partial k-per-group,
    bounded coalesce re-fold, adaptive finish). The twin is the window
    QUALIFY rank.

    Output: (lang, doc_id)."""
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        return pa.table(
            {
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],
                "_h": pa.array(d * np.uint64(2654435761), pa.uint64()),
            }
        )

    out = topk_per_group(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        group_col="lang",
        value_col="_h",
        id_col="doc_id",
        k=25,
        ascending=True,
    )
    return out.select_columns(["lang", "doc_id"]).sort(["lang", "doc_id"])


def _sql_quota_sample() -> str:
    return (
        "SELECT lang, doc_id FROM documents QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY lang ORDER BY "
        f"(CAST(doc_id AS HUGEINT) * 2654435761) % {_WRAP64}) <= 25 "
        "ORDER BY lang, doc_id"
    )


def q_bottomk_sample(sf_dir: str):
    """Deterministic fixed-SIZE corpus sample (round 5): the k = 100
    documents with the smallest 64-bit Knuth multiplicative hash of
    doc_id — the "give me exactly k reproducible rows" primitive
    (rate-based ``hash_sample`` can't hit an exact size; bottom-k
    is coordination-free and merge-associative, so it composes with
    incremental corpora). Rides ``stages/topk.topk_per_group``
    (constant group): per-block partial bottom-k, bounded coalesce
    re-fold, adaptive finish — k rows per block cross the wire, never
    the corpus. The hash is INJECTIVE (odd multiplier mod 2^64), so
    the order — and the sample — is total with no tie contract needed.
    Wide columns (text) are pruned at the read.

    Output: (doc_id, lang, source), the sample as a set."""
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.uint64)
        h = d * np.uint64(2654435761)  # wraps mod 2^64
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "source": batch["source"],
                "_h": pa.array(h, pa.uint64()),
                "_g": pa.array(np.zeros(len(d), np.int64)),
            }
        )

    out = topk_per_group(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        group_col="_g",
        value_col="_h",
        id_col="doc_id",
        k=100,
        ascending=True,
    )
    return out.select_columns(["doc_id", "lang", "source"]).sort("doc_id")


def _sql_bottomk_sample() -> str:
    return (
        "SELECT doc_id, lang, source FROM (SELECT * FROM documents "
        f"ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761) % {_WRAP64} "
        "LIMIT 100) ORDER BY doc_id"
    )


def q_ntile_buckets(sf_dir: str):
    """Windowed NTILE bucketing (round 5): every lineitem is assigned
    its NTILE(4) price-quartile WITHIN its return flag — the
    equal-frequency binning primitive behind per-group train/test
    splits and quantile feature bucketing. Distributed window plan:
    the multi-key zipWithIndex (``stages/rownumber.zip_with_index_multi``,
    two-pass prefix-offset over a (flag, cents, pk) sort — the corpus
    never reaches the driver) gives the global rank; group starts are
    a 3-row exact count aggregate; the SQL-standard NTILE formula
    (first ``c % n`` tiles get ``c//n + 1`` rows) is then pure
    vectorized arithmetic. The twin is ``NTILE(4) OVER (PARTITION BY
    flag ORDER BY cents, pk)``.

    Output: (l_returnflag, tile, n, sum_cents)."""
    from gis_scripts_ray.stages.rownumber import zip_with_index_multi
    from gis_scripts_ray.stages.tile_agg import cell_count, cell_sum_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "cents": _cents(batch["l_extendedprice"]),
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    keys = ["l_returnflag", "cents", "l_orderkey", "l_linenumber"]
    ranked = zip_with_index_multi(prepped, keys)

    # group starts: 3-row exact aggregate, flag-ordered cumulative bases
    gc = cell_count(ranked.select_columns(["l_returnflag"]), ["l_returnflag"])
    gdf = gc.to_pandas().sort_values("l_returnflag")
    flags = gdf["l_returnflag"].tolist()
    counts = gdf["n"].to_numpy().astype(np.int64)
    bases = 1 + np.concatenate([[0], np.cumsum(counts)[:-1]])
    gmap_ref = ray.put({f: (int(b), int(c)) for f, b, c in zip(flags, bases, counts)})

    def assign_tile(batch: pa.Table, *, _ref=gmap_ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        if batch.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "tile": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        gmap = worker_broadcast(_ref)
        fl = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        rn = batch["rn"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(fl, return_inverse=True)
        base = np.array([gmap[str(u)][0] for u in uniq], dtype=np.int64)[inv]
        c = np.array([gmap[str(u)][1] for u in uniq], dtype=np.int64)[inv]
        rank0 = rn - base
        q, r = c // 4, c % 4
        cut = r * (q + 1)
        # SQL NTILE: first r tiles have q+1 rows, the rest q
        lo = rank0 // np.maximum(q + 1, 1) + 1
        hi = r + 1 + (rank0 - cut) // np.maximum(q, 1)
        tile = np.where(rank0 < cut, lo, np.where(q > 0, hi, rank0 + 1))
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
                "cents": batch["cents"],
            }
        )

    tiled = ranked.map_batches(assign_tile, batch_format="pyarrow")
    out = cell_sum_count(tiled, ["l_returnflag", "tile"], ["cents"])
    return out.select_columns(
        ["l_returnflag", "tile", "n", "sum_cents"]
    ).sort(["l_returnflag", "tile"])


def _sql_ntile_buckets() -> str:
    return (
        "WITH c AS (SELECT l_returnflag, l_orderkey, l_linenumber, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem), "
        "t AS (SELECT l_returnflag, cents, NTILE(4) OVER (PARTITION BY "
        "l_returnflag ORDER BY cents, l_orderkey, l_linenumber) AS tile FROM c) "
        "SELECT l_returnflag, CAST(tile AS BIGINT) AS tile, COUNT(*) AS n, "
        "CAST(SUM(cents) AS BIGINT) AS sum_cents "
        "FROM t GROUP BY 1, 2 ORDER BY 1, 2"
    )


def q_grouped_mode(sf_dir: str):
    """Exact per-group MODE (round 5): the most frequent quantity per
    return flag — the argmax-count aggregate (SQL ``MODE()`` /
    ``arg_max``) that a naive plan computes by shuffling every row
    twice. Scale plan: in-batch partial (flag, qty) counts -> adaptive
    combine (the corpus reduces to |flags|x|distinct qty| compacted
    rows) -> ``topk_per_group`` k=1 on count with the repo's (value,
    id) tie contract (equal counts break toward the SMALLER quantity —
    deterministic, twinned). The twin is the window ROW_NUMBER argmax.

    Output: (l_returnflag, mode_qty, n)."""
    from gis_scripts_ray.stages.tile_agg import cell_count
    from gis_scripts_ray.stages.topk import topk_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "qty": pa.array(
                    np.round(batch["l_quantity"].to_numpy()).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    counts = cell_count(
        ds.map_batches(prep, batch_format="pyarrow"), ["l_returnflag", "qty"]
    )
    out = topk_per_group(
        counts, group_col="l_returnflag", value_col="n", id_col="qty", k=1
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "mode_qty": batch["qty"],
                "n": batch["n"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("l_returnflag")


def _sql_grouped_mode() -> str:
    return (
        "WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2) "
        "SELECT l_returnflag, qty AS mode_qty, n FROM c "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag "
        "ORDER BY n DESC, qty ASC) = 1 ORDER BY l_returnflag"
    )


def q_unpivot_metrics(sf_dir: str):
    """Unpivot / melt (round 5, ``stages/melt.py``): lineitem's four
    numeric measures reshape wide -> long ((flag, metric, value) tidy
    rows, 4x the input) and roll up per (flag, metric) — the SQL
    ``UNPIVOT`` / pandas ``melt`` primitive. The melt is a per-batch
    column stack (id columns repeat as extra chunks, metric labels are
    a dictionary take — zero per-row Python) and streams straight into
    the partial pre-agg combine; nothing widens at the driver. All four
    measures enter the exact integer domain first (units / cents /
    half-away pct) so the sums are order-independent. The twin is the
    definitional UNION ALL.

    Output: (l_returnflag, metric, n, sum_value)."""
    from gis_scripts_ray.stages.melt import melt
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "qty": pa.array(
                    np.round(batch["l_quantity"].to_numpy()).astype(np.int64),
                    pa.int64(),
                ),
                "price_cents": _cents(batch["l_extendedprice"]),
                "disc_pct": pa.array(
                    _round_half_away(
                        batch["l_discount"].to_numpy() * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "tax_pct": pa.array(
                    _round_half_away(batch["l_tax"].to_numpy() * 100.0).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    long = melt(
        ds.map_batches(prep, batch_format="pyarrow"),
        id_cols=["l_returnflag"],
        value_cols=["qty", "price_cents", "disc_pct", "tax_pct"],
    )
    out = cell_sum_count(long, ["l_returnflag", "metric"], ["value"])
    return out.select_columns(
        ["l_returnflag", "metric", "n", "sum_value"]
    ).sort(["l_returnflag", "metric"])


def _sql_unpivot_metrics() -> str:
    return (
        "WITH m AS ("
        "SELECT l_returnflag, 'qty' AS metric, CAST(l_quantity AS BIGINT) AS value FROM lineitem "
        "UNION ALL SELECT l_returnflag, 'price_cents', CAST(ROUND(l_extendedprice*100) AS BIGINT) FROM lineitem "
        "UNION ALL SELECT l_returnflag, 'disc_pct', CAST(ROUND(l_discount*100) AS BIGINT) FROM lineitem "
        "UNION ALL SELECT l_returnflag, 'tax_pct', CAST(ROUND(l_tax*100) AS BIGINT) FROM lineitem) "
        "SELECT l_returnflag, metric, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(value) AS BIGINT) AS sum_value "
        "FROM m GROUP BY 1, 2 ORDER BY 1, 2"
    )


def q_interval_overlaps(sf_dir: str):
    """Interval×interval overlap join (round 5,
    ``stages/intervaljoin.py``): each event opens a session interval
    [ts, ts + dur) with a deterministic hashed duration (60..3659 s);
    engagement intervals (click/view) are range-joined against
    consequence intervals (error/purchase/signup) of the SAME user, and
    the exact overlap time is rolled up per type pair — the
    "attention overlapping outcomes" audit. Tiled range join: bounded
    bucket replication (2 h tiles ≥ max duration), one
    ``groupby((user, tile)).map_groups`` vectorized sweep, pairs owned
    solely by the tile containing max(starts). The twin is the
    definitional range self-join.

    Output: (type_a, type_b, sum_ov, n)."""
    from gis_scripts_ray.stages.intervaljoin import interval_overlap_pairs

    _A_TYPES = ("click", "view")
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = batch["event_id"].to_numpy().astype(np.uint64)
        dur_s = (
            (eid * np.uint64(2654435761))
            % np.uint64(4294967296)
            % np.uint64(3600)
        ).astype(np.int64) + 60
        side = ~np.isin(batch["event_type"].to_numpy(zero_copy_only=False), _A_TYPES)
        return pa.table(
            {
                "u": batch["user_id"],
                "side": pa.array(side.astype(np.int64), pa.int64()),
                "s": pa.array(us, pa.int64()),
                "e": pa.array(us + dur_s * 1_000_000, pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    pairs = interval_overlap_pairs(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="u",
        side_col="side",
        start_col="s",
        end_col="e",
        id_col="event_id",
        bucket_width=7_200_000_000,  # 2 h >= max duration: fan-out <= 2
        carry_cols=("event_type",),
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "type_a": batch["event_type_a"],
                "type_b": batch["event_type_b"],
                "ov": batch["overlap"],
            }
        )

    return cell_sum_count(
        pairs.map_batches(rename, batch_format="pyarrow"),
        ["type_a", "type_b"],
        ["ov"],
    ).sort(["type_a", "type_b"])


def _sql_interval_overlaps() -> str:
    return (
        "WITH iv AS (SELECT user_id AS u, event_type, epoch_us(ts) AS s, "
        "epoch_us(ts) + (CAST(((CAST(event_id AS HUGEINT) * 2654435761) "
        "% 4294967296) % 3600 AS BIGINT) + 60) * 1000000 AS e FROM events) "
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s)) AS BIGINT) AS sum_ov, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM iv a JOIN iv b ON a.u = b.u AND a.s < b.e AND b.s < a.e "
        "WHERE a.event_type IN ('click', 'view') "
        "AND b.event_type NOT IN ('click', 'view') "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


def q_embedding_gram(sf_dir: str):
    """Exact int64 Gram matrix of the int8-quantized embedding corpus
    (round 5, ``stages/quantize.gram_matrix``): G = Q^T Q upper
    triangle — the covariance-shaped statistic PCA / whitening needs —
    via one dim x dim integer matmul per block + adaptive combine of
    triu partial rows (all-to-all scales with block count, not corpus).
    The cross-engine bit-exact quantizer (float64 floor((v*127)/max|v|))
    makes every cell hash-match the twin's list-indexed double sum
    (|cell| <= n * 127^2 << 2^53, exact in DOUBLE and BIGINT).

    Output: (i, j, s) for 0 <= i <= j < 64."""
    from gis_scripts_ray.stages.quantize import gram_matrix

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return gram_matrix(ds, "embedding", dim=64).sort(["i", "j"])


def _sql_embedding_gram() -> str:
    from gis_scripts_ray.stages.quantize import quantize_sql_expr

    expr = quantize_sql_expr("embedding")
    return (
        f"WITH qt AS (SELECT {expr} AS qv FROM embeddings), "
        "ij AS (SELECT i.g AS i, j.g AS j FROM generate_series(0, 63) i(g), "
        "generate_series(0, 63) j(g) WHERE i.g <= j.g) "
        "SELECT ij.i, ij.j, CAST(SUM(CAST(qt.qv[ij.i + 1] AS DOUBLE) * "
        "CAST(qt.qv[ij.j + 1] AS DOUBLE)) AS BIGINT) AS s "
        "FROM qt, ij GROUP BY ij.i, ij.j ORDER BY ij.i, ij.j"
    )


def q_first_touch(sf_dir: str):
    """First-touch attribution (round 5): which channel (event_type)
    opens each (user, day) session — the marketing-attribution rollup.
    The classic distributed ARGMIN-with-payload plan: an in-batch
    ``group_by`` min pre-agg + ONE adaptive combine reduces the stream
    to the per-(user, day) first timestamp (all-to-all bounded by
    |users| x |days|, never rows), then one sized hash-join back
    against the raw stream recovers the opening event's payload —
    values never ride through the min (the CLAUDE.md merge-position
    rule). Ties at the minimum (absent here: (user, ts) is unique in
    the fixture) would match identically in both engines — the join
    keeps every tying row, exactly like the SQL twin. The compacted
    right side is ``repartition``-compacted before the join (Ray 2.49
    rejects empty shuffle-partition blocks).

    Output: (event_type, n_first) — days opened per channel."""
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import cell_count, coalesce_shuffle_agg

    _DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        # post-1970 fixture: // matches SQL's truncating // on positives
        return pa.table(
            {
                "u": batch["user_id"],
                "us": pa.array(us, pa.int64()),
                "day": pa.array(us // _DAY_US, pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def partial_min(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(["u", "day", "us"])
            .group_by(["u", "day"])
            .aggregate([("us", "min")])
        )
        return out.rename_columns(["u", "day", "mus"])

    firsts = coalesce_shuffle_agg(
        prepped.map_batches(partial_min, batch_format="pyarrow"),
        ["u", "day"],
        {"mus": "min"},
    ).repartition(4)

    opened = hash_join(
        prepped,
        firsts,
        on=("u", "day", "us"),
        right_on=("u", "day", "mus"),
        num_partitions=8,
    )
    return cell_count(opened, ["event_type"], alias="n_first").sort("event_type")


def _sql_first_touch() -> str:
    return (
        "WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us, "
        "epoch_us(ts) // 86400000000 AS day, event_type FROM events), "
        "f AS (SELECT u, day, MIN(us) AS mus FROM e GROUP BY 1, 2) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_first FROM e "
        "JOIN f ON e.u = f.u AND e.day = f.day AND e.us = f.mus "
        "GROUP BY event_type ORDER BY event_type"
    )


def q_weighted_median_qty(sf_dir: str):
    """Exact per-group WEIGHTED lower median (round 5,
    ``stages/stats.grouped_weighted_median``): the median quantity where
    each row counts its revenue (extendedprice cents) instead of 1 — the
    robust "typical order size by dollar volume" statistic. The shuffle
    carries per-block (group, value) weight sums — bounded by |groups| x
    |value domain| (quantity is 1..50) — never rows; the finish selects
    the smallest value with ``2 * cumw >= W`` (all integers: exactly
    cumw >= ceil(W/2), pinned in the twin's window formula). Weights in
    cents via the half-away kernel so both engines sum identical int64.

    Output: (l_returnflag, l_linestatus, wmedian_qty, w_total)."""
    from gis_scripts_ray.stages.stats import grouped_weighted_median

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
                "cents": _cents(batch["l_extendedprice"]),
            }
        )

    out = grouped_weighted_median(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        "qty",
        "cents",
        out_col="wmedian_qty",
    )

    def ren(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["l_returnflag", "l_linestatus", "wmedian_qty", "w_total"]
        )

    return out.map_batches(ren, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def _sql_weighted_median_qty() -> str:
    # lower weighted median spelled as the explicit integer-rank rule:
    # smallest q with 2 * (cumulative weight) >= total weight
    return (
        "WITH s AS (SELECT l_returnflag, l_linestatus, "
        "CAST(ROUND(l_quantity) AS BIGINT) AS q, "
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS w FROM lineitem), "
        "g AS (SELECT l_returnflag, l_linestatus, q, SUM(w) AS wq FROM s "
        "GROUP BY 1, 2, 3), "
        "c AS (SELECT l_returnflag, l_linestatus, q, "
        "SUM(wq) OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY q) AS cum, "
        "SUM(wq) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot FROM g) "
        "SELECT l_returnflag, l_linestatus, CAST(MIN(q) AS BIGINT) AS wmedian_qty, "
        "CAST(MAX(tot) AS BIGINT) AS w_total FROM c WHERE 2 * cum >= tot "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    )


def q_jw_linkage(sf_dir: str):
    """Fuzzy record linkage over blocked candidate pairs (round 5):
    pairs = consecutive doc_ids on the same host (the
    ``edit_distance_hist`` blocking convention), comparator =
    Jaro-Winkler over the 32-char text prefix
    (:mod:`stages/jarowinkler` — bit-exact to DuckDB's
    ``jaro_winkler_similarity``, byte domain, integer transposition
    halving; the twin uses the ENGINE'S OWN primitive, a genuinely
    independent implementation).  Scores land in the integer domain as
    jw-millionths (floor — both engines floor the SAME double).

    Output: (bucket = jwm // 50000, n_pairs, sum_jwm)."""
    from gis_scripts_ray.stages.jarowinkler import jw_scores
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def left_side(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(
            pc.bit_wise_and(b["doc_id"], pa.scalar(15, pa.int64())), 15
        )
        f = b.filter(keep)
        return pa.table(
            {"k": f["doc_id"], "pre_a": pc.utf8_slice_codeunits(f["text"], 0, 32)}
        )

    def right_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.subtract(b["doc_id"], pa.scalar(1, pa.int64())),
                "pre_b": pc.utf8_slice_codeunits(b["text"], 0, 32),
            }
        )

    pairs = hash_join(
        ds.map_batches(left_side, batch_format="pyarrow"),
        ds.map_batches(right_side, batch_format="pyarrow"),
        on="k",
        num_partitions=16,
    )
    scored = jw_scores(pairs, "pre_a", "pre_b", out_col="jw")

    def partial(b: pa.Table) -> pa.Table:
        jwm = np.floor(b["jw"].to_numpy() * 1_000_000.0).astype(np.int64)
        t = pa.table(
            {
                "bucket": pa.array(jwm // 50_000, pa.int64()),
                "n_pairs": pa.array(np.ones(len(jwm), dtype=np.int64)),
                "sum_jwm": pa.array(jwm, pa.int64()),
            }
        )
        return (
            t.group_by(["bucket"])
            .aggregate([("n_pairs", "sum"), ("sum_jwm", "sum")])
            .rename_columns(["bucket", "n_pairs", "sum_jwm"])
        )

    return coalesce_shuffle_agg(
        scored.map_batches(partial, batch_format="pyarrow"),
        ["bucket"],
        {"n_pairs": "sum", "sum_jwm": "sum"},
    )


def _sql_jw_linkage() -> str:
    return (
        "WITH p AS (SELECT CAST(FLOOR(jaro_winkler_similarity("
        "substr(d1.text, 1, 32), substr(d2.text, 1, 32)) * 1000000) AS BIGINT) "
        "AS jwm FROM documents d1 JOIN documents d2 "
        "ON d2.doc_id = d1.doc_id + 1 WHERE d1.doc_id % 16 <> 15) "
        "SELECT jwm // 50000 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(jwm) AS BIGINT) AS sum_jwm FROM p GROUP BY bucket"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable] = {
    "cms_freq_est": q_cms_freq_est,
    "image_phash_dedup": q_image_phash_dedup,
    "spatial_dbscan": q_spatial_dbscan,
    "crawl_schedule": q_crawl_schedule,
    "jsonl_events_stats": q_jsonl_events_stats,
    "convex_hull": q_convex_hull,
    "jw_linkage": q_jw_linkage,
    "source_diameter": q_source_diameter,
    "late_events": q_late_events,
    "weighted_median_qty": q_weighted_median_qty,
    "link_reciprocity": q_link_reciprocity,
    "first_touch": q_first_touch,
    "embedding_gram": q_embedding_gram,
    "interval_overlaps": q_interval_overlaps,
    "bottomk_sample": q_bottomk_sample,
    "row_number": q_row_number,
    "quota_sample": q_quota_sample,
    "ntile_buckets": q_ntile_buckets,
    "unpivot_metrics": q_unpivot_metrics,
    "grouped_mode": q_grouped_mode,
    "csv_orders_stats": q_csv_orders_stats,
    "orc_lineitem_stats": q_orc_lineitem_stats,
    "geo_knn_join": q_geo_knn_join,
    "geo_tile_counts": q_geo_tile_counts,
    "geo_pip_class_stats": q_geo_pip_class_stats,
    "agreement_test": q_agreement_test,
    "geo_pip_join_rows": q_geo_pip_join_rows,
    "geo_source_tile_stats": q_geo_source_tile_stats,
    "geo_knn": q_geo_knn,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "count_conditions": q_count_conditions,
    "orders_nation_rollup": q_orders_nation_rollup,
    "events_hourly": q_events_hourly,
    "toa_reflectance": q_toa_reflectance,
    "dos_value": q_dos_value,
    "distinct_langs": q_distinct_langs,
    "top_hosts": q_top_hosts,
    "dedup_exact": q_dedup_exact,
    "approx_distinct": q_approx_distinct,
    "heavy_hitters": q_heavy_hitters,
    "bloom_join_revenue": q_bloom_join_revenue,
    "events_asof_orders": q_events_asof_orders,
    "events_interval_orders": q_events_interval_orders,
    "funnel_depths": q_funnel_depths,
    "price_tier_rollup": q_price_tier_rollup,
    "event_transitions": q_event_transitions,
    "session_paths_topk": q_session_paths_topk,
    "topk_docs_per_host": q_topk_docs_per_host,
    "tfidf_scores": q_tfidf_scores,
    "grouped_median_qty": q_grouped_median_qty,
    "dominant_lang_per_source": q_dominant_lang_per_source,
    "customers_no_urgent": q_customers_no_urgent,
    "price_band_revenue": q_price_band_revenue,
    "distinct_users_per_type": q_distinct_users_per_type,
    "running_order_total": q_running_order_total,
    "price_p90_by_flag": q_price_p90_by_flag,
    "user_gap_stats": q_user_gap_stats,
    "qty_discount_corr": q_qty_discount_corr,
    "priority_status_pivot": q_priority_status_pivot,
    "nation_year_revenue": q_nation_year_revenue,
    "rollup_order_counts": q_rollup_order_counts,
    "event_prop_stats": q_event_prop_stats,
    "active_customer_ids": q_active_customer_ids,
    "qty_p75_cont_by_status": q_qty_p75_cont_by_status,
    "nation_revenue_share": q_nation_revenue_share,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_neardup": q_embedding_neardup,
    "token_counts": q_token_counts,
    "bpe_token_counts": q_bpe_token_counts,
    "embedding_topk": q_embedding_topk,
    "sessionize": q_sessionize,
    "interval_coverage": q_interval_coverage,
    "retention_cohorts": q_retention_cohorts,
    "bigram_collocations": q_bigram_collocations,
    "part_skyline": q_part_skyline,
    "edit_distance_hist": q_edit_distance_hist,
    "hist_equalization": q_hist_equalization,
    "salient_terms": q_salient_terms,
    "value_outliers": q_value_outliers,
    "frequent_pairs": q_frequent_pairs,
    "triangle_count": q_triangle_count,
    "morans_i": q_morans_i,
    "burst_pairs": q_burst_pairs,
    "value_mad": q_value_mad,
    "hybrid_rrf": q_hybrid_rrf,
    "token_gini": q_token_gini,
    "source_overlap": q_source_overlap,
    "grouped_ols_slope": q_grouped_ols_slope,
    "chi_square_contingency": q_chi_square_contingency,
    "sliding_value_sum": q_sliding_value_sum,
    "pip_best_match": q_pip_best_match,
    "quantile_breakpoints": q_quantile_breakpoints,
    "source_variance": q_source_variance,
    "source_bbox_overlaps": q_source_bbox_overlaps,
    "cells_all_sources": q_cells_all_sources,
    "hash_sample": q_hash_sample,
    "train_val_split": q_train_val_split,
    "rpc_tile_counts": q_rpc_tile_counts,
    "clip_pushdown": q_clip_pushdown,
    "scalar_transform_sum": q_scalar_transform_sum,
    "quantity_histogram": q_quantity_histogram,
    "multimodal_bytes": q_multimodal_bytes,
    "stretch_breakpoints": q_stretch_breakpoints,
    "order_lineitem_revenue": q_order_lineitem_revenue,
    # non-SQL-expressible (rows-only driver check; python oracles in tests/)
    "knn_cell_ring": q_knn_cell_ring,
    "hex_cell_counts": q_hex_cell_counts,
    "s2_cell_counts": q_s2_cell_counts,
    "minhash_clusters": q_minhash_clusters,
    "simhash_fingerprints": q_simhash_fingerprints,
    "langid_pred_counts": q_langid_pred_counts,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_thumbnails": q_multimodal_thumbnails,
    "jpeg_decode": q_jpeg_decode,
    "video_frame_sample": q_video_frame_sample,
    "mjpeg_video_sample": q_mjpeg_video_sample,
    "mp4_video_sample": q_mp4_video_sample,
    "webm_video_sample": q_webm_video_sample,
    "audio_formats_features": q_audio_formats_features,
    "pdf_text_tokens": q_pdf_text_tokens,
    "warc_host_stats": q_warc_host_stats,
    "substr_dedup": q_substr_dedup,
    "sequence_packing": q_sequence_packing,
    "webdataset_read": q_webdataset_read,
    "blocklist_filter": q_blocklist_filter,
    "warc_record_fetch": q_warc_record_fetch,
    "html_text_extract": q_html_text_extract,
    "html_link_graph": q_html_link_graph,
    "charset_decode": q_charset_decode,
    "robots_filter": q_robots_filter,
    "sitemap_urls": q_sitemap_urls,
    "pagerank_hosts": q_pagerank_hosts,
    "crawl_depths": q_crawl_depths,
    "term_search_pushdown": q_term_search_pushdown,
    "lm_quality_scores": q_lm_quality_scores,
    "phrase_search_pushdown": q_phrase_search_pushdown,
    "term_or_topk": q_term_or_topk,
    "index_incremental_merge": q_index_incremental_merge,
    "index_docs_delete": q_index_docs_delete,
    "index_split": q_index_split,
    "bm25_topk": q_bm25_topk,
    "kwic_snippets": q_kwic_snippets,
    "proximity_topk": q_proximity_topk,
    "tile_pyramid": q_tile_pyramid,
    "audio_features": q_audio_features,
    "stratified_sample": q_stratified_sample,
    "harmonize_params": q_harmonize_params,
    "checkpoint_resume": q_checkpoint_resume,
    "train_eval": q_train_eval,
    "train_eval_conv": q_train_eval_conv,
    "pii_scan_counts": q_pii_scan_counts,
    "pii_redact": q_pii_redact,
    "doc_chunks": q_doc_chunks,
    "quantized_topk": q_quantized_topk,
    "smoothed_grid": q_smoothed_grid,
    "decontaminate": q_decontaminate,
    "text_fingerprints": q_text_fingerprints,
    "gopher_repetition": q_gopher_repetition,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "vocab_coverage": q_vocab_coverage,
    "zipf_histogram": q_zipf_histogram,
    "span_dedup": q_span_dedup,
    "canonical_url_dedup": q_canonical_url_dedup,
    "lang_median_filter": q_lang_median_filter,
    "neardup_clusters": q_neardup_clusters,
    "cluster_canonical": q_cluster_canonical,
    "mixture_rebalance": q_mixture_rebalance,
    "incremental_dedup": q_incremental_dedup,
    "text_normalize": q_text_normalize,
    "local_match": q_local_match,
    "segment_replace": q_segment_replace,
    "idw_grid": q_idw_grid,
}

ORACLES: dict[str, str] = {
    "cms_freq_est": _sql_cms_freq_est(),
    "image_phash_dedup": _sql_image_phash_dedup(),
    "geo_tile_counts": _sql_geo_tile_counts(),
    "geo_pip_class_stats": _sql_geo_pip_class_stats(),
    "agreement_test": _sql_agreement_test(),
    "geo_pip_join_rows": _sql_geo_pip_join_rows(),
    "geo_source_tile_stats": _sql_geo_source_tile_stats(),
    "geo_knn": _sql_geo_knn(),
    "lineitem_pricing_summary": _sql_lineitem_pricing_summary(),
    "count_conditions": _sql_count_conditions(),
    "orders_nation_rollup": _sql_orders_nation_rollup(),
    "events_hourly": _sql_events_hourly(),
    "toa_reflectance": _sql_toa_reflectance(),
    "dos_value": _sql_dos_value(),
    "distinct_langs": _sql_distinct_langs(),
    "top_hosts": _sql_top_hosts(),
    "dedup_exact": _sql_dedup_exact(),
    "approx_distinct": _sql_approx_distinct(),
    "heavy_hitters": _sql_heavy_hitters(),
    "bloom_join_revenue": _sql_bloom_join_revenue(),
    "events_asof_orders": _sql_events_asof_orders(),
    "events_interval_orders": _sql_events_interval_orders(),
    "funnel_depths": _sql_funnel_depths(),
    "price_tier_rollup": _sql_price_tier_rollup(),
    "event_transitions": _sql_event_transitions(),
    "session_paths_topk": _sql_session_paths_topk(),
    "topk_docs_per_host": _sql_topk_docs_per_host(),
    "tfidf_scores": _sql_tfidf_scores(),
    "grouped_median_qty": _sql_grouped_median_qty(),
    "dominant_lang_per_source": _sql_dominant_lang_per_source(),
    "customers_no_urgent": _sql_customers_no_urgent(),
    "price_band_revenue": _sql_price_band_revenue(),
    "distinct_users_per_type": _sql_distinct_users_per_type(),
    "running_order_total": _sql_running_order_total(),
    "price_p90_by_flag": _sql_price_p90_by_flag(),
    "user_gap_stats": _sql_user_gap_stats(),
    "qty_discount_corr": _sql_qty_discount_corr(),
    "priority_status_pivot": _sql_priority_status_pivot(),
    "nation_year_revenue": _sql_nation_year_revenue(),
    "rollup_order_counts": _sql_rollup_order_counts(),
    "event_prop_stats": _sql_event_prop_stats(),
    "active_customer_ids": _sql_active_customer_ids(),
    "qty_p75_cont_by_status": _sql_qty_p75_cont_by_status(),
    "nation_revenue_share": _sql_nation_revenue_share(),
    "ngram_jaccard": _sql_ngram_jaccard(),
    "embedding_neardup": _sql_embedding_neardup(),
    "token_counts": _sql_token_counts(),
    "bpe_token_counts": _sql_bpe_token_counts(),
    "embedding_topk": _sql_embedding_topk(),
    "sessionize": _sql_sessionize(),
    "interval_coverage": _sql_interval_coverage(),
    "retention_cohorts": _sql_retention_cohorts(),
    "bigram_collocations": _sql_bigram_collocations(),
    "part_skyline": _sql_part_skyline(),
    "edit_distance_hist": _sql_edit_distance_hist(),
    "hist_equalization": _sql_hist_equalization(),
    "salient_terms": _sql_salient_terms(),
    "value_outliers": _sql_value_outliers(),
    "frequent_pairs": _sql_frequent_pairs(),
    "triangle_count": _sql_triangle_count(),
    "morans_i": _sql_morans_i(),
    "burst_pairs": _sql_burst_pairs(),
    "value_mad": _sql_value_mad(),
    "hybrid_rrf": _sql_hybrid_rrf(),
    "token_gini": _sql_token_gini(),
    "source_overlap": _sql_source_overlap(),
    "grouped_ols_slope": _sql_grouped_ols_slope(),
    "chi_square_contingency": _sql_chi_square_contingency(),
    "sliding_value_sum": _sql_sliding_value_sum(),
    "pip_best_match": _sql_pip_best_match(),
    "quantile_breakpoints": _sql_quantile_breakpoints(),
    "source_variance": _sql_source_variance(),
    "source_bbox_overlaps": _sql_source_bbox_overlaps(),
    "cells_all_sources": _sql_cells_all_sources(),
    "hash_sample": _sql_hash_sample(),
    "train_val_split": _sql_train_val_split(),
    "rpc_tile_counts": _sql_rpc_tile_counts(),
    "clip_pushdown": _sql_clip_pushdown(),
    "scalar_transform_sum": _sql_scalar_transform_sum(),
    "quantity_histogram": _sql_quantity_histogram(),
    "multimodal_bytes": _sql_multimodal_bytes(),
    "stretch_breakpoints": _sql_stretch_breakpoints(),
    "order_lineitem_revenue": _sql_order_lineitem_revenue(),
    # round-3 derived-invariant promotions (see each query's docstring)
    "harmonize_params": _sql_harmonize_params(),
    "train_eval": _sql_train_eval(),
    "train_eval_conv": _sql_train_eval_conv(),
    "pii_scan_counts": _sql_pii_scan_counts(),
    "pii_redact": _sql_pii_redact(),
    "doc_chunks": _sql_doc_chunks(),
    "quantized_topk": _sql_quantized_topk(),
    "smoothed_grid": _sql_smoothed_grid(),
    "decontaminate": _sql_decontaminate(),
    "minhash_clusters": _sql_minhash_clusters(),
    "simhash_fingerprints": _sql_simhash_fingerprints(),
    "text_fingerprints": _sql_text_fingerprints(),
    "gopher_repetition": _sql_gopher_repetition(),
    "boilerplate_ngrams": _sql_boilerplate_ngrams(),
    "vocab_coverage": _sql_vocab_coverage(),
    "zipf_histogram": _sql_zipf_histogram(),
    "span_dedup": _sql_span_dedup(),
    "canonical_url_dedup": _sql_canonical_url_dedup(),
    "lang_median_filter": _sql_lang_median_filter(),
    "neardup_clusters": _sql_neardup_clusters(),
    "cluster_canonical": _sql_cluster_canonical(),
    "mixture_rebalance": _sql_mixture_rebalance(),
    "incremental_dedup": _sql_incremental_dedup(),
    "text_normalize": _sql_text_normalize(),
    # round-3 full-twin promotion: deterministic seeded-plane LSH probe
    "ann_lsh": _sql_ann_lsh(),
    # round-2 promotions from rows-only to full oracle checks
    "knn_cell_ring": _sql_knn_cell_ring(),
    "checkpoint_resume": _sql_checkpoint_resume(),
    "hex_cell_counts": _sql_hex_cell_counts(),
    "s2_cell_counts": _sql_s2_cell_counts(),
    "idw_grid": _sql_idw_grid(),
    "segment_replace": _sql_segment_replace(),
    "multimodal_thumbnails": _sql_multimodal_thumbnails(),
    "jpeg_decode": _sql_jpeg_decode(),
    "video_frame_sample": _sql_video_frame_sample(),
    "mjpeg_video_sample": _sql_mjpeg_video_sample(),
    "mp4_video_sample": _sql_mp4_video_sample(),
    "webm_video_sample": _sql_webm_video_sample(),
    "audio_formats_features": _sql_audio_formats_features(),
    "pdf_text_tokens": _sql_pdf_text_tokens(),
    "warc_host_stats": _sql_warc_host_stats(),
    "substr_dedup": _sql_substr_dedup(),
    "sequence_packing": _sql_sequence_packing(),
    "webdataset_read": _sql_webdataset_read(),
    "blocklist_filter": _sql_blocklist_filter(),
    "warc_record_fetch": _sql_warc_record_fetch(),
    "html_text_extract": _sql_html_text_extract(),
    "html_link_graph": _sql_html_link_graph(),
    "charset_decode": _sql_charset_decode(),
    "robots_filter": _sql_robots_filter(),
    "sitemap_urls": _sql_sitemap_urls(),
    "pagerank_hosts": _sql_pagerank_hosts(),
    "crawl_depths": _sql_crawl_depths(),
    "term_search_pushdown": _sql_term_search_pushdown(),
    "lm_quality_scores": _sql_lm_quality_scores(),
    "phrase_search_pushdown": _sql_phrase_search_pushdown(),
    "term_or_topk": _sql_term_or_topk(),
    "index_incremental_merge": _sql_index_incremental_merge(),
    "index_docs_delete": _sql_index_docs_delete(),
    "index_split": _sql_index_split(),
    "bm25_topk": _sql_bm25_topk(),
    "kwic_snippets": _sql_kwic_snippets(),
    "proximity_topk": _sql_proximity_topk(),
    "tile_pyramid": _sql_tile_pyramid(),
    "audio_features": _sql_audio_features(),
    "stratified_sample": _sql_stratified_sample(),
    "langid_pred_counts": _sql_langid_pred_counts(),
    "multimodal_decode": _sql_multimodal_decode(),
    # round-5: grid-bucketed weighted DBSCAN, recursive-CTE twin
    "spatial_dbscan": _sql_spatial_dbscan(),
    # round-5: per-host politeness fetch-slot assignment
    "crawl_schedule": _sql_crawl_schedule(),
    "jsonl_events_stats": _sql_jsonl_events_stats(),
    "convex_hull": _sql_convex_hull(),
    "jw_linkage": _sql_jw_linkage(),
    "source_diameter": _sql_source_diameter(),
    "late_events": _sql_late_events(),
    "weighted_median_qty": _sql_weighted_median_qty(),
    "link_reciprocity": _sql_link_reciprocity(),
    "first_touch": _sql_first_touch(),
    "embedding_gram": _sql_embedding_gram(),
    "interval_overlaps": _sql_interval_overlaps(),
    "bottomk_sample": _sql_bottomk_sample(),
    "row_number": _sql_row_number(),
    "quota_sample": _sql_quota_sample(),
    "ntile_buckets": _sql_ntile_buckets(),
    "unpivot_metrics": _sql_unpivot_metrics(),
    "grouped_mode": _sql_grouped_mode(),
    "csv_orders_stats": _sql_csv_orders_stats(),
    "orc_lineitem_stats": _sql_orc_lineitem_stats(),
    # round-5: radius-bounded kNN self-join (one-shuffle spatial join)
    "geo_knn_join": _sql_geo_knn_join(),
}
