"""Scalar operators: condition DSL, value replace, stretch, gamma.

Re-expressions of the reference's per-pixel numpy kernels as Arrow
compute expressions inside ``map_batches`` (SURVEY.md §2.2, §2.7):

* condition DSL — ``count_raster_values.py:5-29``: strings ``'>4'``,
  ``'<10'``, ``'3'`` parsed to predicates, lists AND-ed;
* value replace — ``replace_raster_value.py:6-50``: ``np.where(v==a, b, v)``;
* scalar add on valid values — ``add_value_to_raster.py:27-58``: nodata
  mask becomes the Arrow validity bitmap;
* piecewise-linear stretch — ``stretch_spectral_values.py:7-185``:
  breakpoints from literals or percentiles, ``np.interp`` on valid values;
* gamma correction — ``local_match.py:544-573`` incl. the <=0 offset-shift
  path (``local_match.py:945-953``).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_COND_RE = re.compile(r"^\s*(>=|<=|>|<|==|!=)?\s*(-?\d+(?:\.\d+)?)\s*$")

_OPS: dict[str, Callable] = {
    ">": pc.greater,
    "<": pc.less,
    ">=": pc.greater_equal,
    "<=": pc.less_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
    None: pc.equal,  # bare number means equality (reference semantics)
}


def parse_condition(cond: str):
    """One condition string -> (op, value). ``'3'`` means ``== 3``."""
    m = _COND_RE.match(cond)
    if not m:
        raise ValueError(f"unparseable condition {cond!r}")
    op, val = m.group(1), float(m.group(2))
    return op, val


def condition_mask(col: pa.ChunkedArray | pa.Array, conds: list[str] | str) -> pa.Array:
    """AND of all condition strings applied to a column (null -> excluded)."""
    if isinstance(conds, str):
        conds = [conds]
    mask = None
    for c in conds:
        op, val = parse_condition(c)
        m = _OPS[op](col, val)
        mask = m if mask is None else pc.and_(mask, m)
    return pc.fill_null(mask, False)


def condition_sql(col: str, conds: list[str] | str) -> str:
    """The same conditions as an ANSI-SQL predicate (for DuckDB oracles)."""
    if isinstance(conds, str):
        conds = [conds]
    parts = []
    for c in conds:
        op, val = parse_condition(c)
        sql_op = {"==": "=", None: "="}.get(op, op)
        parts.append(f"{col} {sql_op} {val}")
    return " AND ".join(parts)


def replace_value(col, find: float, repl: float):
    """``np.where(v == find, repl, v)`` preserving nulls (M2)."""
    return pc.if_else(pc.equal(col, find), pa.scalar(repl, pa.float64()),
                      pc.cast(col, pa.float64()))


def add_scalar(col, v: float):
    """Add on valid values only — nulls stay null (M1)."""
    return pc.add(pc.cast(col, pa.float64()), v)


def piecewise_stretch(values: np.ndarray, breakpoints: dict[float, float]) -> np.ndarray:
    """np.interp through sorted (src, dst) breakpoints (M4 apply step).

    Breakpoint keys must already be resolved to absolute values (the
    percentile-resolution pass is a separate global aggregate — A11).
    """
    src = np.asarray(sorted(breakpoints.keys()), dtype=np.float64)
    dst = np.asarray([breakpoints[k] for k in sorted(breakpoints)], dtype=np.float64)
    return np.interp(np.asarray(values, dtype=np.float64), src, dst)


def resolve_breakpoint_spec(
    spec: dict[str, float], quantile_fn: Callable[[float, bool], float]
) -> dict[float, float]:
    """Resolve ``{'10%': 0, '200': 1, '5@': 2}`` to absolute breakpoints.

    ``p%`` -> percentile p of the column; ``p@`` -> percentile p excluding
    negatives (``stretch_spectral_values.py:62-78``); plain numbers are
    literals. ``quantile_fn(q, exclude_negatives)`` supplies percentiles
    (computed once, globally, by the caller).
    """
    out: dict[float, float] = {}
    for key, dst in spec.items():
        ks = str(key).strip()
        if ks.endswith("%"):
            out[quantile_fn(float(ks[:-1]) / 100.0, False)] = dst
        elif ks.endswith("@"):
            out[quantile_fn(float(ks[:-1]) / 100.0, True)] = dst
        else:
            out[float(ks)] = dst
    return out


def gamma_correct(
    values: np.ndarray,
    m_ref: np.ndarray,
    m_in: np.ndarray,
    alpha: float = 1.0,
    shift: "float | None" = None,
) -> np.ndarray:
    """``out = alpha * v ** (log(m_ref)/log(m_in))`` with the reference's
    offset-shift when the minimum is <= 0 (shift into positive domain,
    correct, shift back) — ``local_match.py:544-573, 945-953``.

    ``shift=None`` derives the shift from THIS array's min (the
    reference's whole-image semantics — correct only when ``values`` is
    the full dataset). Distributed callers running per batch MUST pass a
    precomputed global shift, or the output becomes block-structure-
    dependent (each block would shift by its own local min).
    """
    values = np.asarray(values, dtype=np.float64)
    m_ref = np.asarray(m_ref, dtype=np.float64)
    m_in = np.asarray(m_in, dtype=np.float64)
    if shift is None:
        vmin = np.nanmin(values) if len(values) else 0.0
        shift = 1.0 - vmin if vmin <= 0 else 0.0
    v = values + shift
    mr = m_ref + shift
    mi = m_in + shift
    with np.errstate(divide="ignore", invalid="ignore"):
        gamma = np.log(mr) / np.log(mi)
        out = alpha * np.power(v, gamma)
    return out - shift
