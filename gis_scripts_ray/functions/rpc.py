"""Rational-polynomial-coefficient (RPC) image projection — §2.7 function.

Re-expression of the reference's ``coord_to_rpc_image``
(``external/.../seagrass_lib.py:57-76``): normalize (lon, lat, height) by
per-model offset/scale, evaluate four 20-term cubic polynomials (sample/
line numerator/denominator) in the RPC00B term order, divide, de-normalize
and truncate to integer (col, row).

Vectorized over numpy arrays; the accumulation follows the reference's
left-to-right term order exactly so the DuckDB SQL twin (same expression
spelled out) is bit-identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# RPC00B term order: index -> (L exponent, P exponent, H exponent)
RPC_TERMS: tuple[tuple[int, int, int], ...] = (
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 0, 0),
    (0, 2, 0), (0, 0, 2), (1, 1, 1), (3, 0, 0),
    (1, 2, 0), (1, 0, 2), (2, 1, 0), (0, 3, 0),
    (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
)


def rpc_poly(coeff, L: np.ndarray, P: np.ndarray, H: np.ndarray) -> np.ndarray:
    """20-term cubic in the reference's exact accumulation order."""
    coeff = np.asarray(coeff, dtype=np.float64)
    if coeff.shape != (20,):
        raise ValueError("RPC polynomial needs exactly 20 coefficients")
    v = coeff[0] + np.zeros_like(np.asarray(L, dtype=np.float64))
    for c, (el, ep, eh) in zip(coeff[1:], RPC_TERMS[1:]):
        term = c
        for base, e in ((L, el), (P, ep), (H, eh)):
            for _ in range(e):
                term = term * base
        v = v + term
    return v


@dataclass
class RpcModel:
    """Offsets/scales + the four coefficient vectors of one image model."""

    long_off: float
    long_scale: float
    lat_off: float
    lat_scale: float
    height_off: float
    height_scale: float
    samp_off: float
    samp_scale: float
    line_off: float
    line_scale: float
    samp_num: tuple = field(default=None)
    samp_den: tuple = field(default=None)
    line_num: tuple = field(default=None)
    line_den: tuple = field(default=None)


def rpc_project(
    lon: np.ndarray, lat: np.ndarray, height: np.ndarray, m: RpcModel
) -> tuple[np.ndarray, np.ndarray]:
    """(col, row) int64 pixel positions — ``coord_to_rpc_image`` semantics
    (truncation toward zero, like Python ``int()``)."""
    L = (np.asarray(lon, dtype=np.float64) - m.long_off) / m.long_scale
    P = (np.asarray(lat, dtype=np.float64) - m.lat_off) / m.lat_scale
    H = (np.asarray(height, dtype=np.float64) - m.height_off) / m.height_scale
    c_n = rpc_poly(m.samp_num, L, P, H) / rpc_poly(m.samp_den, L, P, H)
    r_n = rpc_poly(m.line_num, L, P, H) / rpc_poly(m.line_den, L, P, H)
    col = np.trunc(c_n * m.samp_scale + m.samp_off).astype(np.int64)
    row = np.trunc(r_n * m.line_scale + m.line_off).astype(np.int64)
    return col, row


def rpc_poly_sql(coeff, L: str, P: str, H: str) -> str:
    """The same 20-term expression as SQL (left-assoc + chain, repr'd
    coefficients). Equal to :func:`rpc_poly` to within ~1 ulp — DuckDB
    contracts mul-add chains to FMA — which the query-level truncation
    and 256-px bucketing margins absorb."""
    coeff = np.asarray(coeff, dtype=np.float64)
    parts = [repr(float(coeff[0]))]
    for c, (el, ep, eh) in zip(coeff[1:], RPC_TERMS[1:]):
        t = repr(float(c))
        t += f"*{L}" * el + f"*{P}" * ep + f"*{H}" * eh
        parts.append(t)
    return "(" + " + ".join(parts) + ")"
