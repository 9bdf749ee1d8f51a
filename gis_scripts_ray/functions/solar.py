"""Solar geometry + TOA reflectance arithmetic — §2.7 functions.

Re-expression of the reference's radiometric-calibration support math
(``external/.../seagrass_lib.py:125-141`` ``earth_sun_distance``,
``:263`` zenith-from-elevation, ``:301`` the Rrs conversion). Vectorized
over int64-microsecond timestamps; the Julian-day integer truncations
follow the reference's ``int()`` exactly (toward zero).
"""

from __future__ import annotations

import numpy as np

_DEG = np.pi / 180.0


def solar_zenith_deg(solar_elevation_deg):
    """Zenith = 90 - elevation (``seagrass_lib.py:263``)."""
    return 90.0 - np.asarray(solar_elevation_deg, dtype=np.float64)


def earth_sun_distance_au(ts_us: np.ndarray) -> np.ndarray:
    """Earth-sun distance in AU from epoch-microsecond timestamps.

    The reference's Julian-day approximation (``seagrass_lib.py:126-141``):
    Jan/Feb roll into month 13/14 of the prior year, Gregorian correction
    B = 2 - A + A//4, JD from truncated year/month terms + UT fraction,
    then d = 1.00014 - 0.01671 cos(g) - 0.00014 cos(2g).
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    days = ts_us // 86_400_000_000
    rem = ts_us - days * 86_400_000_000
    # civil date from days-since-epoch (proleptic Gregorian, Hinnant's
    # public-domain algorithm)
    z = days + 719_468
    era = np.floor_divide(z, 146_097)
    doe = z - era * 146_097
    yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    mon = np.where(mp < 10, mp + 3, mp - 9)
    yr = np.where(mon <= 2, y + 1, y).astype(np.float64)
    mon = mon.astype(np.float64)
    d = d.astype(np.float64)
    # reference: Jan/Feb -> month+12 of the previous year
    jan_feb = mon <= 2.0
    yr = np.where(jan_feb, yr - 1.0, yr)
    mon = np.where(jan_feb, mon + 12.0, mon)
    # UT from whole h/m/s parts, reference expression order (sub-second
    # truncated, like the reference's timetuple)
    secs = rem // 1_000_000
    hh = (secs // 3600).astype(np.float64)
    mm = ((secs // 60) % 60).astype(np.float64)
    ss = (secs % 60).astype(np.float64)
    ut = hh + mm / 60.0 + ss / 3600.0
    a = np.trunc(yr / 100.0)
    b = 2.0 - a + np.trunc(a / 4.0)
    jd = (
        np.trunc(365.25 * (yr + 4716.0))
        + np.trunc(30.6001 * (mon + 1.0))
        + d
        + ut / 24.0
        + b
        - 1524.5
    )
    dd = jd - 2451545.0
    g = 357.529 + 0.98560028 * dd
    return 1.00014 - 0.01671 * np.cos(g * _DEG) - 0.00014 * np.cos(2.0 * g * _DEG)


def toa_reflectance(
    radiance: np.ndarray,
    dist_au: np.ndarray,
    solar_irradiance: float,
    solar_zenith_deg_v: float,
) -> np.ndarray:
    """Remote-sensing reflectance x 10000 (``seagrass_lib.py:301``), same
    operation order as the reference expression."""
    radiance = np.asarray(radiance, dtype=np.float64)
    dist_au = np.asarray(dist_au, dtype=np.float64)
    return (
        (radiance * dist_au**2 * np.pi)
        / (solar_irradiance * np.cos(solar_zenith_deg_v * _DEG))
        / np.pi
    ) * 10000.0
