"""Astronomy-domain scalar functions as native column expressions.

Spark restatement of the reference's math library (SURVEY.md §2.8):
AstronomicalCalculations.java:135-387 (angular distance, spherical law of
cosines / haversine) and :302-335 (flux↔magnitude). Implemented with
built-in ``pyspark.sql.functions`` so they stay inside whole-stage codegen
— never per-row Python (the reference's interpreted Java loops are the
slow path we replace).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def angular_distance_deg(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Great-circle separation in degrees (haversine, numerically stable).

    Reference: AstronomicalCalculations.java:157-182 (haversine variant).
    """
    r1, d1, r2, d2 = (F.radians(c) for c in (ra1, dec1, ra2, dec2))
    sdlat = F.sin((d2 - d1) / 2)
    sdlon = F.sin((r2 - r1) / 2)
    a = sdlat * sdlat + F.cos(d1) * F.cos(d2) * sdlon * sdlon
    return F.degrees(2 * F.atan2(F.sqrt(a), F.sqrt(1 - a)))


def flux_to_magnitude(flux: Column, zero_point: float = 25.0) -> Column:
    """m = zp - 2.5 log10(flux). Reference: AstronomicalCalculations.java:302-318."""
    return F.lit(zero_point) - 2.5 * F.log10(flux)


def magnitude_to_flux(mag: Column, zero_point: float = 25.0) -> Column:
    """Inverse of flux_to_magnitude. Reference: AstronomicalCalculations.java:320-335."""
    return F.pow(F.lit(10.0), (F.lit(zero_point) - mag) / 2.5)
