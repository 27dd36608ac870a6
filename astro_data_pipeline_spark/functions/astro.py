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


# ---------------------------------------------------- photometric calibration

# (filter, zero_point, extinction_coeff, psf_fwhm_px) — the reference's
# STANDARD_ZERO_POINTS + extinction tables + per-instrument PSF widths
# (PhotometricCalibration.java:45-74 zero points, :144-158 extinction,
# :203-215 PSF FWHM). A tiny dimension table: broadcast-joined, never
# shuffled.
PHOTOMETRIC_COEFFS: list[tuple[str, float, float, float]] = [
    ("U", 22.0, 0.60, 4.0),
    ("B", 22.5, 0.40, 4.0),
    ("V", 21.1, 0.20, 4.0),
    ("R", 21.2, 0.10, 4.0),
    ("I", 20.5, 0.08, 4.0),
    ("J", 16.8, 0.05, 4.0),
    ("H", 16.4, 0.03, 4.0),
    ("K", 16.0, 0.02, 4.0),
    ("F555W", 25.7, 0.15, 2.5),  # HST: default extinction coeff
    ("F150W", 28.2, 0.15, 3.0),  # JWST
]


def extinction_correction(k_ext: Column, airmass: Column) -> Column:
    """k(filter) · (airmass − 1) — PhotometricCalibration.java:144-158."""
    return k_ext * (airmass - F.lit(1.0))


def aperture_correction(aperture_diameter: Column, psf_fwhm: Column) -> Column:
    """Encircled-energy aperture correction to infinite aperture
    (PhotometricCalibration.java:168-197): piecewise EE curve on
    ratio = d/FWHM, then −2.5·log10(EE)."""
    ratio = aperture_diameter / psf_fwhm
    ee = (
        F.when(ratio < 0.5, 0.1 * ratio * ratio)
        .when(ratio < 1.0, 0.4 * ratio)
        .when(ratio < 2.0, 0.6 + 0.3 * (ratio - 1.0))
        .when(ratio < 4.0, 0.9 + 0.08 * (ratio - 2.0))
        .otherwise(F.lit(0.98))
    )
    return -2.5 * F.log10(ee)


def color_correction(inst_mag: Column) -> Column:
    """Brightness-banded color term (PhotometricCalibration.java:221-233)."""
    return (
        F.when(inst_mag < 15.0, F.lit(0.02))
        .when(inst_mag < 20.0, F.lit(0.01))
        .otherwise(F.lit(0.0))
    )


def photometric_error(
    inst_mag: Column, exposure_time: Column, airmass: Column,
    aperture_diameter: Column,
) -> Column:
    """STScI-style error model: Poisson + sky + atmospheric + systematic in
    quadrature, floored at 1 mmag (PhotometricCalibration.java:243-267)."""
    import math

    flux = F.pow(F.lit(10.0), -0.4 * inst_mag)
    poisson = F.lit(1.0) / F.sqrt(flux * exposure_time)
    sky = F.lit(0.01) * F.sqrt(
        F.lit(math.pi) * aperture_diameter * aperture_diameter / 4.0
    )
    atmo = F.lit(0.005) * (airmass - 1.0)
    sys_err = F.lit(0.01)
    total = F.sqrt(poisson * poisson + sky * sky + atmo * atmo + sys_err * sys_err)
    return F.greatest(F.lit(0.001), total)
