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


def round_half_up_det(col: Column, decimals: int) -> Column:
    """Engine-deterministic half-toward-positive-infinity rounding:
    ``floor(x·10ⁿ + 0.5) / 10ⁿ`` as plain IEEE-double ops.

    NOTE this is NOT BigDecimal HALF_UP on negatives: -0.5 floors to 0,
    not -1 (halves go toward +inf, not away from zero). Harmless for
    oracle gating — both engines run the same formula — but do not
    assume ``F.round`` parity on negative half-boundary inputs.

    ``F.round`` converts the double to BigDecimal via its shortest string
    representation before HALF_UP — DuckDB rounds the binary double
    directly, so a value constructed from decimal-exact arithmetic that
    lands exactly on a decimal half-boundary (e.g. 33.1003675) rounds UP
    in Spark but to-nearest-binary in DuckDB.  Spelling the rounding as
    floor arithmetic makes both engines execute the identical IEEE op
    sequence on the identical input double, so the outputs are
    bit-identical even on ties.  Use for any oracled column whose value
    derives from exact decimal/integer arithmetic (transcendental
    outputs never hit decimal ties and can keep ``F.round``)."""
    scale = float(10**decimals)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


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


# ------------------------------------------------- coordinate transforms
#
# The reference's astrometric long tail (AstronomicalCalculations.java:
# 176-237 galactic↔equatorial, :239-263 proper motion, :266-296 airmass,
# :588-612 Vincenty separation, :896-940 precession rotation, :901-957
# USNO refraction). All pure trig on scalars — native column expressions
# that stay inside whole-stage codegen; the reference evaluates them in
# interpreted Java per row.

# J2000.0 galactic frame constants (AstronomicalCalculations.java:183-186;
# the standard IAU values): equatorial position of the galactic north
# pole, and galactic longitude of the celestial north pole.
RA_GNP_DEG = 192.859508
DEC_GNP_DEG = 27.128336
L_NCP_DEG = 122.932


def _pmod360(x: Column) -> Column:
    """Normalize an angle to [0, 360) with the same ((x%360)+360)%360
    shape the oracle SQL uses — Spark's % keeps the dividend sign."""
    return ((x % 360.0) + 360.0) % 360.0


def equatorial_to_galactic(ra: Column, dec: Column) -> tuple[Column, Column]:
    """(ra, dec) → (l, b), J2000 — standard IAU spherical triangle
    against the galactic north pole.

    Semantics from AstronomicalCalculations.java:182-206, with one
    deliberate deviation: the reference's longitude branch (tan-form x,
    lGCP = 32.932) is NOT the inverse of its own galacticToEquatorial
    (:211-236) — roundtripping there errs by up to ~245°. We use the
    standard convention (l_NCP = 122.932, cos(dec)-weighted atan2),
    which roundtrips to 1e-13 deg and reproduces published positions
    (Sgr A* → l=359.944, b=−0.046; Vega → l=67.448, b=19.237) —
    verified in tests/test_astro_functions.py."""
    import math

    ra_r, dec_r = F.radians(ra), F.radians(dec)
    ra_gnp = math.radians(RA_GNP_DEG)
    sin_dgnp = math.sin(math.radians(DEC_GNP_DEG))
    cos_dgnp = math.cos(math.radians(DEC_GNP_DEG))
    dra = ra_r - F.lit(ra_gnp)
    sin_b = F.sin(dec_r) * sin_dgnp + F.cos(dec_r) * cos_dgnp * F.cos(dra)
    b = F.degrees(F.asin(sin_b))
    y = F.cos(dec_r) * F.sin(dra)
    x = F.sin(dec_r) * cos_dgnp - F.cos(dec_r) * sin_dgnp * F.cos(dra)
    l = _pmod360(F.lit(L_NCP_DEG) - F.degrees(F.atan2(y, x)))
    return l, b


def galactic_to_equatorial(l: Column, b: Column) -> tuple[Column, Column]:
    """(l, b) → (ra, dec) — exact inverse of equatorial_to_galactic
    (AstronomicalCalculations.java:211-236 semantics, standard-convention
    arithmetic; see the forward transform's docstring)."""
    import math

    l_r, b_r = F.radians(l), F.radians(b)
    l_ncp = math.radians(L_NCP_DEG)
    sin_dgnp = math.sin(math.radians(DEC_GNP_DEG))
    cos_dgnp = math.cos(math.radians(DEC_GNP_DEG))
    dl = F.lit(l_ncp) - l_r
    sin_dec = F.sin(b_r) * sin_dgnp + F.cos(b_r) * cos_dgnp * F.cos(dl)
    dec = F.degrees(F.asin(sin_dec))
    y = F.cos(b_r) * F.sin(dl)
    x = F.sin(b_r) * cos_dgnp - F.cos(b_r) * sin_dgnp * F.cos(dl)
    ra = _pmod360(F.lit(RA_GNP_DEG) + F.degrees(F.atan2(y, x)))
    return ra, dec


def apply_proper_motion(
    ra0: Column, dec0: Column, pm_ra_mas: Column, pm_dec_mas: Column,
    epoch_diff_years: Column,
) -> tuple[Column, Column]:
    """First-order proper-motion epoch transform
    (AstronomicalCalculations.java:239-263): mas/yr → deg over Δepoch,
    RA normalized to [0,360), Dec clamped to [−90,90]. pm_ra carries the
    cos(dec) factor (catalog convention), matching the reference."""
    ra = _pmod360(ra0 + pm_ra_mas / 3_600_000.0 * epoch_diff_years)
    dec = F.greatest(
        F.lit(-90.0),
        F.least(F.lit(90.0), dec0 + pm_dec_mas / 3_600_000.0 * epoch_diff_years),
    )
    return ra, dec


def airmass_plane_parallel(altitude_deg: Column) -> Column:
    """sec(z) plane-parallel airmass; +∞ at/below the horizon
    (AstronomicalCalculations.java:271-282)."""
    return F.when(altitude_deg <= 0.0, F.lit(float("inf"))).otherwise(
        1.0 / F.cos(F.radians(90.0 - altitude_deg))
    )


def airmass_kasten_young(altitude_deg: Column) -> Column:
    """Kasten–Young (1989) airmass — accurate to the horizon
    (AstronomicalCalculations.java:286-293)."""
    return F.when(altitude_deg <= 0.0, F.lit(float("inf"))).otherwise(
        1.0
        / (
            F.sin(F.radians(altitude_deg))
            + 0.50572 * F.pow(altitude_deg + 6.07995, F.lit(-1.6364))
        )
    )


def angular_distance_vincenty_arcsec(
    ra1: Column, dec1: Column, ra2: Column, dec2: Column
) -> Column:
    """Vincenty great-circle separation in ARCSECONDS — the reference's
    high-precision variant (AstronomicalCalculations.java:588-612),
    stable at both tiny and antipodal separations."""
    r1, d1, r2, d2 = (F.radians(c) for c in (ra1, dec1, ra2, dec2))
    dra = r2 - r1
    num = F.sqrt(
        F.pow(F.cos(d2) * F.sin(dra), F.lit(2.0))
        + F.pow(
            F.cos(d1) * F.sin(d2) - F.sin(d1) * F.cos(d2) * F.cos(dra),
            F.lit(2.0),
        )
    )
    den = F.sin(d1) * F.sin(d2) + F.cos(d1) * F.cos(d2) * F.cos(dra)
    return F.degrees(F.atan2(num, den)) * 3600.0


def precess_approx_ra(ra: Column, dec: Column, epoch0: float, epoch1: float) -> Column:
    """RA after the reference's SIMPLIFIED precession rotation
    (AstronomicalCalculations.java:896-940): IAU-2000-style θ(t) angle
    applied as a single z-axis rotation of the unit vector — Dec is
    unchanged by that rotation (zPrec = z there), so only RA moves.
    Mirrored exactly for catalog parity; a full rigorous precession
    would use the zeta/z angles too."""
    import math

    t0 = (epoch0 - 2000.0) / 100.0
    dt = (epoch1 - 2000.0) / 100.0 - t0
    theta_arcsec = (
        (2004.3109 - 0.85330 * t0 - 0.000217 * t0 * t0) * dt
        - (0.42665 + 0.000217 * t0) * dt * dt
        - 0.041833 * dt * dt * dt
    )
    theta = math.radians(theta_arcsec / 3600.0)
    ra_r, dec_r = F.radians(ra), F.radians(dec)
    x = F.cos(dec_r) * F.cos(ra_r)
    y = F.cos(dec_r) * F.sin(ra_r)
    xp = x * math.cos(theta) - y * math.sin(theta)
    yp = x * math.sin(theta) + y * math.cos(theta)
    return _pmod360(F.degrees(F.atan2(yp, xp)))


def atmospheric_refraction_arcsec(
    altitude_deg: Column,
    temperature_c: Column,
    pressure_mb: Column,
    humidity_frac: Column,
    wavelength_um: Column,
) -> Column:
    """USNO/Bennett-style atmospheric refraction in arcseconds
    (AstronomicalCalculations.java:901-957): tan(z) polynomial scaled by
    pressure / temperature / humidity / wavelength-dispersion factors.
    NULL at/below the horizon — the tan(z) polynomial is undefined there
    (the same inputs its airmass siblings guard with +inf), not
    'astronomically large refraction'."""
    tan_z = F.tan(F.radians(90.0 - altitude_deg))
    basic = (
        58.1 * tan_z
        - 0.07 * F.pow(tan_z, F.lit(3.0))
        + 0.000086 * F.pow(tan_z, F.lit(5.0))
    )
    temp_k = temperature_c + 273.15
    return F.when(
        altitude_deg > 0.0,
        basic
        * (pressure_mb / 1013.25)
        * (283.0 / temp_k)
        * (1.0 - 0.0001 * humidity_frac * temp_k / 100.0)
        * (
            1.0
            + 0.00013 * (1.0 / (wavelength_um * wavelength_um) - 1.0 / 0.55)
        ),
    )
