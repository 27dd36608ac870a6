"""Quantitative oracles for the astrometric coordinate-transform long
tail (functions/astro.py; reference AstronomicalCalculations.java:176-296,
:588-612, :896-957).

Known-value pins come from published J2000 positions (SIMBAD values,
public knowledge); the roundtrip property pins the galactic transform as
a true inverse — which the reference's own pair is NOT (its forward and
inverse disagree by up to ~245°; see equatorial_to_galactic docstring).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from astro_data_pipeline_spark.functions.astro import (
    airmass_kasten_young,
    airmass_plane_parallel,
    angular_distance_deg,
    angular_distance_vincenty_arcsec,
    apply_proper_motion,
    atmospheric_refraction_arcsec,
    equatorial_to_galactic,
    galactic_to_equatorial,
    precess_approx_ra,
)


def _eval(spark, rows, cols: dict) -> list[dict]:
    df = spark.createDataFrame(rows)
    return [r.asDict() for r in df.select(*[c.alias(n) for n, c in cols.items()]).collect()]


def test_galactic_known_positions(spark):
    """Sgr A* and Vega map to their published galactic coordinates
    (SIMBAD: Sgr A* l=359.9443 b=-0.0462; Vega l=67.448 b=19.237)."""
    rows = [
        {"ra": 266.41683, "dec": -29.00781},  # Sgr A*
        {"ra": 279.23474, "dec": 38.78369},   # Vega
        {"ra": 192.859508, "dec": 27.128336},  # galactic north pole itself
    ]
    l, b = equatorial_to_galactic(F.col("ra"), F.col("dec"))
    out = _eval(spark, rows, {"l": l, "b": b})
    assert out[0]["l"] == pytest.approx(359.9443, abs=2e-3)
    assert out[0]["b"] == pytest.approx(-0.0462, abs=2e-3)
    assert out[1]["l"] == pytest.approx(67.448, abs=2e-3)
    assert out[1]["b"] == pytest.approx(19.237, abs=2e-3)
    assert out[2]["b"] == pytest.approx(90.0, abs=1e-4)


def test_galactic_roundtrip_is_identity(spark):
    """equatorial→galactic→equatorial reproduces the input over a full
    sky grid (poles excluded) to sub-milliarcsecond error."""
    rows = [
        {"ra": float(ra), "dec": float(dec)}
        for ra in range(0, 360, 23)
        for dec in range(-88, 89, 16)
    ]
    l, b = equatorial_to_galactic(F.col("ra"), F.col("dec"))
    ra2, dec2 = galactic_to_equatorial(l, b)
    out = _eval(
        spark, rows,
        {"ra": F.col("ra"), "dec": F.col("dec"), "ra2": ra2, "dec2": dec2},
    )
    for r in out:
        dra = abs((r["ra2"] - r["ra"] + 180.0) % 360.0 - 180.0)
        assert dra * math.cos(math.radians(r["dec"])) < 1e-9
        assert abs(r["dec2"] - r["dec"]) < 1e-9


def test_proper_motion_normalizes_and_clamps(spark):
    """RA wraps into [0,360); Dec clamps at the poles
    (AstronomicalCalculations.java:239-263)."""
    rows = [
        # 359.9999° + large pm crosses the wrap; dec near the pole clamps
        {"ra": 359.9999, "dec": 89.99999, "pm_ra": 3600.0 * 1000.0, "pm_dec": 3600.0 * 1000.0},
        {"ra": 0.0001, "dec": -89.99999, "pm_ra": -3600.0 * 1000.0, "pm_dec": -3600.0 * 1000.0},
        {"ra": 120.0, "dec": 10.0, "pm_ra": 100.0, "pm_dec": -50.0},
    ]
    ra2, dec2 = apply_proper_motion(
        F.col("ra"), F.col("dec"), F.col("pm_ra"), F.col("pm_dec"), F.lit(10.0)
    )
    out = _eval(spark, rows, {"ra2": ra2, "dec2": dec2})
    # 3600*1000 mas/yr * 10 yr = 10 deg
    assert out[0]["ra2"] == pytest.approx(9.9999, abs=1e-6)
    assert out[0]["dec2"] == 90.0
    assert out[1]["ra2"] == pytest.approx(350.0001, abs=1e-6)
    assert out[1]["dec2"] == -90.0
    # 100 mas/yr * 10 yr = 1 arcsec = 1/3600 deg
    assert out[2]["ra2"] == pytest.approx(120.0 + 1.0 / 3600.0, abs=1e-9)
    assert out[2]["dec2"] == pytest.approx(10.0 - 0.5 / 3600.0, abs=1e-9)


def test_airmass_models(spark):
    """Zenith airmass is 1; sec(z) and Kasten–Young agree to ~1% at
    moderate altitude and diverge near the horizon (where plane-parallel
    blows up); at/below the horizon both return +inf."""
    rows = [{"alt": 90.0}, {"alt": 30.0}, {"alt": 5.0}, {"alt": 0.0}, {"alt": -5.0}]
    out = _eval(
        spark, rows,
        {"pp": airmass_plane_parallel(F.col("alt")),
         "ky": airmass_kasten_young(F.col("alt"))},
    )
    assert out[0]["pp"] == pytest.approx(1.0, abs=1e-12)
    assert out[0]["ky"] == pytest.approx(1.0, abs=2e-3)
    assert out[1]["pp"] == pytest.approx(2.0, abs=1e-9)  # sec(60°)
    assert out[1]["ky"] == pytest.approx(2.0, rel=0.01)
    assert out[2]["ky"] < out[2]["pp"]  # KY stays finite-ish at low alt
    assert math.isinf(out[3]["pp"]) and math.isinf(out[3]["ky"])
    assert math.isinf(out[4]["pp"]) and math.isinf(out[4]["ky"])


def test_vincenty_matches_haversine_and_known_separation(spark):
    """Vincenty agrees with the haversine implementation to sub-mas and
    pins a hand-checkable separation (1° along the equator = 3600\")."""
    rows = [
        {"ra1": 10.0, "dec1": 0.0, "ra2": 11.0, "dec2": 0.0},
        {"ra1": 266.4, "dec1": -29.0, "ra2": 279.2, "dec2": 38.8},
        {"ra1": 359.9, "dec1": 45.0, "ra2": 0.1, "dec2": 45.0},  # RA wrap
    ]
    v = angular_distance_vincenty_arcsec(
        F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2")
    )
    h = angular_distance_deg(
        F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2")
    ) * 3600.0
    out = _eval(spark, rows, {"v": v, "h": h})
    assert out[0]["v"] == pytest.approx(3600.0, abs=1e-6)
    for r in out:
        assert r["v"] == pytest.approx(r["h"], abs=1e-3)


def test_precession_shifts_ra_only_slightly(spark):
    """J2000→J2024.5: the simplified z-rotation moves RA by θ≈491″·cosδ
    scale (≈0.136° at the equator) and is exactly zero when Δepoch=0."""
    rows = [{"ra": 100.0, "dec": 0.0}, {"ra": 100.0, "dec": 60.0}]
    p24 = precess_approx_ra(F.col("ra"), F.col("dec"), 2000.0, 2024.5)
    p0 = precess_approx_ra(F.col("ra"), F.col("dec"), 2000.0, 2000.0)
    out = _eval(spark, rows, {"p24": p24, "p0": p0})
    theta_deg = (2004.3109 * 0.245 - 0.42665 * 0.245**2 - 0.041833 * 0.245**3) / 3600.0
    for r in out:
        assert r["p0"] == pytest.approx(100.0, abs=1e-9)
        # a pure z-rotation shifts RA by exactly θ regardless of dec
        assert r["p24"] == pytest.approx(100.0 + theta_deg, abs=1e-9)


def test_refraction_sane_bands(spark):
    """USNO/Bennett-style refraction: ~60″ at 45° altitude under standard
    conditions is the textbook band (~1 arcminute at z=45°... actually
    ~58″ at alt=45°), falling to ~0 at zenith, growing toward horizon."""
    rows = [{"alt": 90.0}, {"alt": 45.0}, {"alt": 10.0}, {"alt": 0.0}, {"alt": -3.0}]
    refr = atmospheric_refraction_arcsec(
        F.col("alt"), F.lit(10.0), F.lit(1013.25), F.lit(0.0), F.lit(0.55)
    )
    out = _eval(spark, rows, {"r": refr})
    assert out[0]["r"] == pytest.approx(0.0, abs=1e-6)
    assert 50.0 < out[1]["r"] < 70.0
    assert out[2]["r"] > 5.0 * out[1]["r"]  # tan z growth toward horizon
    assert out[3]["r"] is None and out[4]["r"] is None  # undefined at/below horizon
