"""Filters, projections, derived columns, set ops, scalar functions
(SURVEY.md §2.2 F1–F7, §2.7 U1–U3, §2.8).

All predicates are plain Catalyst expressions so they push down to the
parquet scan (``PushedFilters`` in .explain) — the scale property the
reference gets from S3 ``StartAfter`` listing and Postgres indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sha256_arrow
from ..registry import query
from ..sources import load_table


@query(
    "filter_validate_split_documents",
    oracle="""
    SELECT doc_id, n_chars,
           CASE WHEN n_chars BETWEEN 100 AND 500 AND text IS NOT NULL
                THEN 'valid' ELSE 'invalid' END AS validity
    FROM documents
    """,
)
def filter_validate_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/U1 size-range validation splitting valid/invalid streams
    (reference: validate_fits_files size gate 1MB–500MB,
    telescope_data_processing.py:115-156). One scan, a ``when`` tag instead
    of two passes."""
    docs = load_table(spark, sf_dir, "documents")
    valid = (F.col("n_chars").between(100, 500)) & F.col("text").isNotNull()
    return docs.select(
        "doc_id",
        "n_chars",
        F.when(valid, "valid").otherwise("invalid").alias("validity"),
    )


@query(
    "filter_time_window_recent_events",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 6 HOUR
    """,
)
def filter_time_window_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 time-window predicate (reference: 1-hour lookback discovery,
    telescope_data_processing.py:72-84). The scalar max(ts) is a tiny
    separate job; the main scan then gets a pushed-down range filter —
    same two-phase shape as the reference's StartAfter listing."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 6 HOURS")
    return ev.filter(F.col("ts") >= cutoff).select("event_id", "user_id", "event_type")


@query(
    "project_derived_partition_key",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_orderstatus || '_' || strftime(o_orderdate, '%Y%m') AS partition_key,
           CASE WHEN o_totalprice >= 100000 THEN 'high' ELSE 'normal' END AS price_band
    FROM orders
    """,
)
def project_derived_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 derived projection (reference: generated partition_key
    ``{type}_{YYYYMM}`` V2_1__Add_Processing_Context_Tables.sql:48-50,
    derived distance_pc CatalogService.java:163-165)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.concat_ws(
            "_", F.col("o_orderstatus"), F.date_format("o_orderdate", "yyyyMM")
        ).alias("partition_key"),
        F.when(F.col("o_totalprice") >= 100000, "high").otherwise("normal").alias("price_band"),
    )


@query(
    "filter_null_and_validity_audit",
    oracle="""
    SELECT count(CASE WHEN value IS NULL THEN 1 END)          AS n_null_value,
           count(CASE WHEN value < 0 THEN 1 END)              AS n_negative,
           count(CASE WHEN event_type NOT IN
                 ('click','view','purchase','signup','error') THEN 1 END) AS n_bad_type,
           count(*)                                           AS n_total
    FROM events
    """,
)
def filter_null_and_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 validity audit (reference: invalid-coordinate audit
    data_quality_monitoring.py:281-302, null filters
    AstronomicalObjectRepository.java:85-102)."""
    ev = load_table(spark, sf_dir, "events")
    valid_types = ["click", "view", "purchase", "signup", "error"]
    return ev.agg(
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.count(F.when(~F.col("event_type").isin(valid_types), 1)).alias("n_bad_type"),
        F.count("*").alias("n_total"),
    )


@query(
    "route_events_by_type",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type IN ('purchase','signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'dlq'
                ELSE 'engagement' END AS route
    FROM events
    """,
)
def route_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 pattern routing (reference: step-type whitelist router
    GranularProcessingService.java:403-416, research_processing_dag.py:134-137)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .when(F.col("event_type") == "error", "dlq")
        .otherwise("engagement")
        .alias("route"),
    )


@query(
    "scalar_sha256_documents",
    oracle="""
    SELECT doc_id, sha256(text) AS content_sha
    FROM documents WHERE text IS NOT NULL
    """,
)
def scalar_sha256_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 checksum column — the engine's per-row lineage invariant
    (reference: sha256 input checksums, ProcessingContext.java:164,
    GranularProcessingService.java:598-607). Arrow-batched pandas UDF per
    the input_hint mandate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id", sha256_arrow(F.col("text")).alias("content_sha")
    )


@query(
    "scalar_json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events WHERE props IS NOT NULL
    """,
)
def scalar_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON access (reference: JSONB metrics reads,
    wv.performance_metrics->'avg_processing_time_ms', README.md:390-401)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@query(
    "scalar_string_path_functions",
    oracle="""
    SELECT doc_id,
           source AS src,
           'lake://' || source || '/' || CAST(doc_id AS VARCHAR) AS object_uri,
           upper(lang) AS lang_uc,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    """,
)
def scalar_string_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string/path building (reference: s3://%s/%s prefix building
    S3Service.java:37, key builders IntermediateStorageService.java:166-183)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("source").alias("src"),
        F.concat(F.lit("lake://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias(
            "object_uri"
        ),
        F.upper("lang").alias("lang_uc"),
        F.length("text").cast("long").alias("text_len"),
    )


@query(
    "union_split_reconcile",
    oracle="""
    SELECT src_stream, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM (
        SELECT 'high' AS src_stream, value FROM events WHERE value >= 10
        UNION ALL
        SELECT 'low' AS src_stream, value FROM events WHERE value < 10 OR value IS NULL
    )
    GROUP BY src_stream
    """,
)
def union_split_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U3 split then union-reconcile (reference: valid/invalid split +
    per-batch result merge, batch_processing_dag.py:241-263). Asserts the
    split is a partition: counts add back up."""
    ev = load_table(spark, sf_dir, "events")
    high = ev.filter(F.col("value") >= 10).withColumn("src_stream", F.lit("high"))
    low = ev.filter((F.col("value") < 10) | F.col("value").isNull()).withColumn(
        "src_stream", F.lit("low")
    )
    return (
        high.unionByName(low)
        .groupBy("src_stream")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "setop_except_lapsed_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def setop_except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 EXCEPT (SURVEY marks intersect/except NOT PRESENT in the
    reference — its consistency DAG emulates the set difference with a
    LEFT JOIN ... IS NULL, data_quality_monitoring.py:334-341; Spark has
    the operator built in, planned as a left-anti hash join): customers
    who ordered before 1998 but never after — churn candidates."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    before = orders.filter(F.col("o_orderdate") < cutoff).select(
        F.col("o_custkey").alias("custkey")
    )
    after = orders.filter(F.col("o_orderdate") >= cutoff).select(
        F.col("o_custkey").alias("custkey")
    )
    # DataFrame.subtract == SQL EXCEPT (distinct) semantics
    return before.subtract(after)


@query(
    "setop_intersect_retained_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def setop_intersect_retained_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 INTERSECT (left-semi hash join under the hood): customers
    active on both sides of the cutoff."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    before = orders.filter(F.col("o_orderdate") < cutoff).select(
        F.col("o_custkey").alias("custkey")
    )
    after = orders.filter(F.col("o_orderdate") >= cutoff).select(
        F.col("o_custkey").alias("custkey")
    )
    return before.intersect(after)


@query(
    "scalar_datetime_functions",
    oracle="""
    SELECT strftime(ts, '%Y%m') AS month_key,
           CAST(extract(hour FROM ts) AS INTEGER) AS hour_of_day,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date/time functions (reference: to_char(created_at,'YYYYMM')
    partition keys V2_1__...sql:48-50, epoch diffs
    data_quality_monitoring.py:137-138)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyyMM").alias("month_key"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(F.count("*").alias("n"))


@query(
    "scalar_astro_math_functions",
    oracle="""
    SELECT vec_id,
           round(degrees(2 * atan2(
               sqrt(pow(sin((radians(CAST(embedding[2] AS DOUBLE) * 90) - radians(0.0)) / 2), 2)
                    + cos(radians(0.0)) * cos(radians(CAST(embedding[2] AS DOUBLE) * 90))
                    * pow(sin((radians(CAST(embedding[1] AS DOUBLE) * 180) - radians(0.0)) / 2), 2)),
               sqrt(1 - (pow(sin((radians(CAST(embedding[2] AS DOUBLE) * 90) - radians(0.0)) / 2), 2)
                    + cos(radians(0.0)) * cos(radians(CAST(embedding[2] AS DOUBLE) * 90))
                    * pow(sin((radians(CAST(embedding[1] AS DOUBLE) * 180) - radians(0.0)) / 2), 2))))), 4)
               AS sep_deg,
           round(25.0 - 2.5 * log10(1.0 + abs(CAST(embedding[3] AS DOUBLE))), 4) AS mag
    FROM embeddings
    """,
)
def scalar_astro_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 math/trig domain functions as codegen'd column expressions
    (reference: AstronomicalCalculations.java:157-182 haversine, :302-318
    flux→magnitude). Embedding dims stand in for (ra, dec, flux); the
    separation is measured against the origin. Both engines evaluate the
    identical IEEE-double expression tree, rounded to 4 dp."""
    from ..functions.astro import angular_distance_deg, flux_to_magnitude

    emb = load_table(spark, sf_dir, "embeddings")
    ra = F.element_at("embedding", 1).cast("double") * 180
    dec = F.element_at("embedding", 2).cast("double") * 90
    flux = 1.0 + F.abs(F.element_at("embedding", 3).cast("double"))
    return emb.select(
        "vec_id",
        F.round(angular_distance_deg(ra, dec, F.lit(0.0), F.lit(0.0)), 4).alias("sep_deg"),
        F.round(flux_to_magnitude(flux), 4).alias("mag"),
    )


def _photometric_oracle() -> str:
    """DuckDB mirror of the calibration chain, coefficients inlined as a
    VALUES dim from the same PHOTOMETRIC_COEFFS constants."""
    from ..functions.astro import PHOTOMETRIC_COEFFS

    values = ", ".join(
        f"('{f}', {zp}, {k}, {psf})" for f, zp, k, psf in PHOTOMETRIC_COEFFS
    )
    cases = " ".join(
        f"WHEN {i} THEN '{f}'" for i, (f, _, _, _) in enumerate(PHOTOMETRIC_COEFFS)
    )
    return f"""
    WITH obs AS (
        SELECT event_id,
               CASE (event_id % 10) {cases} END AS filter,
               10.0 + (event_id % 1300) / 100.0 AS inst_mag,
               1.0 + (event_id % 150) / 100.0 AS airmass,
               30.0 + (event_id % 270) AS exposure_s,
               2.0 + (event_id % 120) / 10.0 AS aperture_px
        FROM events
    ), coeff(filter, zp, k_ext, psf) AS (VALUES {values}),
    terms AS (
        SELECT o.event_id, o.filter, o.inst_mag, o.airmass, o.exposure_s,
               o.aperture_px, c.zp,
               c.k_ext * (o.airmass - 1.0) AS ext_corr,
               -2.5 * log10(
                   CASE
                     WHEN o.aperture_px / c.psf < 0.5
                       THEN 0.1 * (o.aperture_px / c.psf) * (o.aperture_px / c.psf)
                     WHEN o.aperture_px / c.psf < 1.0
                       THEN 0.4 * (o.aperture_px / c.psf)
                     WHEN o.aperture_px / c.psf < 2.0
                       THEN 0.6 + 0.3 * (o.aperture_px / c.psf - 1.0)
                     WHEN o.aperture_px / c.psf < 4.0
                       THEN 0.9 + 0.08 * (o.aperture_px / c.psf - 2.0)
                     ELSE 0.98
                   END) AS ap_corr,
               CASE WHEN o.inst_mag < 15.0 THEN 0.02
                    WHEN o.inst_mag < 20.0 THEN 0.01
                    ELSE 0.0 END AS color_corr
        FROM obs o JOIN coeff c USING (filter)
    )
    SELECT event_id, filter,
           floor((inst_mag + zp + ext_corr + ap_corr + color_corr)
                 * 10000.0 + 0.5) / 10000.0
               AS calibrated_mag,
           round(greatest(0.001, sqrt(
               (1.0 / sqrt(pow(10.0, -0.4 * inst_mag) * exposure_s))
                 * (1.0 / sqrt(pow(10.0, -0.4 * inst_mag) * exposure_s))
               + (0.01 * sqrt(pi() * aperture_px * aperture_px / 4.0))
                 * (0.01 * sqrt(pi() * aperture_px * aperture_px / 4.0))
               + (0.005 * (airmass - 1.0)) * (0.005 * (airmass - 1.0))
               + 0.0001)), 4) AS mag_error
    FROM terms
    """


@query("scalar_photometric_calibration", oracle=_photometric_oracle())
def scalar_photometric_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 photometric-calibration expression chain (reference:
    PhotometricCalibration.java:96-160 — zero point + extinction(filter,
    airmass) + encircled-energy aperture correction + brightness-banded
    color term, with the STScI-style quadrature error model :243-267).

    The coefficients table (zero point, extinction coefficient, PSF FWHM
    per filter) is a ~10-row dim broadcast-joined onto the fact scan —
    never shuffled; every term is a codegen'd column expression, no UDF.
    Observation parameters (instrumental magnitude, airmass, exposure,
    aperture) derive deterministically from integer arithmetic on
    ``event_id`` so both engines see bit-identical doubles; outputs round
    to 4 dp."""
    from ..functions.astro import (
        PHOTOMETRIC_COEFFS,
        aperture_correction,
        color_correction,
        extinction_correction,
        photometric_error,
    )

    ev = load_table(spark, sf_dir, "events")
    filters = [f for f, _, _, _ in PHOTOMETRIC_COEFFS]
    obs = ev.select(
        "event_id",
        F.element_at(
            F.array(*[F.lit(f) for f in filters]),
            (F.col("event_id") % 10 + 1).cast("int"),
        ).alias("filter"),
        (F.lit(10.0) + (F.col("event_id") % 1300) / F.lit(100.0)).alias("inst_mag"),
        (F.lit(1.0) + (F.col("event_id") % 150) / F.lit(100.0)).alias("airmass"),
        (F.lit(30.0) + (F.col("event_id") % 270)).alias("exposure_s"),
        (F.lit(2.0) + (F.col("event_id") % 120) / F.lit(10.0)).alias("aperture_px"),
    )
    coeff = F.broadcast(
        spark.createDataFrame(PHOTOMETRIC_COEFFS, "filter string, zp double, k_ext double, psf double")
    )
    j = obs.join(coeff, "filter")
    calibrated = (
        F.col("inst_mag")
        + F.col("zp")
        + extinction_correction(F.col("k_ext"), F.col("airmass"))
        + aperture_correction(F.col("aperture_px"), F.col("psf"))
        + color_correction(F.col("inst_mag"))
    )
    err = photometric_error(
        F.col("inst_mag"), F.col("exposure_s"), F.col("airmass"), F.col("aperture_px")
    )
    from ..functions.astro import round_half_up_det

    return j.select(
        "event_id",
        "filter",
        # calibrated_mag can be decimal-exact when the log10 aperture term
        # lands on 0 (ratio exactly at a unity branch value), so round it
        # with the tie-deterministic floor form — same sweep as the
        # proper-motion columns.  mag_error keeps F.round: sqrt output is
        # transcendental, never a decimal tie.
        round_half_up_det(calibrated, 4).alias("calibrated_mag"),
        F.round(err, 4).alias("mag_error"),
    )


def _coord_transform_oracle() -> str:
    """DuckDB mirror of the coordinate-transform chain. Every trig-of-a-
    constant (galactic pole sines/cosines, precession rotation) is
    computed ONCE in Python and inlined as the identical IEEE double
    into both engines' expression trees, so the only per-row math both
    sides evaluate independently is trig of the data columns — the same
    discipline scalar_astro_math_functions uses."""
    import math

    from ..functions.astro import DEC_GNP_DEG, L_NCP_DEG, RA_GNP_DEG

    ra_gnp_rad = math.radians(RA_GNP_DEG)
    l_ncp_rad = math.radians(L_NCP_DEG)
    sin_dg = math.sin(math.radians(DEC_GNP_DEG))
    cos_dg = math.cos(math.radians(DEC_GNP_DEG))
    # precession z-rotation angle for J2000.0 -> J2024.5 (t0=0, dt=0.245
    # centuries) — AstronomicalCalculations.java:896-940 simplified model
    dt = 0.245
    theta = math.radians(
        (2004.3109 * dt - 0.42665 * dt * dt - 0.041833 * dt * dt * dt) / 3600.0
    )
    cos_th, sin_th = math.cos(theta), math.sin(theta)
    sgra_ra, sgra_dec = 266.41683, -29.00781
    return f"""
    WITH obs AS (
        SELECT event_id,
               (event_id % 3600) / 10.0 AS ra,
               (event_id % 1741) / 10.0 - 87.0 AS dec,
               (event_id % 200) - 100.0 AS pm_ra,
               (event_id % 140) - 70.0 AS pm_dec,
               5.0 + (event_id % 850) / 10.0 AS alt
        FROM events
    ), g AS (
        SELECT *,
               degrees(asin(sin(radians(dec)) * {sin_dg!r}
                          + cos(radians(dec)) * {cos_dg!r}
                            * cos(radians(ra) - {ra_gnp_rad!r}))) AS b_raw,
               ((({L_NCP_DEG!r} - degrees(atan2(
                     cos(radians(dec)) * sin(radians(ra) - {ra_gnp_rad!r}),
                     sin(radians(dec)) * {cos_dg!r}
                       - cos(radians(dec)) * {sin_dg!r}
                         * cos(radians(ra) - {ra_gnp_rad!r})))) % 360.0)
                 + 360.0) % 360.0 AS l_raw
        FROM obs
    ), r AS (
        SELECT *,
               degrees(asin(sin(radians(b_raw)) * {sin_dg!r}
                          + cos(radians(b_raw)) * {cos_dg!r}
                            * cos({l_ncp_rad!r} - radians(l_raw)))) AS dec_back_raw,
               ((({RA_GNP_DEG!r} + degrees(atan2(
                     cos(radians(b_raw)) * sin({l_ncp_rad!r} - radians(l_raw)),
                     sin(radians(b_raw)) * {cos_dg!r}
                       - cos(radians(b_raw)) * {sin_dg!r}
                         * cos({l_ncp_rad!r} - radians(l_raw))))) % 360.0)
                 + 360.0) % 360.0 AS ra_back_raw
        FROM g
    )
    SELECT event_id,
           round(l_raw, 4) + 0.0 AS gal_l,
           round(b_raw, 4) + 0.0 AS gal_b,
           round(ra_back_raw, 4) + 0.0 AS ra_back,
           round(dec_back_raw, 4) + 0.0 AS dec_back,
           floor((((ra + pm_ra / 3600000.0 * 24.5) % 360.0) + 360.0) % 360.0
                 * 1000000.0 + 0.5) / 1000000.0 + 0.0
               AS pm_ra_applied,
           floor(greatest(-90.0, least(90.0, dec + pm_dec / 3600000.0 * 24.5))
                 * 1000000.0 + 0.5) / 1000000.0 + 0.0
               AS pm_dec_applied,
           round(1.0 / cos(radians(90.0 - alt)), 4) AS airmass_pp,
           round(1.0 / (sin(radians(alt))
                        + 0.50572 * pow(alt + 6.07995, -1.6364)), 4) AS airmass_ky,
           round((58.1 * tan(radians(90.0 - alt))
                  - 0.07 * pow(tan(radians(90.0 - alt)), 3.0)
                  + 0.000086 * pow(tan(radians(90.0 - alt)), 5.0))
                 * (1005.0 / 1013.25)
                 * (283.0 / (10.0 + 273.15))
                 * (1.0 - 0.0001 * 0.5 * (10.0 + 273.15) / 100.0)
                 * (1.0 + 0.00013 * (1.0 / (0.65 * 0.65) - 1.0 / 0.55)), 4)
               AS refraction_arcsec,
           round(degrees(atan2(
                     sqrt(pow(cos(radians({sgra_dec!r}))
                              * sin(radians({sgra_ra!r}) - radians(ra)), 2.0)
                        + pow(cos(radians(dec)) * sin(radians({sgra_dec!r}))
                              - sin(radians(dec)) * cos(radians({sgra_dec!r}))
                                * cos(radians({sgra_ra!r}) - radians(ra)), 2.0)),
                     sin(radians(dec)) * sin(radians({sgra_dec!r}))
                       + cos(radians(dec)) * cos(radians({sgra_dec!r}))
                         * cos(radians({sgra_ra!r}) - radians(ra))))
                 * 3600.0, 2) AS sep_sgra_arcsec,
           round(((degrees(atan2(
                      cos(radians(dec)) * cos(radians(ra)) * {sin_th!r}
                        + cos(radians(dec)) * sin(radians(ra)) * {cos_th!r},
                      cos(radians(dec)) * cos(radians(ra)) * {cos_th!r}
                        - cos(radians(dec)) * sin(radians(ra)) * {sin_th!r}))
                   % 360.0) + 360.0) % 360.0, 4) AS prec_ra_2024
    FROM r
    """


@query("scalar_coordinate_transforms", oracle=_coord_transform_oracle())
def scalar_coordinate_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 astrometric coordinate-transform long tail (reference:
    AstronomicalCalculations.java:176-237 galactic↔equatorial, :239-263
    proper-motion epoch transform, :266-296 plane-parallel +
    Kasten-Young airmass, :588-612 Vincenty separation, :896-940
    simplified precession, :901-957 USNO refraction) — every transform a
    native codegen'd column expression, zero UDFs, zero shuffles.

    Coordinates derive deterministically from integer arithmetic on
    ``event_id`` (dec kept off the poles where tan/sec blow up); the
    galactic transform is additionally verified as a true inverse here —
    ra_back/dec_back must reproduce ra/dec, and the DuckDB oracle checks
    the identical roundtrip."""
    from ..functions.astro import (
        airmass_kasten_young,
        airmass_plane_parallel,
        angular_distance_vincenty_arcsec,
        apply_proper_motion,
        atmospheric_refraction_arcsec,
        equatorial_to_galactic,
        galactic_to_equatorial,
        precess_approx_ra,
        round_half_up_det,
    )

    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    ra = (eid % 3600) / F.lit(10.0)
    dec = (eid % 1741) / F.lit(10.0) - F.lit(87.0)
    pm_ra = (eid % 200) - F.lit(100.0)
    pm_dec = (eid % 140) - F.lit(70.0)
    alt = F.lit(5.0) + (eid % 850) / F.lit(10.0)
    l, b = equatorial_to_galactic(ra, dec)
    ra_back, dec_back = galactic_to_equatorial(l, b)
    pm_ra2, pm_dec2 = apply_proper_motion(ra, dec, pm_ra, pm_dec, F.lit(24.5))
    # `+ 0.0` after every rounding that can land on ±0: IEEE defines
    # -0.0 + 0.0 = +0.0 and x + 0.0 = x otherwise, so BOTH engines
    # normalize the zero's sign — Spark's round returns 0.0 where
    # DuckDB's keeps -0.0 (31 rows at sf0.1), invisible to numeric
    # comparison but a different byte string to a hash gate.
    return ev.select(
        "event_id",
        (F.round(l, 4) + F.lit(0.0)).alias("gal_l"),
        (F.round(b, 4) + F.lit(0.0)).alias("gal_b"),
        (F.round(ra_back, 4) + F.lit(0.0)).alias("ra_back"),
        (F.round(dec_back, 4) + F.lit(0.0)).alias("dec_back"),
        # Deterministic floor-based rounding: the pm columns are the only
        # ones built from decimal-exact linear arithmetic, so they can land
        # exactly on 6th-decimal half-ties that F.round (string-mediated
        # HALF_UP) and DuckDB (binary-double round) resolve differently —
        # 40/100k rows at sf0.1 did.  floor(x·1e6+0.5)/1e6 executes the
        # same IEEE ops in both engines → bit-identical on ties.
        (round_half_up_det(pm_ra2, 6) + F.lit(0.0)).alias("pm_ra_applied"),
        (round_half_up_det(pm_dec2, 6) + F.lit(0.0)).alias("pm_dec_applied"),
        F.round(airmass_plane_parallel(alt), 4).alias("airmass_pp"),
        F.round(airmass_kasten_young(alt), 4).alias("airmass_ky"),
        F.round(
            atmospheric_refraction_arcsec(
                alt, F.lit(10.0), F.lit(1005.0), F.lit(0.5), F.lit(0.65)
            ),
            4,
        ).alias("refraction_arcsec"),
        F.round(
            angular_distance_vincenty_arcsec(
                ra, dec, F.lit(266.41683), F.lit(-29.00781)
            ),
            2,
        ).alias("sep_sgra_arcsec"),
        F.round(precess_approx_ra(ra, dec, 2000.0, 2024.5), 4).alias("prec_ra_2024"),
    )
