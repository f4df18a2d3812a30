"""Silver transforms: bronze → 6 cleaned silver tables.

Pure DataFrame→DataFrame functions (no writes, no eager counts — the runner
owns IO), reproducing the semantics of the reference's silver transforms with
zero Python UDFs:

- sessions     ≙ silver/sessions_transform.py   (distinct sessions, GP-name
  normalization, sprint detection, duration)
- drivers      ≙ SCD2 via operators/scd2        (scd.py:199-245)
- qualifying   ≙ silver/qualifying_transform.py (Q1/Q2/Q3 array split, best
  time, gap to pole W1)
- race_results ≙ silver/race_results_transform.py (points table, status
  ladder, time formatting)
- laps         ≙ silver/laps_transform.py       (sector-sum fallback, W2/W3
  personal-best & session-fastest flags with tie-break)
- pitstops     ≙ silver/pitstops_transform.py   (ms→DECIMAL(6,3) s, validity
  range filter)

Session-type case is normalized ONCE here to lowercase canonical form —
fixing the reference's silver-lowercase vs gold-Titlecase inconsistency
(SURVEY §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.functions.f1 import (
    detect_sprint_weekend,
    format_lap_time,
    format_millis,
    points_for_position,
    seconds_to_millis,
    standardize_race_status,
    standardize_team_name,
)
from f1_datalakehouse_pipeline_spark.functions.names import normalize_grand_prix_name
from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_from_observations
from f1_datalakehouse_pipeline_spark.schemas import conform

CANONICAL_SESSION_TYPES = ("qualifying", "race")


def transform_sessions(session_result: DataFrame) -> DataFrame:
    """Distinct sessions + derived fields (sessions_transform.py:135-234)."""
    sessions = (
        session_result.select(
            "session_key",
            "meeting_key",
            "year",
            F.lower(F.col("session_type")).alias("session_type"),
            "meeting_name",
            "date_start",
            "date_end",
        )
        .filter(F.col("session_key").isNotNull())  # P2 null guard
        .distinct()  # A1: one row per session from per-driver rows
    )
    return conform(
        sessions.select(
            "*",
            normalize_grand_prix_name(F.col("meeting_name")).alias("grand_prix_name"),
            (
                (F.unix_timestamp("date_end") - F.unix_timestamp("date_start")) / 60
            )
            .cast("int")
            .alias("duration_minutes"),
            detect_sprint_weekend(F.col("meeting_name")).alias("is_sprint_weekend"),
        ),
        "sessions_silver",
    )


def transform_drivers_scd2(drivers: DataFrame, sessions_silver: DataFrame) -> DataFrame:
    """SCD2 driver dimension from per-session driver observations.

    J1 join attaches session dates (common.py:500-523), then the generic SCD2
    build collapses per-driver team stints (scd.py:199-245 semantics with the
    F.max-intent fix). Latest attributes per stint via last-observation join.
    """
    obs = (
        drivers.filter(F.col("driver_number").isNotNull())
        .join(
            sessions_silver.select("session_key", "date_start"),
            "session_key",
            "inner",
        )
        .select(
            F.col("driver_number").cast("int").alias("driver_number"),
            standardize_team_name(F.col("team_name")).alias("team_name"),
            "broadcast_name",
            "full_name",
            "name_acronym",
            "country_code",
            "date_start",
            "session_key",
        )
    )
    dim = scd2_from_observations(
        obs,
        entity_col="driver_number",
        attr_col="team_name",
        order_cols=["date_start", "session_key"],
        time_col="date_start",
    )
    # Attach the latest non-team attributes observed within each stint
    # (reference uses last(attr) per stint — scd.py:213-225; we make "latest"
    # deterministic via max_by over the observation order).
    w = Window.partitionBy("driver_number").orderBy("date_start", "session_key")
    latest = (
        obs.withColumn("rn", F.row_number().over(w.orderBy(F.col("date_start").desc(), F.col("session_key").desc())))
        .filter(F.col("rn") == 1)
        .select("driver_number", "broadcast_name", "full_name", "name_acronym", "country_code")
    )
    return conform(
        dim.join(latest, "driver_number", "left").select(
            "driver_number",
            "broadcast_name",
            "full_name",
            "name_acronym",
            F.col("attr").alias("team_name"),
            "country_code",
            "valid_from",
            "valid_to",
            "is_current",
        ),
        "drivers_silver",
    )


def _with_gp_name(df: DataFrame, sessions_silver: DataFrame) -> DataFrame:
    """Attach canonical grand_prix_name via the (broadcastable) session dim."""
    sess = F.broadcast(
        sessions_silver.select("session_key", "grand_prix_name")
    )
    return df.join(sess, "session_key", "inner")


def transform_qualifying(session_result: DataFrame, sessions_silver: DataFrame) -> DataFrame:
    """Q1/Q2/Q3 array split + best time + gap-to-pole (qualifying_transform.py:134-248)."""
    q = session_result.filter(
        (F.lower(F.col("session_type")) == "qualifying")
        & F.col("session_key").isNotNull()
        & F.col("driver_number").isNotNull()
    )
    dur = F.col("duration")

    def q_time(k: int):
        # size guard + element_at (qualifying_transform.py:151-172); seconds→millis
        return F.when(F.size(dur) >= k, seconds_to_millis(F.element_at(dur, k)))

    q = q.select(
        "session_key",
        "year",
        F.col("driver_number").cast("int").alias("driver_number"),
        F.col("position").cast("int").alias("position"),
        q_time(1).alias("q1_time_millis"),
        q_time(2).alias("q2_time_millis"),
        q_time(3).alias("q3_time_millis"),
        F.coalesce(F.col("dnf"), F.lit(False)).alias("dnf"),
        F.coalesce(F.col("dns"), F.lit(False)).alias("dns"),
        F.coalesce(F.col("dsq"), F.lit(False)).alias("dsq"),
    ).withColumn(
        "best_time_millis",
        F.coalesce("q3_time_millis", "q2_time_millis", "q1_time_millis"),
    )
    # W1: session pole + gap
    w = Window.partitionBy("session_key")
    q = q.withColumn(
        "gap_to_pole_millis",
        F.col("best_time_millis") - F.min("best_time_millis").over(w),
    ).withColumn(
        # status ladder (qualifying_transform.py:240-248)
        "qualifying_status",
        standardize_race_status(F.col("dnf"), F.col("dns"), F.col("dsq"), F.col("position")),
    )
    return conform(_with_gp_name(q, sessions_silver), "qualifying_results_silver")


def transform_race_results(session_result: DataFrame, sessions_silver: DataFrame) -> DataFrame:
    """Points table + status buckets + time formatting (race_results_transform.py:133-289)."""
    r = session_result.filter(
        (F.lower(F.col("session_type")) == "race")
        & F.col("session_key").isNotNull()
        & F.col("driver_number").isNotNull()
    )
    race_ms = seconds_to_millis(F.col("duration").cast("double"))
    r = r.select(
        "session_key",
        "year",
        F.col("driver_number").cast("int").alias("driver_number"),
        F.col("position").cast("int").alias("position"),
        F.col("points").cast("int").alias("points"),
        race_ms.alias("race_time_millis"),
        F.col("gap_to_leader").cast("decimal(8,3)").alias("gap_to_leader_seconds"),
        F.coalesce(F.col("dnf"), F.lit(False)).alias("dnf"),
        F.coalesce(F.col("dns"), F.lit(False)).alias("dns"),
        F.coalesce(F.col("dsq"), F.lit(False)).alias("dsq"),
    )
    r = (
        r.withColumn("validated_points", points_for_position(F.col("position")))
        .withColumn(
            "race_status",
            standardize_race_status(F.col("dnf"), F.col("dns"), F.col("dsq"), F.col("position")),
        )
        .withColumn("race_time_formatted", format_millis(F.col("race_time_millis")))
    )
    return conform(_with_gp_name(r, sessions_silver), "race_results_silver")


def transform_laps(laps: DataFrame, sessions_silver: DataFrame) -> DataFrame:
    """Sector fallback + personal-best / session-fastest flags (laps_transform.py:94-271).

    The reference processes HISTORICAL laps in a per-GP driver loop
    (laps_transform.py:386-451) as a small-executor workaround — here it's one
    partition-parallel plan (SURVEY §4.3.4); windows share the session_key
    partitioning so the flag stack plans a single shuffle.
    """
    base = laps.filter(
        F.col("session_key").isNotNull()
        & F.col("driver_number").isNotNull()
        & F.col("lap_number").isNotNull()
    ).select(
        "session_key",
        "year",
        F.col("driver_number").cast("int").alias("driver_number"),
        F.col("lap_number").cast("int").alias("lap_number"),
        # lap time: lap_duration, else sector sum (null if any sector null) —
        # laps_transform.py:167-183; segments_sector_* arrays dropped on read
        # (:127-128) simply by never selecting them.
        F.coalesce(
            seconds_to_millis(F.col("lap_duration")),
            seconds_to_millis(
                F.col("duration_sector_1") + F.col("duration_sector_2") + F.col("duration_sector_3")
            ),
        ).alias("lap_time_millis"),
        seconds_to_millis(F.col("duration_sector_1")).alias("sector_1_millis"),
        seconds_to_millis(F.col("duration_sector_2")).alias("sector_2_millis"),
        seconds_to_millis(F.col("duration_sector_3")).alias("sector_3_millis"),
    )
    w_driver = Window.partitionBy("session_key", "driver_number")
    w_session = Window.partitionBy("session_key")
    w_tie = Window.partitionBy("session_key", "lap_time_millis").orderBy(
        "driver_number", "lap_number"
    )
    timed = F.col("lap_time_millis").isNotNull()
    out = (
        base.withColumn(
            "is_personal_best",
            timed & (F.col("lap_time_millis") == F.min(F.when(timed, F.col("lap_time_millis"))).over(w_driver)),
        )
        .withColumn(
            "__session_min", F.min(F.when(timed, F.col("lap_time_millis"))).over(w_session)
        )
        .withColumn(
            # W3 tie-break: only the first of equal fastest laps is flagged
            # (laps_transform.py:255-269: order by driver_number, lap_number)
            "is_session_fastest",
            timed
            & (F.col("lap_time_millis") == F.col("__session_min"))
            & (F.row_number().over(w_tie) == 1),
        )
        .withColumn("lap_time_formatted", format_lap_time(F.col("lap_time_millis")))
    )
    return conform(_with_gp_name(out, sessions_silver), "laps_silver")


def transform_pitstops(pit: DataFrame, sessions_silver: DataFrame) -> DataFrame:
    """ms → DECIMAL(6,3) seconds + validity range filter (pitstops_transform.py:85-199)."""
    p = pit.filter(
        F.col("session_key").isNotNull() & F.col("driver_number").isNotNull()
    ).select(
        "session_key",
        "year",
        F.col("driver_number").cast("int").alias("driver_number"),
        F.col("lap_number").cast("int").alias("lap_number"),
        F.round(F.col("pit_duration") / 1000.0, 3)
        .cast("decimal(6,3)")
        .alias("pit_duration_seconds"),
    )
    # P3: 0 < duration < 999 (DECIMAL(6,3) bound), drop null/zero/absurd
    p = p.filter(
        F.col("pit_duration_seconds").isNotNull()
        & (F.col("pit_duration_seconds") > 0)
        & (F.col("pit_duration_seconds") < 999)
    )
    return conform(_with_gp_name(p, sessions_silver), "pitstops_silver")
