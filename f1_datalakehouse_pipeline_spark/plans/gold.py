"""Gold transforms: silver → 4 analytics tables.

Each is a pure DataFrame composition over silver inputs — the 3-way star join
(J4) with broadcast dims, the window stack (W4-W8), and typed selects —
reproducing column-for-column (schemas.py:141-221 of the reference):

- driver_performance_summary_qualifying ≙ gold/driver_performance_summary_qualifying_transform.py
- driver_performance_summary_race       ≙ gold/driver_performance_summary_race_transform.py
  (incl. grid_position from qualifying and positions_gained = grid − finish)
- championship_tracker                  ≙ gold/championship_tracker_transform.py
- race_weekend_insights                 ≙ gold/race_weekend_insights_transform.py
  (incl. pole_to_win and race_winner_team)

Fixes folded in (SURVEY §7.4): session-type filters use the canonical
lowercase form; the weekend-insights lookups join on (year, grand_prix_name),
not grand_prix_name alone; every rank/tie is deterministically broken.

Scale notes: the fact tables (results/laps) stay un-broadcast and partition
by (year, grand_prix_name); the dims (sessions, drivers ~30 rows) are
explicitly broadcast — at 100 TB the star joins are map-side only, and the
window stack shares one (driver_number)-keyed shuffle per table. Audit
columns are stamped once at the end (reference adds created/updated
timestamps on every gold row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_audit(df: DataFrame) -> DataFrame:
    now = F.current_timestamp()
    return df.withColumn("created_timestamp", now).withColumn("updated_timestamp", now)


def _race_dim(sessions_silver: DataFrame) -> DataFrame:
    """(session_key, year, gp, race_date, round_number) for race sessions.

    W8: round_number = dense_rank over race_date within year
    (gold/driver_performance_summary_race_transform.py:248-255).
    """
    races = sessions_silver.filter(F.col("session_type") == "race").select(
        "session_key",
        "year",
        "grand_prix_name",
        F.col("date_start").cast("date").alias("race_date"),
        "is_sprint_weekend",
    )
    w = Window.partitionBy("year").orderBy("race_date")
    return races.withColumn("round_number", F.dense_rank().over(w).cast("int"))


def _quali_dim(sessions_silver: DataFrame) -> DataFrame:
    quali = sessions_silver.filter(F.col("session_type") == "qualifying").select(
        "session_key",
        "year",
        "grand_prix_name",
        F.col("date_start").cast("date").alias("race_date"),
    )
    w = Window.partitionBy("year").orderBy("race_date")
    return quali.withColumn("round_number", F.dense_rank().over(w).cast("int"))


def _current_drivers(drivers_silver: DataFrame) -> DataFrame:
    # P6: is_current filter (scd.py:65-69); driver_name = broadcast name
    # (reference gold schemas: 'Driver broadcast name')
    return drivers_silver.filter(F.col("is_current")).select(
        "driver_number",
        F.col("broadcast_name").alias("driver_name"),
        "team_name",
    )


def transform_championship_tracker(
    race_results_silver: DataFrame,
    sessions_silver: DataFrame,
    drivers_silver: DataFrame,
) -> DataFrame:
    """Running totals (W4) + championship rank (W6) + gap to leader (W7).

    Reference: gold/championship_tracker_transform.py:170-353 — always a full
    season recompute because totals are cumulative (:209-217).
    """
    races = F.broadcast(_race_dim(sessions_silver))
    drivers = F.broadcast(_current_drivers(drivers_silver))
    base = (
        race_results_silver.select(
            "session_key",
            "driver_number",
            F.col("position").alias("finish_position"),
            F.col("validated_points").cast("decimal(4,1)").alias("race_points"),
        )
        .join(races, "session_key", "inner")
        .join(drivers, "driver_number", "inner")
    )
    w_cum = (
        Window.partitionBy("year", "driver_number")
        .orderBy("race_date", "round_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn(
        "season_points_total",
        F.sum("race_points").over(w_cum).cast("decimal(6,1)"),
    )
    # W6: rank per race date, ties broken by driver_number asc
    # (window_functions.py:281-308)
    w_rank = Window.partitionBy("year", "race_date").orderBy(
        F.col("season_points_total").desc(), F.col("driver_number").asc()
    )
    # W7: gap to leader — whole-partition max (window_functions.py:310-338)
    w_race = Window.partitionBy("year", "race_date")
    return _with_audit(
        base.select(
            "year",
            "race_date",
            "grand_prix_name",
            "round_number",
            "driver_number",
            "driver_name",
            "team_name",
            "finish_position",
            "race_points",
            "season_points_total",
            F.rank().over(w_rank).cast("int").alias("championship_position"),
            (F.max("season_points_total").over(w_race) - F.col("season_points_total"))
            .cast("decimal(6,1)")
            .alias("points_gap_to_leader"),
        )
    )


def transform_driver_performance_race(
    race_results_silver: DataFrame,
    qualifying_results_silver: DataFrame,
    sessions_silver: DataFrame,
    drivers_silver: DataFrame,
) -> DataFrame:
    """Per-race driver summary with grid/finish/positions_gained and running
    totals/averages.

    Reference: gold/driver_performance_summary_race_transform.py:221-335
    (W4 cumulative points, W5 running average finish; positions_gained =
    grid − finish, grid from the same weekend's qualifying results).
    """
    races = F.broadcast(_race_dim(sessions_silver))
    drivers = F.broadcast(_current_drivers(drivers_silver))
    grid = qualifying_results_silver.select(
        "year",
        "grand_prix_name",
        "driver_number",
        F.col("position").alias("grid_position"),
    )
    base = (
        race_results_silver.select(
            "session_key",
            "driver_number",
            F.col("position").alias("finish_position"),
            F.col("standardized_status").alias("race_status"),
            F.col("validated_points").cast("decimal(4,1)").alias("race_points"),
        )
        .join(races, "session_key", "inner")
        .join(drivers, "driver_number", "inner")
        .join(grid, ["year", "grand_prix_name", "driver_number"], "left")
    )
    w_cum = (
        Window.partitionBy("year", "driver_number")
        .orderBy("race_date", "round_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _with_audit(
        base.select(
            "session_key",
            "year",
            "race_date",
            "grand_prix_name",
            "round_number",
            "driver_number",
            "driver_name",
            "team_name",
            "grid_position",
            "finish_position",
            (F.col("grid_position") - F.col("finish_position"))
            .cast("int")
            .alias("positions_gained"),
            "race_status",
            "race_points",
            F.sum("race_points").over(w_cum).cast("decimal(6,1)").alias("season_points_total"),
            F.round(
                F.avg(F.col("finish_position").cast("double")).over(w_cum), 1
            )
            .cast("decimal(4,1)")
            .alias("season_avg_finish_position"),
        )
    )


def transform_driver_performance_qualifying(
    qualifying_results_silver: DataFrame,
    sessions_silver: DataFrame,
    drivers_silver: DataFrame,
) -> DataFrame:
    """Qualifying summary: gap-to-pole seconds, made_q3, running avg position.

    Reference: gold/driver_performance_summary_qualifying_transform.py:211-325
    (W1 seconds-variant gap clamped ≥0 DECIMAL(5,3), made_q3 = position ≤ 10,
    W5 running average DECIMAL(4,1)).
    """
    quali = F.broadcast(_quali_dim(sessions_silver))
    drivers = F.broadcast(_current_drivers(drivers_silver))
    base = (
        qualifying_results_silver.select(
            "session_key",
            "driver_number",
            F.col("position").alias("qualifying_position"),
            F.col("fastest_qualifying_time_millis").alias("best_time_millis"),
            "gap_to_pole_millis",
        )
        .join(quali, "session_key", "inner")
        .join(drivers, "driver_number", "inner")
    )
    w_cum = (
        Window.partitionBy("year", "driver_number")
        .orderBy("race_date", "round_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_s = F.greatest(F.col("gap_to_pole_millis") / 1000.0, F.lit(0.0))
    return _with_audit(
        base.select(
            "session_key",
            "year",
            "race_date",
            "grand_prix_name",
            "round_number",
            "driver_number",
            "driver_name",
            "team_name",
            "qualifying_position",
            "best_time_millis",
            F.round(gap_s, 3).cast("decimal(5,3)").alias("gap_to_pole_seconds"),
            (F.col("qualifying_position") <= 10).alias("made_q3"),
            F.round(
                F.avg(F.col("qualifying_position").cast("double")).over(w_cum), 1
            )
            .cast("decimal(4,1)")
            .alias("season_avg_qualifying_position"),
        )
    )


def transform_race_weekend_insights(
    race_results_silver: DataFrame,
    qualifying_results_silver: DataFrame,
    sessions_silver: DataFrame,
    drivers_silver: DataFrame,
) -> DataFrame:
    """Per-weekend rollup: pole (left join — may be missing), winner (inner),
    winner's team, pole_to_win flag, finisher/DNF conditional counts.

    Reference: gold/race_weekend_insights_transform.py:254-395, with the
    under-keyed join fixed: all lookups key on (year, grand_prix_name)
    (SURVEY §7.4.4).
    """
    races = _race_dim(sessions_silver)
    drivers = F.broadcast(_current_drivers(drivers_silver))
    keys = ["year", "grand_prix_name"]

    rr = race_results_silver.join(
        races.select("session_key", "race_date", "round_number", "is_sprint_weekend"),
        "session_key",
        "inner",
    )
    # A4: conditional counts per weekend
    stats = rr.groupBy(*keys).agg(
        F.first("race_date").alias("race_date"),
        F.first("round_number").alias("round_number"),
        F.first("is_sprint_weekend").alias("is_sprint_weekend"),
        F.count(F.lit(1)).cast("int").alias("field_size"),
        F.count(
            F.when(F.col("position").isNotNull() & (F.col("position") <= 20), 1)
        )
        .cast("int")
        .alias("total_finishers"),
        F.count(F.when(F.col("standardized_status") == "DNF", 1)).cast("int").alias("dnf_count"),
    )
    winner = (
        rr.filter(F.col("position") == 1)
        .join(drivers, "driver_number", "inner")
        .select(
            *keys,
            F.col("driver_number").alias("winner_driver_number"),
            F.col("driver_name").alias("race_winner_driver"),
            F.col("team_name").alias("race_winner_team"),
        )
    )
    pole = (
        qualifying_results_silver.filter(F.col("position") == 1)
        .join(drivers, "driver_number", "inner")
        .select(
            *keys,
            F.col("driver_number").alias("pole_driver_number"),
            F.col("driver_name").alias("pole_position_driver"),
        )
    )
    return _with_audit(
        stats.join(winner, keys, "inner")  # winner must exist (:297-320)
        .join(pole, keys, "left")  # pole may be missing (:254-276)
        .select(
            "year",
            "grand_prix_name",
            "race_date",
            "round_number",
            "pole_driver_number",
            "pole_position_driver",
            "winner_driver_number",
            "race_winner_driver",
            "race_winner_team",
            F.coalesce(
                F.col("pole_driver_number") == F.col("winner_driver_number"),
                F.lit(False),
            ).alias("pole_to_win"),
            "field_size",
            "total_finishers",
            "dnf_count",
            "is_sprint_weekend",
        )
    )


def transform_lap_analytics(laps_silver: DataFrame) -> DataFrame:
    """Fill the lap metrics the reference declares but never computes
    (laps_transform.py:297-300 leaves position_at_lap / gap_to_leader_millis /
    interval_to_ahead_millis as NULL placeholders "deferred to Gold", and no
    gold transform exists for them).

    One window family keyed by session: cumulative race time per driver →
    position at each lap (rank of elapsed time among drivers on that lap) →
    gap to leader → interval to the car ahead (lag over position). All four
    metrics share the session_key partitioning, so the stack costs two
    shuffles total (driver-cumsum, then per-lap ranking).
    """
    timed = laps_silver.filter(F.col("lap_time_millis").isNotNull())
    w_cum = (
        Window.partitionBy("session_key", "driver_number")
        .orderBy("lap_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    elapsed = timed.withColumn(
        "elapsed_millis", F.sum("lap_time_millis").over(w_cum)
    )
    w_lap = Window.partitionBy("session_key", "lap_number").orderBy(
        F.col("elapsed_millis").asc(), F.col("driver_number").asc()
    )
    w_lap_all = Window.partitionBy("session_key", "lap_number")
    ranked = (
        elapsed.withColumn("position_at_lap", F.rank().over(w_lap).cast("int"))
        .withColumn(
            "gap_to_leader_millis",
            (F.col("elapsed_millis") - F.min("elapsed_millis").over(w_lap_all)).cast("long"),
        )
        .withColumn(
            "interval_to_ahead_millis",
            (F.col("elapsed_millis") - F.lag("elapsed_millis").over(w_lap)).cast("long"),
        )
    )
    return ranked.select(
        "session_key",
        "year",
        "grand_prix_name",
        "driver_number",
        "lap_number",
        "lap_time_millis",
        F.col("elapsed_millis").cast("long").alias("elapsed_millis"),
        "position_at_lap",
        "gap_to_leader_millis",
        "interval_to_ahead_millis",
    )


def transform_constructor_championship(
    race_results_silver: DataFrame,
    sessions_silver: DataFrame,
    drivers_silver: DataFrame,
) -> DataFrame:
    """Constructor (team) championship — the table the reference's helpers
    point at but never build (window_functions.py:340-392 W13 constructor
    window aggs; business_logic.py:459-483 team points, expressed there as a
    groupBy + self-join — here the window form, SURVEY §4.3.5).

    Team points per race via groupBy sum, then the same running-total /
    rank / gap stack as the driver championship, keyed by team.
    """
    races = F.broadcast(_race_dim(sessions_silver))
    drivers = F.broadcast(_current_drivers(drivers_silver))
    per_team_race = (
        race_results_silver.select(
            "session_key",
            "driver_number",
            F.col("validated_points").cast("decimal(4,1)").alias("pts"),
        )
        .join(races, "session_key", "inner")
        .join(drivers, "driver_number", "inner")
        .groupBy("year", "race_date", "grand_prix_name", "round_number", "team_name")
        .agg(F.sum("pts").cast("decimal(5,1)").alias("race_points"))
    )
    w_cum = (
        Window.partitionBy("year", "team_name")
        .orderBy("race_date", "round_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_team_race.withColumn(
        "season_points_total", F.sum("race_points").over(w_cum).cast("decimal(7,1)")
    )
    w_rank = Window.partitionBy("year", "race_date").orderBy(
        F.col("season_points_total").desc(), F.col("team_name").asc()
    )
    w_race = Window.partitionBy("year", "race_date")
    return _with_audit(
        cum.select(
            "year",
            "race_date",
            "grand_prix_name",
            "round_number",
            "team_name",
            "race_points",
            "season_points_total",
            F.rank().over(w_rank).cast("int").alias("championship_position"),
            (F.max("season_points_total").over(w_race) - F.col("season_points_total"))
            .cast("decimal(7,1)")
            .alias("points_gap_to_leader"),
        )
    )


def weekend_biggest_mover(
    race_results_silver: DataFrame,
    qualifying_results_silver: DataFrame,
    sessions_silver: DataFrame,
    drivers_silver: DataFrame,
) -> DataFrame:
    """Biggest mover per weekend (reference O2 top-1 probe,
    business_logic.py:778-793, turned into a distributed per-group top-1):
    the driver gaining the most places grid→finish, ties to the lower
    driver number.
    """
    races = F.broadcast(_race_dim(sessions_silver))
    drivers = F.broadcast(_current_drivers(drivers_silver))
    keys = ["year", "grand_prix_name"]
    grid = qualifying_results_silver.select(
        *keys, "driver_number", F.col("position").alias("grid_position")
    )
    moved = (
        race_results_silver.filter(F.col("position").isNotNull())
        .select("session_key", "driver_number", F.col("position").alias("finish_position"))
        .join(races.select("session_key", *keys), "session_key")
        .join(grid, [*keys, "driver_number"], "inner")
        .withColumn("positions_gained", F.col("grid_position") - F.col("finish_position"))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("positions_gained").desc(), F.col("driver_number").asc()
    )
    return (
        moved.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(drivers, "driver_number", "inner")
        .select(
            *keys,
            F.col("driver_number").alias("biggest_mover_driver_number"),
            F.col("driver_name").alias("biggest_mover_driver"),
            "positions_gained",
        )
    )
