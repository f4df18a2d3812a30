"""REST → bronze ingestion (SURVEY §2.1 S1; reference openf1_client.py:91-200
+ s3_writer.py:62-128): transport-injectable client unit tests plus an e2e
run: fake API → ingest_year → bronze parquet → full silver pipeline green."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from f1_datalakehouse_pipeline_spark.sources.ingest import RestClient, ingest_year


class FakeTransport:
    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, endpoint, params):
        self.calls.append((endpoint, dict(params)))
        key = (endpoint, params.get("session_key"))
        out = self.responses.get(key, self.responses.get((endpoint, None), []))
        if isinstance(out, Exception):
            raise out
        return out


def test_restclient_retries_transient_failures_with_backoff():
    attempts = []

    def flaky(endpoint, params):
        attempts.append(1)
        if len(attempts) < 3:
            raise ConnectionError("transient")
        return [{"ok": 1}]

    sleeps = []
    client = RestClient(flaky, rate_limit_seconds=0, sleep=sleeps.append)
    assert client.get("sessions", {"year": 2025}) == [{"ok": 1}]
    assert len(attempts) == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff 1s, 2s


def test_restclient_raises_after_max_retries():
    def dead(endpoint, params):
        raise ConnectionError("down")

    client = RestClient(dead, rate_limit_seconds=0, max_retries=2, sleep=lambda _: None)
    with pytest.raises(ConnectionError):
        client.get("sessions")


def test_restclient_rate_limits_between_requests():
    clock = {"t": 0.0}
    sleeps = []

    def sleep(s):
        sleeps.append(s)
        clock["t"] += s

    client = RestClient(
        lambda e, p: [], rate_limit_seconds=0.5, clock=lambda: clock["t"], sleep=sleep
    )
    client.get("a")
    client.get("b")  # immediate second call must wait out the gap
    assert sleeps and abs(sleeps[0] - 0.5) < 1e-9


def test_restclient_non_list_payload_is_empty_batch():
    client = RestClient(lambda e, p: {"detail": "rate limited"}, rate_limit_seconds=0)
    assert client.get("laps") == []


def _fake_api(year=2025):
    """One GP (accented location), qualifying + race, 4 drivers — API-shaped
    dicts with ISO timestamp strings, as the real endpoints serialize them."""
    t0 = datetime(year, 3, 1, 14, 0, 0)
    sessions = []
    responses = {}
    for i, stype in enumerate(["Qualifying", "Race"]):
        sk = 9000 + i
        start = t0 + timedelta(days=i)
        sessions.append(
            {
                "session_key": sk,
                "meeting_key": 1000,
                "year": year,
                "location": "São Paulo",
                "session_name": stype,
                "date_start": start.isoformat(),
            }
        )
        is_race = stype == "Race"
        responses[("session_result", sk)] = [
            {
                "session_key": sk,
                "meeting_key": 1000,
                "meeting_name": "Sao Paulo Grand Prix",
                "date_start": start.isoformat(),
                "date_end": (start + timedelta(hours=2)).isoformat(),
                "driver_number": d,
                "position": d,
                "duration": (5400.0 + d * 9.5) if is_race else [80.0 + d * 0.3, 79.6 + d * 0.3],
                "gap_to_leader": (None if d == 1 else d * 9.5) if is_race else None,
                "points": ([25, 18, 15, 12][d - 1] if is_race else 0),
                "dnf": False,
                "dns": False,
                "dsq": False,
            }
            for d in (1, 2, 3, 4)
        ]
        responses[("drivers", sk)] = [
            {
                "session_key": sk,
                "driver_number": d,
                "broadcast_name": f"D DRIVER{d}",
                "full_name": f"Driver Number{d}",
                "team_name": "McLaren" if d <= 2 else "Williams",
                "country_code": "NED",
                "team_colour": f"{d:06x}",
                "name_acronym": f"D{d:02d}",
            }
            for d in (1, 2, 3, 4)
        ]
        responses[("laps", sk)] = (
            [
                {
                    "session_key": sk,
                    "driver_number": d,
                    "lap_number": lap,
                    "lap_duration": 80.0 + d * 0.3 + lap * 0.01,
                    "duration_sector_1": 24.0,
                    "duration_sector_2": 26.4,
                    "duration_sector_3": 29.6,
                    "segments_sector_1": [2048],
                    "segments_sector_2": [2051],
                    "segments_sector_3": [2064],
                }
                for d in (1, 2, 3, 4)
                for lap in (1, 2, 3)
            ]
            if is_race
            else []
        )
        responses[("pit", sk)] = (
            [
                {
                    "session_key": sk,
                    "driver_number": d,
                    "lap_number": 2,
                    "pit_duration": 22000.0 + d * 100,
                }
                for d in (1, 2, 3, 4)
            ]
            if is_race
            else []
        )
    responses[("sessions", None)] = sessions
    return responses


def test_ingest_year_end_to_end_through_silver(spark, tmp_path):
    from f1_datalakehouse_pipeline_spark.plans.pipeline import run_bronze_to_silver
    from f1_datalakehouse_pipeline_spark.sources.bronze import read_bronze
    from f1_datalakehouse_pipeline_spark.sources.tables import TableStore

    transport = FakeTransport(_fake_api())
    client = RestClient(transport, rate_limit_seconds=0)
    bronze_root = str(tmp_path / "bronze")
    counts = ingest_year(spark, client, bronze_root, year=2025)
    assert counts["session_result"] == 8 and counts["drivers"] == 8
    assert counts["laps"] == 12 and counts["pit"] == 4

    # partition values derive from the SAME normalizer silver uses
    br = read_bronze(spark, bronze_root, "drivers", year=2025)
    assert br.select("grand_prix").distinct().collect()[0][0] == "sao_paulo"
    # ISO strings landed as real timestamps
    sr = read_bronze(spark, bronze_root, "session_result", year=2025, session_type="race")
    assert sr.schema["date_start"].dataType.typeName() == "timestamp"

    store = TableStore(spark, str(tmp_path / "wh"))
    report = run_bronze_to_silver(spark, bronze_root, store, mode="HISTORICAL", year=2025)
    assert all(v == "ok" for v in report.results.values()), report.results
    sess = store.read("sessions_silver")
    assert sess.count() == 2
    assert sess.select("grand_prix_name").distinct().collect()[0][0] == "sao_paulo"
    assert store.read("race_results_silver").count() == 4


def test_read_bronze_glob_metachar_slug_scopes_literally(spark, tmp_path):
    """ADVICE r3: a partition value containing glob metacharacters must match
    its own partition literally — Spark's partitionBy %XX-escapes such chars
    in the directory name, so the path glob must apply the same escaping
    (plus glob neutralization) instead of interpolating the raw slug."""
    from pyspark.sql import functions as F

    from f1_datalakehouse_pipeline_spark.sources.bronze import read_bronze

    weird = "sao-paulo[sprint]*?"
    df = spark.range(8).select(
        F.col("id"),
        F.lit(2025).cast("int").alias("year"),
        F.when(F.col("id") % 2 == 0, weird).otherwise("monaco").alias("grand_prix"),
        F.lit("race").alias("session_type"),
    )
    root = str(tmp_path / "bronze")
    df.write.partitionBy("year", "grand_prix", "session_type").parquet(f"{root}/laps")

    out = read_bronze(spark, root, "laps", year=2025, grand_prix=weird)
    assert out.count() == 4
    assert out.select("grand_prix").distinct().collect()[0][0] == weird

    # a slug that matches nothing still fails loudly, not via a glob error
    import pytest

    with pytest.raises(ValueError, match="matched no partitions"):
        read_bronze(spark, root, "laps", year=2025, grand_prix="no[such]gp")
