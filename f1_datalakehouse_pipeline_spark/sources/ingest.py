"""REST API → bronze ingestion (SURVEY §2.1 S1).

Reference: src/dags/services/openf1_client.py:91-200 (rate-limited, retrying
GET against the OpenF1 endpoints) and s3_writer.py:62-128 (records → pandas →
Hive-partitioned parquet). The client here is transport-injectable pure
Python — tests supply a canned transport, production supplies an HTTP one —
and the landing write reuses ``write_bronze`` so partition layout and dynamic
overwrite semantics are identical to every other bronze producer.

Scale notes: API ingestion is inherently driver-side, low-volume I/O (tens of
sessions × thousands of records per year — the reference runs it as a single
MWAA task). The engine-side handoff happens as early as possible:
``createDataFrame`` per (endpoint, session_type) batch, partition columns
derived with the SAME ``normalize_grand_prix_name`` expression silver uses
(so bronze slugs can never drift from silver names), then one dynamic
partition-overwrite write per batch — re-ingesting a session is idempotent.
For a hypothetical high-volume feed, fan the per-session fetches out with
``mapInPandas`` over a sessions DataFrame; not done here because the
reference's source is a rate-limited public API where parallel fetch is
explicitly unwanted.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_datalakehouse_pipeline_spark.functions.names import normalize_grand_prix_name
from f1_datalakehouse_pipeline_spark.sources.bronze import write_bronze

log = logging.getLogger(__name__)

# (endpoint, params) -> parsed JSON (the API returns a list of record dicts)
Transport = Callable[[str, dict], object]

# ISO-timestamp string columns conformed at landing (the API serializes
# datetimes as ISO-8601; silver expects timestamps)
_TS_COLS = ("date_start", "date_end", "date")

# endpoints fetched per session, mirroring DAGConfig's endpoint list
DEFAULT_ENDPOINTS = ("session_result", "drivers", "laps", "pit")


def http_transport(base_url: str, timeout_seconds: float = 30.0) -> Transport:
    """Production transport over ``requests`` (imported lazily so the engine
    has no hard dependency on it; openf1_client.py:47-76 adds the same
    retry-on-5xx adapter, which here lives in RestClient.get)."""
    import requests  # noqa: PLC0415 — optional dependency, import-gated

    session = requests.Session()
    session.headers.update({"Accept": "application/json"})

    def _get(endpoint: str, params: dict) -> object:
        resp = session.get(
            f"{base_url.rstrip('/')}/{endpoint.lstrip('/')}",
            params=params,
            timeout=timeout_seconds,
        )
        resp.raise_for_status()
        return resp.json()

    return _get


class RestClient:
    """Rate-limited, retrying wrapper around a transport.

    Mirrors openf1_client.py:78-146: enforce a minimum gap between requests,
    retry transient failures with exponential backoff (1s, 2s, 4s), and treat
    a non-list payload as an empty batch with a warning.
    """

    def __init__(
        self,
        transport: Transport,
        rate_limit_seconds: float = 0.5,
        max_retries: int = 3,
        backoff_factor: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._transport = transport
        self.rate_limit_seconds = rate_limit_seconds
        self.max_retries = max_retries
        self.backoff_factor = backoff_factor
        self._clock = clock
        self._sleep = sleep
        self._last_request_at: float | None = None

    def get(self, endpoint: str, params: dict | None = None) -> list[dict]:
        params = params or {}
        attempt = 0
        while True:
            self._throttle()
            try:
                data = self._transport(endpoint, params)
            except Exception:
                attempt += 1
                if attempt > self.max_retries:
                    log.error("GET %s %s failed after %d retries", endpoint, params, self.max_retries)
                    raise
                delay = self.backoff_factor * (2 ** (attempt - 1))
                log.warning("GET %s failed (attempt %d/%d), retrying in %.1fs",
                            endpoint, attempt, self.max_retries, delay)
                self._sleep(delay)
                continue
            if not isinstance(data, list):
                log.warning("API returned non-list payload for %s: %s", endpoint, type(data))
                return []
            return data

    def _throttle(self) -> None:
        now = self._clock()
        if self._last_request_at is not None:
            gap = now - self._last_request_at
            if gap < self.rate_limit_seconds:
                self._sleep(self.rate_limit_seconds - gap)
        self._last_request_at = self._clock()


def _conform_timestamps(df: DataFrame) -> DataFrame:
    for c in _TS_COLS:
        if c in df.columns and isinstance(df.schema[c].dataType, T.StringType):
            df = df.withColumn(c, F.to_timestamp(c))
    return df


def ingest_year(
    spark: SparkSession,
    client: RestClient,
    bronze_root: str,
    year: int,
    endpoints: Sequence[str] = DEFAULT_ENDPOINTS,
    session_types: Sequence[str] = ("qualifying", "race"),
) -> dict[str, int]:
    """Fetch one year of sessions + per-session endpoint data and land it as
    Hive-partitioned bronze parquet. Returns record counts per endpoint.

    Batching: records are grouped per (endpoint, session_type) and written in
    ONE dynamic partition-overwrite each — session_result's ``duration`` is
    array-typed in qualifying and scalar in race (FIXTURES.md §1), so the two
    session types must land as separate write batches, exactly as read_bronze
    scans them.
    """
    import pandas as pd

    sessions = client.get("sessions", {"year": year})
    wanted = {st.lower() for st in session_types}
    counts: dict[str, int] = defaultdict(int)
    # (endpoint, session_type) -> list of annotated records
    batches: dict[tuple[str, str], list[dict]] = defaultdict(list)

    for s in sessions:
        stype = str(s.get("session_name") or s.get("session_type") or "unknown").lower()
        if stype not in wanted:
            continue
        location = s.get("location") or s.get("meeting_name") or "unknown"
        for endpoint in endpoints:
            records = client.get(endpoint, {"session_key": s["session_key"]})
            if not records:
                log.warning("no %s records for session %s", endpoint, s["session_key"])
                continue
            for r in records:
                r = dict(r)
                r["__ingest_year"] = s.get("year", year)
                r["__ingest_location"] = location
                r["__ingest_session_type"] = stype
                batches[(endpoint, stype)].append(r)

    for (endpoint, stype), records in batches.items():
        raw = spark.createDataFrame(pd.DataFrame(records))
        df = (
            _conform_timestamps(raw)
            .withColumn("year", F.col("__ingest_year").cast("int"))
            .withColumn("grand_prix", normalize_grand_prix_name(F.col("__ingest_location")))
            .withColumn("session_type", F.lower(F.col("__ingest_session_type")))
            .drop("__ingest_year", "__ingest_location", "__ingest_session_type")
        )
        write_bronze(df, bronze_root, endpoint)
        counts[endpoint] += len(records)
        log.info("landed %d %s/%s records", len(records), endpoint, stype)
    return dict(counts)
