"""Deterministic F1-shaped bronze fixtures (FIXTURES.md).

One season (2025), N_GP Grand Prix × 2 sessions × N_DRIVERS drivers, written
as Hive-partitioned parquet ``{root}/{endpoint}/year=/grand_prix=/session_type=/``
via pyarrow (mirroring the reference's pandas→parquet bronze landing,
s3_writer.py:62-128). Includes every edge case the silver transforms must
handle: accented GP name, sprint location, NULL date_end, DNF/DNS/DSQ rows,
points mismatches, Q1/Q2/Q3 array truncation, lap-time sector fallback,
fastest-lap tie, invalid pit durations, and a mid-season team change.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

YEAR = 2025
N_GP = 6
N_DRIVERS = 20
N_LAPS = 30

GPS = [
    ("Bahrain Grand Prix", "bahrain"),
    ("Sao Paulo Grand Prix", "sao_paulo"),
    ("Miami Grand Prix", "miami"),  # sprint location
    ("Monaco Grand Prix", "monaco"),
    ("Austrian Grand Prix", "austrian"),  # sprint location
    ("Italian Grand Prix", "italian"),
]

TEAMS_RAW = [
    "Oracle Red Bull Racing",
    "Mercedes AMG Petronas",
    "Scuderia Ferrari",
    "McLaren",
    "Aston Martin",
    "Alpine",
    "Williams",
    "Visa Cash App RB",
    "Kick Sauber",
    "MoneyGram Haas F1 Team",
]

POINTS = [25, 18, 15, 12, 10, 8, 6, 4, 2, 1]

TEAM_CHANGE_DRIVER = 7   # moves teams starting GP index 3
TEAM_CHANGE_GP_IDX = 3


def team_for(driver: int, gp_idx: int) -> str:
    if driver == TEAM_CHANGE_DRIVER and gp_idx >= TEAM_CHANGE_GP_IDX:
        return TEAMS_RAW[(driver - 1) // 2 + 1]
    return TEAMS_RAW[(driver - 1) // 2]


def _write(root: str, endpoint: str, gp_slug: str, session_type: str, pdf: pd.DataFrame, schema: pa.Schema | None = None, year: int = YEAR):
    d = os.path.join(
        root, endpoint, f"year={year}", f"grand_prix={gp_slug}", f"session_type={session_type}"
    )
    os.makedirs(d, exist_ok=True)
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, os.path.join(d, "part-000.parquet"))


def generate_bronze(root: str, year: int = YEAR) -> None:
    rng = random.Random(42 + year - YEAR)
    yoff = (year - YEAR) * 100
    for gp_idx, (meeting_name, gp_slug) in enumerate(GPS):
        meeting_key = 1000 + gp_idx + yoff * 10
        race_day = datetime(year, 3, 1) + timedelta(days=14 * gp_idx)
        for is_race in (0, 1):
            st = "race" if is_race else "qualifying"
            session_key = 9000 + yoff + 2 * gp_idx + is_race
            date_start = race_day + timedelta(days=is_race, hours=14)
            date_end = None if (gp_idx == 1 and not is_race) else date_start + timedelta(hours=1 + is_race)

            # deterministic position permutation per session
            order = list(range(1, N_DRIVERS + 1))
            rng.shuffle(order)
            positions = {drv: pos for pos, drv in enumerate(order, start=1)}

            rows = []
            for drv in range(1, N_DRIVERS + 1):
                pos = positions[drv]
                dnf = bool(is_race and pos in (N_DRIVERS - 1, N_DRIVERS) and gp_idx % 2 == 0)
                dns = bool(is_race and pos == N_DRIVERS and gp_idx == 1)
                dsq = bool(not is_race and pos == N_DRIVERS and gp_idx == 2)
                shown_pos = None if (is_race and dnf) else pos
                if is_race:
                    base = 5400.0 + pos * 9.5 + rng.random()
                    duration = None if dnf or dns else round(base, 3)
                    gap = None if (pos == 1 or dnf or dns) else round(pos * 9.5 + rng.random(), 3)
                    pts = POINTS[pos - 1] if pos <= 10 else 0
                    # deliberate reconciliation mismatches (FIXTURES §1)
                    if gp_idx == 0 and pos in (4, 9):
                        pts += 2
                    row_duration = duration
                else:
                    q1 = round(78.0 + pos * 0.35 + rng.random() * 0.2, 3)
                    q2 = round(q1 - 0.4, 3) if pos <= 15 else None
                    q3 = round(q1 - 0.8, 3) if pos <= 10 else None
                    row_duration = [t for t in (q1, q2, q3) if t is not None]
                    gap, pts = None, 0
                rows.append(
                    dict(
                        session_key=session_key,
                        meeting_key=meeting_key,
                        meeting_name=meeting_name,
                        date_start=date_start,
                        date_end=date_end,
                        driver_number=drv,
                        position=shown_pos,
                        duration=row_duration,
                        gap_to_leader=gap,
                        points=pts,
                        dnf=dnf,
                        dns=dns,
                        dsq=dsq,
                    )
                )
            pdf = pd.DataFrame(rows)
            dur_type = pa.list_(pa.float64()) if not is_race else pa.float64()
            schema = pa.schema(
                [
                    ("session_key", pa.int64()),
                    ("meeting_key", pa.int64()),
                    ("meeting_name", pa.string()),
                    ("date_start", pa.timestamp("us")),
                    ("date_end", pa.timestamp("us")),
                    ("driver_number", pa.int32()),
                    ("position", pa.int32()),
                    ("duration", dur_type),
                    ("gap_to_leader", pa.float64()),
                    ("points", pa.int32()),
                    ("dnf", pa.bool_()),
                    ("dns", pa.bool_()),
                    ("dsq", pa.bool_()),
                ]
            )
            _write(root, "session_result", gp_slug, st, pdf, schema, year=year)

            # drivers: one row per driver per session
            drows = [
                dict(
                    session_key=session_key,
                    driver_number=drv,
                    broadcast_name=f"D DRIVER{drv}",
                    full_name=f"Driver Number{drv}",
                    team_name=team_for(drv, gp_idx),
                    country_code="NED" if drv % 2 else "GBR",
                    team_colour=f"{drv:06x}",
                    name_acronym=f"D{drv:02d}",
                )
                for drv in range(1, N_DRIVERS + 1)
            ]
            _write(root, "drivers", gp_slug, st, pd.DataFrame(drows), year=year)

            if not is_race:
                continue

            # laps (race only)
            lrows = []
            for drv in range(1, N_DRIVERS + 1):
                for lap in range(1, N_LAPS + 1):
                    t = 80.0 + positions[drv] * 0.3 + ((lap * 7 + drv * 13) % 50) / 25.0
                    s1, s2, s3 = round(t * 0.3, 3), round(t * 0.33, 3), round(t * 0.37, 3)
                    lap_duration = round(t, 3)
                    if (lap + drv) % 17 == 0:  # ~5%: NULL lap_duration → sector fallback
                        lap_duration = None
                    if drv == 5 and lap == 10:  # NULL sector ⇒ NULL lap time
                        lap_duration, s2 = None, None
                    lrows.append(
                        dict(
                            session_key=session_key,
                            driver_number=drv,
                            lap_number=lap,
                            lap_duration=lap_duration,
                            duration_sector_1=s1,
                            duration_sector_2=s2,
                            duration_sector_3=s3,
                            segments_sector_1=[2048, 2049],
                            segments_sector_2=[2051],
                            segments_sector_3=[2064, 2068],
                        )
                    )
            # fastest-lap tie: drivers 1 and 2 share the identical best time
            tie = 70.123
            for drv in (2, 1):
                lrows.append(
                    dict(
                        session_key=session_key,
                        driver_number=drv,
                        lap_number=N_LAPS + 1,
                        lap_duration=tie,
                        duration_sector_1=round(tie * 0.3, 3),
                        duration_sector_2=round(tie * 0.33, 3),
                        duration_sector_3=round(tie * 0.37, 3),
                        segments_sector_1=[2048],
                        segments_sector_2=[2051],
                        segments_sector_3=[2064],
                    )
                )
            _write(root, "laps", gp_slug, st, pd.DataFrame(lrows), year=year)

            # pit stops (race only), pit_duration in MILLISECONDS
            prows = []
            for drv in range(1, N_DRIVERS + 1):
                for stop in range(2):
                    prows.append(
                        dict(
                            session_key=session_key,
                            driver_number=drv,
                            lap_number=10 + stop * 12 + drv % 5,
                            pit_duration=float(21000 + (drv * 997 + stop * 4001) % 14000),
                        )
                    )
            prows[0]["pit_duration"] = None  # NULL → filtered
            prows[1]["pit_duration"] = 0.0   # zero → filtered
            _write(root, "pit", gp_slug, st, pd.DataFrame(prows), year=year)
