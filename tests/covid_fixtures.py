"""Deterministic COVID-shaped fixture CSVs (FIXTURES.md §1).

~20 ISO-3 codes × 60 days, ~5% empty metric cells (exercises
na.fill(0)), a few non-numeric cells (exercises silent-null Integer
casts), location-only rows in excess_mortality/full_data that are
absent from the owid mapping (exercise the inner J1 join dropping
them), and a "yesterday" snapshot = today minus the last day with ~2%
of shared rows mutated (exercises subtract-CDC).
"""

from __future__ import annotations

import csv
import datetime as dt
import os
import random

ISO = [
    ("Austria", "AUT"), ("Belgium", "BEL"), ("Brazil", "BRA"), ("Canada", "CAN"),
    ("Chile", "CHL"), ("Denmark", "DNK"), ("Egypt", "EGY"), ("France", "FRA"),
    ("Germany", "DEU"), ("Greece", "GRC"), ("India", "IND"), ("Italy", "ITA"),
    ("Japan", "JPN"), ("Kenya", "KEN"), ("Mexico", "MEX"), ("Norway", "NOR"),
    ("Peru", "PER"), ("Spain", "ESP"), ("Sweden", "SWE"), ("Uruguay", "URY"),
]
EXTRA_LOCATIONS = ["Atlantis", "Wakanda"]  # location-only, no owid mapping row

START = dt.date(2021, 1, 1)
N_DAYS = 60
RUN_DATE = START + dt.timedelta(days=N_DAYS)  # day after the last data day

INDICATORS = [
    "Daily hospital occupancy",
    "Daily ICU occupancy",
    "Weekly new hospital admissions",
    "Weekly new ICU admissions",
]


def _num(rng: random.Random, lo: int, hi: int) -> str:
    roll = rng.random()
    if roll < 0.05:
        return ""  # null
    if roll < 0.06:
        return "N/A"  # non-numeric → silent null under Integer cast
    return str(rng.randint(lo, hi))


def _dec(rng: random.Random, lo: float, hi: float, nd: int) -> str:
    if rng.random() < 0.05:
        return ""
    return f"{rng.uniform(lo, hi):.{nd}f}"


def generate(root: str, seed: int = 42) -> dict[str, str]:
    """Write today/ and yesterday/ CSV dirs; returns {name: today_dir}."""
    rng = random.Random(seed)
    days = [START + dt.timedelta(days=i) for i in range(N_DAYS)]
    today_dir = os.path.join(root, "today")
    yday_dir = os.path.join(root, "yesterday")
    os.makedirs(today_dir, exist_ok=True)
    os.makedirs(yday_dir, exist_ok=True)

    tables: dict[str, tuple[list[str], list[list[str]]]] = {}

    rows = []
    for loc, iso in ISO:
        pop = str(rng.randint(1_000_000, 90_000_000))
        a65, a70 = str(rng.randint(5, 25)), str(rng.randint(3, 18))
        for d in days:
            rows.append([
                loc, iso, d.isoformat(), _dec(rng, 0, 100, 1), pop, a65, a70,
                _num(rng, 100, 90000), _num(rng, 1000, 5_000_000),
            ])
    tables["owid_covid_data"] = (
        ["location", "iso_code", "date", "stringency_index", "population",
         "aged_65_older", "aged_70_older", "new_tests", "total_tests"],
        rows,
    )

    rows = []
    for _, iso in ISO:
        if rng.random() < 0.15:
            continue  # some countries report no vaccinations
        for d in days:
            rows.append([
                iso, d.isoformat(), _num(rng, 0, 50_000_000), _num(rng, 0, 800_000),
                _num(rng, 0, 10_000_000),
            ])
    tables["vaccinations"] = (
        ["iso_code", "date", "total_vaccinations", "daily_vaccinations", "total_boosters"],
        rows,
    )

    rows = []
    for _, iso in ISO:
        for d in days:
            for ind in INDICATORS:
                if rng.random() < 0.10:
                    continue  # sparse long table
                rows.append([iso, d.isoformat(), ind, _dec(rng, 0, 5000, 2)])
    tables["hospitalizations"] = (["iso_code", "date", "indicator", "value"], rows)

    rows = []
    for loc, _ in ISO + [(x, None) for x in EXTRA_LOCATIONS]:
        for d in days:
            if rng.random() < 0.3:
                continue
            rows.append([loc, d.isoformat(), _dec(rng, -50, 300, 2)])
    tables["excess_mortality"] = (["location", "date", "excess_proj_all_ages"], rows)

    rows = []
    for loc, _ in ISO + [(x, None) for x in EXTRA_LOCATIONS]:
        for d in days:
            rows.append([
                loc, d.isoformat(), _num(rng, 0, 60000), _num(rng, 0, 2000),
                _num(rng, 0, 5_000_000), _num(rng, 0, 150_000),
                _num(rng, 0, 300_000), _num(rng, 0, 12_000),
            ])
    tables["full_data"] = (
        ["location", "date", "new_cases", "new_deaths", "total_cases",
         "total_deaths", "weekly_cases", "weekly_deaths"],
        rows,
    )

    last_day = days[-1].isoformat()
    for name, (header, rows) in tables.items():
        with open(os.path.join(today_dir, f"{name}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
        # Yesterday snapshot: drop the last day; mutate ~2% of kept rows
        # (so today's copy of those rows counts as a change).
        date_idx = header.index("date")
        yrows = []
        for r in rows:
            if r[date_idx] == last_day:
                continue
            r2 = list(r)
            if rng.random() < 0.02:
                for i, col in enumerate(header):
                    if i != date_idx and col not in ("location", "iso_code", "indicator"):
                        r2[i] = "0" if r2[i] != "0" else "1"
                        break
            yrows.append(r2)
        with open(os.path.join(yday_dir, f"{name}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(yrows)

    return {"today": today_dir, "yesterday": yday_dir}
