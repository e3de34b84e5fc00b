"""Deterministic synthetic loan-payments dataset.

Same schema and golden property as the reference's example dataset
(reference examples/data/Loan payments data.csv, profiled in FIXTURES.md
§1) without copying its rows: 500 loans, string dates in M/d/yyyy,
null-bearing numeric columns, and EXACTLY 247 loans that are both
Gender='male' and loan_status='PAIDOFF' — the golden answer of
reference examples/from_csv.py ("247 loans have been paid off by men").
"""

from __future__ import annotations

import csv
import random

COLUMNS = [
    "Loan_ID", "loan_status", "Principal", "terms", "effective_date",
    "due_date", "paid_off_time", "past_due_days", "age", "education", "Gender",
]

# (status, gender, count): 300 PAIDOFF / 100 COLLECTION / 100 COLLECTION_PAIDOFF
_STRATA = [
    ("PAIDOFF", "male", 247),
    ("PAIDOFF", "female", 53),
    ("COLLECTION", "male", 60),
    ("COLLECTION", "female", 40),
    ("COLLECTION_PAIDOFF", "male", 55),
    ("COLLECTION_PAIDOFF", "female", 45),
]
_EDUCATIONS = ["High School or Below", "college", "Bechalor", "Master or Above"]
_PRINCIPALS = [300, 500, 700, 800, 900, 1000]
_TERMS = [7, 15, 30]


def rows() -> list[list]:
    rng = random.Random(20160908)
    out: list[list] = []
    i = 0
    for status, gender, count in _STRATA:
        for _ in range(count):
            i += 1
            eff_day = rng.randint(8, 14)  # September 2016, like the original
            term = rng.choice(_TERMS)
            due_day = eff_day + term
            due = f"10/{due_day - 30}/2016" if due_day > 30 else f"9/{due_day}/2016"
            paid_off = (
                f"9/{rng.randint(eff_day, min(due_day, 30))}/2016 {rng.randint(8, 21)}:{rng.randint(0, 59):02d}"
                if status != "COLLECTION"
                else None
            )
            past_due = rng.randint(1, 89) if status != "PAIDOFF" else None
            out.append([
                f"xqd{20160000 + i}",
                status,
                rng.choice(_PRINCIPALS),
                term,
                f"9/{eff_day}/2016",
                due,
                paid_off,
                past_due,
                rng.randint(18, 51),
                rng.choice(_EDUCATIONS),
                gender,
            ])
    rng.shuffle(out)
    return out


def write_csv(path: str) -> str:
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(COLUMNS)
        for r in rows():
            w.writerow(["" if v is None else v for v in r])
    return path


def write_xlsx(path: str) -> str:
    from my_polars_ai_spark.sources.xlsx import write_xlsx as _write

    _write(path, COLUMNS, rows())
    return path
