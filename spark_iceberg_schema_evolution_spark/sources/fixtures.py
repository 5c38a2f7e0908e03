"""Deterministic schema-evolving CSV fixture generator.

Mirrors the *contract* of the reference's Faker-based generator
(`src/utils/fake_data.py:40-218`): every file carries 5 mandatory columns;
each file adds a pseudo-random subset of optional columns, so consecutive
files have ragged schemas. Values here are deterministic (seeded; no Faker
dependency) because the generator's job in this engine is driving
schema-evolution correctness tests (FIXTURES.md §A), not demo data.
"""

from __future__ import annotations

import csv
import os
import random

MANDATORY = [
    "Index",
    "Customer Id",
    "First Name",
    "Last Name",
    "Subscription Date",
]

# representative optional columns spanning the inferred-type space
# (FIXTURES.md §A.2; full reference list is 70 columns, fake_data.py:15-32)
OPTIONAL: dict[str, str] = {
    "Company": "str",
    "Country": "str",
    "Email": "str",
    "Revenue": "int",
    "Website": "str",
    "Loyalty Points": "int",
    "Membership Level": "enum",
    "Marketing Opt-In": "bool",
    "Account Status": "enum",
    "Previous Purchases": "int",
    "Average Order Value": "float",
    "Customer Rating": "int",
    "Session Duration": "int",
    "Temperature": "float",
}

_ENUMS = {
    "Membership Level": ["Gold", "Silver", "Bronze"],
    "Account Status": ["Active", "Inactive", "Pending"],
}


def _value(col: str, kind: str, rng: random.Random, row_id: int):
    if kind == "int":
        return rng.randint(0, 100000)
    if kind == "float":
        return round(rng.uniform(0, 1000), 2)
    if kind == "bool":
        return rng.choice([True, False])
    if kind == "enum":
        return rng.choice(_ENUMS[col])
    return f"{col.replace(' ', '').lower()}_{row_id}_{rng.randint(0, 999)}"


def generate_csv_files(
    out_dir: str,
    n_files: int = 3,
    rows_per_file: int = 10,
    seed: int = 42,
) -> list[str]:
    """Write `customers-{i}.csv` files with ragged optional columns.
    Unique Index = file_index*10_000 + row (reference keyed uniqueness the
    same way, fake_data.py:62: file_index*10+i)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    paths = []
    opt_names = list(OPTIONAL)
    for fi in range(1, n_files + 1):
        k = rng.randint(1, len(opt_names))
        extras = sorted(rng.sample(opt_names, k))
        cols = MANDATORY + extras
        path = os.path.join(out_dir, f"customers-{fi}.csv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for i in range(rows_per_file):
                row_id = fi * 10_000 + i
                row = {
                    "Index": row_id,
                    "Customer Id": f"cust-{row_id:08d}",
                    "First Name": f"First{row_id % 97}",
                    "Last Name": f"Last{row_id % 89}",
                    "Subscription Date": f"20{20 + fi % 5}-0{1 + row_id % 9}-1{row_id % 9}",
                }
                for c in extras:
                    row[c] = _value(c, OPTIONAL[c], rng, row_id)
                w.writerow(row)
        paths.append(path)
    return paths
