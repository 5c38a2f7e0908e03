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

# the FULL optional-column envelope of the reference generator
# (fake_data.py:15-32, 71 names), each mapped onto this generator's
# deterministic type space — the reference's demo breadth without the
# Faker dependency. Kinds: str / int / float / bool / enum / date.
OPTIONAL: dict[str, str] = {
    "Company": "str",
    "City": "str",
    "Country": "str",
    "Phone": "str",
    "Email": "str",
    "Industry": "str",
    "Revenue": "int",
    "Zip Code": "str",
    "Address": "str",
    "State": "str",
    "Website": "str",
    "Job Title": "str",
    "Department": "str",
    "Product Category": "enum",
    "Purchase Date": "date",
    "Order ID": "str",
    "Shipping Address": "str",
    "Billing Address": "str",
    "Credit Card Number": "str",
    "Social Security Number": "str",
    "IP Address": "str",
    "User Agent": "str",
    "Referral Source": "str",
    "Language": "enum",
    "Time Zone": "str",
    "Notes": "str",
    "Comments": "str",
    "Loyalty Points": "int",
    "Membership Level": "enum",
    "Last Login": "date",
    "Marketing Opt-In": "bool",
    "Newsletter Subscription": "bool",
    "Preferred Contact Method": "enum",
    "Account Status": "enum",
    "Customer Since": "date",
    "Date of Birth": "date",
    "Gender": "enum",
    "Ethnicity": "str",
    "Marital Status": "enum",
    "Education Level": "enum",
    "Occupation": "str",
    "Hobbies": "str",
    "Interests": "str",
    "Previous Purchases": "int",
    "Average Order Value": "float",
    "Customer Rating": "int",
    "Support Tickets": "int",
    "Last Contacted": "date",
    "Next Scheduled Contact": "date",
    "Lead Source": "str",
    "Lead Status": "enum",
    "Campaign ID": "str",
    "Campaign Name": "str",
    "Ad Group": "str",
    "Keyword": "str",
    "Click ID": "str",
    "Page Views": "int",
    "Session Duration": "int",
    "Device Type": "enum",
    "Operating System": "enum",
    "Browser": "enum",
    "Screen Resolution": "str",
    "Location Coordinates": "str",
    "Latitude": "float",
    "Longitude": "float",
    "Altitude": "float",
    "Sensor Data": "str",
    "Temperature": "float",
    "Humidity": "float",
    "Pressure": "float",
    "Acceleration": "float",
}

_ENUMS = {
    "Membership Level": ["Gold", "Silver", "Bronze"],
    "Account Status": ["Active", "Inactive", "Pending"],
    "Product Category": ["Books", "Tools", "Food", "Toys"],
    "Language": ["en", "es", "de", "fr"],
    "Preferred Contact Method": ["email", "phone", "mail"],
    "Gender": ["female", "male", "nonbinary"],
    "Marital Status": ["single", "married", "divorced"],
    "Education Level": ["HS", "BS", "MS", "PhD"],
    "Lead Status": ["new", "contacted", "qualified", "lost"],
    "Device Type": ["desktop", "mobile", "tablet"],
    "Operating System": ["linux", "macos", "windows"],
    "Browser": ["firefox", "chrome", "safari"],
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
    if kind == "date":
        return (
            f"20{rng.randint(18, 25)}-"
            f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        )
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
