#!/usr/bin/env python3
"""Data-schema probe for the driver-generated test tables.

Round-6 lesson: the driver regenerated /root/testdata with events.ts as
timestamp[us] while the repo assumed TIMESTAMP(NANOS)-as-long — one silent
drift cost 3 streaming certifications, 9 CORRECTNESS entries and 13 test
failures. This 5-second gate fails the commit instead.

Checks, per SF dir:
  1. events.ts has a physical type the loaders normalize
     (Tables.events / Streams.normalizeTs): timestamp[ns|us|ms] or int64
     (int64 is read as nanos under nanosAsLong).
  2. The interpreted min(ts) lands in a sane epoch window (1990..2100) —
     catches a nanos/micros flip inside a type the gate would otherwise
     accept.
"""
import sys
import datetime

import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# divisor to seconds for each accepted physical type
ACCEPTED = {
    "timestamp[ns]": 1_000_000_000,
    "timestamp[us]": 1_000_000,
    "timestamp[ms]": 1_000,
    "int64": 1_000_000_000,  # read as nanos under nanosAsLong
}


def probe(sf_dir: str) -> list[str]:
    errs = []
    path = f"{sf_dir}/events.parquet"
    try:
        t = pq.read_table(path, columns=["ts"])
    except Exception as e:  # missing dir/file: driver hasn't generated it
        return [f"{path}: unreadable ({e})"]
    typ = str(t.schema.field("ts").type)
    if typ not in ACCEPTED:
        return [f"{path}: ts type {typ} — loaders handle only {sorted(ACCEPTED)}; "
                "extend Tables.events + Streams.normalizeTs first"]
    raw = t.column("ts").cast("int64").to_pylist()
    lo = min(v for v in raw if v is not None)
    year = datetime.datetime.fromtimestamp(lo / ACCEPTED[typ], datetime.timezone.utc).year
    if not (1990 <= year <= 2100):
        errs.append(f"{path}: min(ts) interprets to year {year} under {typ} — "
                    "unit drift (nanos/micros flip?)")
    return errs


def main() -> int:
    errors = []
    for d in SF_DIRS:
        errors.extend(probe(d))
    if errors:
        print("schema_probe: FAIL", file=sys.stderr)
        for e in errors:
            print(f"  {e}", file=sys.stderr)
        return 1
    print("schema_probe: ok (events.ts readable and time-typed at all SFs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
