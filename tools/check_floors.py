#!/usr/bin/env python3
"""Spot-check recall/floor queries at a larger SF than the driver's gate.

The driver's correctness gate (check_oracle.py) runs at sf0.01; iteration-
bound searches can pass there yet miss their floors at sf0.1. Run Verify at
the target SF first, then:

    sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
    python3 tools/check_floors.py /tmp/verify_sf01

Scans every query output that carries a floor_met / *_ok boolean column —
plus the planner-route pins (*_routed, route_refused, brute_served,
order_independent,
delta_empty, delta_appended), which the sf0.01 oracle hash-checks but
nothing re-asserted at the larger SF — and fails if any is false.
"""
import glob
import sys

import duckdb

def main(outdir: str) -> int:
    bad = 0
    checked = 0
    for q in sorted(glob.glob(f"{outdir}/*")):
        if not glob.glob(f"{q}/*.parquet"):
            continue
        name = q.rsplit("/", 1)[-1]
        df = duckdb.sql(f"SELECT * FROM '{q}/*.parquet'").df()
        flags = [c for c in df.columns
                 if c == "floor_met" or c.endswith("_ok") or c.endswith("_met")
                 or c.endswith("_routed") or c in
                 ("route_refused", "order_independent",
                  "brute_served", "delta_empty", "delta_appended")]
        if not flags:
            continue
        checked += 1
        for c in flags:
            vals = df[c].tolist()
            if not all(bool(v) for v in vals):
                bad += 1
                print(f"[FLOOR FAIL] {name}.{c} = {vals}")
            else:
                print(f"[ok] {name}.{c}")
    print(f"floor-flag queries checked: {checked}, failures: {bad}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf01"))
