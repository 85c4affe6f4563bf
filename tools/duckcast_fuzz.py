#!/usr/bin/env python3
"""Round-close DuckCast fuzz gate (round-15 verdict item 5; closing leg 5).

Generates ~10k SEEDED random decimals covering every band the
graft.DuckCast emission-twin model claims (DuckCast.scala scaladoc):
  - int64 storage (p <= 18), scales 0..6, both signs
  - hugeint storage (p = 38), scales 0..6, both signs, with magnitude
    bands: sub-2^53 (twin == native), 2^53..2^64 (first inexact zone,
    including the upper == -1 negative band), and multi-limb > 2^64 up
    to the digits(U)+s <= 38 cliff
then runs the REAL Scala twin on the real engine (graft.DuckCastFuzz)
and compares doubleToRawLongBits against DuckDB's own
CAST(DECIMAL -> DOUBLE), bit for bit.  Exit 0 = zero mismatches; any
mismatch (or any NULL from either side) exits 1 with the offending
cases printed -- so a silent duckdb upgrade or twin regression fails
the round close loudly.

Usage: python3 tools/duckcast_fuzz.py [n_cases]   (default 10000)
Runtime: ~1 min (sbt/JVM startup dominates).
"""
import csv
import random
import struct
import subprocess
import sys
import tempfile
import os

import duckdb

SEED = 160001  # round-16 gate seed; stable across runs by design


def fmt(unscaled: int, s: int) -> str:
    """Exact decimal literal for integer `unscaled` at scale s."""
    sign = "-" if unscaled < 0 else ""
    digits = str(abs(unscaled))
    if s == 0:
        return sign + digits
    if len(digits) <= s:
        digits = "0" * (s + 1 - len(digits)) + digits
    return f"{sign}{digits[:-s]}.{digits[-s:]}"


def gen_cases(n: int):
    rng = random.Random(SEED)
    cases = []  # (id, p, s, value_string)
    bands = [
        # (precision, lo, hi) magnitude bands for |unscaled|
        (18, 0, 2**53),                # int64 storage, exact zone
        (18, 2**53, 10**18 - 1),       # int64 storage, inexact zone
        (38, 0, 2**53),                # hugeint path, exact zone
        (38, 2**53, 2**64),            # one-limb zone (incl. up == -1)
        (38, 2**64, None),             # multi-limb zone (hi set per s)
    ]
    per = max(1, n // (len(bands) * 7 * 2))
    i = 0
    for (p, lo, hi0) in bands:
        for s in range(0, 7):
            # stay inside the documented digits(U)+s <= 38 cliff
            cap = 10 ** (38 - s - 1) if p == 38 else 10**18 - 1
            hi = min(hi0, cap) if hi0 is not None else cap
            if hi <= lo:
                continue
            for sign in (1, -1):
                for _ in range(per):
                    u = sign * rng.randint(lo, hi - 1)
                    cases.append((f"c{i}", p, s, fmt(u, s)))
                    i += 1
    # pin the spec's boundary constants on top of the random draw
    for (u, s, p) in [
        (9007199254740993, 0, 38), (2**64 - 1, 0, 38), (-(2**64 - 1), 0, 38),
        (-1, 0, 38), (2**64, 0, 38), (-(2**64), 0, 38),
        (646040157072047817590359375624573390, 0, 38),
        (5978102397715941016746, 4, 38), (-5978102397715941016747, 4, 38),
        (12345678901234567, 2, 18), (-9876543210987654, 4, 18),
    ]:
        cases.append((f"c{i}", p, s, fmt(u, s)))
        i += 1
    return cases


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cases = gen_cases(n)
    tmp = tempfile.mkdtemp(prefix="duckcast_fuzz_")
    cases_csv = os.path.join(tmp, "cases.csv")
    out_csv = os.path.join(tmp, "twin.csv")
    with open(cases_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "p", "s", "v"])
        w.writerows(cases)

    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.DuckCastFuzz {cases_csv} {out_csv}"],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(out_csv):
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        print("[duckcast-fuzz] FAIL: Scala twin runner did not complete")
        return 1

    twin = {}
    with open(out_csv) as f:
        for row in csv.DictReader(f):
            twin[row["id"]] = row["bits"]

    con = duckdb.connect()
    mism = []
    for (cid, p, s, v) in cases:
        (d,) = con.execute(
            f"SELECT CAST(CAST('{v}' AS DECIMAL({p},{s})) AS DOUBLE)"
        ).fetchone()
        want = str(struct.unpack("<q", struct.pack("<d", d))[0])
        got = twin.get(cid, "<missing>")
        if got != want:
            mism.append((cid, p, s, v, want, got))
    if mism:
        print(f"[duckcast-fuzz] FAIL: {len(mism)}/{len(cases)} bit mismatches")
        for m in mism[:20]:
            print("  ", m)
        return 1
    print(f"[duckcast-fuzz] PASS: {len(cases)} cases, 0 bit mismatches "
          f"(seed {SEED})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
