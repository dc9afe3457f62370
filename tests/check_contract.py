"""Local stand-in for the driver's correctness gate: runs every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compares row count, column names, and an order-insensitive value hash.

Usage: python tests/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from sparkcrawl.session import get_spark

    spark = get_spark("contract-check", cores=4, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = value_hash(scols, srows) == value_hash(dcols, drows)
        if ok_count and ok_cols and ok_hash:
            print(f"ok   {name}: {len(srows)} rows match")
        else:
            failures.append(name)
            print(
                f"FAIL {name}: rows {len(srows)}/{len(drows)} "
                f"cols {scols} vs {dcols} hash_match={ok_hash}"
            )
            if ok_count and ok_cols and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted(
                    "\x01".join(_canon(r[i]) for i in order) for r in srows
                )
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted(
                    "\x01".join(_canon(r[i]) for i in dorder) for r in drows
                )
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"  spark : {a[:160]}")
                        print(f"  duckdb: {b[:160]}")
                        break
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
