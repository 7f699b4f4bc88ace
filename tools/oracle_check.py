"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, sorted column names, and values
(order-insensitive, exact — floats must be bit-identical, which the query
layer guarantees via decimal accumulation).

Usage: python tools/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from octopusdb_spark.queries import ORACLE_SQL, REGISTRY
from octopusdb_spark.session import TABLE_NAMES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    """Type-tagged canonical form.

    The driver's value hash distinguishes Decimal('12') from 12 from 12.0
    (round-1 lesson: DuckDB sum(INTEGER) → DECIMAL(38,0) drift slipped past
    a value-only compare because Decimal('12') == 12 in Python). Tag every
    numeric with its concrete type so the local gate is at least as strict
    as the driver's.
    """
    import decimal

    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, norm_cell(x)) for k, x in v.items())))
    if hasattr(v, "isoformat"):
        return ("dt", v.isoformat())
    return (type(v).__name__, v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    # None-safe, mixed-type-safe total order for the order-insensitive compare
    return sorted(normed, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    names = sys.argv[1:] or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        fn = REGISTRY[name]
        try:
            sdf = fn(get_spark("oracle-check"), SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        # The driver canonicalizes results via pandas sort_values, which
        # raises "unhashable type: 'list'" on array/map columns (round-2
        # graph_adjacency crash). No registry query may emit one.
        bad_types = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad_types:
            print(f"FAIL {name}: driver-incompatible array/map/struct cols: {bad_types}")
            n_fail += 1
            continue
        if name not in ORACLE_SQL:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            n_rowsonly += 1
            continue
        try:
            # Fetch through Arrow, exactly like the driver: DuckDB HUGEINT /
            # DECIMAL(38,0) surfaces as decimal128 here (round-2 lesson:
            # fetchall() converts HUGEINT to a plain Python int, which let
            # sum(BIGINT) drift pass locally while failing the driver hash).
            tbl = con.execute(ORACLE_SQL[name]).arrow()
            dcols = tbl.schema.names
            drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            s = norm_rows(scols, srows)
            d = norm_rows(dcols, drows)
            if s != d:
                diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
