"""Local mirror of the driver's differential-oracle check.

Runs every registry query on Spark and its oracle SQL on DuckDB against
the same parquet tables, then compares row count, column names/types and
values (order-insensitive). Floats compare with tight tolerance and the
max deviation is reported — the driver hashes values, so any non-trivial
float deviation here predicts a hash mismatch there.

Usage:
    python tools/oracle_check.py [sf_dir] [query ...] [--json PATH]

``--json PATH`` additionally writes a driver-shaped record per query
({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err})
— what `tools/degenerate_sweep.py --emit` records as DEGEN_r{N}.json so
degenerate-input parity regressions are caught by artifact diff, not by
re-running the hunt (round-8 verdict ask #3).
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY
from serverless_etl_reporting_pipeline_spark.session import get_spark
from serverless_etl_reporting_pipeline_spark.sources.reader import TABLES


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, date):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _sort_key(row):
    out = []
    for v in row:
        if v is None:
            out.append((0, ""))
        elif isinstance(v, float):
            out.append((1, f"{v:.6f}"))
        elif isinstance(v, (tuple, list)):
            out.append((2, str(v)))
        else:
            out.append((1, str(v)))
    return out


# DuckDB result type (upper, parametrized stripped) → Spark dtypes the driver's
# value-hash treats as equivalent. A pair outside this table on a numeric /
# temporal column is a driver hash mismatch even when every value compares
# equal — DuckDB widens sum(BIGINT) to HUGEINT and avg-of-DECIMAL to DECIMAL,
# and the driver hashes the arrow type alongside the value (r4: c07/k01/k02
# were value-identical yet hash-red purely on HUGEINT vs BIGINT).
_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_TYPE_OK = {
    # Integer WIDTH differences are driver-green (r4: t13 duck BIGINT vs spark
    # int, hash_match=true) — the driver compares converted values, and every
    # duck width ≤64 bits converts losslessly. HUGEINT does not (pandas →
    # float64/object), hence its absence below.
    "TINYINT": _INTEGRAL,
    "SMALLINT": _INTEGRAL,
    "INTEGER": _INTEGRAL,
    "BIGINT": _INTEGRAL,
    "FLOAT": {"float", "double"},
    "DOUBLE": {"float", "double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
    # HUGEINT / DECIMAL deliberately absent: DuckDB only produces them by
    # widening, and Spark never emits them — always CAST the oracle instead.
}


def _duck_base_type(t: str) -> str:
    t = str(t).upper()
    return t.split("(", 1)[0].strip()


def type_check(spark_dtypes, duck_cols, duck_types):
    """Flag oracle result types the driver would hash differently from Spark's.

    Returns a list of 'col: duck_type vs spark_type' strings (empty = clean).
    List/struct columns are skipped (compared value-wise elsewhere).
    """
    spark_by_col = dict(spark_dtypes)
    bad = []
    for col, dt in zip(duck_cols, duck_types):
        st = spark_by_col.get(col)
        if st is None:
            continue
        base = _duck_base_type(dt)
        if base.endswith("[]") or base.startswith(("STRUCT", "MAP", "UNION", "LIST")):
            continue
        if st.startswith(("array", "struct", "map")):
            continue
        ok = _TYPE_OK.get(base)
        if ok is None or st not in ok:
            bad.append(f"{col}: duck {dt} vs spark {st}")
    return bad


def compare(spark_rows, duck_rows, spark_cols, duck_cols):
    """Returns (ok, message, max_float_dev)."""
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}", None
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}", None
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted((tuple(_norm_cell(r[i]) for i in order) for r in spark_rows), key=_sort_key)
    d = sorted((tuple(_norm_cell(r[i]) for i in dorder) for r in duck_rows), key=_sort_key)
    max_dev = 0.0
    for ri, (sr, dr) in enumerate(zip(s, d)):
        for ci, (a, b) in enumerate(zip(sr, dr)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                dev = abs(a - b)
                rel = dev / max(1.0, abs(a), abs(b))
                max_dev = max(max_dev, rel)
                if rel > 1e-9:
                    return False, f"float mismatch row {ri} col {sorted(spark_cols)[ci]}: {a!r} vs {b!r}", max_dev
            elif isinstance(a, tuple) and isinstance(b, tuple):
                if len(a) != len(b):
                    return False, f"array len mismatch row {ri}: {len(a)} vs {len(b)}", max_dev
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        if abs(x - y) / max(1.0, abs(x), abs(y)) > 1e-6:
                            return False, f"array value mismatch row {ri}: {x!r} vs {y!r}", max_dev
                    elif x != y:
                        return False, f"array value mismatch row {ri}: {x!r} vs {y!r}", max_dev
            elif a != b:
                return False, f"value mismatch row {ri} col {sorted(spark_cols)[ci]}: {a!r} vs {b!r}", max_dev
    return True, f"{len(s)} rows", max_dev


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: --json PATH", file=sys.stderr)
            return 2
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    session_tz = None
    if "--session-tz" in args:
        # HOSTILE-SESSION mode (r11 verdict ask #2): run the whole
        # differential under a shifted spark.sql.session.timeZone while
        # the DuckDB oracle stays UTC-naive. Every engine result is
        # timestamp_ntz / literal-free by contract (functions/timelit),
        # so any residual session-zoned literal or coercion diverges
        # loudly here instead of silently shifting values by the zone
        # offset in production. Use a DST zone (America/New_York) so
        # dates on both sides of a transition exercise both offsets.
        i = args.index("--session-tz")
        if i + 1 >= len(args):
            print("usage: --session-tz ZONE", file=sys.stderr)
            return 2
        session_tz = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    selected = {n: REGISTRY[n] for n in names} if names else REGISTRY

    spark = get_spark()
    if session_tz:
        spark.conf.set("spark.sql.session.timeZone", session_tz)
        print(f"session timezone: {session_tz} (hostile-session mode; oracle stays UTC-naive)")
    con = duck_connect(sf_dir)
    n_pass = n_fail = n_nooracle = 0
    exact_warn = []
    records: dict[str, dict] = {}

    def record(name, *, rows=None, schema=None, values=None, s_rows=None, d_rows=None, err=None):
        records[name] = {
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": values,
            "spark_rows": s_rows,
            "oracle_rows": d_rows,
            "err": err,
        }

    for name, q in sorted(selected.items()):
        t0 = time.time()
        try:
            sdf = q.builder(spark, sf_dir)
            spark_cols = sdf.columns
            spark_dtypes = sdf.dtypes
            spark_rows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            record(name, rows=False, schema=False, values=False, err=f"spark: {str(e)[:300]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"---- {name}: no oracle, {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            record(name, s_rows=len(spark_rows))
            n_nooracle += 1
            continue
        try:
            rel = con.sql(q.oracle)
            duck_cols = list(rel.columns)
            duck_types = [str(t) for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            record(name, rows=False, schema=False, values=False, s_rows=len(spark_rows),
                   err=f"duckdb: {str(e)[:300]}")
            n_fail += 1
            continue
        ok, msg, max_dev = compare(spark_rows, duck_rows, spark_cols, duck_cols)
        schema_ok = sorted(spark_cols) == sorted(duck_cols) and not type_check(
            spark_dtypes, duck_cols, duck_types
        )
        if ok and not schema_ok:
            ok, msg = False, "type divergence (driver hashes types)"
        status = "ok  " if ok else "FAIL"
        devnote = f" maxreldev={max_dev:.1e}" if max_dev else ""
        print(f"{status} {name}: {msg}{devnote} ({time.time()-t0:.1f}s)")
        record(
            name,
            rows=len(spark_rows) == len(duck_rows),
            schema=schema_ok,
            values=bool(ok),
            s_rows=len(spark_rows),
            d_rows=len(duck_rows),
            err=None if ok else msg,
        )
        if ok and max_dev and max_dev > 1e-12:
            exact_warn.append((name, max_dev))
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} ok, {n_fail} fail, {n_nooracle} rows-only")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    if exact_warn:
        print("float deviations (tolerated here, may flip driver hash):")
        for name, dev in exact_warn:
            print(f"  {name}: {dev:.2e}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
