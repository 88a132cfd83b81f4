"""Degenerate-input sweep: the hunt class that found the r7 shingles
ANSI crash and the r8 batch of DIVIDE_BY_ZERO / CAST_INVALID_INPUT /
NULL-payload crashes, made repeatable.

Builds a DOCTORED copy of an sf dir — the fixture tables plus the
degenerate rows the generators never emit — and runs every registry
query against it. The fixtures are clean by construction, so this is
the only harness that exercises the ANSI hazard class at the query
level: empty/whitespace/NULL documents, single-char and punctuation-only
text, a NULL-lang row, zero-norm and quantizes-to-zero embeddings,
NULL user/event_type/value/props events, a malformed-JSON props row,
an out-of-scheme source id, and (separately) zero-variance domains.

A crash is ALWAYS a finding: every operator defines its degenerate
behavior (valid masks, quarantines, floors, try_cast) instead of
letting ANSI mode decide. Row counts differing from the clean fixtures
are expected — the doctored rows are supposed to route through the
defined-degenerate paths.

Usage:
    python tools/degenerate_sweep.py [base_sf_dir] [query ...]
        base_sf_dir defaults to /root/testdata/sf0.001; with query
        names, ALSO runs the DuckDB differential oracle on the doctored
        tables for those queries (parity ON degenerate inputs — the
        strongest form of the check; r8 verified t05/v08/c05/c09/m02/
        m03/m04 this way).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/spark_graft_degenerate"

_PLAIN = ["region", "nation", "part"]


def build_doctored(base: str, dest: str) -> str:
    """Copy ``base`` and append the degenerate rows. DuckDB-side so the
    doctored parquet is independent of the engine under test."""
    import duckdb

    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    for t in _PLAIN:
        shutil.copy(f"{base}/{t}.parquet", f"{dest}/{t}.parquet")
    con = duckdb.connect()
    # TPC-H-side degenerates (r8 extension): NULL dates/keys/amounts,
    # negatives, orphan foreign keys. The NULL-date order with a REAL
    # price is the sharp probe: it found the window-frame divergence
    # (Spark nulls-first vs DuckDB NULLS LAST) in w03/w04/w05.
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/orders.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (99000001, NULL,    'O',  NULL,  NULL,                            NULL),
        (99000002, 9999999, 'F',  -12.5, TIMESTAMP '2023-06-15 00:00:00', '1-URGENT'),
        (99000003, 1,       NULL, 0.0,   TIMESTAMP '2023-06-16 00:00:00', '5-LOW'),
        (99000004, 1,       'O',  500.0, NULL,                            '3-MEDIUM')
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    ) TO '{dest}/orders.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/lineitem.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (99000001, 1, 1, 1, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (88888888, 1, 1, 1, 0.0,  0.0,  0.0,  0.0,  'R',  'F',  TIMESTAMP '2023-07-01 00:00:00'),
        (99000002, NULL, NULL, 2, -3.0, -1.0, 1.5,  -0.1, 'N',  'O',  TIMESTAMP '2023-07-02 00:00:00')
      ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
          l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    ) TO '{dest}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/customer.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (99000001, NULL, NULL, NULL, NULL),
        (99000002, 'Degenerate Dan', 999, -50.0, 'NOSEGMENT')
      ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    ) TO '{dest}/customer.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/supplier.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES (99000001, NULL, NULL, NULL)) t(s_suppkey, s_name, s_nationkey, s_acctbal)
    ) TO '{dest}/supplier.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/documents.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (900001, '', 'en', 'webz', 0),                 -- empty text
        (900002, '   ', 'en', 'webz', 3),              -- whitespace only
        (900003, NULL, 'en', 'webz', NULL),            -- NULL text
        (900004, 'x', 'xx', 'webz', 1),                -- 1 char, odd lang
        (900005, repeat('a ', 50), NULL, 'webz', 100), -- NULL lang, repetitive
        (900006, '!!! ??? ... ;;;', 'en', 'webz', 15), -- punctuation only
        (900010, 'lonely', 'en', 'solodomain', 6),     -- single-doc domain
        (900011, 'aaaa', 'en', 'uniformdom', 4),       -- zero-variance domain
        (900012, 'bbbb', 'en', 'uniformdom', 4)
      ) t(doc_id, text, lang, source, n_chars)
    ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
    """)
    dim = con.sql(f"SELECT len(embedding) FROM '{base}/embeddings.parquet' LIMIT 1").fetchone()[0]
    zeros = "[" + ", ".join(["0.0"] * dim) + "]"
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/embeddings.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (900001, CAST({zeros} AS FLOAT[]), 3),         -- zero-norm vector
        (900002, (SELECT list_transform(embedding, x -> CAST(x * 1e-9 AS FLOAT))
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 5), 2)
                                                       -- quantizes to zero
      ) t(vec_id, embedding, label)
    ) TO '{dest}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/events.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (9900001, TIMESTAMP '2024-01-15 12:00:00', NULL, 'purchase', 0.0, '{{}}'),
        (9900002, TIMESTAMP '2024-01-15 12:00:01', 999999, NULL, NULL, NULL),
        (9900003, TIMESTAMP '2024-01-15 12:00:02', 999999, 'purchase', -1.5, '{{"bad json'),
        (9900004, TIMESTAMP '2024-01-15 12:00:03', 999998, 'view', 1e15, '{{}}')
      ) t(event_id, ts, user_id, event_type, value, props)
    ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    return dest


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    dest = build_doctored(base, os.path.join(OUT, "sf"))
    print(f"doctored dir: {dest}")

    if names:
        # parity ON degenerate inputs: delegate to the differential
        # oracle harness against the doctored dir
        import subprocess

        return subprocess.call(
            [sys.executable, os.path.join(os.path.dirname(__file__), "oracle_check.py"), dest, *names]
        )

    from serverless_etl_reporting_pipeline_spark.plans import REGISTRY
    from serverless_etl_reporting_pipeline_spark.session import get_spark

    spark = get_spark()
    fails = []
    for name, q in REGISTRY.items():
        try:
            q.builder(spark, dest).collect()
        except Exception as e:  # noqa: BLE001 — a crash IS the finding
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}", flush=True)
        spark.catalog.clearCache()
    print(f"{len(REGISTRY) - len(fails)} ok, {len(fails)} crash")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
