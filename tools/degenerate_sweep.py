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
an out-of-scheme source id, (separately) zero-variance domains,
duplicate ids, multilingual/casefold probes (İ + the r11 exhaustive-
sweep classes), extreme timestamps/values, ADVERSARIAL JSON (lone
surrogate escapes, 1500-deep nesting, duplicate keys, overflow and
float-rendered numbers — p06's r11 contract), and adversarial
text->binary payloads (embedded NUL, C0/C1 controls, a ~1 MB
oversized document).

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
    python tools/degenerate_sweep.py --emit DEGEN_r9.json [base_sf_dir]
        full-registry ORACLE parity on the doctored tables, recorded as
        a driver-shaped JSON artifact (rows/schema/hash per query) — the
        per-round DEGEN_r{N}.json next to CORRECTNESS_r{N}.json, so a
        degenerate-parity regression shows up as an artifact diff
        instead of needing the hunt re-run (round-8 verdict ask #3).
        Part of the pre-commit path alongside tools/oracle_check.py.
    python tools/degenerate_sweep.py --empty [base_sf_dir] [query ...]
        the ZERO-ROW-TABLE class (r9): schema-only copies of every
        table — the empty day partition / fresh lake every 100 TB
        pipeline eventually feeds a query. Same crash-sweep / parity /
        --emit semantics, against the empty dir.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/spark_graft_degenerate"

_PLAIN = ["part"]

# Spark declared type → DuckDB DESCRIBE type, for pinning the fixture
# schemas below. TIMESTAMP_NS normalizes to TIMESTAMP (DuckDB surfaces
# parquet ns-timestamps either way depending on version).
_SPARK2DUCK = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "string": "VARCHAR",
    "double": "DOUBLE",
    "float": "FLOAT",
    "timestamp_ntz": "TIMESTAMP",
    "array<float>": "FLOAT[]",
}


def _assert_base_schemas(base: str) -> None:
    """Pin the TESTDATA.md schemas EXPLICITLY (r9 verdict ask #6):
    `build_empty`/`build_doctored` otherwise derive every schema from
    the base parquet at sweep time, so a reader hard-coding a column
    that silently vanished from TESTDATA would still sweep green. A
    renamed/retyped/reordered fixture column now trips loudly here
    instead."""
    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS

    con = duckdb.connect()
    for t, st in SCHEMAS.items():
        # .get(): an unmapped Spark type (a future date/boolean fixture
        # column) must surface as the loud drift diagnostic below, not
        # a bare KeyError (r10 ADVICE)
        declared = [
            (f.name, _SPARK2DUCK.get(f.dataType.simpleString(), f"<unmapped:{f.dataType.simpleString()}>"))
            for f in st.fields
        ]
        actual = [
            (name, "TIMESTAMP" if typ == "TIMESTAMP_NS" else typ)
            for name, typ, *_ in con.sql(
                f"DESCRIBE SELECT * FROM '{base}/{t}.parquet'"
            ).fetchall()
        ]
        if declared != actual:
            raise AssertionError(
                f"fixture schema drift in {base}/{t}.parquet:\n"
                f"  declared (sources/schemas.py): {declared}\n"
                f"  on disk:                       {actual}"
            )


def build_doctored(base: str, dest: str) -> str:
    """Copy ``base`` and append the degenerate rows. DuckDB-side so the
    doctored parquet is independent of the engine under test."""
    import duckdb

    _assert_base_schemas(base)
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    for t in _PLAIN:
        shutil.copy(f"{base}/{t}.parquet", f"{dest}/{t}.parquet")
    con = duckdb.connect()
    # TPC-H-side degenerates (r8 extension): NULL dates/keys/amounts,
    # negatives, orphan foreign keys. The NULL-date order with a REAL
    # price is the sharp probe: it found the window-frame divergence
    # (Spark nulls-first vs DuckDB NULLS LAST) in w03/w04/w05.
    # r9 extension — ZERO-ROW GROUPS on the dim side: a nation with no
    # customers (NULL name + NULL region) and a named zero-customer
    # nation stress the left-join-keep-empty path (j03) and every
    # dim-driven group frame; a NULL-name region with no nations does
    # the same one level up (j01's dim chain).
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/nation.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (990, NULL, NULL),
        (991, 'EMPTYLAND', 0)
      ) t(n_nationkey, n_name, n_regionkey)
    ) TO '{dest}/nation.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/region.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES (99, NULL)) t(r_regionkey, r_name)
    ) TO '{dest}/region.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * FROM '{base}/orders.parquet'
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (99000001, NULL,    'O',  NULL,  NULL,                            NULL),
        (99000002, 9999999, 'F',  -12.5, TIMESTAMP '2023-06-15 00:00:00', '1-URGENT'),
        (99000003, 1,       NULL, 0.0,   TIMESTAMP '2023-06-16 00:00:00', '5-LOW'),
        (99000004, 1,       'O',  500.0, NULL,                            '3-MEDIUM'),
        -- r9: NULL custkeys inside the d04/d05 year slice — EXCEPT/
        -- INTERSECT must agree on NULL-as-a-set-element in both engines
        (99000005, NULL,    'F',  10.0,  TIMESTAMP '1995-03-01 00:00:00', '2-HIGH'),
        (99000006, NULL,    'O',  11.0,  TIMESTAMP '1996-03-01 00:00:00', '2-HIGH')
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
      UNION ALL BY NAME
      -- r10: a DUPLICATE o_orderkey with a conflicting price — row
      -- semantics everywhere orders aggregate (both engines see both
      -- rows; no orders query keys a window on o_orderkey alone)
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 7.5 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM '{base}/orders.parquet' WHERE o_orderkey = 32
      UNION ALL BY NAME
      -- r10: extreme order dates + a half-cent amount + negative zero
      -- (parity-clean on first probe; pinned)
      SELECT * FROM (VALUES
        (99100001, 1, 'O', 0.005, TIMESTAMP '0001-01-01 00:00:00', '1-URGENT'),
        (99100002, 1, 'O', -0.0,  TIMESTAMP '9999-12-31 00:00:00', '5-LOW')
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
      UNION ALL BY NAME
      -- r10: DUPLICATE ids (the re-ingested-file fault). Contract: a
      -- doc_id names a document; extra rows are shards — token
      -- profiles/shingle sets/simhash merge them, per-row transforms
      -- emit per row, and every id-assumed-unique sort key carries a
      -- content tie-break (PARITY.md r10). One CONFLICTING dup and one
      -- IDENTICAL dup (exact re-ingest).
      SELECT doc_id, 'an entirely different conflicting shard body ' || text AS text,
             lang, source, n_chars
      FROM '{base}/documents.parquet' WHERE doc_id = 3
      UNION ALL BY NAME
      SELECT * FROM '{base}/documents.parquet' WHERE doc_id = 7
      UNION ALL BY NAME
      -- r10: MULTILINGUAL / multibyte text — the probe that found the
      -- İ (U+0130) case-fold divergence (Java full mapping i+U+0307 vs
      -- utf8proc simple fold 'i'; operators/text.py casefold pins the
      -- simple fold). ß/ẞ, CJK (not \w — zero word tokens), emoji/ZWJ,
      -- Cyrillic (like CJK, NOT \w — both engines' \w is ASCII-only,
      -- re-verified r11: zero word tokens in both), combining vs
      -- precomposed accents,
      -- NBSP/em-space/ZWSP (not \s and not \w: glued tokens) measured
      -- engine-identical. NOTE 910005 carries Σ only word-INITIALLY,
      -- which is why this probe missed Java's contextual final-sigma
      -- rule — found r11 by the exhaustive tools/casefold_parity.py
      -- sweep and probed end-to-end by 910009 below.
      SELECT * FROM (VALUES
        (910001, 'Grüße aus München — straße STRASSE ß ẞ', 'de', 'webz', 40),
        (910002, 'İstanbul ILIK ılık Iı İi dotted', 'tr', 'webz', 31),
        (910003, '日本語のテキスト、中文文本，한국어 텍스트 mixed with ASCII words', 'zh', 'webz', 40),
        (910004, 'emoji 😀😀 text 🎉 with zwj 👨\u200d👩\u200d👧 family', 'en', 'webz', 35),
        (910005, 'café résumé naïve coöperate Ωμέγα ΣΙΓΜΑ σίγμα ς', 'fr', 'webz', 47),
        (910006, 'а б в г русский текст кириллица ЁёЙй', 'ru', 'webz', 36),
        (910007, 'combining á é vs precomposed \u00e1 \u00e9', 'en', 'webz', 35),
        (910008, '\u00a0nbsp and em-space\u2003\u200bzwsp separators', 'en', 'webz', 30),
        -- r11: the remaining casefold-divergence classes from the
        -- exhaustive sweep, probed END-TO-END: word-FINAL capital
        -- sigma (Java contextual \u03c2 vs utf8proc simple fold \u03c3),
        -- Unicode-version-skew capitals Java lowers but this utf8proc
        -- keeps (U+2C2F, U+A7C0), and Vithkuqi (U+10570 capital, which
        -- this utf8proc mis-maps by -0x20 into Caucasian Albanian,
        -- plus its U+10597 small form). All 45 divergent code points
        -- are pinned by the operators/text.py translate, mirrored in
        -- every oracle's inlined duck_casefold fragment.
        (910009, '\u039f\u0394\u03a5\u03a3\u03a3\u0395\u03a5\u03a3 \u039a\u0391\u039b\u039f\u03a3 \u03a3 \u2c2f\u2c5f \ua7c0\ua7c1 \U00010570\U00010597 mixed', 'el', 'webz', 40),
        -- r12: VERTICAL TAB (U+000B) -- the one code point where Java
        -- regex backslash-s and RE2 backslash-s disagree (probed against
        -- FF, FS/GS/RS/US, NEL, NBSP, LS/PS, ZWSP: all others agree).
        -- Before the explicit tab/LF/VT/FF/CR/space class was written on
        -- both engines, this doc normalized to 'vertical tab' vs
        -- 'verticaltab' and flipped t02/t06/c04 fingerprints and t05's
        -- punct count.
        (910010, 'vertical' || chr(11) || 'tab body and the of to is in a', 'en', 'webz', 40)
      ) t(doc_id, text, lang, source, n_chars)
      UNION ALL BY NAME
      -- r11: ADVERSARIAL TEXT->BINARY payloads (m01-m04 encode text as
      -- the binary payload, so the payload faults stage through text):
      -- an embedded NUL byte, C0 control bytes, DEL + C1 controls
      -- (all valid UTF-8 \u2014 the classes a scraped corpus actually
      -- carries), and an OVERSIZED ~1 MB document, 300x the largest
      -- fixture doc (the size-bound probe for every Arrow kernel and
      -- md5/token path). The 1 MB size first HUNG the sweep: the
      -- duck-side shingle oracles' lateral UNNEST carried the doc's
      -- full 174k-token list into every unnested row \u2014 O(tokens^2)
      -- oracle memory (~30 GB, 309 s for ONE doc). All 11 oracles now
      -- build shingles with UNNEST(list_transform(...)) instead
      -- (0.11 s same doc, identical results), so the probe runs at
      -- full size.
      SELECT * FROM (VALUES
        (920001, 'pre' || chr(0) || 'post nul byte payload', 'en', 'webz', 22),
        (920002, chr(1) || chr(2) || chr(31) || ' control bytes mixed with words', 'en', 'webz', 34),
        (920003, repeat('oversized payload block ', 43690), 'en', 'webz', 1048560),
        (920004, chr(127) || chr(128) || chr(159) || ' del and c1 controls', 'en', 'webz', 23),
        -- r11 ReDoS probe: a 32 KB UNBROKEN alphanumeric run followed
        -- by a real email — the shape that made the plain email regex
        -- O(n^2) on Spark's backtracking matcher (35 s for one 80 KB
        -- run) while DuckDB's RE2 stayed linear. c01's engine pattern
        -- now carries the lookbehind run-start anchor; this row keeps
        -- the sweep itself the regression test.
        (920005, repeat('x1', 16384) || ' contact me a@b.co end', 'en', 'webz', 32790)
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
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 5), 2),
                                                       -- quantizes to zero
        -- r9: corrupt rows — a NULL vector and a NULL label. Contract:
        -- NULL embeddings are EXCLUDED from every vector operator on
        -- both engines (the oracles' nrm > 0 predicates already skip
        -- them: NULL is not > 0); a NULL label is just another group.
        (900003, NULL, 1),
        (900004, (SELECT embedding FROM '{base}/embeddings.parquet' WHERE vec_id = 7), NULL),
        -- r9: RAGGED rows — one short (40 dims), one long (100 dims).
        -- Contract: a vector off the operator's dimension (the query's
        -- for single-query ops, the corpus MODAL len for pair/index
        -- ops) is corrupt like NULL — excluded from every kernel,
        -- centroid, posting, and assignment on both engines (numpy's
        -- stack throws on it; DuckDB's list_zip would silently
        -- NULL-pad). v03/v08 are REPORTS and surface the extra dims.
        (900005, (SELECT list_transform(embedding[1:40], x -> CAST(x AS FLOAT))
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 11), 4),
        (900006, (SELECT list_transform(list_concat(embedding, embedding[1:36]),
                                        x -> CAST(x AS FLOAT))
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 12), 5),
        -- r9: a NULL COMPONENT inside a correct-length vector — the
        -- third corrupt class. DuckDB's list_sum would skip the NULL
        -- (keeping the row with a truncated dot) while Arrow hands the
        -- kernels NaN (dropping it, or worse: a garbage int8 score in
        -- the sq8 cut). Contract: excluded everywhere, both engines.
        (900007, (SELECT list_transform(embedding[1:31], x -> CAST(x AS FLOAT))
                         || [CAST(NULL AS FLOAT)]
                         || list_transform(embedding[33:64], x -> CAST(x AS FLOAT))
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 13), 6),
        -- r9: NON-FINITE components (NaN, +Inf) — DuckDB orders NaN
        -- above every value so a bare nrm > 0 would KEEP what the
        -- kernels' NaN masks drop, and an Inf norm passed `> 0` until
        -- the isfinite masks. Excluded everywhere; the v03/v08 reports
        -- drop the corrupt COMPONENT (the ANSI bigint cast would raise)
        (900008, (SELECT list_transform(embedding[1:31], x -> CAST(x AS FLOAT))
                         || [CAST('NaN' AS FLOAT)]
                         || list_transform(embedding[33:64], x -> CAST(x AS FLOAT))
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 14), 7),
        (900009, (SELECT list_transform(embedding[1:31], x -> CAST(x AS FLOAT))
                         || [CAST('Infinity' AS FLOAT)]
                         || list_transform(embedding[33:64], x -> CAST(x AS FLOAT))
                  FROM '{base}/embeddings.parquet' WHERE vec_id = 15), 8)
      ) t(vec_id, embedding, label)
      UNION ALL BY NAME
      -- r10: DUPLICATE vec_ids. Contract: per-ROW semantics — a dup id
      -- is two points (FAISS-style); write paths file both, read paths
      -- rank the per-row union per qid (PARITY.md r10). A conflicting
      -- QUERY-side dup (vec 5, negated), a conflicting CORPUS-side dup
      -- (vec 20, negated), and an identical corpus dup (vec 9).
      SELECT vec_id, list_transform(embedding, x -> CAST(-x AS FLOAT)) AS embedding, label
      FROM '{base}/embeddings.parquet' WHERE vec_id IN (5, 20)
      UNION ALL BY NAME
      SELECT * FROM '{base}/embeddings.parquet' WHERE vec_id = 9
      UNION ALL BY NAME
      -- r11: EXTREME-MAGNITUDE components. A 1e30 component CRASHED
      -- five training-path queries with CAST_OVERFLOW (its 1e-6
      -- quantization exceeds BIGINT); the contract now treats
      -- |x| > 1e12 (operators/vectors.py COMPONENT_BOUND) exactly
      -- like a NaN component on every path — kernel paths via the
      -- quantize_np NaN mapping, explode paths via
      -- _has_corrupt_component, oracles via abs(x) > 1e12.
      SELECT 930001 AS vec_id,
             list_transform(embedding, x -> CAST(1000000000000000.0 AS FLOAT)) AS embedding,
             2 AS label
      FROM '{base}/embeddings.parquet' WHERE vec_id = 11
      UNION ALL BY NAME
      -- one huge component inside an otherwise-clean vector: the
      -- whole VECTOR is corrupt for kernels (NaN norm), the single
      -- COMPONENT is skipped by the per-component centroid paths
      SELECT 930002 AS vec_id,
             list_concat([CAST(1e30 AS FLOAT)], embedding[2:]) AS embedding,
             3 AS label
      FROM '{base}/embeddings.parquet' WHERE vec_id = 13
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
        (9900004, TIMESTAMP '2024-01-15 12:00:03', 999998, 'view', 1e15, '{{}}'),
        -- r9 (ADVICE): NULL-ts PURCHASES — rows the s04 staged drain /
        -- e08 watermark split can never route; the oracles' explicit
        -- ts IS NOT NULL pins that contract instead of masking it.
        -- 999999 also has REAL purchases, so a kept NULL ts would sit
        -- at opposite ends of every per-user time frame per engine
        -- (Spark nulls-first vs DuckDB NULLS LAST) — the sharp probe
        -- that found the e01/e08/s01/s03 divergences
        (9900005, NULL, 999997, 'purchase', 7.5, '{{}}'),
        (9900006, NULL, 999999, 'purchase', 3.25, '{{}}'),
        -- r9: a NaN metric value — the double-column corruption the
        -- vector hunt covered for embeddings. Spark and DuckDB share
        -- the NaN-greatest ordering convention, but aggregates and
        -- ANSI casts do not forgive: sum/avg poison to NaN, min/max
        -- return NaN as the maximum, and CAST(NaN AS BIGINT) raises
        (9900007, TIMESTAMP '2024-01-15 12:00:04', 999996, 'view', CAST('NaN' AS DOUBLE), '{{}}')
      ) t(event_id, ts, user_id, event_type, value, props)
      UNION ALL BY NAME
      -- r10: DUPLICATE event_ids — a conflicting measurement (value
      -- 2x+1) and an exact re-ingest. The OHLC/keep-first tie-breaks
      -- now carry the value so the kept row is deterministic.
      SELECT event_id, ts, user_id, event_type, value * 2 + 1 AS value, props
      FROM '{base}/events.parquet' WHERE event_id = 11
      UNION ALL BY NAME
      SELECT * FROM '{base}/events.parquet' WHERE event_id = 13
      UNION ALL BY NAME
      -- r10: EXTREME timestamps and values — measured parity-clean on
      -- first probe (no fix needed), pinned so it stays true: year
      -- 1900/9999 bounds, a pre-epoch second, the leap-day last-us,
      -- negative zero, a denormal-adjacent 1e-300, and the largest
      -- value whose cents fit a BIGINT.
      SELECT * FROM (VALUES
        (9910001, TIMESTAMP '1900-01-01 00:00:00',        999995, 'view', 1.0, '{{}}'),
        (9910002, TIMESTAMP '9999-12-31 23:59:59.999999', 999995, 'view', 2.0, '{{}}'),
        (9910003, TIMESTAMP '1969-12-31 23:59:59',        999995, 'view', 3.0, '{{}}'),
        (9910004, TIMESTAMP '2024-02-29 23:59:59.999999', 999995, 'view', 4.0, '{{}}'),
        (9910005, TIMESTAMP '2024-01-15 12:00:05',        999994, 'view', -0.0, '{{}}'),
        (9910006, TIMESTAMP '2024-01-15 12:00:06',        999994, 'view', 1e-300, '{{}}'),
        (9910007, TIMESTAMP '2024-01-15 12:00:07',        999994, 'view', 92233720368547.0, '{{}}')
      ) t(event_id, ts, user_id, event_type, value, props)
      UNION ALL BY NAME
      -- r11: ADVERSARIAL JSON (the parser-divergence hunt, p06's
      -- contract): valid vs LONE surrogate escapes (lenient Jackson
      -- accepts the lone one, yyjson rejects it — engine rlike guard),
      -- nesting at 200 (parses both) and 1500 (Jackson's 1000 bound vs
      -- unbounded yyjson — the shared >256-bracket resource bound
      -- rejects it on both), duplicate keys, an overflowing integer
      -- (engines RENDER it differently: literal digits vs '1e26' —
      -- NULL under the integer-literal regex either way), float-
      -- rendered '7.0' (DuckDB TRY_CAST would read 7, Spark NULL —
      -- the regex pins integer literals only), an array value,
      -- leading whitespace, and spaces inside the value string.
      SELECT * FROM (VALUES
        (9920001, TIMESTAMP '2024-01-15 12:01:00', 999993, 'view', 1.0, '{{"s":"\\ud83d\\ude00 pair","k":"11"}}'),
        (9920002, TIMESTAMP '2024-01-15 12:01:01', 999993, 'view', 1.0, '{{"s":"\\ud800 lone","k":"13"}}'),
        (9920003, TIMESTAMP '2024-01-15 12:01:02', 999993, 'view', 1.0,
            '{{"k":21,"d":' || repeat('{{"d":', 199) || '{{}}' || repeat('}}', 199) || '}}'),
        (9920004, TIMESTAMP '2024-01-15 12:01:03', 999993, 'view', 1.0,
            '{{"k":23,"d":' || repeat('{{"d":', 1499) || '{{}}' || repeat('}}', 1499) || '}}'),
        (9920005, TIMESTAMP '2024-01-15 12:01:04', 999993, 'view', 1.0, '{{"k":"1","k":"2"}}'),
        (9920006, TIMESTAMP '2024-01-15 12:01:05', 999993, 'view', 1.0, '{{"k":99999999999999999999999999}}'),
        (9920007, TIMESTAMP '2024-01-15 12:01:06', 999993, 'view', 1.0, '{{"k":7.0}}'),
        (9920008, TIMESTAMP '2024-01-15 12:01:07', 999993, 'view', 1.0, '{{"k":[5]}}'),
        (9920009, TIMESTAMP '2024-01-15 12:01:08', 999993, 'view', 1.0, ' {{"k":17}}'),
        (9920010, TIMESTAMP '2024-01-15 12:01:09', 999993, 'view', 1.0, '{{"k":" 19 "}}'),
        -- r12 (ADVICE): backslash-parity shapes for the lone-surrogate
        -- guard. ESCAPED backslash + literal "ud800" text is VALID
        -- JSON (k=25 must contribute — the old lookaround guard
        -- false-positived here); escaped backslash followed by a REAL
        -- lone low escape is invalid (rejected both); a real pair
        -- split by a literal backslash is two lone escapes (rejected
        -- both — the stripped pair must not create false adjacency).
        (9920011, TIMESTAMP '2024-01-15 12:01:10', 999993, 'view', 1.0, '{{"s":"\\\\ud800 esc","k":"25"}}'),
        (9920012, TIMESTAMP '2024-01-15 12:01:11', 999993, 'view', 1.0, '{{"s":"\\\\\\udc00","k":"27"}}'),
        (9920013, TIMESTAMP '2024-01-15 12:01:12', 999993, 'view', 1.0, '{{"s":"\\ud800\\\\\\udc00","k":"29"}}')
      ) t(event_id, ts, user_id, event_type, value, props)
    ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    return dest


def build_empty(base: str, dest: str) -> str:
    """Schema-only copies of EVERY table — the zero-row-input class (an
    empty day partition, a fresh lake, a filter that matched nothing
    upstream). DuckDB-side, like `build_doctored`."""
    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.reader import TABLES

    _assert_base_schemas(base)
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{base}/{t}.parquet' WHERE 1=0) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    return dest


def main() -> int:
    args = sys.argv[1:]
    emit = None
    if "--emit" in args:
        i = args.index("--emit")
        if i + 1 >= len(args):
            print("usage: --emit PATH", file=sys.stderr)
            return 2
        emit = args[i + 1]
        args = args[:i] + args[i + 2:]
    empty = "--empty" in args
    if empty:
        args.remove("--empty")
    base = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if empty:
        dest = build_empty(base, os.path.join(OUT, "sf_empty"))
        print(f"empty dir: {dest}")
    else:
        dest = build_doctored(base, os.path.join(OUT, "sf"))
        print(f"doctored dir: {dest}")

    if names or emit:
        # parity ON degenerate inputs: delegate to the differential
        # oracle harness against the doctored dir (all queries when
        # emitting the per-round artifact)
        import subprocess

        cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "oracle_check.py"), dest, *names]
        if emit:
            cmd += ["--json", emit]
        return subprocess.call(cmd)

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
