"""One-shot exhaustive case-fold parity sweep (r10 verdict ask #3).

The r10 multilingual hunt found ONE engine-divergent code point by
probing a hand-picked set (İ U+0130: Java's full case mapping gives
'i' + U+0307, DuckDB's utf8proc simple fold gives plain 'i') and
`operators/text.py casefold` pins it via a pre-lower translate. That
made the policy REACTIVE — a future divergent code point is only
caught if a probe doc happens to carry it. This sweep converts the
blacklist into a proven-complete set: enumerate EVERY assigned Unicode
code point (all planes, not just the BMP — supplementary-plane scripts
like Deseret/Osage/Adlam carry case mappings too), run each through
Spark `lower()` and through the engine's `casefold()` in four
contexts (isolated, word-initial, word-interior, word-final — full
case mappings can be CONTEXT-SENSITIVE, e.g. Greek final sigma), and
diff against DuckDB `lower()` on identical inputs.

Outputs two sets:
  raw-divergent    — code points where Spark lower() != DuckDB lower()
                     (the hazard inventory; MEASURED r11: 45 code
                     points — İ; word-final Σ via Java's contextual
                     final-sigma rule; U+2C2F + 7 Latin Extended-D
                     capitals JDK lowers but this utf8proc predates;
                     35 Vithkuqi capitals JDK ignores and this
                     utf8proc mis-maps by -0x20. The r10 hand-picked
                     probe had found exactly one of these.)
  pinned-divergent — code points where casefold() != the oracle-side
                     duck_casefold() fragment (the live contract;
                     expected: EMPTY — every divergent point is pinned
                     to the Unicode-standard simple fold on BOTH
                     engines by the shared 45-entry translate)

Run:  python tools/casefold_parity.py
The result is pinned by tests/test_operators.py::
test_casefold_full_unicode_parity (a chunked fast replay) and recorded
in PARITY.md; re-run this sweep when the container's JVM/DuckDB/ICU
versions change.
"""

from __future__ import annotations

import os
import sys
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def assigned_codepoints() -> list[int]:
    """Every assigned, non-surrogate code point (Python's unicodedata,
    category != Cn/Cs). NUL is dropped: it cannot round-trip through a
    C-string boundary and has no case mapping."""
    out = []
    for cp in range(1, 0x110000):
        cat = unicodedata.category(chr(cp))
        if cat not in ("Cn", "Cs"):
            out.append(cp)
    return out


CONTEXTS = (
    ("isolated", "{c}"),
    ("initial", "{c}a"),
    ("interior", "a{c}b"),
    ("final", "a{c}"),
)


def derive_divergent_sets(spark) -> tuple[list[int], list[int], "object"]:
    """THE derivation, callable from the CI-grade slow test (r11 verdict
    ask #6) as well as main(): every assigned code point x four word
    contexts through Spark lower()/casefold() and DuckDB
    lower()/duck_casefold() on identical inputs. Returns
    (raw_divergent, pinned_divergent, merged-frame) — the first is the
    hazard inventory a JVM/DuckDB Unicode-data bump can shift, the
    second must be empty while the shared pin table is complete."""
    import duckdb
    import pandas as pd

    from serverless_etl_reporting_pipeline_spark.operators.text import casefold, duck_casefold
    from pyspark.sql import functions as F

    cps = assigned_codepoints()
    rows = []
    for cp in cps:
        ch = chr(cp)
        for name, tpl in CONTEXTS:
            rows.append((cp, name, tpl.format(c=ch)))
    pdf = pd.DataFrame(rows, columns=["cp", "ctx", "s"])

    con = duckdb.connect()
    # lo: plain DuckDB lower (the raw hazard inventory); pin_ref: the
    # duck_casefold() fragment every oracle inlines (the live contract)
    duck = con.execute(
        f"SELECT cp, ctx, lower(s) AS lo, {duck_casefold('s')} AS pin_ref FROM pdf"
    ).df()

    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "cp",
            "ctx",
            F.lower("s").alias("raw_lo"),
            casefold("s").alias("pin_lo"),
        )
        .toPandas()
    )

    m = got.merge(duck, on=["cp", "ctx"], validate="one_to_one")
    raw_div = sorted(set(m.loc[m.raw_lo != m.lo, "cp"]))
    pin_div = sorted(set(m.loc[m.pin_lo != m.pin_ref, "cp"]))
    return raw_div, pin_div, m


def main() -> int:
    from serverless_etl_reporting_pipeline_spark.session import get_spark

    cps = assigned_codepoints()
    print(f"{len(cps)} assigned code points x {len(CONTEXTS)} contexts")
    raw_div, pin_div, m = derive_divergent_sets(get_spark())

    def show(tag: str, div: list[int]) -> None:
        print(f"{tag}: {len(div)} divergent code point(s)")
        for cp in div[:40]:
            ch = chr(cp)
            nm = unicodedata.name(ch, "<unnamed>")
            sub = m[(m.cp == cp) & ((m.raw_lo != m.lo) | (m.pin_lo != m.pin_ref))]
            ex = sub.iloc[0]
            print(
                f"  U+{cp:04X} {nm}: spark_raw={ex.raw_lo!r} "
                f"spark_pinned={ex.pin_lo!r} duck={ex.lo!r} "
                f"duck_pinned={ex.pin_ref!r} ctx={ex.ctx}"
            )
        if len(div) > 40:
            print(f"  ... and {len(div) - 40} more")

    show("raw-divergent (Spark lower vs DuckDB lower)", raw_div)
    show("pinned-divergent (casefold vs DuckDB lower)", pin_div)
    print(
        "CONTRACT "
        + ("HOLDS" if not pin_div else "BROKEN")
        + f": raw={[hex(c) for c in raw_div]} pinned={[hex(c) for c in pin_div]}"
    )
    return 0 if not pin_div else 1


if __name__ == "__main__":
    raise SystemExit(main())
