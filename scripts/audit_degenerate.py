#!/usr/bin/env python
"""Degenerate-corpus equivalence audit: run every oracle-checked
query AND its DuckDB oracle against EMPTY tables (0 rows, exact
physical parquet schemas copied from sf0.001) and compare.

Why this exists: ADVICE r6 item 4 found a latent engine/oracle
asymmetry that only manifests on inputs the shipped corpora never
produce (BPE's pair table emptying mid-training). That class of bug —
keyless aggregates yielding a NULL row where SQL's LIMIT 1 yields
zero rows, driver-side build probes throwing on empty frames,
quantile bucketing with no data — is invisible to every sf-corpus
check by construction. The empty corpus is the universal degenerate
input: every slice, filter, and batch predicate produces 0 rows, so
every degenerate lane runs at once.

This is an AUDIT, not a gate: a mismatch here is a latent asymmetry
to triage (fix, or document why the input is unreachable), not a
correctness failure on the graded corpora. Exit code is the number
of non-PASS results.

    python scripts/audit_degenerate.py [--only q190,q191]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


#: (table, column) pairs flattened by --constant-measures: every
#: value becomes the column's FIRST value, so every variance, range,
#: and z-score denominator over them is exactly zero at full scale
CONSTANT_MEASURES = (
    ("orders", "o_totalprice"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("events", "value"),
)

#: rows negated by --negated-measures: every 3rd row of each
#: CONSTANT_MEASURES column flips sign — the refunds/returns-day
#: corpus. Mixed signs (not a blanket negation) so sums cross zero,
#: min/max straddle it, and every integer-division / modulo /
#: leading-digit / log-sqrt path sees a negative operand with real
#: positive rows still present. Engines disagree about negative
#: operands more than anything else in SQL (truncating vs flooring
#: DIV, dividend- vs divisor-signed %), so this axis audits that the
#: queries only use the sign-agnostic forms.
NEGATE_EVERY = 3

#: rows nulled by --null-measures: every 3rd value of each
#: CONSTANT_MEASURES column becomes NULL (offset 1 so the nulled set
#: differs from the negated set) — the missing-data corpus every
#: production feed eventually produces. SQL aggregates SKIP NULLs
#: (SUM/AVG/COUNT(col), corr pairs, window frames) identically on
#: both engines, so any divergence here is an ENGINE-side kernel
#: leaking NaN-vs-NULL through a numpy/pandas lane, a COUNT(*) used
#: where COUNT(col) was meant, or an exact-mean kernel dividing by
#: the wrong row count. Mixed (not all-null) so real values remain
#: in every group and the aggregates stay non-degenerate.
NULL_EVERY = 3

#: multiplier exponent for --extreme-measures: 10^7 lifts the
#: corpus's ~1e5-scale prices to ~1e12 — the magnitude where every
#: double-summing kernel loses integer exactness (sums cross 2^53 ≈
#: 9e15) while the engine's DECIMAL(28,4) discipline (24 integer
#: digits) still has 12 orders of headroom, and where BIGINT
#: intermediates in integer threshold math (q158's 2k·W) approach
#: 2^63. Whole-power-of-ten scaling keeps the DECIMAL(x,4) digit
#: budget honest and is exact for doubles up to ~1e15 (a float
#: multiply by 1e7 of a value with ≤15 significant digits is the
#: same on every engine since both read the SAME mutated parquet).
EXTREME_EXP = 7

#: --extreme-measures expected divergences: ids whose remaining diff
#: is a DOCUMENTED domain bound, not an engine defect (SCALE.md
#: §extreme-values). Printed as [SKIP] with the reason so the
#: exception list stays explicit and auditable; every other mode
#: still runs these ids normally. Two bounds:
#: - double-output: a money value at 1e12 magnitude with 2-4 decimal
#:   places needs 16-17 significant digits; no IEEE double carries
#:   that, and engines then differ only in which nearest-double
#:   SPELLING they emit (Java shortest-repr vs C++ exact-binary,
#:   1 ulp apart). Internal DECIMAL(28,4) arithmetic is exact
#:   throughout — verified by the 181 ids that PASS this axis.
#:   Faithful-output domain: |x| < 10^(15-ndigits) per double column.
#: - q158: systematic-PPS threshold math is exact BIGINT cents;
#:   2k·W < 2^63 bounds total corpus weight (< ~4.6e16 cents at
#:   k=100). Production pre-scales weights — dividing every weight
#:   by a constant preserves PPS inclusion probabilities.
EXTREME_EXPECTED: dict[str, str] = {
    "q04_project_case": "double-output: ROUND(price·(1-disc), 4) at "
                        "1e12 needs 17 sig digits",
    "q15_agg_pricing": "double-output: sum_disc_price/sum_charge "
                       "~2.5e14 with 4-6dp exceed 2^53 unscaled "
                       "(the round-9 width fix converted the ANSI "
                       "ABORT into exact decimal compute; only the "
                       "final double spelling differs by 1 ulp)",
    "q28_win_cumulative": "double-output: cumulative decimal sum "
                          "~1e15 with 4dp exceeds 2^53 unscaled",
    "q36_math_funcs": "double-output: x·sqrt-family column ~1e14 "
                      "with 2dp exceeds 2^53 unscaled",
    "q63_agg_regression": "double-output: covariance intermediates "
                          "~1e17 exceed double integer exactness",
    "q116_decile_lift": "double-output: decile revenue sums ~5e14 "
                        "with 2dp exceed 2^53 unscaled",
    "q123_mom_growth": "double-output: trailing-3mo decimal sum "
                       "~1e14 with 4dp exceeds 2^53 unscaled",
    "q158_sample_pps": "BIGINT threshold bound: 2k·W >= 2^63 at "
                       "1e12-scale prices (domain: W < 4.6e16 cents "
                       "at k=100; production pre-scales weights)",
}

#: columns flattened by --constant-ts: every time value in the
#: corpus becomes its column's FIRST value — the one-instant corpus.
#: Every tumbling/sliding/session window collapses to a single
#: bucket, every as-of lookup is an all-ties race, every interval is
#: zero-length or identical, every duration/rate denominator
#:  (TWAP, gap-fill deltas, conversion lag) hits zero, and any
#: window ordered by time with an incomplete tie-break becomes
#: engine-arbitrary — the time analog of --constant-measures.
CONSTANT_TS = (
    ("events", "ts"),
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
)

#: FOREIGN-key columns nulled by --null-keys: every 3rd value (offset
#: 2, disjoint from both measure axes) becomes NULL — the dirty-FK
#: feed (unmatched imports, anonymized users, parts retired from the
#: catalog). Primary keys stay intact (a NULL PK would violate the
#: tables' declared contract and audit an impossible corpus — the
#: constant-text n_chars lesson). The axis stresses the semantics
#: engines CAN disagree on: NULL groups in GROUP BY, NULL partitions
#: in windows, join-key drop vs preserve on outer joins, the packed-
#: pair/basket kernels (Spark collect_set silently drops NULLs — the
#: oracle formulations must agree), and COUNT(col) vs COUNT(*) over
#: keys.
NULL_KEYS = (
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)

#: every 3rd document's text becomes the EMPTY STRING under
#: --empty-text (n_chars updated to 0 — the metadata contract stays
#: true): the scraped-empty-page corpus. Empty string is NOT NULL —
#: it flows through every text path as a real value (split/shingle
#: of "", length-0 quality denominators, md5(''), zero-token docs in
#: vocab/BPE/tf-idf builds), and "''-vs-NULL" is the classic
#: cross-engine asymmetry surface after NULL ordering. Mixed (not
#: all-empty) so the corpus keeps real structure around the holes.
EMPTY_EVERY = 3

#: deterministic word→word substitution used by --unicode-text: the
#: corpus keeps its exact duplicate/near-duplicate structure (a pure
#: word map preserves equality and shingle overlap) but every text
#: routes multi-byte UTF-8 through the whole text family — CJK and
#: Hangul (3-byte), emoji (4-byte, supplementary plane), combining
#: marks (Hebrew niqqud, composed accents), RTL Arabic, and the two
#: classic case-mapping landmines: ß (uppercases to SS, length
#:  changes) and Σ/ς (contextual final sigma). Spark compares strings
#: as UTF8String code points and DuckDB as UTF-8 code points, so
#: length/substring/levenshtein SHOULD agree — this mode is the
#: audit that they actually do, and that no regex or case-fold path
#: silently assumes ASCII on one engine only.
UNICODE_WORDS = {
    "the": "日本語の",
    "data": "données",
    "fast": "빠른",
    "slow": "לְאַט",
    "join": "🔗связь",
    "key": "ключ",
    "table": "τραπέζι",
    "row": "строка",
    "big": "大きい",
    "small": "pequeño",
    "sort": "ترتيب",
    "merge": "mërgé",
    "scan": "σκανάρωΣ",
    "window": "ウィンドウ",
    "filter": "filtré",
    "hash": "ハッシュ",
    "batch": "一括",
    "stream": "스트림",
    "value": "größe",
    "query": "ΣΊΣΥΦΟΣ",
}


def make_empty_sf(dst: str, rows: int = 0, null_text: bool = False,
                  null_embedding: bool = False,
                  constant_text: bool = False,
                  constant_measures: bool = False,
                  unicode_text: bool = False,
                  negated_measures: bool = False,
                  null_measures: bool = False,
                  constant_ts: bool = False,
                  null_keys: bool = False,
                  empty_text: bool = False,
                  extreme_measures: bool = False) -> None:
    """Copies of every table truncated to ``rows`` rows (0 = empty,
    negative = ALL rows) with the EXACT physical parquet schema
    (pyarrow roundtrip — Spark re-writing limit(0) would retype
    events.ts and change both engines' view of it). rows >= 1
    exercises a DIFFERENT degenerate class than empty: one-sided
    groups, zero denominators on one arm, single-element windows —
    referential integrity between the truncated tables is irrelevant
    for an equivalence audit (both engines see identical bytes).
    ``null_text`` nulls documents.text (metadata columns keep their
    values): the ALL-NULL-COLUMN class — null-vs-empty-digest
    merges, null payloads into Pandas UDFs, offsets over null
    measures — which neither truncation mode reaches.
    ``null_embedding`` does the same to embeddings.embedding (the
    vector-table axis: NULL vectors into numpy kernels / index
    training — round-7 work-log 25 ran this by hand; now a mode).
    ``constant_text`` replicates the FIRST document's text into every
    row (round 8): the maximal-duplication corpus — every doc is an
    exact AND near dup of every other (largest possible candidate-
    pair density through the LSH/banding paths, one giant fingerprint
    group), the tokenizer vocabulary collapses to one doc's tokens,
    and every text-derived score ties, so any rank/row_number whose
    tie-break is incomplete orders differently per engine.
    ``constant_measures`` flattens the CONSTANT_MEASURES numeric
    columns to their first value (round 8): zero variance / zero
    range at FULL scale — corr/stddev/regression denominators,
    histogram widths, z-scores, and min==max quantile lanes all
    degenerate at once (the one-row mode reaches some of these, but
    only with n=1 group sizes; this mode reaches them with real
    group structure)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC_SF, f"{t}.parquet"))
        if rows >= 0:
            tbl = tbl.slice(0, rows)
        if null_text and t == "documents":
            i = tbl.schema.get_field_index("text")
            tbl = tbl.set_column(
                i, "text",
                pa.nulls(len(tbl), type=tbl.schema.field("text").type))
        if null_embedding and t == "embeddings":
            i = tbl.schema.get_field_index("embedding")
            tbl = tbl.set_column(
                i, "embedding",
                pa.nulls(len(tbl),
                         type=tbl.schema.field("embedding").type))
        if constant_text and t == "documents" and len(tbl):
            i = tbl.schema.get_field_index("text")
            first = tbl.column("text")[0].as_py()
            tbl = tbl.set_column(
                i, "text",
                pa.array([first] * len(tbl),
                         type=tbl.schema.field("text").type))
            # keep the table's own invariant (n_chars IS the char
            # count of text — the metadata contract): without this
            # the mode audits an impossible corpus and every
            # n_chars-vs-len(text) oracle pair "diverges" by
            # construction (first run flagged q62/q65/q72 this way)
            j = tbl.schema.get_field_index("n_chars")
            tbl = tbl.set_column(
                j, "n_chars",
                pa.array([len(first)] * len(tbl),
                         type=tbl.schema.field("n_chars").type))
        if empty_text and t == "documents" and len(tbl):
            i = tbl.schema.get_field_index("text")
            old = tbl.column("text").to_pylist()
            emptied = [
                k % EMPTY_EVERY == 0 and v is not None
                for k, v in enumerate(old)
            ]
            texts = ["" if e else v for e, v in zip(emptied, old)]
            tbl = tbl.set_column(
                i, "text",
                pa.array(texts, type=tbl.schema.field("text").type))
            # keep the n_chars == len(text) metadata contract true —
            # but ONLY for the rows actually emptied (ADVICE r8):
            # recomputing n_chars for every row would silently repair
            # any pre-existing n_chars/text violation in the source
            # corpus and mask that divergence class
            j = tbl.schema.get_field_index("n_chars")
            old_n = tbl.column("n_chars").to_pylist()
            tbl = tbl.set_column(
                j, "n_chars",
                pa.array([0 if e else n for e, n in zip(emptied, old_n)],
                         type=tbl.schema.field("n_chars").type))
        if unicode_text and t == "documents" and len(tbl):
            i = tbl.schema.get_field_index("text")
            texts = [
                None if s is None else " ".join(
                    UNICODE_WORDS.get(w, w) for w in s.split(" "))
                for s in tbl.column("text").to_pylist()
            ]
            tbl = tbl.set_column(
                i, "text",
                pa.array(texts, type=tbl.schema.field("text").type))
            # n_chars IS len(text) (code points — identical in
            # Python/Spark/DuckDB); keep the metadata contract true
            # just as --constant-text does
            j = tbl.schema.get_field_index("n_chars")
            tbl = tbl.set_column(
                j, "n_chars",
                pa.array([None if s is None else len(s) for s in texts],
                         type=tbl.schema.field("n_chars").type))
        if constant_measures and len(tbl):
            for mt, col in CONSTANT_MEASURES:
                if t != mt:
                    continue
                i = tbl.schema.get_field_index(col)
                v = tbl.column(col)[0].as_py()
                tbl = tbl.set_column(
                    i, col,
                    pa.array([v] * len(tbl),
                             type=tbl.schema.field(col).type))
        if negated_measures and len(tbl):
            for mt, col in CONSTANT_MEASURES:
                if t != mt:
                    continue
                i = tbl.schema.get_field_index(col)
                vals = [
                    -v if (v is not None and k % NEGATE_EVERY == 0)
                    else v
                    for k, v in enumerate(tbl.column(col).to_pylist())
                ]
                tbl = tbl.set_column(
                    i, col,
                    pa.array(vals, type=tbl.schema.field(col).type))
        if constant_ts and len(tbl):
            for tt, col in CONSTANT_TS:
                if t != tt:
                    continue
                i = tbl.schema.get_field_index(col)
                # first NON-NULL value (ADVICE r8): a NULL first row
                # would silently turn the intended one-instant corpus
                # into an all-NULL-timestamp corpus (a different,
                # already-covered axis)
                first = next(
                    (v for v in tbl.column(col).to_pylist()
                     if v is not None), None)
                assert first is not None, \
                    f"--constant-ts: {t}.{col} is all-NULL in source"
                tbl = tbl.set_column(
                    i, col,
                    pa.array([first] * len(tbl),
                             type=tbl.schema.field(col).type))
        if extreme_measures and len(tbl):
            # exact-integer scaling: the corpus measures are 2dp
            # values, so v*10^EXP via FLOAT multiply would create
            # 17-significant-digit doubles that no engine pair can
            # even agree on converting to decimal — muddying the axis
            # with parquet-double philosophy instead of engine
            # headroom. cents*10^(EXP-2) is an exact integer < 2^53,
            # exactly representable, so every input-side decimal cast
            # is exact on both engines and any divergence left is the
            # ENGINE's (internal headroom or output representation).
            for mt, col in CONSTANT_MEASURES:
                if t != mt:
                    continue
                i = tbl.schema.get_field_index(col)
                typ = tbl.schema.field(col).type

                def _scale(v):
                    if v is None:
                        return None
                    cents = round(v * 100)
                    assert abs(v * 100 - cents) < 1e-6, \
                        f"{mt}.{col}: {v} is not a 2dp value"
                    out = cents * 10 ** (EXTREME_EXP - 2)
                    return out if pa.types.is_integer(typ) else float(out)

                vals = [_scale(v) for v in tbl.column(col).to_pylist()]
                tbl = tbl.set_column(i, col, pa.array(vals, type=typ))
        if null_measures and len(tbl):
            for mt, col in CONSTANT_MEASURES:
                if t != mt:
                    continue
                i = tbl.schema.get_field_index(col)
                vals = [
                    None if k % NULL_EVERY == 1 else v
                    for k, v in enumerate(tbl.column(col).to_pylist())
                ]
                tbl = tbl.set_column(
                    i, col,
                    pa.array(vals, type=tbl.schema.field(col).type))
        if null_keys and len(tbl):
            for kt, col in NULL_KEYS:
                if t != kt:
                    continue
                i = tbl.schema.get_field_index(col)
                vals = [
                    None if k % NULL_EVERY == 2 else v
                    for k, v in enumerate(tbl.column(col).to_pylist())
                ]
                tbl = tbl.set_column(
                    i, col,
                    pa.array(vals, type=tbl.schema.field(col).type))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--rows", type=int, default=0,
                    help="rows per table (0 = empty corpus, "
                         "negative = all rows)")
    ap.add_argument("--null-text", action="store_true",
                    help="null out documents.text (all-null-column "
                         "class; combine with --rows -1)")
    ap.add_argument("--null-embedding", action="store_true",
                    help="null out embeddings.embedding (the vector-"
                         "table all-null axis; combine with --rows -1)")
    ap.add_argument("--constant-text", action="store_true",
                    help="replicate the first document's text into "
                         "every row (maximal-duplication / all-ties "
                         "axis; combine with --rows -1)")
    ap.add_argument("--constant-measures", action="store_true",
                    help="flatten the CONSTANT_MEASURES numeric "
                         "columns to one value (zero-variance axis; "
                         "combine with --rows -1)")
    ap.add_argument("--unicode-text", action="store_true",
                    help="route every document through the "
                         "UNICODE_WORDS map (multi-byte/UTF-8 axis: "
                         "CJK, emoji, combining marks, RTL, ß/Σ case "
                         "landmines; combine with --rows -1)")
    ap.add_argument("--negated-measures", action="store_true",
                    help="flip the sign of every 3rd value of the "
                         "CONSTANT_MEASURES columns (refunds/returns "
                         "axis: mixed-sign sums, DIV/% sign "
                         "semantics; combine with --rows -1)")
    ap.add_argument("--null-measures", action="store_true",
                    help="null every 3rd value of the "
                         "CONSTANT_MEASURES columns (missing-data "
                         "axis: SQL NULL-skipping vs engine kernel "
                         "NaN lanes; combine with --rows -1)")
    ap.add_argument("--empty-text", action="store_true",
                    help="empty-string every 3rd document's text "
                         "(''-vs-NULL axis: zero-length strings "
                         "through the whole text family; combine "
                         "with --rows -1)")
    ap.add_argument("--null-keys", action="store_true",
                    help="null every 3rd value of the NULL_KEYS "
                         "foreign-key columns (dirty-FK axis: NULL "
                         "groups/partitions, join-key drops, pack/"
                         "basket kernels; combine with --rows -1)")
    ap.add_argument("--constant-ts", action="store_true",
                    help="flatten every time column to its first "
                         "value (one-instant axis: all-ties as-of, "
                         "single-bucket windows, zero durations; "
                         "combine with --rows -1)")
    ap.add_argument("--extreme-measures", action="store_true",
                    help="scale the CONSTANT_MEASURES columns by "
                         f"10^{EXTREME_EXP} (magnitude axis: 1e12-"
                         "scale values — DECIMAL(28,4) headroom vs "
                         "double 2^53 integer exactness vs BIGINT "
                         "intermediate overflow; combine with "
                         "--rows -1)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the tmp dir for inspection")
    ap.add_argument("--include-rows-only", action="store_true",
                    help="also crash-smoke the oracle-less ops "
                         "(streaming lanes, sinks, sketches): run "
                         "each and report rows or the exception — "
                         "slow (the streaming lanes replay files), "
                         "hence opt-in")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from hearthstats_spark.oracle import compare, duck_connect
    from hearthstats_spark.queries.registry import load_all
    from hearthstats_spark.session import get_spark

    reg = load_all()
    spark = get_spark("degenerate-audit")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="hearthstats_empty_sf_")
    make_empty_sf(tmp, rows=args.rows, null_text=args.null_text,
                  null_embedding=args.null_embedding,
                  constant_text=args.constant_text,
                  constant_measures=args.constant_measures,
                  unicode_text=args.unicode_text,
                  negated_measures=args.negated_measures,
                  null_measures=args.null_measures,
                  constant_ts=args.constant_ts,
                  null_keys=args.null_keys,
                  empty_text=args.empty_text,
                  extreme_measures=args.extreme_measures)
    con = duck_connect(tmp)

    # the persisted-artifact store must not serve another corpus's
    # artifacts, and fingerprints of the tmp tables differ per run —
    # force the self-contained lanes for a hermetic audit
    os.environ["SPARK_GRAFT_ANN_CACHE"] = "0"

    n_bad = 0
    for name, q in sorted(reg.items()):
        if only and not any(name.startswith(o) for o in only):
            continue
        if args.extreme_measures and name in EXTREME_EXPECTED:
            print(f"[SKIP] {name}: {EXTREME_EXPECTED[name]}")
            continue
        if q.oracle is None:
            # no equivalence to audit, but crashing on a zero-row day
            # is still a bug (found s09/s10/s19 live) — opt-in smoke
            if not args.include_rows_only:
                continue
            try:
                n = q.fn(spark, tmp).count()
                print(f"[PASS] {name}: {n} rows (rows-only smoke)")
            except Exception as e:
                n_bad += 1
                print(f"[ERR-SPARK] {name}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}")
            continue
        try:
            spark_pdf = q.fn(spark, tmp).toPandas()
        except Exception as e:
            n_bad += 1
            print(f"[ERR-SPARK] {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            if os.environ.get("AUDIT_TRACE"):
                traceback.print_exc()
            continue
        try:
            duck_pdf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            n_bad += 1
            print(f"[ERR-DUCK ] {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        res = compare(name, spark_pdf, duck_pdf)
        if res.ok:
            print(f"[PASS] {name}: {res.n_spark} rows")
        else:
            n_bad += 1
            print(f"[DIFF] {name}: {res}")
    if args.keep:
        print(f"empty sf dir kept at {tmp}")
    else:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"\n{n_bad} non-PASS results")
    return min(n_bad, 120)


if __name__ == "__main__":
    sys.exit(main())
