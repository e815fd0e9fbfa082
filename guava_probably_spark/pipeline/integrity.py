"""Corpus integrity digests: multiset equality of two 100-TB tables from
ONE scan each — no join, no sort, no shuffle of anything but one number.

``corpus_digest(df, cols)`` reduces the multiset of row keys to a single
BIGINT: sum over rows of a 60-bit cross-engine hash, accumulated exactly
in decimal(38,0) (headroom: 10^12 rows × 2^60 ≈ 2^100 « 10^38) and
reduced mod the largest sub-2^63 prime.  Equal digests + equal counts ⇒
equal multisets up to a ~2^-60 collision, and the digest is invariant
under row order and partitioning by construction (addition commutes) —
so two clusters, two table versions, or a pre/post-migration pair can
each compute it independently and compare two numbers.

This is the scale answer to the north rule's per-row invariant
(BASELINE.json `input_hint`: "per-turn text equality under stable turn
ordering"): digest over ``(conv_id, turn_idx, text)`` includes the
position in the hashed key, so ANY text change, turn swap, duplication
or loss anywhere in 10^12 turns moves the digest — verified without
ordering a single row.  ``corpus_diff`` is the drill-down: exact
multiset difference (``exceptAll`` both ways) once a digest mismatch
says WHERE to look is worth a shuffle.

Field framing is unambiguous: each column is rendered as
``v<length>:<value>`` (or ``n`` for NULL) before hashing, so
("a","bc") and ("ab","c") cannot collide and NULL ≠ '' ≠ 'n'.  The hash
is the repo's frozen dual-dialect md5→u60 construction
(pipeline/textexpr.py), so DuckDB computes the IDENTICAL digest —
the driver oracle compares values, not just row counts.  Cross-engine
parity is guaranteed for string/integer key columns (same cast-as-string
discipline as the sampling expressions); float/timestamp renderings are
engine-specific and should be cast explicitly by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textexpr import _nibble_value, _q

# largest prime below 2^63: the digest stays a non-negative BIGINT on
# both engines while losing only ~log2(25/2^63) bits of the sum
DIGEST_MOD = 9223372036854775783


def _framed(col: str) -> str:
    """'v<len>:<value>' or 'n' — NULL-safe, boundary-unambiguous field
    rendering, identical SQL in both dialects.  The NULL branch is an
    explicit CASE: Spark's concat is NULL-poisoning but DuckDB's concat
    SKIPS NULL args, so a coalesce-over-concat construction silently
    diverges on NULL fields (caught by the row-level parity test)."""
    v = f"cast({col} as string)"
    return (
        f"(case when {col} is null then 'n' "
        f"else concat('v', cast(length({v}) as string), ':', {v}) end)"
    )


def digest_u60_expr(cols: list[str] | tuple[str, ...], dialect: str, salt: str = "") -> str:
    """Per-row 60-bit digest hash: md5 over length-framed fields (+ salt),
    assembled to a BIGINT by the same nibble arithmetic as hash_u60_expr —
    bit-identical across engines."""
    _q(dialect)
    if salt and not all(c.isalnum() or c in "_-." for c in salt):
        raise ValueError(f"salt must be alphanumeric/_-. only, got {salt!r}")
    parts = [_framed(c) for c in cols]
    if salt:
        parts.append(f"'{salt}'")
    key = parts[0] if len(parts) == 1 else f"concat({', '.join(parts)})"
    h = f"md5({key})"
    terms = []
    for i in range(15):
        nib = _nibble_value(f"substr({h}, {i + 1}, 1)", dialect)
        terms.append(f"cast({nib} as bigint) * {16 ** (14 - i)}")
    return f"({' + '.join(terms)})"


def _key_expr(cols: list[str] | tuple[str, ...], salt: str) -> str:
    if salt and not all(c.isalnum() or c in "_-." for c in salt):
        raise ValueError(f"salt must be alphanumeric/_-. only, got {salt!r}")
    parts = [_framed(c) for c in cols]
    if salt:
        parts.append(f"'{salt}'")
    return parts[0] if len(parts) == 1 else f"concat({', '.join(parts)})"


def _row_hash(df: DataFrame, cols, salt: str):
    """(original df columns…, h decimal(38,0)) — md5 evaluated ONCE in its
    own projection (the 15-term nibble expression repeats md5(key)
    textually and Catalyst does not always CSE it — 25× slower on KB-scale
    text keys, measured), then one conv() hex→int on the 15-char prefix.
    conv-of-15-hex == the nibble arithmetic == the DuckDB twin, value-
    identical (both read the same 60 bits of the same digest)."""
    hx = F.expr(f"md5({_key_expr(cols, salt)})")
    return df.withColumn("__hx", hx).withColumn(
        "h",
        F.expr("cast(conv(substr(__hx, 1, 15), 16, 10) as bigint)").cast(
            "decimal(38,0)"
        ),
    )


def corpus_digest(
    df: DataFrame, cols: list[str] | tuple[str, ...], salt: str = ""
) -> DataFrame:
    """One row: (digest bigint, n bigint) for the multiset of ``cols``
    tuples.  One scan, partial aggregation map-side, nothing but two
    numbers cross the wire per partition."""
    return _row_hash(df, cols, salt).agg(
        F.expr(f"cast(sum(h) % {DIGEST_MOD} as bigint)").alias("digest"),
        F.count("*").alias("n"),
    )


def corpus_digest_sql_duck(
    table: str, cols: list[str] | tuple[str, ...], salt: str = ""
) -> str:
    """DuckDB twin — computes the IDENTICAL digest value (sum runs in
    HUGEINT, exact at any corpus size DuckDB can hold)."""
    h = digest_u60_expr(cols, "duck", salt)
    return (
        f"SELECT CAST(sum(CAST({h} AS HUGEINT)) % {DIGEST_MOD} AS BIGINT) "
        f"AS digest, count(*) AS n FROM {table}"
    )


def corpus_diff(
    a: DataFrame, b: DataFrame, cols: list[str] | tuple[str, ...]
) -> DataFrame:
    """Exact multiset difference of the two corpora on ``cols`` — the
    drill-down AFTER a digest mismatch: rows (+side 'a'|'b') present in
    one side's multiset more times than the other's.  This one shuffles
    (exceptAll hash-partitions both sides); run it on the narrowed slice
    the per-partition/per-day digests identified, not the whole corpus."""
    pa_, pb = a.select(*cols), b.select(*cols)
    only_a = pa_.exceptAll(pb).withColumn("side", F.lit("a"))
    only_b = pb.exceptAll(pa_).withColumn("side", F.lit("b"))
    return only_a.unionByName(only_b)


def transcript_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Structural validation of a transcript table, per conversation —
    the shape checks the BASELINE.json input contract implies, as ONE
    window + ONE reusable-exchange groupBy (both partitioned on
    ``conv_col``, so AQE plans a single shuffle; all whole-stage codegen,
    no Python):

    (conv_id, n_turns,
     idx_ok        — turn_idx is exactly {0..n-1}: min 0, max n−1, no dups,
     ts_monotone   — event time never decreases along turn order,
     tool_tagged   — tool is non-NULL exactly on role='tool' turns,
     null_texts    — NULL/empty text count,
     same_role_adjacent — adjacent equal-role pairs; a SIGNAL, not a rule:
                     legitimate multi-tool runs repeat roles).

    Filter ``~idx_ok`` for the quarantine list; feed the corpus through
    ``corpus_digest`` afterwards to pin the surviving bytes."""
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    enriched = df.select(
        conv_col,
        idx_col,
        role_col,
        text_col,
        tool_col,
        ts_col,
        F.lag(ts_col).over(w).alias("__prev_ts"),
        F.lag(role_col).over(w).alias("__prev_role"),
    )
    c = F.col
    return enriched.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        (
            (F.min(idx_col) == 0)
            & (F.max(idx_col) == F.count("*") - 1)
            & (F.countDistinct(idx_col) == F.count("*"))
        ).alias("idx_ok"),
        (
            F.min(
                F.when(
                    c("__prev_ts").isNull() | (c(ts_col) >= c("__prev_ts")), 1
                ).otherwise(0)
            )
            == 1
        ).alias("ts_monotone"),
        (
            F.min(
                F.when(
                    c(tool_col).isNotNull() == (c(role_col) == "tool"), 1
                ).otherwise(0)
            )
            == 1
        ).alias("tool_tagged"),
        F.sum(
            F.when(c(text_col).isNull() | (F.length(text_col) == 0), 1).otherwise(0)
        ).alias("null_texts"),
        F.sum(
            F.when(c(role_col) == c("__prev_role"), 1).otherwise(0)
        ).alias("same_role_adjacent"),
    )


def grouped_digest(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    cols: list[str] | tuple[str, ...],
    salt: str = "",
) -> DataFrame:
    """Per-group digests (one row per group: (*group_cols, digest, n)) —
    digest by day / source / shard so a mismatch localizes before
    corpus_diff pays its shuffle.  Group digests re-sum: the global
    digest equals sum(group digests) mod DIGEST_MOD (addition is the
    merge), so a stored per-day digest table rolls up for free."""
    return (
        _row_hash(df, cols, salt)
        .groupBy(*group_cols)
        .agg(
            F.expr(f"cast(sum(h) % {DIGEST_MOD} as bigint)").alias("digest"),
            F.count("*").alias("n"),
        )
    )
