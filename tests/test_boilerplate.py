"""Corpus-level line dedup (C4-style boilerplate removal) — exact vs a
pure-Python recompute on synthesized line-structured docs."""

from collections import defaultdict

import pytest

from guava_probably_spark.pipeline.textops import remove_boilerplate_lines

BOILER = "Subscribe to our newsletter today"
LEGAL = "copyright 2026 example corp all rights reserved"
SHORT = "}"  # frequent but below min_chars: structural, must survive


def _docs():
    docs = []
    for i in range(6):
        lines = [f"unique content line number {i} alpha", SHORT]
        if i < 4:
            lines.append(BOILER if i % 2 == 0 else BOILER.upper())
        if i < 3:
            lines.append(LEGAL)
        lines.append(f"tail line for document {i} omega")
        docs.append((i, "\n".join(lines)))
    docs.append((6, "\n".join([BOILER, LEGAL])))  # all-boilerplate doc: drops
    docs.append((7, BOILER + "\n" + BOILER))  # same line twice in ONE doc
    return docs


def _expected(docs, min_docs, min_chars):
    per_key_docs = defaultdict(set)
    for i, text in docs:
        for line in text.split("\n"):
            norm = line.strip().lower()
            if len(norm) >= min_chars:
                per_key_docs[norm].add(i)
    boiler = {k for k, d in per_key_docs.items() if len(d) >= min_docs}
    out = {}
    for i, text in docs:
        kept = [
            ln
            for ln in text.split("\n")
            if not (len(ln.strip().lower()) >= min_chars and ln.strip().lower() in boiler)
        ]
        if kept:
            total = len(text.split("\n"))
            out[i] = ("\n".join(kept), len(kept), total - len(kept))
    return out


@pytest.mark.parametrize("min_docs", [2, 3])
def test_matches_local_recompute(spark, min_docs):
    docs = _docs()
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    got = {
        r.doc_id: (r.text, r.n_kept, r.n_dropped)
        for r in remove_boilerplate_lines(df, min_docs=min_docs, min_chars=5).collect()
    }
    assert got == _expected(docs, min_docs, 5)


def test_case_insensitive_and_all_boiler_doc_drops(spark):
    docs = _docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate_lines(df, min_docs=3, min_chars=5).collect()}
    # BOILER appears (case-folded) in docs 0-3 plus 6,7 → removed everywhere
    assert all(BOILER.lower() not in r.text.lower() for r in out.values())
    assert 6 not in out  # every line boilerplate → doc dropped
    # short structural line survives even though it is in every doc
    assert all(SHORT in out[i].text for i in range(6))


def test_single_doc_repeats_not_boilerplate(spark):
    # the same line twice in one doc is 1 DISTINCT doc — not corpus boilerplate
    df = spark.createDataFrame(
        [(1, "only here\nonly here\nbody text line")], "doc_id long, text string"
    )
    r = remove_boilerplate_lines(df, min_docs=2, min_chars=5).collect()[0]
    assert r.text == "only here\nonly here\nbody text line" and r.n_dropped == 0


def test_literal_delimiter_not_regex(spark):
    df = spark.createDataFrame(
        [(1, "aaaa bbbb.cccc dddd"), (2, "aaaa bbbb.eeee ffff"), (3, "aaaa bbbb.gggg")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(
            df, min_docs=3, delim=".", min_chars=4
        ).collect()
    }
    # "aaaa bbbb" segment shared by all 3 docs → removed; "." split literally
    assert out == {1: "cccc dddd", 2: "eeee ffff", 3: "gggg"}


def test_line_bytes_untouched(spark):
    # kept lines must round-trip byte-exact (whitespace, case, unicode)
    weird = "  MiXeD éü line with   spaces  "
    df = spark.createDataFrame(
        [(1, weird + "\nnormal content line one"), (2, "normal content line two")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x.text for x in remove_boilerplate_lines(df, min_docs=2).collect()}
    assert r[1].split("\n")[0] == weird


def test_null_text_passes_through(spark):
    """A NULL-text doc has no lines — a line-removal op must hand it back
    unchanged, never silently delete the row (split(NULL) explodes to
    zero rows and would drop the doc from the groupBy otherwise)."""
    df = spark.createDataFrame(
        [
            (1, "shared boilerplate line\nunique one"),
            (2, "shared boilerplate line\nunique two"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df, min_docs=2, min_chars=5).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[3].text is None and out[3].n_kept == 0 and out[3].n_dropped == 0
    assert "shared boilerplate line" not in out[1].text
