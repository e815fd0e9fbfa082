"""Winnowing repeated-substring detection (pipeline/winnow.py): rolling-hash
correctness, the Schleimer guarantee, density bound, exact pair semantics
vs brute force (incl. multibyte text)."""

import numpy as np
import pytest

from guava_probably_spark.pipeline.winnow import (
    _BINV,
    _B,
    _doc_fingerprints,
    _mix,
    repeated_substring_pairs,
    winnow_fingerprints,
)


def _direct_hash(b: np.ndarray, i: int, k: int) -> int:
    h = 0
    for j in range(k):
        h = (h * int(_B) + int(b[i + j])) % (1 << 64)
    return int(_mix(np.array([h], dtype=np.uint64))[0])


def test_rolling_hash_matches_direct_polynomial():
    rng = np.random.default_rng(3)
    b = rng.integers(0, 256, 200, dtype=np.uint8)
    k = 13
    pos, fp = _doc_fingerprints(b, k, window=1)  # window=1 selects every pos
    assert len(pos) == 200 - k + 1
    for i in (0, 1, 57, 186, 187):
        assert int(fp[list(pos).index(i)]) == _direct_hash(b, i, k)


def test_binv_is_inverse():
    assert (int(_B) * int(_BINV)) % (1 << 64) == 1


def test_winnowing_guarantee_planted_substring():
    """Any common substring of length >= k + window - 1 must yield a shared
    selected fingerprint VALUE in both documents (join recall = 100%)."""
    rng = np.random.default_rng(7)
    k, w = 13, 8
    t = k + w - 1
    shared = bytes(rng.integers(97, 123, t, dtype=np.uint8))
    for trial in range(20):
        pre_a = bytes(rng.integers(65, 91, rng.integers(0, 50), dtype=np.uint8))
        post_a = bytes(rng.integers(65, 91, rng.integers(0, 50), dtype=np.uint8))
        pre_b = bytes(rng.integers(48, 58, rng.integers(0, 50), dtype=np.uint8))
        post_b = bytes(rng.integers(48, 58, rng.integers(0, 50), dtype=np.uint8))
        da = np.frombuffer(pre_a + shared + post_a, dtype=np.uint8)
        db = np.frombuffer(pre_b + shared + post_b, dtype=np.uint8)
        _, fa = _doc_fingerprints(da, k, w)
        _, fb = _doc_fingerprints(db, k, w)
        assert set(fa.tolist()) & set(fb.tolist()), f"trial {trial}: no shared fp"


def test_winnowing_density_bound():
    """Expected selection density is ~2/(w+1) of positions (Schleimer §4)."""
    rng = np.random.default_rng(11)
    b = rng.integers(0, 256, 50_000, dtype=np.uint8)
    k, w = 13, 8
    pos, _ = _doc_fingerprints(b, k, w)
    density = len(pos) / (len(b) - k + 1)
    assert 1.0 / w <= density <= 3.0 / (w + 1)


def test_winnow_fingerprints_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789"), (2, None), (3, "xy")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, "doc_id", "text", k=13, window=4).collect()
    assert {r.id for r in rows} == {1}  # null and too-short docs drop out
    assert all(0 <= r.pos <= 36 - 13 for r in rows)


def _brute_pairs(docs, t):
    out = set()
    for i, (a, x) in enumerate(docs):
        for b, y in docs[i + 1 :]:
            gx = {x[j : j + t] for j in range(len(x) - t + 1)}
            if any(y[j : j + t] in gx for j in range(len(y) - t + 1)):
                out.add((min(a, b), max(a, b)))
    return out


def test_repeated_substring_pairs_exact_vs_brute_force(spark):
    rng = np.random.default_rng(17)
    t = 20
    boiler = "This content is licensed under the FOO license v2."
    docs = []
    for i in range(30):
        body = "".join(chr(c) for c in rng.integers(97, 123, 120))
        if i % 3 == 0:
            body = body[:40] + boiler + body[40:]
        docs.append((i, body))
    # one multibyte pair: 20 CHARACTERS shared, multibyte UTF-8
    uni = "αβγδεζηθικλμνξοπρστυ"  # 20 greek chars (2 bytes each)
    docs.append((100, "prefix-" + uni + "-suffixaaaaaaaaaaaaaaa"))
    docs.append((101, "other--" + uni + "--tailbbbbbbbbbbbbbbbb"))
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = {
        (r.a, r.b)
        for r in repeated_substring_pairs(df, "doc_id", "text", min_len=t).collect()
    }
    assert got == _brute_pairs(docs, t)
    assert (100, 101) in got  # multibyte guarantee held
