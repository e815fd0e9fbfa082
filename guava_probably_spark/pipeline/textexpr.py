"""Dual-dialect text expression builders (Spark SQL ↔ DuckDB SQL).

Every pipeline operator that participates in the driver's DuckDB oracle gate
needs the Spark side and the oracle side to compute *bit-identical* values.
Instead of maintaining two hand-written copies that can drift, each concept
here is one function emitting the expression for a requested ``dialect``
(``"spark"`` or ``"duck"``); shared constants (stopword list, token regex,
rolling-hash base/modulus, simhash geometry) live in this module only.

Dialect differences handled centrally:
- DuckDB ``regexp_replace`` replaces the FIRST match unless passed ``'g'``;
  Spark replaces all.
- Spark ``sequence(1, 0)`` yields a DESCENDING ``[1, 0]`` — trigram builders
  need an explicit size guard; DuckDB ``generate_series(1, 0)`` is ``[]``.
- Spark ``regexp_extract_all`` requires the explicit group index ``0``.
- array/lambda names: ``transform``/``aggregate`` (Spark) vs
  ``list_transform``/``list_reduce`` (DuckDB); 1-based indexing in both
  (``element_at`` / ``w[i]``).

All expressions avoid float output: ratios are expressed as integer
cross-multiplications so the oracle hash can never diverge on rounding.
"""

from __future__ import annotations

# English stopword sample for the language-ID heuristic and stopword-ratio
# quality signal. Kept deliberately small and frozen: it is part of the
# oracle contract.
STOPWORDS: tuple[str, ...] = (
    "the", "of", "and", "a", "to", "in", "is", "it", "for", "on",
    "with", "as", "by", "at", "or", "an", "be", "this", "that", "from",
)

# BPE-ish token pattern: runs of lowercase alphanumerics over normalized text.
TOKEN_RE = "[a-z0-9]+"

# Karp–Rabin rolling-hash parameters (fingerprinting). base * 255 + MOD must
# fit int64: MOD < 2^31 keeps acc*31+255 < 2^36.
ROLL_BASE = 31
ROLL_MOD = 1_000_000_007

# SimHash geometry: 64 bits taken from the first 16 hex nibbles of
# md5(token). md5 exists as a built-in in both engines, so the oracle can
# recompute the identical signature.
SIMHASH_BITS = 64

_HEX = "0123456789abcdef"


def _q(dialect: str) -> None:
    if dialect not in ("spark", "duck"):
        raise ValueError(f"unknown dialect {dialect!r}")


def norm_expr(col: str, dialect: str) -> str:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    _q(dialect)
    if dialect == "spark":
        return f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def words_expr(col: str, dialect: str) -> str:
    """Whitespace tokens of the normalized text (array<string>)."""
    _q(dialect)
    n = norm_expr(col, dialect)
    if dialect == "spark":
        return f"split({n}, ' ')"
    return f"string_split({n}, ' ')"


def word_count_expr(col: str, dialect: str) -> str:
    _q(dialect)
    w = words_expr(col, dialect)
    if dialect == "spark":
        return f"size({w})"
    return f"len({w})"


def re_token_count_expr(col: str, dialect: str) -> str:
    """Count of TOKEN_RE matches over the normalized text."""
    _q(dialect)
    n = norm_expr(col, dialect)
    if dialect == "spark":
        return f"size(regexp_extract_all({n}, '{TOKEN_RE}', 0))"
    return f"len(regexp_extract_all({n}, '{TOKEN_RE}'))"


def trigrams_expr(col: str, dialect: str) -> str:
    """Array of word 3-gram shingles ('w1 w2 w3') of the normalized text.

    Word n-grams (not character n-grams) because transcript/document token
    soups share a small vocabulary — character-shingle sets of unrelated
    docs overlap heavily, word trigram sets do not (measured random-pair
    Jaccard ≤ 0.04 on the sf0.01 documents table).
    """
    _q(dialect)
    w = words_expr(col, dialect)
    if dialect == "spark":
        return (
            f"CASE WHEN size({w}) >= 3 THEN "
            f"transform(sequence(1, size({w}) - 2), i -> "
            f"concat_ws(' ', element_at({w}, i), element_at({w}, i + 1), "
            f"element_at({w}, i + 2))) "
            f"ELSE array() END"
        )
    return (
        f"list_transform(generate_series(1, len({w}) - 2), i -> "
        f"{w}[i] || ' ' || {w}[i + 1] || ' ' || {w}[i + 2])"
    )


def stopword_hits_expr(col: str, dialect: str) -> str:
    """Number of whitespace tokens that are in STOPWORDS (int)."""
    _q(dialect)
    w = words_expr(col, dialect)
    lst = ", ".join(f"'{s}'" for s in STOPWORDS)
    if dialect == "spark":
        return f"size(filter({w}, t -> t IN ({lst})))"
    return f"len(list_filter({w}, t -> t IN ({lst})))"


def md5_fingerprint_expr(col: str, dialect: str) -> str:
    """Normalization fingerprint: md5 of lower(text) with every non-alnum
    run collapsed to a single space (case / whitespace / punctuation
    insensitive exact-dedup key).

    One regex pass, deliberately: a separate strip pass with the
    no-match-heavy class ``[^a-z0-9 ]`` measured 17 s vs 0.9 s for this
    single ``[^a-z0-9]+`` pass over 400k docs (Spark's regex replace is
    pathologically slow on zero-match single-char classes).
    """
    _q(dialect)
    if dialect == "spark":
        return f"md5(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ')))"
    return f"md5(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g')))"


def rolling_hash_expr(col: str, dialect: str) -> str:
    """Karp–Rabin polynomial rolling hash of the normalized text (BIGINT).

    acc := (acc * ROLL_BASE + byte) % ROLL_MOD folded over characters.
    Order-sensitive (unlike the md5 set-style fingerprint) — two documents
    with the same words in different order fingerprint differently.
    """
    _q(dialect)
    n = norm_expr(col, dialect)
    if dialect == "spark":
        return (
            f"aggregate(split({n}, ''), CAST(0 AS BIGINT), (acc, c) -> "
            f"(acc * {ROLL_BASE} + CAST(coalesce(ascii(c), 0) AS BIGINT)) % {ROLL_MOD})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({n}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    )


def langid_expr(col: str, dialect: str) -> str:
    """Stopword-density language-ID heuristic: 'en' iff ≥10% of whitespace
    tokens are English stopwords, else 'unk'. Integer cross-multiplication
    (10*hits >= tokens) — no float division in the oracle contract."""
    _q(dialect)
    hits = stopword_hits_expr(col, dialect)
    n = word_count_expr(col, dialect)
    return f"CASE WHEN 10 * ({hits}) >= ({n}) THEN 'en' ELSE 'unk' END"


def char_count_expr(col: str, dialect: str) -> str:
    _q(dialect)
    return f"length({norm_expr(col, dialect)})"


def lines_expr(col: str, dialect: str) -> str:
    """Raw lines of the text (array<string>), split on newline."""
    _q(dialect)
    if dialect == "spark":
        return f"split({col}, '\\n')"
    return f"string_split({col}, chr(10))"


def symbol_hits_expr(col: str, dialect: str) -> str:
    """Gopher symbol count over the RAW text: '#' characters + '...' runs
    + '…' characters (Rae et al. 2021 use the symbol-to-word ratio as a
    boilerplate/markup signal). Same syntax in both dialects; '/' is float
    division in both, exact here because the difference is a multiple of 3."""
    _q(dialect)
    return (
        f"(length({col}) - length(replace({col}, '#', ''))) "
        f"+ CAST((length({col}) - length(replace({col}, '...', ''))) / 3 AS BIGINT) "
        f"+ (length({col}) - length(replace({col}, '…', '')))"
    )


def bullet_line_flag_expr(line_col: str, dialect: str) -> str:
    """1 when the (left-trimmed) line starts with a bullet glyph."""
    _q(dialect)
    return (
        f"CASE WHEN substr(ltrim({line_col}), 1, 1) IN "
        f"('-', '*', '•', '‣', '▪') THEN 1 ELSE 0 END"
    )


def ellipsis_line_flag_expr(line_col: str, dialect: str) -> str:
    """1 when the (right-trimmed) line ends with an ellipsis."""
    _q(dialect)
    return (
        f"CASE WHEN rtrim({line_col}) LIKE '%...' "
        f"OR rtrim({line_col}) LIKE '%…' THEN 1 ELSE 0 END"
    )


def alpha_word_flag_expr(word_col: str, dialect: str) -> str:
    """1 when the (already-lowercased) word contains an alphabetic char."""
    _q(dialect)
    if dialect == "spark":
        return f"CASE WHEN {word_col} RLIKE '[a-z]' THEN 1 ELSE 0 END"
    return f"CASE WHEN regexp_matches({word_col}, '[a-z]') THEN 1 ELSE 0 END"


def quality_flag_expr(col: str, dialect: str) -> str:
    """Boolean quality gate: 5..5000 tokens AND mean token length in [2, 12]
    chars (integer cross-multiplied: 2*T <= C+T-1 <= 12*T+T-1 where C is
    normalized char count including the T-1 separator spaces)."""
    _q(dialect)
    t = word_count_expr(col, dialect)
    c = char_count_expr(col, dialect)
    # mean token len = (C - (T-1)) / T; bounds 2 <= mean <= 12
    return (
        f"(({t}) BETWEEN 5 AND 5000) AND "
        f"(2 * ({t}) <= ({c}) - (({t}) - 1)) AND "
        f"(({c}) - (({t}) - 1) <= 12 * ({t}))"
    )


def _nibble_value(hexchar_expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"(instr('{_HEX}', {hexchar_expr}) - 1)"
    return f"(strpos('{_HEX}', {hexchar_expr}) - 1)"


def simhash_bit_sign_exprs(token_col: str, dialect: str) -> list[str]:
    """64 expressions (one per simhash bit), each ±1 for a single token.

    Bit i of md5(token)'s first 64 bits: nibble = hex char at position
    1 + i div 4, bit = (nibble >> (3 - i mod 4)) & 1; sign = 2*bit - 1.
    """
    _q(dialect)
    exprs = []
    for i in range(SIMHASH_BITS):
        pos = 1 + i // 4
        shift = 3 - i % 4
        nib = _nibble_value(f"substr(md5({token_col}), {pos}, 1)", dialect)
        if shift:
            bit = f"(({nib} >> {shift}) & 1)"
        else:
            bit = f"({nib} & 1)"
        exprs.append(f"(2 * {bit} - 1)")
    return exprs


def simhash_hex_from_bits(bit_exprs: list[str]) -> str:
    """Assemble 64 bit expressions (each 0/1) into a 16-char hex string.

    String assembly (not BIGINT) so bit 63 can't overflow a signed int64.
    Same concat in both dialects.
    """
    nibbles = []
    for j in range(SIMHASH_BITS // 4):
        b = bit_exprs[4 * j : 4 * j + 4]
        v = f"(8 * {b[0]} + 4 * {b[1]} + 2 * {b[2]} + {b[3]})"
        nibbles.append(f"substr('{_HEX}', {v} + 1, 1)")
    return " || ".join(nibbles)


# ---------------------------------------------------------------------------
# deterministic sampling (hash-rank) expressions
# ---------------------------------------------------------------------------

# Field separator for multi-column sample keys: unlikely in real keys, and
# frozen — part of the oracle contract like STOPWORDS above.
SAMPLE_SEP = "\x01"


def sample_rank_expr(cols: list[str] | tuple[str, ...], dialect: str, salt: str = "") -> str:
    """Uniform deterministic rank in [0, 16^32) as a 32-char hex string.

    md5 over the concatenated stringified key columns (plus an optional
    salt, so independent samples of the same table decorrelate).  Both
    engines emit identical lowercase hex, so lexicographic comparison is
    the same total order on both sides.
    """
    _q(dialect)
    if salt and not all(c.isalnum() or c in "_-." for c in salt):
        # the salt is spliced into a SQL string literal in both dialects —
        # restrict it rather than attempt cross-engine escaping
        raise ValueError(f"salt must be alphanumeric/_-. only, got {salt!r}")
    parts = [f"cast({c} as string)" for c in cols]
    if salt:
        parts.append(f"'{salt}'")
    key = parts[0] if len(parts) == 1 else f"concat_ws('{SAMPLE_SEP}', {', '.join(parts)})"
    return f"md5({key})"


def split_label_expr(
    cols: list[str] | tuple[str, ...],
    fractions: dict[str, float],
    dialect: str,
    salt: str = "",
) -> str:
    """CASE expression assigning each row a deterministic split label.

    The first 8 hex nibbles of the sample rank are compared against
    cumulative thresholds formatted as fixed-width hex — pure string
    comparison, bit-identical across engines, no float anywhere.
    Fractions must sum to 1 (the last label absorbs rounding).
    """
    _q(dialect)
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    rank8 = f"substring({sample_rank_expr(cols, dialect, salt)}, 1, 8)"
    labels = list(fractions)
    cum = 0.0
    arms = []
    for label in labels[:-1]:
        cum += fractions[label]
        threshold = format(min(int(round(cum * 16**8)), 16**8 - 1), "08x")
        arms.append(f"WHEN {rank8} < '{threshold}' THEN '{label}'")
    return f"CASE {' '.join(arms)} ELSE '{labels[-1]}' END"


def hash_u60_expr(cols: list[str] | tuple[str, ...], dialect: str, salt: str = "") -> str:
    """Deterministic uniform BIGINT in [0, 2^60): 15 md5 nibbles assembled
    by integer arithmetic (same trick as the simhash builders) — exact and
    bit-identical across engines, no engine-specific hex-parse builtin.

    The integer form is the one to use when a sampling decision must be
    provably identical on both engines: compare it against an integer
    threshold (``temperature_sample``), never against a float fraction.
    """
    _q(dialect)
    h = sample_rank_expr(cols, dialect, salt)
    terms = []
    for i in range(15):
        nib = _nibble_value(f"substr({h}, {i + 1}, 1)", dialect)
        # small 16^k literals type as INT32 — force 64-bit arithmetic (Spark
        # ANSI mode raises on the 32-bit product otherwise)
        terms.append(f"cast({nib} as bigint) * {16 ** (14 - i)}")
    return f"({' + '.join(terms)})"


def hash_uniform_expr(cols: list[str] | tuple[str, ...], dialect: str, salt: str = "") -> str:
    """Deterministic uniform in (0, 1]: (hash_u60 + 1) / 2^60.

    The BIGINT — and therefore the double — is bit-identical across
    engines (see :func:`hash_u60_expr`).
    """
    _q(dialect)
    return f"(({hash_u60_expr(cols, dialect, salt)} + 1) / {float(2 ** 60)})"


# ---------------------------------------------------------------------------
# PII redaction expressions
# ---------------------------------------------------------------------------

# (label, RE2-and-Java-compatible pattern, replacement) applied in order.
# Patterns deliberately stick to the syntax intersection of Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b \d.
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{13,16}\b", "<CARD>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_expr(col: str, dialect: str) -> str:
    """Chained regexp_replace masking emails, long digit runs and IPv4s."""
    _q(dialect)
    e = col
    for _, pat, rep in REDACT_PATTERNS:
        if dialect == "spark":
            spat = pat.replace("\\", "\\\\")
            e = f"regexp_replace({e}, '{spat}', '{rep}')"
        else:
            e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    return e


# --- C4 cleaning rules (Raffel et al. 2020, §2.2) ---------------------------
# Frozen placeholder bad-word sample: the published recipe uses the full
# LDNOOBW blocklist, which is external content — production deployments swap
# the real list in here. Like STOPWORDS, the sample is part of the oracle
# contract and deliberately small/frozen.
C4_BAD_WORDS: tuple[str, ...] = ("porn", "xxx", "viagra", "casino", "nsfw")
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
# terminal punctuation accepted at end-of-line: period / bang / question /
# closing double quote (the paper's "terminal punctuation mark")
_C4_TERMINAL = ('.', '!', '?', '"')


def c4_kept_lines_expr(col: str, dialect: str) -> str:
    """Array of RAW lines surviving the C4 line filter: ends in a terminal
    punctuation mark AND has >= C4_MIN_LINE_WORDS whitespace words AND does
    not mention 'javascript' (case-insensitive). HOF filter is interpreted
    per ELEMENT, which is fine here — elements are lines (~10/doc), not
    grams; the predicate itself is engine-compiled regex/string ops.

    The terminal check is a LAST-CHAR test on the whitespace-trimmed line
    (CR from CRLF endings stripped first), NOT a '$' regex anchor: Java
    '$' matches before a final line terminator while RE2 '$' matches only
    end-of-text, so an anchor silently diverges between the engines on
    '...today.\\r' lines — exactly the CRLF text C4 targets."""
    _q(dialect)
    lines = lines_expr(col, dialect)
    punct = ", ".join(f"'{c}'" for c in _C4_TERMINAL)
    if dialect == "spark":
        tl = "trim(replace(l, '\\r', ''))"
        wc = "size(split(trim(regexp_replace(l, '\\\\s+', ' ')), ' '))"
        return (
            f"filter({lines}, l -> right({tl}, 1) IN ({punct}) "
            f"AND {wc} >= {C4_MIN_LINE_WORDS} "
            f"AND lower(l) NOT LIKE '%javascript%')"
        )
    tl = "trim(replace(l, chr(13), ''))"
    wc = "len(string_split(trim(regexp_replace(l, '\\s+', ' ', 'g')), ' '))"
    return (
        f"list_filter({lines}, l -> right({tl}, 1) IN ({punct}) "
        f"AND {wc} >= {C4_MIN_LINE_WORDS} "
        f"AND lower(l) NOT LIKE '%javascript%')"
    )


def c4_sentence_count_expr(text_expr: str, dialect: str) -> str:
    """Sentence proxy: count of terminal marks [.!?] in the given text
    expression (the paper splits on sentence boundaries; counting the
    terminators is the deterministic integer equivalent both engines
    compute identically)."""
    _q(dialect)
    if dialect == "spark":
        return f"size(regexp_extract_all({text_expr}, '[.!?]', 0))"
    return f"len(regexp_extract_all({text_expr}, '[.!?]'))"


def c4_badword_hits_expr(col: str, dialect: str) -> str:
    """Number of normalized whitespace tokens in C4_BAD_WORDS (int)."""
    _q(dialect)
    w = words_expr(col, dialect)
    lst = ", ".join(f"'{s}'" for s in C4_BAD_WORDS)
    if dialect == "spark":
        return f"size(filter({w}, t -> t IN ({lst})))"
    return f"len(list_filter({w}, t -> t IN ({lst})))"
