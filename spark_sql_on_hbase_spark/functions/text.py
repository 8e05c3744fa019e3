"""Text-column helpers shared by the dedup / text-analysis operators.

``hash60`` is the engine's deterministic cross-platform 60-bit hash
(first 15 hex chars of md5 → BIGINT): unlike Spark's xxhash64/murmur it
is reproducible in any SQL engine, which is what lets the DuckDB oracle
validate MinHash/SimHash signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col) -> Column:
    """Deterministic 60-bit hash of a string column (md5-prefix based)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def whitespace_tokens(col) -> Column:
    """Lower-cased whitespace tokenization → array<string>."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(col), r"\s+")


def null_safe_tokens(col) -> Column:
    """``whitespace_tokens`` with NULL text coalesced to an empty array —
    the ML ``NGram`` transformer NPEs on a NULL input array, so every
    operator that feeds tokens to it (or posexplodes them outer) shares
    this one guard (see test_null_text_degrades_not_crashes)."""
    return F.coalesce(whitespace_tokens(col), F.array().cast("array<string>"))


def word_ngrams(tokens, n: int) -> Column:
    """Word n-gram shingles from a token array (space-joined).

    Formulated as ``transform(sequence, i -> concat(element_at…))`` —
    O(1) element accesses per position instead of the old per-position
    ``slice``+``array_join`` (which allocated an n-element array per
    shingle and measured 5.2 task-s vs 0.7 on the sf0.1 bigram stream,
    r15).  This is also faster than the ML ``NGram`` transformer (0.98
    task-s) and, unlike the NGram UDF, stays inside whole-stage codegen
    so the optimizer's filter pushdown can't triple-evaluate it
    (guide §4.4); ``operators.dedup._shingles`` shingles through here.
    """
    tokens = F.col(tokens) if isinstance(tokens, str) else tokens
    # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# PII-ish redaction targets: URLs, emails, digit runs.  The patterns are
# deliberately restricted to RE2-compatible syntax (no backrefs, no
# lookaround) so the exact same regex runs under Spark's java.util.regex
# AND the DuckDB oracle's RE2 with identical semantics.
REDACT_PATTERN = r"(https?://[^\s]+|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]+)"


def normalize_ws(col) -> Column:
    """Canonical text form: lower-case, trim, collapse runs of whitespace.

    Pure codegen (no UDF); the usual first stage before hashing /
    shingling so that formatting-only variants dedup together.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def redact_sensitive(col, replacement: str = "#") -> Column:
    """Mask URLs / emails / digit runs with a fixed replacement token.

    Spark's regexp_replace is global by default (the DuckDB oracle needs
    the explicit 'g' flag for parity).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(col, REDACT_PATTERN, replacement)
