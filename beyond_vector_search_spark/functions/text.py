"""Scalar text functions as Spark Column expressions.

Each function returns a *Column* built purely from JVM-side builtins —
they run inside whole-stage codegen, never in a Python worker.  Every
function reproduces the exact semantics of the reference (citations into
/root/reference), and each docstring records the DuckDB-SQL equivalent
used by the oracle harness so the two stay in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference text.py:8 — keeps '-'/'_'-joined tokens (inc-49217, user_id).
# Match MIXED-case on the original text, then lowercase each token —
# exactly the reference's order.  Lowercasing the whole string first is
# NOT equivalent under Unicode: e.g. 'İ' (U+0130) lowercases to
# 'i' + combining dot, minting a phantom [a-z] token that the reference
# never sees (found by hypothesis).  Matched tokens are pure ASCII, so
# the per-token lower() is locale-safe.
TOKEN_PATTERN = r"[A-Za-z0-9]+(?:[-_][A-Za-z0-9]+)*"


def tokenize(text: Column | str) -> Column:
    """Lowercase regex tokenization (reference text.py:11-17).

    DuckDB oracle: ``list_transform(regexp_extract_all(text,
    '[A-Za-z0-9]+(?:[-_][A-Za-z0-9]+)*'), t -> lower(t))``
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)),
        lambda t: F.lower(t),
    )


def has_digits(text: Column | str) -> Column:
    """True iff the string contains a digit (reference text.py:20-21).

    DuckDB oracle: ``regexp_matches(text, '[0-9]')``
    """
    text = F.col(text) if isinstance(text, str) else text
    return text.rlike("[0-9]")


def normalize_ws(text: Column | str) -> Column:
    """Whitespace-collapse + lowercase + trim (the n-gram prenormalize
    of reference retrievers.py:42)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(text), r"(?U)\s+", " "))


def char_ngrams_from_normed(s: Column | str, n: int = 4) -> Column:
    """Char n-grams of an ALREADY-normalized string column.

    PERFORMANCE: ``s`` must be a plain column reference, not an
    expression — lambda bodies defeat codegen subexpression elimination,
    so any expression passed here is re-evaluated once per n-gram
    (measured 7x slowdown with an inlined regexp_replace).  Callers
    project :func:`normalize_ws` into a real column first; Catalyst's
    CollapseProject keeps the two projections separate because the
    produced column is non-cheap and multiply referenced.
    """
    s = F.col(s) if isinstance(s, str) else s
    return (
        F.when(F.length(s) == 0, F.array().cast("array<string>"))
        .when(F.length(s) < n, F.array(s))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - (n - 1)),
                lambda i: F.substring(s, i, n),
            )
        )
    )


def char_ngrams(text: Column | str, n: int = 4) -> Column:
    """Char n-grams over the whitespace-normalized lowercase string
    (reference retrievers.py:33-44): collapse ``\\s+`` to one space,
    strip, lowercase; whole string if shorter than n; [] for empty.

    One-shot convenience form; hot paths use
    ``select(normalize_ws(...))`` + :func:`char_ngrams_from_normed`
    (see that docstring for why).

    DuckDB oracle (s = trim(regexp_replace(lower(text),'\\s+',' ','g'))):
      ``CASE WHEN length(s)=0 THEN [] WHEN length(s)<n THEN [s]
        ELSE list_transform(range(1, length(s)-n+2), i -> substring(s,i,n)) END``
    """
    return char_ngrams_from_normed(normalize_ws(text), n)


def join_top_sentences(text: Column | str, max_sentences: int = 2) -> Column:
    """First ``max_sentences`` sentences re-joined with ". " and a
    guaranteed terminal punctuation mark (reference text.py:44-49).

    Split on ``[.!?]\\s+``, drop blank parts, keep the first two, join
    with ". ", append "." unless the result already ends in . ! or ?.
    """
    text = F.col(text) if isinstance(text, str) else text
    # Python str.strip() trims UNICODE whitespace — Spark's trim() only
    # ASCII; use a (?U) regex trim for part-level stripping.
    utrim = lambda p: F.regexp_replace(p, r"(?U)^\s+|\s+$", "")  # noqa: E731
    parts = F.filter(
        F.transform(F.split(text, r"(?U)[.!?]\s+"), utrim),
        lambda p: p != "",
    )
    joined = F.concat_ws(". ", F.slice(parts, 1, max_sentences))
    out = utrim(joined)
    return F.when(F.length(out) == 0, F.lit("")).otherwise(
        F.when(out.rlike(r"[.!?]$"), out).otherwise(F.concat(out, F.lit(".")))
    )


def norm_answer(text: Column | str) -> Column:
    """Whitespace-collapse + lowercase normalization used by answer
    exact-match scoring (reference evaluator.py:23-28:
    ``" ".join(s.lower().split())`` = trim + collapse any whitespace).

    DuckDB oracle: ``trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))``
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(text), r"(?U)\s+", " "))
