"""Text-analysis expression builders (LLM-data-pipeline extensions).

All JVM-side Catalyst expressions — no Python UDFs — so tokenization,
shingling, and stats stay inside whole-stage codegen and scale linearly
with input splits. These power the dedup/fingerprint/language operators
in plans/llm.py; they are engine extensions beyond the reference
(SURVEY.md §2.I), built only from public ``pyspark.sql.functions``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny embedded stopword list — enough for ratio features. A real
# deployment would broadcast a per-language list; the operator shape
# (array_size(filter(...)) / size(...)) is the same.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Lowercase whitespace tokenization: split(lower(trim(text)), '\\s+')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles as space-joined strings.

    transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks, i, k)))
    — a narrow, codegen'd higher-order-function pipeline; the shingle
    *set* (array_distinct) is what Jaccard/MinHash consume.
    """
    n = F.size(toks)
    seq = F.sequence(F.lit(1), n - (k - 1))
    sh = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[^\w\s]"))


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text. Identical content modulo spacing/case collides — the exact-dup
    key for 100 TB dedup (hash once, shuffle 16 bytes, never the text).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def lang_id_heuristic(text: Column | str) -> Column:
    """Marker-based language guess (CASE cascade).

    A deliberately simple, SQL-expressible heuristic (function-word
    markers). Real deployments swap in a model via a Pandas UDF; the
    surrounding plan (project + groupBy) is unchanged.
    """
    c = F.col(text) if isinstance(text, str) else text
    low = F.lower(c)
    has = lambda w: low.rlike(rf"(^|\s){w}(\s|$)")  # noqa: E731
    return (
        F.when(has("the") | has("and"), F.lit("en"))
        .when(has("el") | has("los"), F.lit("es"))
        .when(has("le") | has("les"), F.lit("fr"))
        .when(has("der") | has("und"), F.lit("de"))
        .otherwise(F.lit("unk"))
    )
