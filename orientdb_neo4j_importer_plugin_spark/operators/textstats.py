"""Text analysis operators for training-data pipelines over `documents`.

Each operator returns a DataFrame AND exposes an `*_SQL` oracle twin
(ANSI/DuckDB) with identical column names and semantics, per the driver's
correctness contract. All expressions are Spark built-ins — whole-stage
codegen, no Python row functions.

Reference analogue: the importer's per-record string-parsing scalar functions
(``ONeo4jImporterSchemaMigrator.java:536-583``) — here generalized to
text-quality primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import h64, h64_sql, tokens, tokens_sql

# Marker stopwords for quality scoring / language heuristics. Deterministic
# fixed list shared verbatim with the SQL oracle.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token counts + char stats.

    Columns: doc_id, n_tokens, n_chars_measured, avg_token_len.
    """
    toks = tokens(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.round(
            F.length(F.concat_ws("", toks)) / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("avg_token_len"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len({tokens_sql("text")}) AS n_tokens,
       length(text) AS n_chars_measured,
       round(length(array_to_string({tokens_sql("text")}, '')) * 1.0
             / greatest(len({tokens_sql("text")}), 1), 4) AS avg_token_len
FROM documents
ORDER BY doc_id
"""


def quality_exprs() -> dict:
    """The quality signals as row-local Columns over a `text` column — the
    single source of the scoring formula, shared by quality_score and
    pipeline composers. All-integer floor arithmetic (bit-identical across
    engines; no float round-at-half-boundary hazards)."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    text_len = F.greatest(F.length("text"), F.lit(1)).cast("long")
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", "")).cast("long")
    upper = F.length(F.regexp_replace(F.col("text"), r"[^A-Z]", "")).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    ).cast("long")
    punct_bp = F.floor(punct * 10000 / text_len)
    upper_bp = F.floor(upper * 10000 / text_len)
    stop_bp = F.floor(stop_hits * 10000 / F.greatest(n_tok, F.lit(1)).cast("long"))
    len_term = F.least(F.floor(n_tok.cast("long") * 10000 / 64), F.lit(10000))
    quality_bp = F.floor(
        (
            len_term * 5
            + stop_bp * 3
            + (10000 - F.least(punct_bp * 10, F.lit(10000))) * 2
        )
        / 10
    )
    return {
        "n_tokens": n_tok,
        "punct_bp": punct_bp,
        "stopword_bp": stop_bp,
        "upper_bp": upper_bp,
        "quality_bp": quality_bp,
    }


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals in integer basis points (0..10000): length
    term, punctuation ratio, stopword ratio, uppercase ratio, and a
    composite score (formula: quality_exprs).

    Columns: doc_id, n_tokens, punct_bp, stopword_bp, upper_bp, quality_bp.
    """
    q = quality_exprs()
    return documents.select(
        "doc_id", *[c.alias(name) for name, c in q.items()]
    )


_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

# the t/bp CTE pair computing the quality signals — the single SQL source of
# the formula, shared by QUALITY_SCORE_SQL and pipeline composers. Keeps
# doc_id + text in scope so composers can hash/redact downstream.
QUALITY_CTES_SQL = f"""t AS (
  SELECT doc_id, text, {tokens_sql("text")} AS toks,
         greatest(length(text), 1) AS tl
  FROM documents
),
bp AS (
  SELECT doc_id, text,
         len(toks) AS n_tokens,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 10000 // tl AS punct_bp,
         len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) * 10000
           // greatest(len(toks), 1) AS stopword_bp,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) * 10000 // tl AS upper_bp,
         least(len(toks) * 10000 // 64, 10000) AS len_term
  FROM t
)"""

QUALITY_BP_SQL = (
    "(len_term * 5 + stopword_bp * 3"
    " + (10000 - least(punct_bp * 10, 10000)) * 2) // 10"
)

QUALITY_SCORE_SQL = f"""
WITH {QUALITY_CTES_SQL}
SELECT doc_id, n_tokens, punct_bp, stopword_bp, upper_bp,
       {QUALITY_BP_SQL} AS quality_bp
FROM bp
ORDER BY doc_id
"""


# Language-marker words per language — a deterministic n-gram-free heuristic
# (the container has no langid lib; this is the honest, testable version).
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}



def _pick_best_lang(langs: list[str], score_fmt: str):
    """Shared argmax + deterministic tie-break for the language classifiers:
    first language (in the dict's fixed order) achieving the max, 'und' when
    every score is 0. Returns (guess Column, best Column)."""
    best = F.greatest(*[F.col(score_fmt.format(lg)) for lg in langs])
    guess = F.lit("und")
    for lg in reversed(langs):
        guess = F.when(
            (F.col(score_fmt.format(lg)) == best) & (best > 0), F.lit(lg)
        ).otherwise(guess)
    return guess, best


def _pick_best_lang_sql(langs: list[str], score_fmt: str) -> str:
    """SQL twin of _pick_best_lang (expects a `best` column in scope)."""
    return (
        "CASE "
        + " ".join(
            f"WHEN {score_fmt.format(lg)} = best AND best > 0 THEN '{lg}'"
            for lg in langs
        )
        + " ELSE 'und' END"
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language guess with deterministic tie-break.

    Columns: doc_id, lang_guess, lang_hits.
    """
    toks = tokens(F.col("text"))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in ms]))).alias(
            f"hits_{lang}"
        )
        for lang, ms in LANG_MARKERS.items()
    ]
    scored = documents.select("doc_id", *scores)
    guess, best = _pick_best_lang(list(LANG_MARKERS), "hits_{}")
    return scored.select("doc_id", guess.alias("lang_guess"), best.alias("lang_hits"))


def _lang_hits_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({tokens_sql('text')}, x -> list_contains({lst}, x)))"


LANG_ID_SQL = (
    "WITH s AS (SELECT doc_id, "
    + ", ".join(f"{_lang_hits_sql(lg)} AS hits_{lg}" for lg in LANG_MARKERS)
    + ", greatest("
    + ", ".join(f"{_lang_hits_sql(lg)}" for lg in LANG_MARKERS)
    + ") AS best FROM documents) SELECT doc_id, "
    + _pick_best_lang_sql(list(LANG_MARKERS), "hits_{}")
    + " AS lang_guess, best AS lang_hits FROM s ORDER BY doc_id"
)


def contains_probe(documents: DataFrame, needle: str = "spark") -> DataFrame:
    """Array-contains existence probe per language — the reference's
    CONTAINS/LIMIT-1 label probe (L1/L2, ``ONeo4jImporterUtils.java:57-73``)
    generalized to a per-group existence count.

    Columns: lang, n_docs, n_with_needle, any_with_needle.
    """
    toks = tokens(F.col("text"))
    has = F.array_contains(toks, needle)
    return documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(has.cast("int")).alias("n_with_needle"),
        F.max(has).alias("any_with_needle"),
    )


def contains_probe_sql(needle: str = "spark") -> str:
    return f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN list_contains({tokens_sql("text")}, '{needle}') THEN 1 ELSE 0 END) AS BIGINT) AS n_with_needle,
       max(list_contains({tokens_sql("text")}, '{needle}')) AS any_with_needle
FROM documents
GROUP BY lang
ORDER BY lang
"""


def fingerprint(documents: DataFrame) -> DataFrame:
    """64-bit-ish document fingerprint: h64 of the normalized token stream
    (whitespace-canonicalized content hash; rolling-hash analogue).

    Columns: doc_id, fp.
    """
    toks = tokens(F.col("text"))
    return documents.select(
        "doc_id", h64(F.concat_ws(" ", toks)).alias("fp")
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       {h64_sql(f"array_to_string({tokens_sql('text')}, ' ')")} AS fp
FROM documents
ORDER BY doc_id
"""

# Character-trigram profiles per language, most-frequent first (public
# Cavnar–Trenkle-style rank profiles, restricted to [a-z ] so they survive
# the accent-stripping normalization below). Rank-weighted: the i-th trigram
# of a K-long profile contributes (K - i) per occurrence — all-integer, so
# both engines produce bit-identical scores.
LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", " of", "of ", "ion"],
    "es": [" de", "de ", " la", "la ", "os ", "que", " qu", "es ", " el", "el "],
    "de": ["en ", "er ", "ch ", " de", "der", "ein", "sch", "die", "und", " un"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "et ", "on "],
}

# lowercase, collapse every non-letter run to one space, pad the ends so
# word-boundary trigrams (" th", "nd ") match at string edges
_NORM_SPARK = "concat(' ', regexp_replace(lower(text), '[^a-z]+', ' '), ' ')"
_NORM_SQL = "concat(' ', regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')"


def _trigram_score(norm_col, grams: list[str]):
    """Rank-weighted occurrence count as a Spark Column (bigint)."""
    k = len(grams)
    terms = [
        (
            (F.length(norm_col) - F.length(F.replace(norm_col, F.lit(g))))
            / F.lit(len(g))
        ).cast("long")
        * F.lit(k - i)
        for i, g in enumerate(grams)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total.cast("long")


def lang_id_ngram(documents: DataFrame) -> DataFrame:
    """Character-trigram language ID (Cavnar–Trenkle rank profiles).

    Upgrade over the marker-word `lang_id`: scores every language on
    rank-weighted counts of its top character trigrams over the normalized
    text — robust to texts that never contain a whole marker word. Pure
    built-in expressions (length/replace arithmetic), whole-stage codegen,
    integer scores for cross-engine bit-parity. Reference analogue: the
    importer's per-record classification during migration
    (``ONeo4jImporterVerticesAndEdgesMigrator.java:274-283`` routes records
    by per-record string inspection).

    Columns: doc_id, lang_guess, lang_score.
    """
    norm = F.expr(_NORM_SPARK)
    scored = documents.select(
        "doc_id",
        *[
            _trigram_score(norm, grams).alias(f"score_{lang}")
            for lang, grams in LANG_TRIGRAMS.items()
        ],
    )
    guess, best = _pick_best_lang(list(LANG_TRIGRAMS), "score_{}")
    return scored.select(
        "doc_id", guess.alias("lang_guess"), best.alias("lang_score")
    )


def _trigram_score_sql(grams: list[str]) -> str:
    k = len(grams)
    terms = [
        f"CAST((length(n) - length(replace(n, '{g}', ''))) / {len(g)} AS BIGINT)"
        f" * {k - i}"
        for i, g in enumerate(grams)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


LANG_ID_NGRAM_SQL = (
    f"WITH nrm AS (SELECT doc_id, {_NORM_SQL} AS n FROM documents), "
    "s AS (SELECT doc_id, "
    + ", ".join(
        f"{_trigram_score_sql(grams)} AS score_{lang}"
        for lang, grams in LANG_TRIGRAMS.items()
    )
    + ", greatest("
    + ", ".join(f"{_trigram_score_sql(grams)}" for grams in LANG_TRIGRAMS.values())
    + ") AS best FROM nrm) SELECT doc_id, "
    + _pick_best_lang_sql(list(LANG_TRIGRAMS), "score_{}")
    + " AS lang_guess, best AS lang_score FROM s ORDER BY doc_id"
)


# PII-style scrubbing patterns (heuristic, deterministic; RE2-compatible so
# the Spark (Java regex) and DuckDB (RE2) engines match identically — no
# lookarounds, no backrefs). A date like 2026-08-16 deliberately matches the
# phone pattern (digit runs with separators are scrubbed conservatively).
PII_PATTERNS = [
    # order matters: emails first (an IP inside a hostname must not be
    # half-masked), then IPs, then phone-like digit runs
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d -]{7,}\d", "[PHONE]"),
]


def redact_pii(documents: DataFrame) -> DataFrame:
    """Scrub email / IP / phone-like spans from `text`, counting each
    category on the ORIGINAL text (counts are independent of mask order;
    masking is sequential in PII_PATTERNS order). Pure regexp built-ins —
    whole-stage codegen, no Python in the hot path. Reference analogue: the
    importer's per-record value sanitization during migration
    (``ONeo4jImporterVerticesAndEdgesMigrator.java:306-335``).

    Columns: doc_id, text_redacted, n_email, n_ip, n_phone, n_pii.
    """
    red = F.col("text")
    counts = []
    for name, pat, mask in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        red = F.regexp_replace(red, pat, mask)
    out = documents.select("doc_id", red.alias("text_redacted"), *counts)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long")).select(
        "doc_id",
        "text_redacted",
        *[F.col(f"n_{n}").cast("long").alias(f"n_{n}") for n, _, _ in PII_PATTERNS],
        "n_pii",
    )


def _sql_quote(pat: str) -> str:
    # DuckDB string literals do NOT process backslash escapes — pass the
    # regex through verbatim, only double the quote character
    return pat.replace("'", "''")


def pii_total_expr():
    """Total PII span count on the ORIGINAL text as a row-local Column —
    the single source of the counting rule, shared with pipeline composers."""
    total = None
    for _, pat, _ in PII_PATTERNS:
        c = F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).cast("long")
        total = c if total is None else total + c
    return total.cast("long")


def pii_total_sql() -> str:
    """SQL twin of pii_total_expr."""
    total = " + ".join(
        f"CAST(len(regexp_extract_all(text, '{_sql_quote(pat)}')) AS BIGINT)"
        for _, pat, _ in PII_PATTERNS
    )
    return f"CAST({total} AS BIGINT)"


def redact_pii_sql() -> str:
    red = "text"
    for _, pat, mask in PII_PATTERNS:
        red = f"regexp_replace({red}, '{_sql_quote(pat)}', '{mask}', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{_sql_quote(pat)}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    total = pii_total_sql()
    return f"""
SELECT doc_id,
       {red} AS text_redacted,
       {counts},
       {total} AS n_pii
FROM documents
ORDER BY doc_id
"""
