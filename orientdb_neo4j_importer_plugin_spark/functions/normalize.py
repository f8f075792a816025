"""Vectorized text normalization — the per-record transform hook.

Reference analogue: ``convertValueTypeFromNeo4jToJava``
(``ONeo4jImporterVerticesAndEdgesMigrator.java:306-335``), the reference's
per-record value-transform hook. Per ``input_hint`` the only sanctioned
Python hot path is vectorized pandas/Arrow UDFs — this module is that path.

``normalize_text_expr`` is the pure-column-function twin (JVM codegen); the
pandas UDF exists for transforms that genuinely need Python (and as the
tested template for plugging one in). Both produce identical output, which
the test suite asserts.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def normalize_text_expr(col: Column | str) -> Column:
    """Built-in-function normalization: trim, collapse whitespace, lowercase.
    Prefer this — it stays inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def _normalize_series(s: pd.Series) -> pd.Series:
    out = s.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()
    return out.map(
        lambda x: unicodedata.normalize("NFC", x) if isinstance(x, str) else x
    )


def normalize_text_udf(col: Column | str) -> Column:
    """Arrow-batched twin (adds NFC unicode normalization, which built-ins
    can't express). Vectorized pandas string ops — no Python row loop.

    Built lazily: pandas_udf registration needs an active SparkSession.
    """
    fn = pandas_udf(_normalize_series, "string")
    return fn(F.col(col) if isinstance(col, str) else col)


NORMALIZE_SQL_EXPR = "lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"
