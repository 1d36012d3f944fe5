"""The engine's complete Python-UDF surface beyond parsing (SURVEY §2.9).

Everything else in the engine is native Catalyst; these are the few
operations with no JVM builtin. All Arrow-batched (zero per-row
Python serde).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def nfkc_lower(s: pd.Series) -> pd.Series:
    """F4: unicode NFKC normalize + lowercase
    (/root/reference/5_NLP/nlp/normalize.py:8-11) — NFKC has no
    Catalyst builtin, hence the engine's only non-parsing UDF."""
    return s.map(lambda v: unicodedata.normalize("NFKC", v).lower() if v is not None else None)


def remove_stopwords(c: Column, stopwords: list[str] | None = None) -> Column:
    """F8: stopword removal (5_NLP/nlp/cleaning.py:26-29) — native
    Catalyst (array_except-style filter keeps order + duplicates)."""
    from pdf_to_text_spark.operators.textstats import EN_STOPWORDS

    sw = stopwords or EN_STOPWORDS
    words = F.filter(F.split(c, "[ ]+"), lambda w: F.length(w) > 0)
    kept = F.filter(words, lambda w: ~F.lower(w).isin(sw))
    return F.array_join(kept, " ")
