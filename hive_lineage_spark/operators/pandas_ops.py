"""Arrow-vectorized Python operators — the two remaining Pandas UDF API
surfaces (scalar ``@pandas_udf`` and grouped-map ``applyInPandas``;
``mapInPandas`` is covered by multimodal/dd06, ``applyInPandasWithState``
by streaming). Both are deterministic arithmetic, so even the Python
paths are oracle-checked.

At 100 TB these run where JVM expressions genuinely can't (model scoring,
custom numerics): Arrow batches amortize the Python boundary to ~free,
and grouped-map shuffles once on the group key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def px01_pandas_udf_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar @pandas_udf: a Flesch-style readability proxy computed
    vectorized over Arrow batches (206.835 − 1.015·words − 84.6·chars/words)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def readability(text: pd.Series) -> pd.Series:
        words = text.str.split(" ").str.len().astype("float64")
        chars = text.str.len().astype("float64")
        # +1e-9 midpoint nudge so numpy half-even and DuckDB half-away
        # agree (values like x.xxxx5 occur for rational chars/words)
        return (206.835 - 1.015 * words - 84.6 * (chars / words) + 1e-9).round(4)

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", readability("text").alias("readability"))


PX01_SQL = """
    SELECT doc_id,
           round(206.835
                 - 1.015 * CAST(len(string_split(text, ' ')) AS DOUBLE)
                 - 84.6 * (CAST(length(text) AS DOUBLE)
                           / CAST(len(string_split(text, ' ')) AS DOUBLE))
                 + 1e-9, 4) AS readability
    FROM documents
"""


def px02_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-source z-score of document length
    (pandas DataFrame in/out per group; one shuffle on the group key)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        pdf["z"] = ((pdf["n_chars"] - mu) / sd + 1e-9).round(4)
        return pdf[["source", "doc_id", "n_chars", "z"]]

    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return d.groupBy("source").applyInPandas(
        zscore, schema="source string, doc_id long, n_chars long, z double"
    )


PX02_SQL = """
    SELECT source, doc_id, n_chars,
           round((n_chars - avg(n_chars) OVER (PARTITION BY source))
                 / stddev_samp(n_chars) OVER (PARTITION BY source) + 1e-9, 4) AS z
    FROM documents
"""


QUERIES = {
    "px01_pandas_udf_readability": px01_pandas_udf_readability,
    "px02_grouped_zscore": px02_grouped_zscore,
}

ORACLES = {
    "px01_pandas_udf_readability": PX01_SQL,
    "px02_grouped_zscore": PX02_SQL,
}

# Operator-authored lineage through px02's applyInPandas barrier
# (lineage.analyze ``declared``): the group key and carried columns pass
# through; z derives from n_chars.
DECLARED = {
    "px02_grouped_zscore": {
        "source": ["source"],
        "doc_id": ["doc_id"],
        "n_chars": ["n_chars"],
        "z": ["n_chars"],
    },
}
