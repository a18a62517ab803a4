"""Main-content extraction routing — Arrow-batched pandas UDF.

Implements the reference's content-type → extractor dispatch
(src/workflows/ingest/langchain_loader.py:120-243, intelligent_orchestrator
routing :387-467) over text payloads:

* html      → readability-style boilerplate strip (kernel.html_extract)
* pdf       → artifact repair (kernel.textops.preprocess_before_chunking)
* markdown  → identity (reference loads .md as raw text, chunk.py:271-276)
* plain     → identity
* empty     → '' (early-return path, chunk.py:672-675)

The UDF dispatches *per content-type group within each Arrow batch* so each
extractor runs vectorized over a contiguous pandas Series — one Python hop
for the whole batch, not per row. The engine name is derived from the
content type afterwards as a pure column expression (no second UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ragstudio_spark.kernel import html_extract, textops

_ENGINES = {
    "html": "html_readability",
    "pdf": "pdf_cleaner",
    "markdown": "identity",
    "plain": "identity",
    "empty": "none",
}


def _extract_group(ctype: str, texts: pd.Series) -> pd.Series:
    if ctype == "html":
        return texts.map(html_extract.extract_main_content)
    if ctype == "pdf":
        return texts.map(lambda t: textops.preprocess_before_chunking(t or "", "pdf"))
    if ctype == "empty":
        return pd.Series([""] * len(texts), index=texts.index, dtype=object)
    return texts.fillna("")


@F.pandas_udf(StringType())
def _extract_udf(text: pd.Series, ctype: pd.Series) -> pd.Series:
    out = pd.Series([""] * len(text), index=text.index, dtype=object)
    for c, idx in text.groupby(ctype).groups.items():
        out.loc[idx] = _extract_group(str(c), text.loc[idx])
    return out


def with_extracted_text(
    df,
    text_col: str = "text",
    type_col: str = "content_type",
    out_col: str = "extracted_text",
    engine_col: str = "extraction_engine",
):
    """Add extracted main-content text + extraction engine columns."""
    engine = F.lit(None).cast("string")
    for ctype, name in _ENGINES.items():
        engine = F.when(F.col(type_col) == ctype, F.lit(name)).otherwise(engine)
    return df.withColumn(out_col, _extract_udf(F.col(text_col), F.col(type_col))).withColumn(
        engine_col, engine
    )
