"""Training-data preparation pipeline: the composed 100 TB use case.

language-ID → quality score → filter → exact dedup → token stats, in
the scale-correct order: the narrow zero-UDF filters run FIRST so the
dedup shuffle only sees surviving rows (at 100 TB, filtering after the
shuffle wastes the whole shuffle), and the dedup itself moves only
(fingerprint, doc_id) pairs — document text never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import text_analysis as ta
from ..operators.dedup import dedup_exact


def prepare_training_data(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: Sequence[str] = ("en",),
    min_quality: float = 0.5,
    dedup: bool = True,
) -> DataFrame:
    """Rows that survive language / quality / duplicate filtering,
    enriched with quality, lang_pred, and token counts."""
    out = ta.language_id(df, text_col)
    out = ta.quality_score(out, text_col)
    out = out.filter(F.col("lang_pred").isin(list(langs))
                     & (F.col("quality") >= min_quality))
    if dedup:
        out = dedup_exact(out, id_col=id_col, text_col=text_col)
    return ta.token_stats(out, text_col)
