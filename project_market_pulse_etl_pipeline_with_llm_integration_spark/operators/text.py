"""Text-analysis operators for LLM training-data pipelines (north-star
mandate, BASELINE.json): token counting, quality scoring, language ID,
document fingerprinting — all pure ``pyspark.sql.functions`` column
algebra, so every operator runs inside whole-stage codegen with zero
Python in the hot path and scales linearly with no shuffle at all
(per-row narrow transforms).

Each operator's formula is deliberately SQL-expressible so the DuckDB
oracle replicates it exactly (see ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
    norm_text,
    token_count,
    tokens,
)

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Real pipelines plug in fastText/CLD3 via a Pandas UDF; the heuristic
# keeps the operator hermetic and oracle-checkable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "es": ["el", "la", "de", "y", "que", "los"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ein", "nicht"],
}


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, distinct-token ratio, mean token length."""
    toks = tokens(text_col)
    n_tok = token_count(text_col)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_calc", F.length(text_col).cast("long"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)).cast("long"))
        .withColumn(
            "distinct_ratio",
            F.round(
                F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(0.0), 6
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: rewards mid-length docs and
    lexical diversity — the shape of Gopher/C4-style length+repetition
    filters, kept linear and oracle-replicable:

        length_score   = least(n_tokens, 64) / 64
        diversity      = n_distinct_tokens / n_tokens   (0 if empty)
        quality_score  = round(0.5*length_score + 0.5*diversity, 6)
    """
    toks = tokens(text_col)
    n_tok = token_count(text_col)
    diversity = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(0.0)
    length_score = F.least(n_tok, F.lit(64)) / F.lit(64.0)
    return df.withColumn("quality_score", F.round(0.5 * length_score + 0.5 * diversity, 6))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per-language hit counts over the token
    set; predicted language = argmax with 'und' when no marker hits.
    Ties break by language-code order (deterministic, oracle-matching
    via greatest-based CASE)."""
    toks = F.array_distinct(tokens(text_col))
    out = df
    for lang, markers in LANG_MARKERS.items():
        lit_arr = F.array(*[F.lit(m) for m in markers])
        out = out.withColumn(
            f"hits_{lang}", F.size(F.array_intersect(toks, lit_arr)).cast("long")
        )
    hit_cols = [F.col(f"hits_{lang}") for lang in LANG_MARKERS]
    best = F.greatest(*hit_cols)
    pred = F.lit("und")
    # reversed so earlier languages win ties (first match in code order)
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", F.when(best > 0, pred).otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, whitespace-collapsed) — the exact-dedup key.  md5 hex is
    engine-portable (DuckDB md5 produces the identical digest)."""
    return df.withColumn("fingerprint", F.md5(norm_text(text_col)))


# -- queries() entries -------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_text_stats(df).select(
        "doc_id", "n_tokens", "n_chars_calc", "n_distinct_tokens", "distinct_ratio"
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_quality_score(df).select("doc_id", "quality_score")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_lang_id(df).select("doc_id", "hits_en", "hits_es", "hits_fr", "hits_de", "pred_lang")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_fingerprint(df).select("doc_id", "fingerprint")
