"""Composed corpus-curation pipeline: the end-to-end funnel a training-data
build actually runs — quality filter, language filter, repetition (Gopher)
filter, exact dedup, benchmark decontamination, deterministic split.

Each stage reuses the standalone operator (text.py / clean.py / sampling.py),
but the composition is join-free where the math allows: every per-row signal
(quality, language, repetition, split) fuses into ONE projection over the
scan via the operators' column/append forms, canonical selection is one
window over the content hash, and decontamination is the single join. At
100 TB the whole funnel is one shuffle (the content-hash window) plus one
contamination join — not a chain of per-stage shuffle joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import clean, sampling, text


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bench: DataFrame | None = None,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    decontam_ngram: int = 8,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Per-document curation verdict: (id, quality_ok, lang_ok,
    repetition_ok, is_canonical, clean_ok, kept, split).

    Stage flags are INDEPENDENT (each evaluated over all documents, not the
    survivors of the previous stage) so every flag is individually
    auditable and oracle-checkable; ``kept`` is their conjunction. Exact
    dedup keeps the smallest id per identical text (``is_canonical``);
    ``clean_ok`` is False for documents sharing any token
    ``decontam_ngram``-gram with ``bench`` (always True when no bench is
    given). ``split`` is the content-hash train/valid/test assignment —
    independent of the flags, so re-running curation with different
    thresholds never moves a surviving document across splits.
    """
    from .util import ensure_parallelism

    # the whole fused per-document projection chain (language folds,
    # quality score, repetition stats, tokenize) runs upstream of the
    # first shuffle (the content-hash window) — on a narrow single-file
    # corpus that is ONE core doing all the per-row work. Spread once at
    # the head (no-op on fleet-wide inputs); every flag is row-local or
    # content-keyed, so partitioning cannot change any verdict. The
    # contamination branch below keeps the UNSPREAD input: decontaminate
    # spreads its corpus side itself.
    d = text.lang_id(ensure_parallelism(docs), id_col, text_col, append=True)
    d = d.withColumn(
        "quality_score", text.quality_score_col(F.col(text_col))
    )
    d = clean.repetition_stats(d, id_col, text_col, append=True)
    d = sampling.hash_split(d, weights=split_weights, text_col=text_col)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    d = d.withColumn("is_canonical", F.row_number().over(w) == 1)

    if bench is not None:
        contaminated = (
            clean.decontaminate(docs, bench, id_col, text_col, n=decontam_ngram)
            .select(F.col("corpus_id").alias(id_col))
            .distinct()
            .withColumn("__contaminated", F.lit(True))
        )
        d = d.join(contaminated, id_col, "left")
        clean_ok = F.coalesce(~F.col("__contaminated"), F.lit(True))
    else:
        clean_ok = F.lit(True)

    quality_ok = F.col("quality_score") >= min_quality
    lang_ok = F.col("detected_lang").isin(list(langs))
    repetition_ok = (F.col("dup_line_frac") <= max_dup_line_frac) & (
        F.col("top_bigram_frac") <= max_top_bigram_frac
    )
    kept = (
        quality_ok & lang_ok & repetition_ok & F.col("is_canonical") & clean_ok
    )
    return d.select(
        F.col(id_col),
        quality_ok.alias("quality_ok"),
        lang_ok.alias("lang_ok"),
        repetition_ok.alias("repetition_ok"),
        "is_canonical",
        clean_ok.alias("clean_ok"),
        kept.alias("kept"),
        "split",
    )


def curation_audit(verdicts: DataFrame) -> DataFrame:
    """Funnel audit over curate_corpus output: one row per stage with the
    number of documents failing it, plus the final keep count — the numbers
    a pipeline owner reads before shipping a corpus."""
    agg = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((~F.col("quality_ok")).cast("long")).alias("fail_quality"),
        F.sum((~F.col("lang_ok")).cast("long")).alias("fail_lang"),
        F.sum((~F.col("repetition_ok")).cast("long")).alias("fail_repetition"),
        F.sum((~F.col("is_canonical")).cast("long")).alias("fail_dedup"),
        F.sum((~F.col("clean_ok")).cast("long")).alias("fail_decontam"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    ]
    return verdicts.agg(*agg)


def curate_stream(
    stream_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    time_col: str = "ts",
    *,
    watermark: str = "1 hour",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Streaming curation: the same funnel on a Structured Streaming source.

    The stateless stages (quality, language, repetition, split) are the
    SAME column expressions as the batch funnel — they evaluate per
    micro-batch with zero state. Exact dedup becomes first-arrival-wins on
    the content hash within the ``watermark`` horizon
    (dropDuplicatesWithinWatermark — state bounded by keys-per-horizon,
    the property that lets ingest run forever; a duplicate later than the
    horizon is re-emitted, the documented streaming trade). Filters run
    BEFORE the dedup so state holds only curated survivors.
    Decontamination is omitted: a static bench-gram set joins as a
    stream-static broadcast join at write time if required.

    Returns the stream of kept documents: (id, ts, quality_score,
    detected_lang, split).
    """
    d = text.lang_id(stream_docs, id_col, text_col, append=True)
    d = d.withColumn("quality_score", text.quality_score_col(F.col(text_col)))
    d = clean.repetition_stats(d, id_col, text_col, append=True)
    d = d.where(
        (F.col("quality_score") >= min_quality)
        & F.col("detected_lang").isin(list(langs))
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    d = sampling.hash_split(d, weights=split_weights, text_col=text_col)
    d = d.withColumn("__content", F.md5(F.col(text_col)))
    d = d.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["__content"]
    )
    return d.select(
        F.col(id_col), F.col(time_col), "quality_score", "detected_lang",
        "split",
    )
