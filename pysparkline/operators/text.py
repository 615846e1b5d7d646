"""Text analysis operators: token stats, quality score, language ID,
document fingerprinting. All JVM-side expressions (no Python in the hot path)
so they vectorize inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword language heuristic.
# NOTE: whitespace tokenization means zh only matches artificially
# space-separated text; real unsegmented Chinese detects as 'und' — a
# character-n-gram scorer is the upgrade path.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "für"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "es", "para", "con"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "也"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (empty string -> empty array)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: word/digit runs + individual punctuation marks each
    count as one piece. Formulated as two regexp_extract_all counts (no
    lookarounds), so any RE2-class engine computes it identically — the
    oracle-portability property the driver check relies on."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+"), 0)) + F.size(
        F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)
    )


def text_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document stats: token/char counts and punctuation/digit/space
    ratios, all as exact-arithmetic-friendly columns."""
    from .util import ensure_parallelism

    # narrow single-file corpora otherwise run this regex-heavy projection
    # on one core (documents.parquet is one scan split at bench SF); wide
    # production inputs skip the repartition entirely
    df = ensure_parallelism(df)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    # literal character classes: translate() counts digits/spaces in one
    # linear pass — byte-identical to the regexp_replace('[0-9]'/' ') forms
    # it replaces, without the per-char regex-engine cost
    n_digits = F.length(text) - F.length(F.translate(text, "0123456789", ""))
    n_spaces = F.length(text) - F.length(F.translate(text, " ", ""))
    # two-stage select: the ratio columns reference the COUNT columns, not
    # re-inlined copies of their expressions — inlining re-ran the punct
    # regex and the tokenizing split once more per row (CollapseProject
    # keeps the split because the counts are non-cheap, multiply-referenced)
    base = df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_spaces.alias("n_spaces"),
    )
    return base.select(
        "*",
        (
            F.col("n_punct").cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("punct_ratio"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("avg_token_len"),
    )


def _hits(toks: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_hits(text: Column, lang: str) -> Column:
    return _hits(tokens_col(F.lower(text)), lang)


def lang_id(
    df: DataFrame, id_col: str, text_col: str, append: bool = False
) -> DataFrame:
    """Heuristic language ID: argmax of stopword-hit counts (deterministic
    tie-break by language code). 'und' when nothing matches.

    The text is lowered + tokenized ONCE into a projected column, and every
    token does ONE literal-map lookup producing a language bitmask (a token
    can be a stopword of several languages, e.g. 'la' in fr+es) — versus
    |langs| * |stopwords| array_contains probes per token, this is the
    difference between 1 and 50 comparisons on every token of the corpus.

    ``append=True`` keeps the input columns (join-free pipeline
    composition) instead of projecting down to (id, signals)."""
    if not append:
        # standalone mode: spread narrow single-file corpora across the
        # fleet before the token-scoring projection (one scan split would
        # otherwise run it on one core). append=True composes into fused
        # single-scan pipelines (curate_corpus) and must not inject a
        # shuffle there.
        from .util import ensure_parallelism

        df = ensure_parallelism(df)
    keep = list(df.columns)
    langs = sorted(STOPWORDS)
    mask: dict[str, int] = {}
    for i, lang in enumerate(langs):
        for w in STOPWORDS[lang]:
            mask[w] = mask.get(w, 0) | (1 << i)
    sw_map = F.create_map(*[F.lit(x) for kv in mask.items() for x in kv])
    df = df.withColumn(
        "__toks", tokens_col(F.lower(F.col(text_col)))
    ).withColumn(
        "__masks",
        F.transform(F.col("__toks"), lambda t: F.coalesce(sw_map[t], F.lit(0))),
    )
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.filter(
                        F.col("__masks"),
                        lambda v: v.bitwiseAND(F.lit(1 << i)) != 0,
                    )
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    # left fold with strict ">" keeps the alphabetically-first language on ties
    best = F.aggregate(
        scores,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    # materialize the fold ONCE: inlining `best` into the three output
    # expressions re-evaluated the whole interpreted HOF chain (5 filters +
    # the fold) per reference — 3x the per-row cost, visible as triplicated
    # aggregate(...) trees in the physical plan. A non-cheap column
    # referenced three times survives CollapseProject, exactly like
    # __masks above.
    df = df.withColumn("__best", best)
    bestc = F.col("__best")
    out_cols = [
        F.when(bestc["hits"] > 0, bestc["lang"]).otherwise(F.lit("und")).alias(
            "detected_lang"
        ),
        bestc["hits"].alias("stopword_hits"),
    ]
    if append:
        return df.select(*keep, *out_cols)
    return df.select(F.col(id_col), *out_cols)


def quality_score_col(text: Column) -> Column:
    """Pure-expression form of the quality heuristic — composable into any
    projection without a join (pipeline.curate_corpus fuses it into the one
    scan)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    avg_token_len = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    punct_ok = punct_ratio <= 0.2
    tok_ok = (avg_token_len >= 3) & (avg_token_len <= 12)
    return (
        len_ok.cast("double") * 0.4
        + punct_ok.cast("double") * 0.3
        + tok_ok.cast("double") * 0.3
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic quality heuristic in [0,1]: length band + punctuation
    sanity + mean token length band. (The standard cheap pre-filter before
    expensive model-based scoring.)"""
    return df.select(
        F.col(id_col),
        quality_score_col(F.col(text_col)).alias("quality_score"),
    )


def unigram_lm(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus unigram language model: (tok, logp) with add-one smoothing,
    logp = ln((count+1) / (N+V)) over lowercased whitespace tokens.

    The counts aggregation is ONE map-side-combined shuffle over the token
    stream; N/V are a single-row aggregate broadcast onto it. At 100 TB the
    model table is vocabulary-sized (weakly sub-linear in corpus size), so
    it stays joinable/broadcastable downstream.
    """
    toks = df.select(
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))).alias("logp"),
    )


def perplexity_scores(
    df: DataFrame, id_col: str, text_col: str, lm: DataFrame | None = None
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM —
    the cheap analog of the CCNet-style LM-perplexity quality filter
    (documents whose token distribution diverges from the corpus score
    high and get filtered/bucketed). Returns (id, n_tokens, nll); docs
    with zero tokens are dropped (no likelihood is defined).

    ``lm`` defaults to ``unigram_lm(df, text_col)`` (self-scoring); pass a
    model built on a reference corpus to score drift against it. Tokens
    absent from a supplied LM are skipped (inner join) — the ANSI-portable
    choice the DuckDB oracle reproduces exactly.

    Scale: tokenize is a narrow map; the score is one equi-join on token
    (AQE broadcasts vocabulary-sized LMs) + one map-side-combined
    aggregation by doc id. Nothing driver-side, nothing all-pairs.
    """
    if lm is None:
        lm = unigram_lm(df, text_col)
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"),
    )
    return (
        toks.join(lm, "tok")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg("logp"), 6).alias("nll"),
        )
        .withColumnRenamed("__id", id_col)
    )


def _bigrams_expr(toks: Column) -> Column:
    """Array of (w1, w2) structs for adjacent token pairs — a narrow
    per-row map (zip the array with itself shifted by one), no shuffle."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )


def bigram_lm(
    df: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Corpus bigram LM tables: (bigram_counts(w1, w2, c2),
    context_counts(w1, cc), unigram_probs(tok, p1)) over lowercased
    whitespace tokens. ``p1`` is add-one smoothed ((c+1)/(N+V), the same
    model :func:`unigram_lm` logs).

    Scale: ONE map-side-combined shuffle over the bigram stream builds
    ``bigram_counts``; ``context_counts`` re-aggregates that (already
    model-sized) table, and unigrams ride their own single shuffle. All
    three tables are vocabulary-scaled — weakly sub-linear in corpus
    size — so downstream joins stay AQE-broadcastable until the bigram
    vocabulary itself is huge, at which point they are ordinary
    equi-joins on (w1, w2)."""
    toks = df.select(tokens_col(F.lower(F.col(text_col))).alias("__toks"))
    big = (
        toks.where(F.size("__toks") >= 2)
        .select(F.explode(_bigrams_expr(F.col("__toks"))).alias("bg"))
        .select("bg.w1", "bg.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("cc"))
    uni = (
        toks.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    p1 = uni.crossJoin(F.broadcast(tot)).select(
        "tok",
        ((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))).alias("p1"),
    )
    return c2, ctx, p1


def bigram_perplexity_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.7,
    lm: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under an INTERPOLATED
    bigram LM — the next-fidelity rung above :func:`perplexity_scores`
    toward the CCNet 5-gram-KenLM quality filter:
    ``p(w2|w1) = lam * c(w1 w2)/c(w1 ·) + (1-lam) * p1(w2)``.
    Returns (id, n_bigrams, nll); documents with < 2 tokens are dropped
    (no bigram likelihood is defined).

    The quality-filter usage is scoring against a REFERENCE model (pass
    ``lm`` built on e.g. curated text, the CCNet setup): clean text
    scores low, divergent text high, and bigrams absent from the model
    are skipped (inner join — the unigram operator's ANSI-portable
    convention). Self-scoring (the default) measures IN-CORPUS
    typicality instead: repeated template text scores lowest, but
    one-off noise ALSO scores low because its singleton contexts get ML
    probability 1 — the overfit regime reference-model scoring exists
    to avoid (and why CCNet trains on Wikipedia, not the corpus being
    filtered).

    Scale: tokenize + bigram expansion are narrow maps; scoring is three
    equi-joins against model-sized tables + one map-side-combined
    aggregation by doc id. Nothing driver-side, nothing all-pairs."""
    c2, ctx, p1 = lm if lm is not None else bigram_lm(df, text_col)
    big = (
        df.select(
            F.col(id_col).alias("__id"),
            tokens_col(F.lower(F.col(text_col))).alias("__toks"),
        )
        .where(F.size("__toks") >= 2)
        .select("__id", F.explode(_bigrams_expr(F.col("__toks"))).alias("bg"))
        .select("__id", "bg.w1", "bg.w2")
    )
    p = (
        F.lit(float(lam)) * (F.col("c2") / F.col("cc"))
        + F.lit(1.0 - float(lam)) * F.col("p1")
    )
    return (
        big.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(p1, F.col("w2") == F.col("tok"))
        .select("__id", F.log(p).alias("__logp"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg("__logp"), 6).alias("nll"),
        )
        .withColumnRenamed("__id", id_col)
    )


@dataclass
class NbModel:
    """Multinomial Naive Bayes model (one relational training pass).

    ``token_counts``: (label, tok, c) — per-class token counts;
    ``classes``: (label, n_tokens, n_docs) — per-class totals;
    ``vocab_size`` / ``total_docs``: corpus constants (two bounded 1-row
    collects at fit time — model-sized driver state, like the BPE vocab).
    """

    token_counts: DataFrame
    classes: DataFrame
    vocab_size: int
    total_docs: int


def nb_train(df: DataFrame, text_col: str, label_col: str) -> NbModel:
    """Train a multinomial Naive Bayes document classifier — the
    one-pass, fully relational analog of the fastText-style quality /
    domain / language filter an LLM-data pipeline runs at ingest (CCNet
    trains a linear classifier for exactly this slot; NB's counts train
    in ONE map-side-combined aggregation and score with pure joins, no
    gradient loop). Shared lowercased whitespace tokenizer (the LM-row
    convention); rows with a NULL label are excluded from training
    (unlabeled — they are what the classifier will score).

    100 TB posture: training is one groupBy(label, token) over the
    token stream (map-side combined; shuffle is model-sized, bounded by
    vocab x classes) plus two tiny aggregates for the constants."""
    labeled = df.where(F.col(label_col).isNotNull())
    toks = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"),
    )
    token_counts = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    classes = (
        labeled.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            toks.groupBy("label").agg(
                F.count(F.lit(1)).alias("n_tokens")
            ),
            "label",
            "left",
        )
        .fillna(0, subset=["n_tokens"])
    )
    vocab_size = token_counts.select("tok").distinct().count()
    total_docs = labeled.count()
    return NbModel(token_counts, classes, int(vocab_size), int(total_docs))


def nb_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: NbModel,
    score_col: str = "nb_score",
    label_out: str = "nb_label",
) -> DataFrame:
    """Score documents against an :func:`nb_train` model: per class,
    sum of add-one-smoothed token log-likelihoods plus the class
    log-prior; output = argmax class per document (ties break to the
    lexicographically smallest label over the 6dp-ROUNDED score — the
    engine-agreed tie rule every scoring row uses).

    Token-free documents (empty or NULL text) score on the prior alone.

    100 TB posture: the token stream crosses only the CLASS list (a
    broadcast of L rows), the model join keys on (label, tok) — Spark
    broadcasts a small model, a huge one degrades to a shuffled hash
    join — and the per-document aggregation is map-side combined; the
    final argmax is a window over L rows per document."""
    from pyspark.sql import Window

    v = F.lit(float(model.vocab_size))
    prior = F.log(
        F.col("n_docs").cast("double") / F.lit(float(model.total_docs))
    )
    labels = F.broadcast(model.classes)
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"),
    )
    scored = (
        toks.crossJoin(labels.select("label", "n_tokens"))
        .join(model.token_counts, ["label", "tok"], "left")
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("n_tokens").cast("double") + v)
            ),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("__logp").alias("__ll"))
    )
    # token-free documents: every class scores on the prior alone
    empties = (
        df.join(toks.select(id_col).distinct(), id_col, "left_anti")
        .select(id_col)
        .crossJoin(labels.select("label"))
        .withColumn("__ll", F.lit(0.0))
    )
    per_class = (
        scored.unionByName(empties)
        .join(F.broadcast(model.classes.select("label", "n_docs")), "label")
        .withColumn(
            score_col, F.round(F.col("__ll") + prior, 6)
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col(score_col).desc(), F.col("label").asc()
    )
    return (
        per_class.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(
            F.col(id_col),
            F.col("label").alias(label_out),
            F.col(score_col),
        )
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint: md5 of (lowercased, whitespace-collapsed,
    trimmed) text — the exact-dedup key for near-identical formatting."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def vocab_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    min_df: int = 1,
) -> DataFrame:
    """Top-k corpus vocabulary by document frequency: (token, tf, df) —
    the corpus-stats pass of tokenizer training / vocab pruning.

    One explode + one two-phase aggregation: ``tf`` (total occurrences)
    map-side combines, ``df`` (distinct docs) runs Spark's partial-distinct
    expansion — both shuffle once on token. Output ordered totally
    (df desc, tf desc, token) and bounded by ``k``, so the result is
    driver-safe at any corpus size; ``min_df`` drops hapax-class noise
    before the sort.
    """
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    out = (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("__doc").alias("df"),
        )
        .where(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), F.col("tf").desc(), F.col("token"))
        .limit(k)
    )
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training chunking step. Output: (id, chunk_id, chunk_text, n_tokens),
    chunk i covering tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final window may be short, and an
    empty document yields one empty chunk (row count preserved per doc >= 1).

    Pure JVM expressions (tokenize once, one transform + posexplode) — a
    narrow map with no shuffle, so chunking 100 TB is a single pass.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    from .util import ensure_parallelism

    stride = chunk_tokens - overlap
    # materialize the token array ONCE per row: referenced inside the
    # per-chunk transform lambda it would re-tokenize the document for
    # every window (measured 0.49 -> 0.25 s at bench SF); the repartition
    # spreads narrow single-file corpora across the fleet (same rationale
    # as text_stats) — together 2.4x, bit-identical output
    df = ensure_parallelism(df).withColumn(
        "__toks", tokens_col(F.col(text_col))
    )
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(float(stride)))
        .cast("int")
        + F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens))
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_id"),
            F.col("c.chunk_text"),
            F.col("c.n_tokens"),
        )
    )


def _pack_shard_bounds(
    out: DataFrame, id_col: str, part_col: str, rows_per_shard: int
) -> DataFrame | None:
    """Per-source ``id_col`` cut points for sources larger than
    ``rows_per_shard`` rows, or None when no source needs sharding.

    Returns a tiny (part_col, __cuts array) frame — one row per OVERSIZED
    source only (count bounded by total_rows / rows_per_shard), built with a
    broadcast semi-join, never a literal IN chain. Cut placement comes from
    ``percentile_approx`` so it is only approximately balanced — exactness
    of the packing offsets never depends on where the cuts fall, only on
    the cut function being monotone in ``id_col`` (it is: shard = number of
    cuts <= id).

    The sharded path requires a NUMERIC ``id_col`` (percentile_approx
    rejects strings); non-numeric ids return None so the caller keeps the
    always-correct single-window plan — sorting strings works there, it
    just foregoes the dominant-source parallelism upgrade."""
    from pyspark.sql import types as T

    if not isinstance(out.schema[id_col].dataType, T.NumericType):
        return None
    big = (
        out.groupBy(part_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > rows_per_shard)
        .select(part_col, "__n")
        .collect()
    )
    if not big:
        return None
    # cap the cut count: 4096 shards is ample parallelism at any scale,
    # and an uncapped k puts k-1 literal fractions into the percentile
    # expression — the IVF-cells/LSH-buckets literal-explosion class
    k = min(4096, max(-(-int(r["__n"]) // rows_per_shard) for r in big))
    fracs = [i / k for i in range(1, k)]
    big_df = out.sparkSession.createDataFrame(
        [(r[part_col],) for r in big],
        _schema_of(out, part_col),
    ).withColumnRenamed(part_col, "__big_src")
    return (
        # null-safe semi join: a NULL-valued source can be the oversized one
        out.join(
            F.broadcast(big_df),
            F.col(part_col).eqNullSafe(F.col("__big_src")),
            "left_semi",
        )
        .groupBy(part_col)
        .agg(F.percentile_approx(id_col, fracs, 10_000).alias("__cuts"))
    )


def _schema_of(df: DataFrame, col: str):
    from pyspark.sql import types as T

    return T.StructType([T.StructField(col, df.schema[col].dataType)])


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
    rows_per_shard: int = 4_000_000,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document its position
    in a stream of fixed-size training packs.

    The standard LM data prep step — documents are concatenated (per
    ``part_col`` stream, in ``id_col`` order) and the token stream is cut
    every ``budget`` tokens. For each document this returns where it landed:
    ``start_offset`` (tokens before it in its stream), ``pack_id`` (the pack
    its first token falls in) and ``packs_spanned`` (how many packs it
    straddles; 0 for empty docs). All integer window arithmetic, exact in
    any SQL engine (the driver oracle mirrors it with the same window sum).

    100 TB posture: a per-source window alone would serialize a dominant
    source into ONE reducer (the r4 scale hazard), so sources larger than
    ``rows_per_shard`` rows are auto-split into id-range shards: a local
    window runs within each (source, shard) — parallelism = shard count —
    and exact global offsets are composed by adding the per-shard prefix
    sums (a tiny broadcast frame, sources x shards rows). Equal ids land in
    the same shard, so RANGE-frame tie semantics are bit-identical to the
    single-window form. When no source is oversized the original one-window
    plan runs unchanged. The sharded upgrade needs a NUMERIC ``id_col``
    (its cuts come from percentile_approx); string ids always take the
    single-window plan, which sorts them fine.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError("budget must be positive")
    n = token_count(F.col(text_col))
    out = df.select(
        F.col(part_col),
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
    )
    bounds = _pack_shard_bounds(out, id_col, part_col, rows_per_shard)
    if bounds is None:
        w = Window.partitionBy(part_col).orderBy(id_col)
        cum = F.sum("n_tokens").over(w)
    else:
        # shard = count of cuts <= id: monotone in id, ties co-located.
        # ALL source-keyed joins here are NULL-SAFE: a NULL-valued source
        # is a real stream (the window's partitionBy groups it), and a
        # name-list equality join would silently DROP its rows when the
        # sharded path engages
        bcuts = F.broadcast(
            bounds.select(
                F.col(part_col).alias("__bnd_src"), "__cuts"
            )
        )
        sharded = (
            out.join(bcuts, F.col(part_col).eqNullSafe(F.col("__bnd_src")),
                     "left")
            .withColumn(
                "__shard",
                F.when(F.col("__cuts").isNull(), F.lit(0)).otherwise(
                    F.size(F.filter("__cuts", lambda c: c <= F.col(id_col)))
                ),
            )
            .drop("__cuts", "__bnd_src")
        )
        # exclusive prefix of earlier shards' token totals, per source —
        # computed on the tiny per-shard frame, then broadcast back
        shard_tot = sharded.groupBy(part_col, "__shard").agg(
            F.sum("n_tokens").alias("__tot")
        )
        wb = (
            Window.partitionBy(part_col)
            .orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        shard_base = shard_tot.select(
            F.col(part_col).alias("__base_src"),
            F.col("__shard").alias("__base_shard"),
            F.coalesce(F.sum("__tot").over(wb), F.lit(0)).alias("__base"),
        )
        wl = Window.partitionBy(part_col, "__shard").orderBy(id_col)
        out = sharded.join(
            F.broadcast(shard_base),
            F.col(part_col).eqNullSafe(F.col("__base_src"))
            & (F.col("__shard") == F.col("__base_shard")),
            "inner",
        ).drop("__base_src", "__base_shard")
        cum = F.col("__base") + F.sum("n_tokens").over(wl)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    pack_id = F.floor((cum - F.col("n_tokens")) / budget)
    end_pack = F.floor((cum - 1) / budget)
    return out.select(
        part_col,
        id_col,
        "n_tokens",
        start,
        pack_id.alias("pack_id"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(end_pack - pack_id + 1)
        .cast("long")
        .alias("packs_spanned"),
    )


def length_bucketed_batches(
    df: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    rows_per_shard: int = 4_000_000,
) -> DataFrame:
    """Padding-efficient batch assignment: documents are grouped into
    power-of-two LENGTH BUCKETS (bucket = floor(log2(n_tokens)), empty docs
    bucket 0) and, within a bucket, batches of ``batch_size`` docs are cut
    in (n_tokens, id) order — so a batch's members have near-equal lengths
    and padding-to-max inside a batch stays small (the classic bucketed
    batching of sequence training). Returns (id, n_tokens, bucket,
    batch_idx, pos_in_batch) — deterministic, exact in any SQL engine.

    100 TB posture: the per-bucket ranking reuses ``pack_sequences``' shard
    upgrade — buckets larger than ``rows_per_shard`` rows are split by
    percentile cuts on ``n_tokens`` (monotone in the FIRST sort key, so
    equal lengths co-locate and tie semantics match the single window),
    ranks compose from a local row_number + broadcast per-shard COUNT
    prefix. A dozen-odd buckets never serialize into single reducers."""
    from pyspark.sql import Window

    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    # NULL text counts as an empty document (0 tokens, bucket 0): leaving
    # n_tokens NULL would sort NULLS FIRST in Spark's ascending window but
    # NULLS LAST in most SQL engines — a silent rank divergence
    n = F.coalesce(token_count(F.col(text_col)), F.lit(0))
    out = df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.floor(F.log2(F.greatest(n.cast("double"), F.lit(1.0))))
        .cast("int")
        .alias("bucket"),
    )
    bounds = _pack_shard_bounds(
        out, id_col="n_tokens", part_col="bucket",
        rows_per_shard=rows_per_shard,
    )
    if bounds is None:
        w = Window.partitionBy("bucket").orderBy("n_tokens", id_col)
        rank = F.row_number().over(w)
    else:
        bcuts = F.broadcast(
            bounds.select(F.col("bucket").alias("__bnd_b"), "__cuts")
        )
        sharded = (
            out.join(bcuts, F.col("bucket") == F.col("__bnd_b"), "left")
            .withColumn(
                "__shard",
                F.when(F.col("__cuts").isNull(), F.lit(0)).otherwise(
                    F.size(
                        F.filter("__cuts", lambda c: c <= F.col("n_tokens"))
                    )
                ),
            )
            .drop("__cuts", "__bnd_b")
        )
        shard_cnt = sharded.groupBy("bucket", "__shard").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        wb = (
            Window.partitionBy("bucket")
            .orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        shard_base = shard_cnt.select(
            F.col("bucket").alias("__base_b"),
            F.col("__shard").alias("__base_s"),
            F.coalesce(F.sum("__cnt").over(wb), F.lit(0)).alias("__base"),
        )
        wl = Window.partitionBy("bucket", "__shard").orderBy(
            "n_tokens", id_col
        )
        out = sharded.join(
            F.broadcast(shard_base),
            (F.col("bucket") == F.col("__base_b"))
            & (F.col("__shard") == F.col("__base_s")),
        ).drop("__base_b", "__base_s")
        rank = F.col("__base") + F.row_number().over(wl)
    return out.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor((rank - 1) / batch_size).cast("long").alias("batch_idx"),
        ((rank - 1) % batch_size).cast("int").alias("pos_in_batch"),
    )


def batch_padding_stats(batches: DataFrame) -> DataFrame:
    """Per-batch padding report over ``length_bucketed_batches`` output:
    (bucket, batch_idx, n_docs, max_len, sum_len, padding_frac) where
    padding_frac = wasted fraction when every member pads to the batch
    max. One map-side-combined aggregate."""
    return (
        batches.groupBy("bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_len"),
        )
        .withColumn(
            "padding_frac",
            F.when(
                F.col("max_len") * F.col("n_docs") == 0, F.lit(0.0)
            ).otherwise(
                1.0
                - F.col("sum_len") / (F.col("max_len") * F.col("n_docs"))
            ),
        )
    )


def tfidf_hash_features(
    df: DataFrame, id_col: str, text_col: str, dim: int = 1024
) -> DataFrame:
    """Hashed TF-IDF features: (id, bucket, weight) — the text->vector
    bridge for the similarity operators (hashing trick: md5-prefix of the
    token modulo ``dim``; colliding tokens sum).

    weight = tf * (ln((N+1)/(df+1)) + 1), L2-normalized per document and
    rounded to 6 dp (the oracle-portability grid). Every hash piece (md5,
    hex->int, modulo) is portable SQL — the same trick sampling.hash_split
    relies on — so any engine recomputes the features bit-for-bit.

    Scale: token tf and df are map-side-combined aggregations; N is a
    single-row broadcast; bucketing is a narrow map; normalization is one
    window keyed by doc id. No collects, nothing all-pairs.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"),
    )
    tf = toks.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % dim
    )
    weighted = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            bucket.alias("bucket"),
            (
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1)
            ).alias("w"),
        )
        .groupBy("__id", "bucket")
        .agg(F.sum("w").alias("w"))
    )
    from pyspark.sql import Window

    norm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("__id")))
    return weighted.select(
        F.col("__id").alias(id_col),
        "bucket",
        F.round(F.col("w") / norm, 6).alias("weight"),
    )


def tfidf_vectors(
    df: DataFrame, id_col: str, text_col: str, dim: int = 1024
) -> DataFrame:
    """Dense array<double> form of tfidf_hash_features — plugs directly
    into the similarity operators (cosine top-k, LSH, IVF, PQ)."""
    feats = tfidf_hash_features(df, id_col, text_col, dim)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
    )
    return (
        feats.groupBy(id_col)
        .agg(m.alias("__m"))
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("__m", i.cast("long")), F.lit(0.0)),
            ).alias("features"),
        )
    )
