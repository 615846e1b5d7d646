"""Corpus-cleaning operators for training-data pipelines: benchmark
decontamination, over-frequent-unit (boilerplate) pruning, and PII redaction.

All three stay JVM-side (split/explode/join/window/regexp — no Python in the
hot path) and are shaped for the 100 TB case:

- decontamination joins the (huge) corpus gram stream against a DISTINCT,
  usually-small benchmark gram set — Spark broadcasts it when it fits, and
  non-matching corpus grams die at the join before any shuffle of documents;
- boilerplate pruning is two shuffles (unit document-frequency, then
  per-document reconstruction), both with map-side combine;
- redaction is a narrow map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _token_ngrams(text: Column, n: int) -> Column:
    """Distinct lowercase token n-grams of ``text`` (same construction as
    dedup.ngram_jaccard_pairs, shared convention: whitespace tokens,
    space-joined)."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Benchmark contamination report: (corpus_id, bench_id, n_shared_grams)
    for every corpus document sharing at least one token ``n``-gram with a
    benchmark document.

    The standard eval-set decontamination check (n-gram collision against
    held-out benchmarks) as a pure DataFrame plan: explode distinct n-grams
    on both sides, inner-join on the gram, count collisions per (corpus,
    bench) pair. The benchmark side is DISTINCT grams per bench doc and is
    small in practice — Spark/AQE broadcasts it, so the corpus NEVER
    shuffles: contaminated rows reduce at the (tiny) pair aggregation.

    Filtering the corpus is then a semi/anti join of ids against this
    report. n defaults to 8 — large enough that natural collisions are rare,
    the usual choice for contamination sweeps.
    """
    from pysparkline.operators.util import ensure_parallelism

    bid = bench_id_col or id_col
    btext = bench_text_col or text_col
    # the per-document tokenize + n-gram explode is the expensive stage; a
    # narrow single-file corpus would run it all on one core (no-op on
    # fleet-wide inputs). The bench side stays unspread: it broadcasts.
    cg = ensure_parallelism(corpus).select(
        F.col(id_col).alias("corpus_id"),
        F.explode(_token_ngrams(F.col(text_col), n)).alias("gram"),
    )
    bg = bench.select(
        F.col(bid).alias("bench_id"),
        F.explode(_token_ngrams(F.col(btext), n)).alias("gram"),
    )
    return (
        cg.join(bg, "gram")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    threshold: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic sibling of
    :func:`decontaminate`: paraphrased or reformatted eval questions share
    no 8-gram with the corpus but sit next to it in embedding space.
    Returns per corpus row (id, bench_id, cosine, contaminated): its
    single nearest benchmark item (ties: higher cosine, then smaller
    bench id) and whether that cosine reaches ``threshold``. Filtering is
    then a semi/anti join of ids, exactly like the n-gram report.

    The benchmark side is broadcast (eval sets are small by nature — for
    a benchmark too big to broadcast, use ``similarity.knn_join`` with
    the bench as the query side and threshold the result); the corpus is
    scanned once — the per-row argmax folds in the map-side partial
    aggregate. A narrow single-file corpus is spread across the fleet
    first (``ensure_parallelism``, a no-op on wide production inputs):
    corpus-rows x bench-rows cosine folds are CPU-dense, and a one-split
    scan would run them all on one core. Cosines are JVM-side (zip_with
    fold, zero-norm -> 0.0) and rounded BEFORE the argmax so the
    nearest-item choice is engine-reproducible."""
    from pysparkline.operators.similarity import cosine_similarity_col
    from pysparkline.operators.util import ensure_parallelism

    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    b = F.broadcast(
        bench.select(
            F.col(bid).alias("__bid"), F.col(bvec).alias("__bv")
        )
    )
    cos = F.round(
        cosine_similarity_col(F.col("__cv"), F.col("__bv")), round_to
    )
    sims = ensure_parallelism(corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    )).crossJoin(b).select(
        "__cid",
        "__bid",
        cos.alias("__cos"),
    )
    # argmax via min_by on (-cosine, bench_id): highest cosine, ties to the
    # smallest bench id — one map-side-combined aggregate, no window. The
    # ordering negates the COSINE (always numeric), not the bench id, so
    # string benchmark ids — a common eval-set id shape — work too
    # (ADVICE r7 #5: the old (cos, -bid) struct-max raised AnalysisException
    # for string ids).
    best = sims.groupBy("__cid").agg(
        F.min_by(
            F.struct(F.col("__bid"), F.col("__cos")),
            F.struct((-F.col("__cos")).alias("__nc"), F.col("__bid")),
        ).alias("__best")
    )
    return best.select(
        F.col("__cid").alias(id_col),
        F.col("__best.__bid").alias("bench_id"),
        F.col("__best.__cos").alias("cosine"),
        (F.col("__best.__cos") >= F.lit(float(threshold))).alias(
            "contaminated"
        ),
    )


def prune_frequent_units(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str = "\n",
    min_doc_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Remove units (lines by default) that occur in too many documents —
    the C4-style boilerplate filter (nav bars, cookie banners, licence
    headers repeat verbatim across pages).

    A unit is boilerplate when it appears in ≥ ``min_docs`` documents AND in
    ≥ ``min_doc_frac`` of all documents. ``delimiter`` is a regex (Spark
    split semantics); keep it a plain character for oracle parity. Output: (id, clean_text) for EVERY
    input document (all-boilerplate documents come back as ''), with
    surviving units in their original order.

    Shape: split → posexplode (narrow), document-frequency per unit (shuffle
    1, map-side combined), anti-join against the flagged set (broadcast when
    small — the flagged set is bounded by NDV(units), further cut by the
    threshold), re-assemble per document (shuffle 2). No per-row Python.
    """
    units = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), delimiter, -1)).alias(
            "pos", "unit"
        ),
    )
    # corpus size enters the plan as a broadcast 1-row aggregate (no eager
    # driver count; the whole operator stays one lazy plan)
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    dfreq = units.groupBy("unit").agg(
        F.count_distinct("id").alias("__df")
    )
    boiler = (
        dfreq.crossJoin(F.broadcast(total))
        .where(
            (F.col("__df") >= F.lit(int(min_docs)))
            & (
                F.col("__df")
                >= F.ceil(F.lit(float(min_doc_frac)) * F.col("__total"))
            )
        )
        .select("unit")
    )
    kept = units.join(boiler, "unit", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("unit")))
                ),
                lambda s: s["unit"],
            ),
        ).alias("clean_text")
    )
    # every input id comes back, even when all units were pruned
    return (
        df.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


# portable regexes (no lookarounds/backrefs): Java regex and RE2-class
# engines (DuckDB) read these identically — the oracle-parity property
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "long_digits": r"\b[0-9]{9,}\b",
}


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact common PII shapes (emails, IPv4 addresses, ≥9-digit runs) to
    typed placeholders and count the replacements per kind.

    Order matters: emails first (their local parts may contain digit runs),
    then IPs (dotted digits would otherwise partially match long_digits),
    then bare digit runs. The redaction itself is a narrow codegen-friendly
    map; narrow single-file corpora additionally pay one AQE-exempt spread
    exchange so the six regex passes use the whole fleet (wide inputs
    skip it — ensure_parallelism doc).
    """
    from .util import ensure_parallelism

    # six regex passes per doc: spread narrow single-file corpora across
    # the fleet first (one scan split runs them all on one core; measured
    # 0.49 -> 0.35 s at bench SF, wide inputs skip the repartition)
    df = ensure_parallelism(df)
    text = F.col(text_col)
    counts = {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }
    red = text
    for kind in ("email", "ipv4", "long_digits"):
        red = F.regexp_replace(red, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.select(
        F.col(id_col),
        red.alias("clean_text"),
        *[counts[k].cast("int").alias(f"n_{k}") for k in PII_PATTERNS],
    )


def _max_sorted_run(arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e. the
    count of the most frequent element — as a pure fold (no explode, no
    shuffle; the narrow-map formulation of per-doc mode counting)."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1))
        .otherwise(acc["run"] + 1)
        .alias("run"),
        F.greatest(
            acc["best"],
            F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1))
            .otherwise(acc["run"] + 1),
        ).alias("best"),
    )
    return F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    append: bool = False,
) -> DataFrame:
    """Gopher-style repetition signals per document (public Rae et al. 2021
    quality rules): duplicate-line fraction, most-frequent-line fraction,
    and most-frequent word-bigram fraction. Everything is array folds over
    a sorted copy (array_distinct / longest-equal-run) — a narrow map with
    zero shuffles at any corpus size; thresholding is the caller's filter.
    Fractions are exact integer ratios in double (DuckDB reproduces them
    bit-identically — the oracle property)."""
    if not append:
        # standalone mode: spread single-file corpora before the CPU-bound
        # array folds; append=True composes into fused pipelines
        from .util import ensure_parallelism

        df = ensure_parallelism(df)
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
    )
    words = F.filter(
        F.split(F.col(text_col), "\\s+"), lambda x: F.length(x) > 0
    )
    # zip words with their successors; zip_with pads the shorter side with
    # NULL, so slicing back to n-1 drops the padded tail pair
    shifted = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    paired = F.zip_with(words, shifted, lambda a, b: F.concat_ws("\x01", a, b))
    bigrams = F.slice(paired, 1, F.greatest(F.size(words) - 1, F.lit(0)))
    lead = list(df.columns) if append else [F.col(id_col)]
    # materialize the tokenized arrays ONCE: inlined, the line split was
    # re-evaluated for each of its four references and the whole
    # split->zip->slice bigram chain twice (multiply-referenced non-cheap
    # columns survive CollapseProject — measured 2.0 -> 0.6 s warm)
    staged = df.select(*lead, lines.alias("__ln"), bigrams.alias("__bi"))
    linesc, bigramsc = F.col("__ln"), F.col("__bi")
    n_lines = F.size(linesc)
    n_bi = F.size(bigramsc)
    return staged.select(
        *[c for c in staged.columns if c not in ("__ln", "__bi")],
        F.when(
            n_lines > 0,
            1.0 - F.size(F.array_distinct(linesc)).cast("double") / n_lines,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(
            n_lines > 0,
            _max_sorted_run(F.array_sort(linesc)).cast("double") / n_lines,
        )
        .otherwise(F.lit(0.0))
        .alias("max_line_frac"),
        F.when(
            n_bi > 0,
            _max_sorted_run(F.array_sort(bigramsc)).cast("double") / n_bi,
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def source_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    shingle_k: int = 5,
) -> DataFrame:
    """Pairwise shingle-overlap matrix between document groups — the
    train/test-leakage audit: how much character-shingle mass two sources
    (or two split assignments) share.

    Returns one row per unordered group pair (a < b):
    (group_a, group_b, shared_shingles, total_a, total_b) over DISTINCT
    k-char shingles per group. Plan: explode shingles -> distinct
    (group, shingle) [one map-side-combined shuffle] -> self-equi-join on
    shingle [shuffle or broadcast by size] -> pair counts. Per-shingle join
    fan-out is bounded by (#groups choose 2), never by corpus size, so the
    pair explosion a naive doc-level cross join would hit cannot occur.
    """
    from .dedup import shingle_set_col
    from .util import ensure_parallelism

    # per-document shingle-set construction is the CPU-dense stage and runs
    # upstream of the distinct shuffle — spread a narrow single-file input
    # across the fleet first (no-op on wide production inputs)
    gs = (
        ensure_parallelism(df).select(
            F.col(group_col).alias("g"),
            F.explode(shingle_set_col(text_col, shingle_k)).alias("sh"),
        )
        .distinct()
    )
    totals = gs.groupBy("g").agg(F.count(F.lit(1)).alias("total"))
    a, b = gs.alias("a"), gs.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    return (
        shared.join(totals.withColumnRenamed("g", "group_a"), "group_a")
        .withColumnRenamed("total", "total_a")
        .join(
            totals.withColumnRenamed("g", "group_b").withColumnRenamed(
                "total", "total_b"
            ),
            "group_b",
        )
        .select(
            "group_a", "group_b", "shared_shingles", "total_a", "total_b"
        )
    )
