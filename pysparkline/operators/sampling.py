"""Sampling operators for training-data pipelines: stratified sampling and
weighted source mixing.

Scale notes: both are pure narrow maps (`sampleBy` filters rows with a
per-stratum Bernoulli draw keyed by a seed — no shuffle at all); the only
aggregation is the optional exact post-count. Determinism: Spark's sample is
seed-stable for a fixed partitioning, so pipelines get reproducible subsets
as long as the input layout is stable (write the sampled output if you need
layout-independent reproducibility).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict | float,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling. ``fractions`` is either one rate for
    every stratum or a {stratum_value: rate} dict (missing strata => 0).

    A uniform rate needs no stratum enumeration at all (per-row Bernoulli is
    identical across strata), so that path is a pure narrow map with no
    driver-side distinct-collect — at 100 TB the dict form should likewise be
    built from upstream knowledge, not by enumerating the column."""
    if isinstance(fractions, float):
        return df.sample(withReplacement=False, fraction=fractions, seed=seed)
    return df.sampleBy(strata_col, fractions, seed)


def sample_counts(df: DataFrame, strata_col: str) -> DataFrame:
    """Exact per-stratum counts — the audit twin of stratified_sample."""
    return df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))


def mix_sources(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    seed: int = 42,
    tag_col: str = "__source",
) -> DataFrame:
    """Weighted mixture of datasets (the data-mixing step of a training
    pipeline): each source is independently subsampled at its weight and
    tagged. Weights are sampling RATES (0..1], not normalized proportions —
    compute rates upstream from target token budgets."""
    unknown = set(weights) - set(sources)
    missing = set(sources) - set(weights)
    if unknown or missing:
        raise ValueError(
            f"weights must cover every source exactly: unknown={sorted(unknown)}"
            f" missing={sorted(missing)} (pass an explicit 0.0 to drop a source)"
        )
    out = None
    for name in sorted(sources):
        rate = weights.get(name, 0.0)
        if rate <= 0:
            continue
        part = sources[name]
        if rate < 1.0:
            part = part.sample(withReplacement=False, fraction=rate, seed=seed)
        part = part.withColumn(tag_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("no source has positive weight")
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    salt: str = "",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic, content-keyed train/valid/test assignment.

    Seeded sampling is reproducible only for a fixed partition layout; a
    CONTENT hash survives re-sharding, re-ordering, and incremental appends
    — the property a 100 TB pipeline actually needs (the same document lands
    in the same split forever, so eval never leaks into train across
    re-builds). The key is md5 of the normalized text (same normalization as
    text.fingerprint), its first 8 hex chars read as an integer modulo
    ``buckets``, cut by cumulative weight. Pure narrow map, no shuffle; every
    piece (md5, hex->int, modulo) is portable SQL, so the assignment is
    oracle-checkable in any engine.
    """
    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), norm)), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    acc = 0.0
    expr = None
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt / total * buckets
        cond = bucket < int(round(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def shard_assignment(
    df: DataFrame, text_col: str = "text", n_shards: int = 16, salt: str = ""
) -> DataFrame:
    """+``shard`` column: content-keyed md5 bucket modulo ``n_shards``.

    Same normalization and hash as ``hash_split``/``text.fingerprint``, so a
    document lands in the same shard across re-shards, re-orders, and
    incremental appends — and the assignment is portable SQL, exactly
    oracle-checkable in any engine. Pure narrow map."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), norm)), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    return df.withColumn("shard", shard.cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    text_col: str = "text",
    salt: str = "",
) -> dict:
    """Materialize a curated corpus as ``shard=K/`` parquet directories plus
    a ``_shards.json`` manifest (per-shard row counts and an
    order-independent content checksum) — the handoff format a training job
    consumes shard-by-shard.

    Layout-independent by construction: shard membership is the content
    hash (``shard_assignment``), and the checksum is a SUM of per-row
    32-bit content hashes, so re-running over a re-partitioned or appended-
    then-deduped input produces byte-comparable manifests. One shuffle
    (repartition by shard) so each shard writes contiguously; file sizes
    stay writer-bounded via maxRecordsPerFile at scale."""
    import json as _json
    import os

    out = shard_assignment(df, text_col, n_shards, salt)
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    chk = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), norm)), 1, 8), 16, 10
    ).cast("long")
    (
        out.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    stats = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(chk).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "nShards": n_shards,
        "salt": salt,
        "shards": {
            int(r["shard"]): {"rows": int(r["rows"]), "checksum": int(r["checksum"])}
            for r in stats
        },
    }
    from ..index import atomic_json_dump

    atomic_json_dump(manifest, os.path.join(path, "_shards.json"))
    return manifest


def temperature_mix_rates(
    counts: dict[str, int], tau: float, target_rows: int | None = None
) -> dict[str, float]:
    """Per-source sampling rates for temperature-based mixing: source i is
    drawn with probability proportional to ``n_i ** tau`` (tau=1 keeps
    natural proportions; tau->0 flattens toward uniform — the standard
    multilingual/multi-source rebalancing recipe). Rates are clamped to 1
    (no replacement); ``target_rows`` scales the mix size, defaulting to
    the full corpus."""
    if tau < 0:
        raise ValueError("tau must be >= 0")
    if not counts or min(counts.values()) < 0:
        raise ValueError("counts must be non-negative and non-empty")
    total = sum(counts.values())
    if total == 0:
        return {k: 0.0 for k in counts}
    target = total if target_rows is None else target_rows
    weights = {k: (n ** tau if n > 0 else 0.0) for k, n in counts.items()}
    wsum = sum(weights.values())
    rates = {}
    for k, n in counts.items():
        want = target * weights[k] / wsum if wsum else 0.0
        rates[k] = min(1.0, want / n) if n else 0.0
    return rates


def temperature_mix(
    df: DataFrame,
    source_col: str,
    tau: float,
    text_col: str = "text",
    target_rows: int | None = None,
    salt: str = "",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic temperature-based source rebalancing over ONE tagged
    corpus: per-source rates come from ``temperature_mix_rates`` (counted
    with one map-side-combined aggregation), and row selection is the
    CONTENT-hash Bernoulli (`hash_split`'s md5 bucket < rate * buckets) —
    so the same document survives the mix across re-shards/appends and the
    selection is exact portable SQL, oracle-checkable in any engine (the
    property seeded `sample()` lacks). Selection is a broadcast join of the
    tiny (source, threshold) frame against the corpus — NOT a per-source
    OR-chain, so a per-domain mix with 10⁴+ sources doesn't blow up
    Catalyst analysis (same literal-explosion lesson as IVF cells / LSH
    buckets) — plus one narrow filter; the only job is the bounded
    per-source count. NULL-valued sources form their own bucket
    (null-safe join key) rather than crashing or silently vanishing; an
    empty corpus returns empty."""
    from pyspark.sql import types as T

    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df.where(F.lit(False))
    rates = temperature_mix_rates(counts, tau, target_rows)
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), norm)), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    # floor(x + 0.5), not round(): python round() is banker's rounding,
    # and the oracle-side SQL needs one reproducible half-up rule
    src_type = df.schema[source_col].dataType
    rates_df = df.sparkSession.createDataFrame(
        [(name, int(rate * buckets + 0.5)) for name, rate in rates.items()],
        T.StructType(
            [
                T.StructField("__mix_src", src_type),
                T.StructField("__mix_thresh", T.LongType()),
            ]
        ),
    )
    return (
        df.withColumn("__mix_bucket", bucket)
        .join(
            F.broadcast(rates_df),
            F.col(source_col).eqNullSafe(F.col("__mix_src")),
            "inner",
        )
        .where(F.col("__mix_bucket") < F.col("__mix_thresh"))
        .drop("__mix_src", "__mix_thresh", "__mix_bucket")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES, 2006): rank rows by ``u^(1/w)`` — equivalently
    ``ln(u)/w`` — and keep the top ``k`` (per group when ``group_col``
    is set). Inclusion probability is weight-proportional in the A-ES
    sense; the uniforms are CONTENT-KEYED (md5 of (id, seed) -> the
    first 52 hash bits as a uniform in (0,1)), so the selection is
    reproducible across partition layouts, re-shards, and engines — the
    ``hash_split``/``top_k_per_group`` determinism discipline, upgraded
    from uniform to weighted draws (quality- or length-proportional
    subsampling, the curation staple ``temperature_mix``'s Bernoulli
    rates cannot do with exact counts).

    Adds ``sample_rank`` (1 = first drawn). Rows with a NULL id or a
    NULL/non-positive weight are EXCLUDED (no defined key — and
    concat_ws would hash all NULL ids identically).

    Scale shape: the GLOBAL draw is orderBy(key).limit(k) — Spark's
    TakeOrderedAndProject keeps a k-row heap per partition and merges
    k-sized results, so no task ever sees more than its partition + k
    rows (an unpartitioned rank window would shuffle the ENTIRE corpus
    to one task); the rank is then assigned on the k surviving rows.
    The per-group draw is a partitioned rank window — one shuffle on
    the group key. Nothing corpus-sized is collected."""
    from pyspark.sql import Window

    out = df.where(
        F.col(id_col).isNotNull() & (F.col(weight_col) > 0)
    )
    # 52 hash bits -> exact double; +0.5 keeps u in (0,1) open interval
    v = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(int(seed)))
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    key = F.log((v + F.lit(0.5)) / F.lit(float(1 << 52))) / F.col(
        weight_col
    ).cast("double")
    if group_col:
        w = Window.partitionBy(group_col).orderBy(
            key.desc(), F.col(id_col).asc()
        )
        return (
            out.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= int(k))
        )
    cut = (
        out.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    w = Window.orderBy(F.col("__key").desc(), F.col(id_col).asc())
    # the rank window runs over the k SURVIVING rows only — single
    # partition by construction and bounded by k
    return cut.withColumn("sample_rank", F.row_number().over(w)).drop(
        "__key"
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic k-per-group sampling: exactly ``min(k, group size)``
    rows per group, selected by md5-hash rank over (id, seed) — the
    content-keyed determinism discipline of ``hash_split`` (survives
    re-sharding/appends of UNCHANGED rows, unlike seeded ``sample()``,
    whose row picks depend on partition layout), with an exact-count
    guarantee ``stratified_sample``'s Bernoulli draws cannot give.
    The md5 ranking is portable SQL, so the selection is reproducible by
    any engine (the driver oracle replays it verbatim). One shuffle on
    the group key; groups are window-partitioned, never collected.

    Rows with a NULL id are EXCLUDED: concat_ws silently drops NULL args,
    which would hash every NULL-id row identically (nondeterministic
    ties) and diverge from SQL engines whose ``||`` yields NULL — there
    is no deterministic, portable rank for an absent key."""
    from pyspark.sql import Window

    df = df.where(F.col(id_col).isNotNull())
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(str(int(seed)))))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(k))
        .drop("__rk")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): select raw documents whose hashed-n-gram feature
# distribution looks like a TARGET corpus, by importance weight
# p_target(features)/p_raw(features), then Gumbel-top-k resampling.
# The production method behind "make CommonCrawl look like Wikipedia"
# curation — fully relational here: two bucket-count tables (bounded by
# n_buckets, broadcast-class), one per-document log-sum, one top-k heap.
# ---------------------------------------------------------------------------


def _dsir_features(text) -> "F.Column":
    """Hashed-feature stream per document: lowercased whitespace unigrams
    + adjacent bigrams ("w1 w2") — the paper's hashed n-gram features.
    Empty/NULL text -> empty array (the document scores logw = 0 and
    competes on Gumbel noise alone)."""
    from .text import tokens_col

    toks = tokens_col(F.lower(text))
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(F.coalesce(toks, F.array().cast("array<string>")), bi)


# hard cap on dsir_weights' bucket count: the per-bucket count tables are
# collected to the driver and broadcast back (one row per non-empty bucket,
# ~24 bytes each), so 4M buckets bounds the collect at ~100 MB — broadcast
# class with headroom — where an uncapped n_buckets could OOM the driver
DSIR_MAX_BUCKETS = 4_000_000


def _dsir_bucket(feat, n_buckets: int) -> "F.Column":
    """Portable md5 feature bucket (the hash_split idiom: first 8 hex
    chars -> int -> modulo; identical SQL exists on every engine)."""
    return (
        F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("bigint")
        % F.lit(int(n_buckets))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``sum over feature occurrences of ln((c_target(b)+1)/(c_raw(b)+1))
    + n_features * ln((T_raw+B)/(T_target+B))`` — algebraically the
    add-one-smoothed ``ln(p_t/p_r)`` sum with the constant factored out
    so both engines compute the identical expression. Rounded to 6dp
    (the cross-engine float discipline every scoring row uses).

    Every feature bucket of a raw document exists in the raw counts by
    construction; target-side misses coalesce to 0. Documents with no
    features (empty/NULL text) get logw = 0.0.

    100 TB posture: the two count tables are bounded by ``n_buckets``
    (broadcast-class at the default 10k); the per-document sum is one
    map-side-combined aggregation over the exploded feature stream.

    ``n_buckets`` is capped at ``DSIR_MAX_BUCKETS``: the count tables are
    collected driver-side and rebuilt as broadcast local relations, so the
    bucket count IS the driver/executor memory bound — past broadcast
    class, raise instead of OOMing the driver (VERDICT r11 #4)."""
    from .util import ensure_parallelism

    if n_buckets > DSIR_MAX_BUCKETS:
        raise ValueError(
            f"n_buckets={n_buckets} exceeds DSIR_MAX_BUCKETS="
            f"{DSIR_MAX_BUCKETS}: the bucket-count tables are collected to "
            "the driver and broadcast, so the bucket count must stay "
            "broadcast-class; hash-feature weighting does not gain past "
            "~10k buckets anyway (DSIR paper setting)"
        )

    # feature explode + md5 bucketing is the CPU-dense stage: spread narrow
    # single-file inputs across the fleet first (no-op on wide inputs)
    feats_raw = ensure_parallelism(raw).select(
        F.col(id_col),
        F.explode_outer(_dsir_features(F.col(text_col))).alias("__feat"),
    ).withColumn("__b", _dsir_bucket(F.col("__feat"), n_buckets))
    feats_tgt = ensure_parallelism(target).select(
        F.explode(_dsir_features(F.col(text_col))).alias("__feat")
    ).withColumn("__b", _dsir_bucket(F.col("__feat"), n_buckets))
    # materialize each count table ONCE (bounded by n_buckets — driver-safe
    # by the same contract that lets them broadcast): the totals and the
    # per-doc join below otherwise each re-ran the full feature explode
    # (3 corpus passes + 2 target passes -> 1 each). Local relations keep
    # zero persist residue and the identical broadcast join.
    cr_rows = (
        feats_raw.where(F.col("__b").isNotNull()).groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__cr")).collect()
    )
    ct_rows = (
        feats_tgt.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct")).collect()
    )
    spark = raw.sparkSession
    cr = spark.createDataFrame(cr_rows, "__b bigint, __cr bigint")
    ct = spark.createDataFrame(ct_rows, "__b bigint, __ct bigint")
    tr = sum(r["__cr"] for r in cr_rows)
    tt = sum(r["__ct"] for r in ct_rows)
    const = float(n_buckets)
    # ln((T_raw+B)/(T_target+B)): exact same double both engines
    c_norm = F.log(
        (F.lit(float(tr)) + F.lit(const))
        / (F.lit(float(tt)) + F.lit(const))
    )
    per_doc = (
        feats_raw.join(F.broadcast(cr), "__b", "left")
        .join(F.broadcast(ct), "__b", "left")
        .withColumn(
            "__lr",
            F.when(
                F.col("__b").isNotNull(),
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(1.0))
                )
                + c_norm,
            ).otherwise(F.lit(0.0)),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__lr"), 6).alias("dsir_logw"))
    )
    return per_doc


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k over the importance weights — adding
    independent Gumbel noise to each log-weight and keeping the top k
    samples WITHOUT replacement proportionally to the (softmax of the)
    weights, exactly the paper's resampling step. The Gumbel uniforms
    are CONTENT-KEYED (md5 of (id, seed), the weighted_sample
    discipline), so the draw replays bit-for-bit across engines and
    partition layouts; the selection key rounds to 6dp with an id
    tie-break so marginal ULP drift cannot flip the cut.

    Scale shape: orderBy(key).limit(k) = TakeOrderedAndProject (k-row
    heap per partition; nothing corpus-sized shuffles or collects).
    Returns (id, dsir_logw, sample_rank). NULL-id rows are excluded
    (no defined uniform)."""
    from pyspark.sql import Window

    w = dsir_weights(raw, target, id_col, text_col, n_buckets)
    w = w.where(F.col(id_col).isNotNull())
    v = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(int(seed)))
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(1 << 52))
    key = F.round(
        F.col("dsir_logw") + (-F.log(-F.log(u))), 6
    )
    top = (
        w.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    rk = Window.orderBy(F.col("__key").desc(), F.col(id_col).asc())
    return (
        top.withColumn("sample_rank", F.row_number().over(rk))
        .select(id_col, "dsir_logw", "sample_rank")
    )
