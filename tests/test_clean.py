"""Corpus-cleaning operators: decontamination, boilerplate pruning, PII
redaction — semantics on synthetic fixtures (the testdata corpus has no
newlines or PII, so the driver queries exercise parity while these exercise
behavior)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pysparkline.operators import clean


def test_decontaminate_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally unrelated words nothing shared here at all folks ok"),
            (3, "x alpha beta gamma delta epsilon zeta eta theta end"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = {
        (r.corpus_id, r.bench_id): r.n_shared_grams
        for r in clean.decontaminate(corpus, bench, "doc_id", "text", n=8).collect()
    }
    # doc 1 and 3 contain the full benchmark 8-gram; doc 2 shares nothing
    assert set(out) == {(1, 100), (3, 100)}
    assert all(v >= 1 for v in out.values())


def test_decontaminate_short_docs_whole_text_gram(spark):
    # docs shorter than n fall back to their whole text as one gram — an
    # exact short-text match is still contamination
    corpus = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    out = clean.decontaminate(corpus, bench, "doc_id", "text", n=8).collect()
    assert len(out) == 1 and out[0].n_shared_grams == 1


def test_prune_frequent_units_lines(spark):
    header = "COOKIE BANNER"
    docs = [
        (1, f"{header}\nreal content one\nmore text"),
        (2, f"{header}\nreal content two"),
        (3, f"{header}\nreal content three"),
        (4, "no banner here\njust text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r.clean_text
        for r in clean.prune_frequent_units(
            df, "doc_id", "text", delimiter="\n", min_doc_frac=0.5, min_docs=2
        ).collect()
    }
    assert out[1] == "real content one\nmore text"
    assert out[2] == "real content two"
    assert out[4] == "no banner here\njust text"
    assert header not in "\n".join(out.values())


def test_prune_all_boilerplate_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.clean_text
        for r in clean.prune_frequent_units(
            df, "doc_id", "text", min_doc_frac=0.5, min_docs=2
        ).collect()
    }
    assert out == {1: "", 2: "", 3: ""}


def test_prune_preserves_unit_order(spark):
    # kept units must come back in original order, not collection order
    df = spark.createDataFrame(
        [(1, "z\na\nm\nb"), (2, "unrelated")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.clean_text
        for r in clean.prune_frequent_units(
            df, "doc_id", "text", min_doc_frac=0.9, min_docs=2
        ).collect()
    }
    assert out[1] == "z\na\nm\nb"


PII_FIXTURES = [
    (1, "contact john.doe+spam@example.co.uk or admin@host.io today"),
    (2, "server at 192.168.0.1 and card 1234567890123456 leaked"),
    (3, "clean text with the number 12345678 (too short to redact)"),
    (4, "mixed: a@b.com from 10.0.0.255 acct 999999999"),
]


def test_redact_pii_fixtures(spark):
    df = spark.createDataFrame(PII_FIXTURES, "doc_id long, text string")
    out = {r.doc_id: r for r in clean.redact_pii(df, "doc_id", "text").collect()}
    assert out[1].clean_text == "contact <EMAIL> or <EMAIL> today"
    assert out[1].n_email == 2 and out[1].n_ipv4 == 0
    assert out[2].clean_text == "server at <IPV4> and card <LONG_DIGITS> leaked"
    assert out[3].clean_text == PII_FIXTURES[2][1]  # untouched
    assert out[4].n_email == 1 and out[4].n_ipv4 == 1 and out[4].n_long_digits == 1


def test_redact_pii_matches_duckdb_on_fixtures(spark):
    """Regex-dialect parity: the same portable patterns produce byte-identical
    redactions in Java regex (Spark) and RE2 (DuckDB)."""
    df = spark.createDataFrame(PII_FIXTURES, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.clean_text, r.n_email, r.n_ipv4, r.n_long_digits)
        for r in clean.redact_pii(df, "doc_id", "text").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in PII_FIXTURES)
        + ") AS t(doc_id, text)"
    )
    email, ipv4, digits = (
        clean.PII_PATTERNS["email"],
        clean.PII_PATTERNS["ipv4"],
        clean.PII_PATTERNS["long_digits"],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(text,
                '{email}', '<EMAIL>', 'g'),
                '{ipv4}', '<IPV4>', 'g'),
                '{digits}', '<LONG_DIGITS>', 'g'),
              CAST(len(regexp_extract_all(text, '{email}')) AS INTEGER),
              CAST(len(regexp_extract_all(text, '{ipv4}')) AS INTEGER),
              CAST(len(regexp_extract_all(text, '{digits}')) AS INTEGER)
            FROM d
            """
        ).fetchall()
    )
    assert got == want


def test_chunk_documents_coverage_and_overlap(spark):
    from pysparkline.operators import text as t

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc"), (3, "")],
                               "doc_id long, text string")
    out = t.chunk_documents(df, "doc_id", "text", chunk_tokens=32, overlap=8)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: 100 tokens, stride 24 -> ceil(68/24)+1 = 4 chunks
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2, 3]
    # consecutive chunks overlap by exactly 8 tokens
    c0 = rows[(1, 0)].chunk_text.split()
    c1 = rows[(1, 1)].chunk_text.split()
    assert c0[-8:] == c1[:8] and len(c0) == 32
    # every token appears in order across chunks (strided reconstruction)
    recon = c0 + [tok for cid in (1, 2, 3)
                  for tok in rows[(1, cid)].chunk_text.split()[8:]]
    assert recon == words.split()
    # last chunk is short: tokens 72..99 = 28
    assert rows[(1, 3)].n_tokens == 28
    # short doc: one whole chunk; empty doc: one empty chunk
    assert rows[(2, 0)].chunk_text == "short doc" and rows[(2, 0)].n_tokens == 2
    assert rows[(3, 0)].chunk_text == "" and rows[(3, 0)].n_tokens == 0


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from pysparkline.operators import text as t

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        t.chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_repetition_stats_fixture(spark):
    """Known-geometry fixtures: exact Gopher-signal values."""
    from pysparkline.operators.clean import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 lines, one duplicated; "a b" bigram twice out of 5
            (1, "a b c\na b c\nx y\nz w"),
            # single line, all-distinct bigrams
            (2, "one two three"),
            # pathological: one word repeated
            (3, "spam spam spam spam"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert abs(r1.dup_line_frac - 0.25) < 1e-12       # 4 lines, 3 distinct
    assert abs(r1.max_line_frac - 0.5) < 1e-12        # "a b c" twice / 4
    # bigrams: (a,b) (b,c) (c,a) (a,b) (b,c) (c,x) (x,y) (y,z) (z,w) = 9,
    # top (a,b) or (b,c) twice
    assert abs(r1.top_bigram_frac - 2 / 9) < 1e-12
    r2 = rows[2]
    assert r2.dup_line_frac == 0.0 and r2.max_line_frac == 1.0
    assert abs(r2.top_bigram_frac - 0.5) < 1e-12      # 2 distinct of 2
    r3 = rows[3]
    assert abs(r3.top_bigram_frac - 1.0) < 1e-12      # all bigrams equal


def test_semantic_decontaminate(spark):
    """Planted paraphrase-neighbor found; verdicts thresholded; argmax
    ties break to the smaller bench id; corpus never shuffles (broadcast
    bench)."""
    from pysparkline.operators import clean

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.6, 0.8, 0.0])],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        # 100 and 101 are BOTH identical to corpus 0 -> tie, smaller id wins
        [(101, [2.0, 0.0, 0.0]), (100, [1.0, 0.0, 0.0]),
         (102, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in clean.semantic_decontaminate(
        corpus, bench, threshold=0.9).collect()}
    assert out[0].bench_id == 100 and out[0].cosine == 1.0
    assert out[0].contaminated
    assert not out[1].contaminated and out[1].cosine == 0.0
    assert out[2].bench_id in (100, 101) and not out[2].contaminated
    plan = clean.semantic_decontaminate(
        corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_semantic_decontaminate_string_bench_ids(spark):
    """ADVICE r7 #5: STRING benchmark ids (the common eval-set shape) must
    work — the argmax orders ties without negating the id — and ties still
    break to the lexicographically smallest bench id."""
    from pysparkline.operators import clean

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        # mmlu-b and mmlu-a are BOTH parallel to corpus 0 -> tie, 'mmlu-a'
        [("mmlu-b", [3.0, 0.0]), ("mmlu-a", [1.0, 0.0]),
         ("gsm8k-1", [0.0, 0.5])],
        "vec_id string, embedding array<float>",
    )
    out = {r.vec_id: r for r in clean.semantic_decontaminate(
        corpus, bench, threshold=0.9).collect()}
    assert out[0].bench_id == "mmlu-a" and out[0].cosine == 1.0
    assert out[0].contaminated
    assert out[1].bench_id == "gsm8k-1" and out[1].contaminated
