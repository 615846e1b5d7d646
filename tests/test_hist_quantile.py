"""Mergeable histogram quantiles (approxHistogram analog): cube partials
merge to the SAME answer as row-grain evaluation, DuckDB reproduces the
estimator bit-exactly, and the estimate is within one bin width of the true
percentile."""

from __future__ import annotations

import duckdb
import pytest

from pysparkline import ir, lowering
from pysparkline.lowering import Backing
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ectx(spark):
    from pysparkline.events_index import build_or_load_events_index
    from pysparkline.session import OlapContext

    return OlapContext(spark, build_or_load_events_index(spark, SF_DIR))


def _spec(fraction=0.9, lo=0.0, hi=512.0, nbins=64):
    return ir.GroupByQuery(
        dimensions=[ir.DefaultDim("event_type")],
        aggregations=[
            ir.HistQuantileAgg("p", "value", fraction=fraction, lo=lo,
                               hi=hi, nbins=nbins)
        ],
    )


def test_cube_and_flat_bit_identical(ectx):
    spec, backing, dec = ectx.plan(_spec())
    assert dec.backing == "cube"
    cube = {r.event_type: r.p for r in ectx.query(_spec()).collect()}
    flat = {
        r.event_type: r.p
        for r in lowering.lower(spec, Backing.flat(ectx.index)).collect()
    }
    assert cube == flat  # exact equality, not tolerance


def test_matches_duckdb_estimator_and_error_bound(ectx):
    got = {r.event_type: r.p for r in ectx.query(_spec()).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = {
        r[0]: r[1]
        for r in con.execute("""
WITH b AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR((CAST(value AS DOUBLE) - 0.0)/8.0), 0), 63)
              AS INT) AS bin
  FROM events WHERE value IS NOT NULL
), h AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
w AS (SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS total FROM h)
SELECT event_type,
       arg_min(0.0 + 8.0*(bin + (CAST(0.9 AS DOUBLE)*CAST(total AS DOUBLE)
                                 - CAST(cum - c AS DOUBLE))/CAST(c AS DOUBLE)),
               bin)
         FILTER (WHERE CAST(cum AS DOUBLE) >=
                       CAST(0.9 AS DOUBLE)*CAST(total AS DOUBLE) AND c > 0)
FROM w GROUP BY 1
""").fetchall()
    }
    assert got == want  # bit-exact: both run the same double arithmetic
    exact = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.9) "
            "FROM events GROUP BY 1"
        ).fetchall()
    }
    binw = 512.0 / 64
    assert all(abs(got[k] - exact[k]) <= binw for k in exact)


def test_mismatched_params_fall_back_to_flat(ectx):
    # a histogram the cube does not carry (different bin count) cannot ride
    # the pre-agg path — the planner must fall back, still answering exactly
    spec, backing, dec = ectx.plan(_spec(nbins=32))
    assert dec.backing == "flat"
    assert any("no matching hist" in n for n in dec.notes)
    out = {r.event_type: r.p for r in ectx.query(_spec(nbins=32)).collect()}
    assert len(out) == 5 and all(v is not None for v in out.values())


def test_hist_survives_append_and_compaction(spark, tmp_path):
    """Streamed-in cube partials and compaction both preserve the histogram:
    quantiles after append+compact equal row-grain evaluation over ALL rows."""
    from pyspark.sql import functions as F

    from pysparkline.events_index import events_index_config, events_star
    from pysparkline.index import OlapIndex
    from pysparkline.session import OlapContext
    from pysparkline.streaming.ingest import StreamingIngest
    from pysparkline.tpch import read_events

    ev = read_events(spark, SF_DIR)
    cfg = events_index_config()
    split = "2024-01-15"
    idx = OlapIndex.build(
        spark, ev.where(F.col("ts") < split), cfg, str(tmp_path / "idx"),
        star=events_star(),
    )
    ing = StreamingIngest(idx)
    ing.process_batch(ev.where(F.col("ts") >= split), 0)
    ing.compact("types")
    ctx = OlapContext(spark, idx)
    spec, backing, dec = ctx.plan(_spec())
    assert dec.backing == "cube"
    got = {r.event_type: r.p for r in ctx.query(_spec()).collect()}
    want = {
        r.event_type: r.p
        for r in lowering.lower(spec, Backing.base(ev, "ts")).collect()
    }
    assert got == want
