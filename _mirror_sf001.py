"""Driver-mirror insurance run: every registered query at sf0.01 vs its
DuckDB oracle (rows + sorted-values compare, float-tolerant) — the same
check the driver applies to the first-50 window, run over ALL rows."""
import json
import math
import os
import sys

import duckdb

from pysparkline.session import get_spark

SF = os.environ.get("MIRROR_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, osql = e.queries(), e.oracle_sql()
bad = []
n_ok = n_rowsonly = 0
for name in qs:
    try:
        df = qs[name](spark, SF)
        got = [tuple(r) for r in df.collect()]
        if name not in osql:
            n_rowsonly += 1
            continue
        exp = [tuple(r) for r in con.execute(osql[name]).fetchall()]
        if len(got) != len(exp):
            bad.append((name, f"rows {len(got)} vs {len(exp)}"))
            continue
        sg, se = sorted(map(repr, [tuple(
            round(x, 6) if isinstance(x, float) else x for x in r) for r in got])), None

        def norm(rows):
            out = []
            for r in rows:
                rr = []
                for x in r:
                    if isinstance(x, float) or str(type(x)) == "<class 'decimal.Decimal'>":
                        v = float(x)
                        rr.append(0.0 if v == 0 else round(v, max(0, 6 - int(math.log10(abs(v))) if v else 6)))
                    else:
                        rr.append(x)
                out.append(tuple(rr))
            return sorted(map(repr, out))

        if norm(got) != norm(exp):
            g, x = norm(got), norm(exp)
            diff = [(a, b) for a, b in zip(g, x) if a != b][:2]
            bad.append((name, f"values {diff}"))
            continue
        n_ok += 1
    except Exception as ex:  # noqa: BLE001
        bad.append((name, f"ERR {type(ex).__name__}: {str(ex)[:150]}"))
print(json.dumps({"ok": n_ok, "rows_only": n_rowsonly, "bad": bad}))
sys.exit(1 if bad else 0)
