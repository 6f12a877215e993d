"""Gate replay for a named subset of queries: runs each query Spark-side
and value-compares against its DuckDB oracle with the driver-faithful
harness (tests/oracle_compare.py). Usage:

    python tools_gate_replay.py /root/testdata/sf0.01 query_a query_b ...

The per-query pre-screen used before introducing any new registry entry
(COVERAGE.md round-7 discipline)."""
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stockmarket_bigdata_project_spark import registry
from stockmarket_bigdata_project_spark.catalog import TABLES, table_path
from stockmarket_bigdata_project_spark.session import get_spark
from tests.oracle_compare import compare

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
names = sys.argv[2:]
spark = get_spark(app_name="scratch", shuffle_partitions=8)
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
    )
Q = registry.all_queries()
O = registry.all_oracle_sql()
fail = 0
for n in names:
    t0 = time.time()
    try:
        compare(Q[n](spark, sf), con, O[n], name=n)
        print(f"PASS {n} ({time.time()-t0:.1f}s)")
    except AssertionError as e:
        fail += 1
        print(f"FAIL {n}: {str(e)[:500]}")
    except Exception as e:
        fail += 1
        print(f"ERR  {n}: {type(e).__name__}: {str(e)[:500]}")
print("RESULT", "FAIL" if fail else "OK")
