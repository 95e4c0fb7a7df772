"""Local driver-style correctness harness: run queries() vs oracle_sql()
at a given sf and compare row-count + sorted-by-name column values."""
import sys, math
import duckdb
import __spark_entry__ as E
from frontier_engine.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = sys.argv[2:] or None
spark = get_spark(master='local[16]', shuffle_partitions=16)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def normval(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return round(v, 9)
    return v

qs, os_ = E.queries(), E.oracle_sql()
fails = []
for name, fn in qs.items():
    if only and name not in only: continue
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        sset = sorted(tuple(normval(r[c]) for c in scols) for r in srows)
    except Exception as e:
        print(f"{name}: SPARK ERROR {str(e)[:200]}"); fails.append(name); continue
    if name not in os_:
        print(f"{name}: rows-only, {len(srows)} rows"); continue
    try:
        ddf = con.execute(os_[name]).fetch_df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {str(e)[:200]}"); fails.append(name); continue
    dcols = sorted(ddf.columns)
    if dcols != scols:
        print(f"{name}: SCHEMA MISMATCH spark={scols} duck={dcols}"); fails.append(name); continue
    drows = sorted(tuple(normval(v) for v in row) for row in ddf[scols].itertuples(index=False, name=None))
    if len(drows) != len(sset):
        print(f"{name}: ROWCOUNT spark={len(sset)} duck={len(drows)}"); fails.append(name); continue
    if drows != sset:
        diff = [i for i,(a,b) in enumerate(zip(sset,drows)) if a!=b][:3]
        print(f"{name}: VALUE MISMATCH at {diff[:3]}")
        for i in diff[:2]:
            print("   spark:", sset[i], "\n   duck :", drows[i])
        fails.append(name); continue
    print(f"{name}: OK ({len(sset)} rows)")
print("\nFAILURES:", fails if fails else "none")
spark.stop()
