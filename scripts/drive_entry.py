# Emulates the driver's smoke + correctness harness against /root/repo/__spark_entry__.py
import sys, importlib.util
import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())

rows = mod.entry(spark).collect()
print("T1 SMOKE: entry() rows =", len(rows)); print(rows[0])

qs, oracles = mod.queries(), mod.oracle_sql()
print("declared queries:", sorted(qs))
conn = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    conn.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
for name, fn in qs.items():
    spdf = fn(spark, "/root/testdata/sf0.01").toPandas()
    if name in oracles:
        odf = conn.execute(oracles[name]).df()
        spdf = spdf.reindex(sorted(spdf.columns), axis=1).sort_values(list(spdf.columns)).reset_index(drop=True)
        odf = odf.reindex(sorted(odf.columns), axis=1).sort_values(list(odf.columns)).reset_index(drop=True)
        exact = spdf.equals(odf) or (spdf.shape == odf.shape and (spdf.values == odf.values).all())
        print(f"T2 {name}: rows spark={len(spdf)} oracle={len(odf)} exact_value_match={exact}")
    else:
        print(f"T2 {name}: rows-only, rows={len(spdf)}")
