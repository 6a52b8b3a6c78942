"""Regenerate the pseudo-sf10 scale-experiment corpus (100 key-offset
copies of sf0.1) — the generator SCALING_r06.json references. Committed
here because /tmp copies vanish between rounds; run:
    python tools/make_sfx10.py   # writes /tmp/sfx10 (~1.4 GB)
Recipe: 60M lineitem, 15M orders, 10M
events, 500k documents (per-copy tail perturbation -> every doc has 99
near-identical twins), 200k embeddings (exact 100-twin groups); dims
fixed (copied once)."""
import shutil
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx10"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")
N = 100

con.execute(f"""
COPY (
  SELECT l_orderkey + c.c * 150000 AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', generate_series(0, {N-1}) c(c)
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")
print("lineitem done", flush=True)

con.execute(f"""
COPY (
  SELECT o_orderkey + c.c * 150000 AS o_orderkey,
         o_custkey + c.c * 15000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', generate_series(0, {N-1}) c(c)
) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")
print("orders done", flush=True)

con.execute(f"""
COPY (
  SELECT event_id + c.c * 100000 AS event_id, ts,
         user_id + c.c * 1500 AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet', generate_series(0, {N-1}) c(c)
) TO '{DST}/events.parquet' (FORMAT PARQUET)""")
print("events done", flush=True)

# documents: per-copy tail perturbation — same body, copy-specific tail
# token, so each doc has 99 NEAR-identical twins (the adversarial
# pre-dedup web shape)
con.execute(f"""
COPY (
  SELECT doc_id + c.c * 5000 AS doc_id,
         CASE WHEN c.c = 0 THEN text
              ELSE text || ' tail' || CAST(c.c AS VARCHAR) END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet', generate_series(0, {N-1}) c(c)
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
print("documents done", flush=True)

# embeddings: exact 100-twin groups (same vector, offset id)
con.execute(f"""
COPY (
  SELECT vec_id + c.c * 2000 AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet', generate_series(0, {N-1}) c(c)
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")
print("embeddings done", flush=True)

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("dims copied", flush=True)
