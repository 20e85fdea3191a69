#!/usr/bin/env python3
"""Local driver-mimic: compare Verify.scala's parquet dumps against DuckDB
running the oracle SQL on the same fixture tables. Strict: row count, column
names, dtypes (after arrow normalization), and exact values after sorting
columns by name. Usage: check_oracle.py <sfdir> <outdir>"""
import sys, json, duckdb, pyarrow.parquet as pq, pyarrow as pa, glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {path}")
        fails += 1
        continue
    spark_tbl = pq.read_table(path)
    try:
        duck_tbl = con.sql(oracle[name]).arrow()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    s = spark_tbl.select(sorted(spark_tbl.column_names))
    d = duck_tbl.select(sorted(duck_tbl.column_names))
    msgs = []
    if s.column_names != d.column_names:
        msgs.append(f"columns spark={s.column_names} duck={d.column_names}")
    elif s.num_rows != d.num_rows:
        msgs.append(f"rows spark={s.num_rows} duck={d.num_rows}")
    else:
        sp, dp = s.to_pandas(), d.to_pandas()
        for c in s.column_names:
            sc, dc = sp[c], dp[c]
            st, dt = s.schema.field(c).type, d.schema.field(c).type
            # normalize timestamp units / int widths the way arrow cast does
            if pa.types.is_timestamp(st) != pa.types.is_timestamp(dt) or \
               (not pa.types.is_timestamp(st) and str(st) != str(dt)):
                msgs.append(f"col {c}: dtype spark={st} duck={dt}")
                continue
            neq = ~((sc == dc) | (sc.isna() & dc.isna()))
            if neq.any():
                i = neq.idxmax()
                msgs.append(
                    f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={sc[i]!r} duck={dc[i]!r}")
    if msgs:
        fails += 1
        print(f"FAIL {name}: " + "; ".join(msgs[:4]))
    else:
        print(f"ok   {name} ({s.num_rows} rows)")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} queries)")
sys.exit(1 if fails else 0)
