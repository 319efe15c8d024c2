import duckdb, json, glob, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out_r6"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
oracles = json.load(open(f"{out}/oracle_sql.json"))
tables = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings","partsupp"]
con = duckdb.connect()
for t in tables:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fails, errs = [], []
for name, sql in sorted(oracles.items()):
    qdir = f"{out}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        errs.append((name, "no spark output")); continue
    try:
        o = con.sql(sql).df()
        s = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        # driver semantics: sort columns by name, then hash values row-sorted
        o = o.reindex(sorted(o.columns), axis=1)
        s = s.reindex(sorted(s.columns), axis=1)
        if list(o.columns) != list(s.columns):
            fails.append((name, f"schema {list(o.columns)} vs {list(s.columns)}")); continue
        if len(o) != len(s):
            fails.append((name, f"rows {len(o)} vs {len(s)}")); continue
        o2 = o.sort_values(by=list(o.columns)).reset_index(drop=True).astype(str)
        s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True).astype(str)
        if not o2.equals(s2):
            diff = (o2 != s2).any(axis=1)
            fails.append((name, f"values differ, first at row {diff.idxmax()}:\n  oracle {o2[diff].head(2).to_dict('records')}\n  spark  {s2[diff].head(2).to_dict('records')}"))
    except Exception as e:
        errs.append((name, str(e)[:300]))

print(f"checked {len(oracles)} oracled queries: {len(oracles)-len(fails)-len(errs)} pass, {len(fails)} mismatch, {len(errs)} errors")
for n, m in fails: print("MISMATCH", n, m)
for n, m in errs: print("ERR", n, m)
