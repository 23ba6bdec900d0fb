import duckdb, json, glob, sys
import pandas as pd

sf = '/root/testdata/sf0.01'
out = '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)]
    # normalize timestamps to ns, floats to repr
    for c in df.columns:
        if str(df[c].dtype).startswith('datetime'):
            df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try: df[c] = pd.to_numeric(df[c])
            except Exception: pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = canon(con.sql(sql).df())
        got = canon(duckdb.sql(f"SELECT * FROM '{out}/{name}/*.parquet'", connection=con).df())
        if list(want.columns) != list(got.columns):
            fails.append((name, f"cols want={list(want.columns)} got={list(got.columns)}"))
            continue
        if len(want) != len(got):
            fails.append((name, f"rows want={len(want)} got={len(got)}"))
            continue
        eq = want.equals(got)
        if not eq:
            diff = (want != got)
            bad = diff.any(axis=1)
            fails.append((name, f"values differ in {bad.sum()} rows; first:\nwant\n{want[bad].head(3)}\ngot\n{got[bad].head(3)}"))
        else:
            print(f"OK   {name}  rows={len(want)}")
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {e}"))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
