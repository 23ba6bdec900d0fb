import duckdb, json, glob, sys
import pandas as pd

# keep in lockstep with the Verify invocation: compare_oracle.py [SF_DIR] [OUT_DIR]
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)]
    # normalize timestamps to us precision and numeric dtypes WITHIN kind
    # (int32 vs int64, float32 vs float64 — exact widenings only, so the
    # compare stays value-strict): pd.DataFrame.equals is dtype-strict,
    # and the Spark parquet dump and DuckDB .df() legitimately disagree
    # on width while agreeing on values. Cross-kind (int vs float) stays
    # a mismatch on purpose, and ints are NOT cast to float (int64 hash
    # values exceed 2^53 — a float cast would silently pass unequal
    # values).
    for c in df.columns:
        if str(df[c].dtype).startswith('datetime'):
            df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == 'i':
            df[c] = df[c].astype('int64')
        elif df[c].dtype.kind == 'u':
            df[c] = df[c].astype('uint64')
        elif df[c].dtype.kind == 'f':
            df[c] = df[c].astype('float64')
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
            dtypes_w = {c: str(want[c].dtype) for c in want.columns}
            dtypes_g = {c: str(got[c].dtype) for c in got.columns}
            if dtypes_w != dtypes_g:
                # dtype-only mismatch after canon = cross-kind disagreement
                # (e.g. int column vs float column) — report it as such
                # instead of the nonsense "values differ in 0 rows"
                fails.append((name, f"dtypes differ: want={dtypes_w} got={dtypes_g}"))
                continue
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
# exit-code-gated automation must see failures as failures
sys.exit(1 if fails else 0)
