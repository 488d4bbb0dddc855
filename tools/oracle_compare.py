"""Local replica of the driver's DuckDB correctness gate.

Usage:  python3 tools/oracle_compare.py [verify_out_dir] [sf_dir]

Run `sbt -batch "runMain graft.Verify <sf_dir> <verify_out_dir>"` first;
this script then executes every oracle_sql.json entry in DuckDB over the
same parquet tables and compares rows + sorted-values against the Spark
dumps. Driver-side tooling only (python/duckdb are not available to the
library itself).

Known artifact: q08 timestamps stringify tz-aware here but tz-naive in
the Spark dump; the real driver hashes it green. Handled by NORMALIZING
timestamp columns to tz-naive before comparing (r6 ADVICE: the old
blanket q08 waiver would have passed a genuine value regression).
"""
import duckdb, json, sys

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    try:
        o = con.execute(sql).fetchdf()
        s = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchdf()
        o = o.reindex(sorted(o.columns), axis=1)
        s = s.reindex(sorted(s.columns), axis=1)
        # normalize tz-aware timestamps to naive so both engines
        # stringify identically; any residual q08 diff now FAILS
        for df in (o, s):
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime64") and \
                        getattr(df[c].dt, "tz", None) is not None:
                    df[c] = df[c].dt.tz_localize(None)
        if len(o) != len(s):
            print(f"{name}: ROWS {len(s)} vs {len(o)}")
            bad += 1
            continue
        oh = sorted(map(str, o.itertuples(index=False, name=None)))
        sh = sorted(map(str, s.itertuples(index=False, name=None)))
        if oh == sh:
            ok += 1
        else:
            print(f"{name}: HASH MISMATCH")
            print(f"  spark:  {sh[:2]}")
            print(f"  oracle: {oh[:2]}")
            bad += 1
    except Exception as e:
        print(f"{name}: ERR {e}")
        bad += 1
print(f"{ok} ok, {bad} bad of {len(oracle)}")
sys.exit(1 if bad else 0)
