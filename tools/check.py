#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[<name>] in DuckDB against the sfDir
tables, then compares: column names (sorted), dtypes, row counts, and
values (rows sorted by all columns). Dev-only tool — NOT part of the
engine; the engine itself is pure Scala/Spark.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Sketch oracles (DuckSketchSql) hash ord(char), which equals the
    # UTF-8 byte only for ASCII — a non-ASCII corpus would silently
    # diverge from the byte-wise JVM hash. Fail loudly, but only for
    # runs that actually verify a char-ord oracle (a DumpOracles
    # iteration on the q-series shouldn't abort on corpus text).
    CHAR_ORD_ORACLES = {"d02_minhash_lsh", "d03_simhash", "p01_corpus_clean",
                        "h03_countmin_freq"}
    affected = sorted(CHAR_ORD_ORACLES & set(oracle))
    if affected and os.path.exists(f"{sfdir}/documents.parquet"):
        n_nonascii = con.execute(
            "SELECT count(*) FROM documents "
            "WHERE regexp_matches(text, '[^\\x00-\\x7F]')").fetchone()[0]
        if n_nonascii:
            sys.exit(f"ABORT: {n_nonascii} non-ASCII documents — the "
                     f"char-ord-based sketch oracles ({', '.join(affected)}) "
                     "only match the JVM byte-wise hashes for ASCII corpora. "
                     "Port the oracles to byte-level hashing first.")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s, d = norm(sdf), norm(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        dtype_warn = [c for c in s.columns if str(s[c].dtype) != str(d[c].dtype)]
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            ok = True
        except AssertionError as e:
            ok = False
            msg = str(e).splitlines()[0:6]
        if ok:
            w = f" (dtype diff: {dtype_warn})" if dtype_warn else ""
            print(f"PASS {name} rows={len(s)}{w}")
            n_pass += 1
        else:
            print(f"FAIL {name}: value mismatch: {' | '.join(msg)}")
            # show first differing rows
            neq = (s != d) & ~(s.isna() & d.isna())
            bad = neq.any(axis=1)
            print(s[bad].head(3))
            print(d[bad].head(3))
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
