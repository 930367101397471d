#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
dumped by graft.Verify, run the corresponding oracle SQL in DuckDB over the
same sf tables, sort columns by name, sort rows, and compare values.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import hashlib
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def col_types(con, sql):
    """column_name -> DuckDB type string for a query, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def canon(rows, cols):
    """Sort columns by name, then rows; normalize floats."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return [cols[i] for i in order], out


def py_types(rows, cols):
    """column_name -> set of Python fetch-level type names over non-None
    cells. Decimal-vs-int here is exactly the sub-DESCRIBE divergence that
    sank corr_stats for two rounds: DuckDB DESCRIBE said DECIMAL(38,0) on
    both paths while one path fetched Decimal and the other int."""
    out = {c: set() for c in cols}
    for row in rows:
        for c, v in zip(cols, row):
            if v is not None:
                out[c].add(type(v).__name__)
    return out


def canon_hash(rows):
    """md5 over the canonical STRING rendering of every cell. This is NOT
    redundant with the row compare: Python `==` is cross-type (1 == 1.0 ==
    Decimal(1) is True), so tuple equality can pass while the rendered
    values differ — e.g. a column that fetches int on one path and float
    on the other only in SOME rows slips past the per-column type-set
    compare (both sides show {int, float}) and past `a != b`, yet any
    typed driver hash rejects it. The repr hash is the layer that catches
    exactly that numeric-type aliasing."""
    h = hashlib.md5()
    for row in rows:
        for v in row:
            h.update(repr(v).encode())
            h.update(b"\x1f")  # cell delimiter: keeps the digest injective
            # over cell boundaries ('ab','c' must not alias 'a','bc')
        h.update(b"\x00")
    return h.hexdigest()


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    # optional third arg: comma-separated query subset, for iterating on a
    # SPARK_GRAFT_VERIFY_ONLY dump without paying every DuckDB replay
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only is not None:
        unknown = only - set(oracle)
        assert not unknown, f"unknown queries: {unknown}"
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output read error: {e}")
            failures += 1
            continue
        oc, orws = canon(orows, ocols)
        sc, srws = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            failures += 1
            continue
        # Type gate: the driver's hash is typed, so a DuckDB-widened sum()
        # (HUGEINT) vs a Spark BIGINT fails there even when every value
        # matches. fetchall() erases that difference; DESCRIBE does not.
        # Exact string equality, no allowed aliases — that's the point.
        otypes = col_types(con, f"({sql})")
        stypes = col_types(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        tbad = {c: (stypes.get(c), otypes.get(c))
                for c in otypes if stypes.get(c) != otypes.get(c)}
        if tbad:
            print(f"FAIL {name}: column types differ "
                  f"{{col: (spark, oracle)}} = {tbad}")
            failures += 1
            continue
        # DECIMAL ban: wide decimals survive the DESCRIBE gate yet hash
        # differently per physical representation (DuckDB int128 result vs
        # Spark parquet fixed_len_byte_array(16) vs Python Decimal
        # canonicalization) — corr_stats failed the driver hash for two
        # rounds in exactly that state. Gate outputs must use an exact
        # representation-stable type instead (the decimal digit STRING).
        dec = {c: t for d in (otypes, stypes)
               for c, t in d.items() if t.upper().startswith("DECIMAL")}
        if dec:
            print(f"FAIL {name}: hash-unstable type — DECIMAL output "
                  f"columns {dec}; emit exact decimal strings instead")
            failures += 1
            continue
        # Fetch-level type gate: DESCRIBE typing alone is not the driver's
        # hash — compare the Python types the two paths actually fetch.
        opty = py_types(orows, ocols)
        spty = py_types(srows, scols)
        pbad = {c: (sorted(spty.get(c, set())), sorted(opty[c]))
                for c in opty if spty.get(c, set()) != opty[c]}
        if pbad:
            print(f"FAIL {name}: fetch-level Python types differ "
                  f"{{col: (spark, oracle)}} = {pbad}")
            failures += 1
            continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rows spark={len(srws)} oracle={len(orws)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(srws, orws) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            failures += 1
            continue
        sh, oh = canon_hash(srws), canon_hash(orws)
        if sh != oh:
            print(f"FAIL {name}: canonical-string hash differs "
                  f"spark={sh} oracle={oh} (values equal — rendering "
                  f"divergence; check cell repr above)")
            failures += 1
        else:
            print(f"OK   {name}: {len(srws)} rows")
    # rows-only queries (no oracle): report counts
    import os
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"ROWS {name}: {n} (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable: {e}")
                failures += 1
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
