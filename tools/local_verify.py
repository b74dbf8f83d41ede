#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json over the same sf dir.

Usage: tools/local_verify.py <sfDir> <verifyOutDir> [queryPrefix]

Mirrors the driver's compare: columns sorted by name, rows sorted by all
columns, exact value hash. Intended for local iteration only — the driver
runs its own copy per round.
"""
import sys, json, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    h = hashlib.sha256()
    for r in out:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(out)

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else ""
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails = 0
    for name in sorted(oracles):
        if not name.startswith(prefix):
            continue
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        try:
            sp = con.execute(f"SELECT * FROM '{d}/*.parquet'")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
            orc = con.execute(oracles[name])
            orc_cols = [c[0] for c in orc.description]
            orc_rows = orc.fetchall()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fails += 1
            continue
        schema_ok = sorted(sp_cols) == sorted(orc_cols)
        h1, n1 = canon(sp_rows, sp_cols)
        h2, n2 = canon(orc_rows, orc_cols)
        ok = schema_ok and h1 == h2 and n1 == n2
        if not ok:
            fails += 1
            print(f"FAIL {name}: schema={schema_ok} rows={n1}/{n2} hash={h1==h2}")
            if schema_ok and n1 and n2:
                o1 = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
                o2 = sorted(range(len(orc_cols)), key=lambda i: orc_cols[i])
                s1 = sorted(tuple(repr(r[i]) for i in o1) for r in sp_rows)
                s2 = sorted(tuple(repr(r[i]) for i in o2) for r in orc_rows)
                for a, b in zip(s1, s2):
                    if a != b:
                        print(f"  spark : {a}\n  oracle: {b}")
                        break
        else:
            print(f"ok   {name} ({n1} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
