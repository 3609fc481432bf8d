#!/usr/bin/env python3
"""Oracle/Spark output TYPE-parity gate (VERDICT r12 #2).

The driver's hash is dtype-sensitive while its schema check is name-level:
a query can be value-identical yet hash-red because DuckDB promotes an
uncast aggregate (e.g. sum(BIGINT) -> HUGEINT -> pandas float64) while
Spark writes int64. `eval_pr_curve` failed two rounds this way. This gate
kills the class: for every oracle it fetches the DuckDB Arrow schema via
`SELECT * FROM (oracle) q LIMIT 0` and compares it column-by-column
against the Spark result parquet's Arrow schema, failing on any numeric
FAMILY divergence (int vs float, int vs decimal/HUGEINT, float vs
decimal) or non-numeric family mismatch.

Types are scale-independent, so run against the smallest sf dir:
    python3 tools/check_types.py <verify_out_dir> <sf_dir>
check_oracle.py invokes this automatically after its value gate.
"""
import json, sys, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def family(t: pa.DataType) -> str:
    """Collapse an Arrow type to the comparison family the driver's
    pandas normalization actually distinguishes."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):  # incl. DuckDB HUGEINT -> decimal128(38,0)
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{family(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{family(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


# Numeric families that the driver's normalization does NOT collapse to a
# common dtype — any pairing across these is a latent (or live) hash-fail.
NUMERIC = {"int", "float", "decimal"}


def diverges(a: str, b: str) -> bool:
    if a == b:
        return False
    if a.startswith("list<") and b.startswith("list<"):
        return diverges(a[5:-1], b[5:-1])
    # int-vs-float, int-vs-decimal, float-vs-decimal are ALL divergences:
    # decimal-vs-double happens to collapse to float64 today, but it is
    # belt-and-braces banned (VERDICT r12 #2) so the class cannot recur.
    return True


def check(out_dir: str, sf_dir: str, names=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if names and name not in names:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"SKIP {name}: no spark result parquet"); n_skip += 1
            continue
        try:
            duck = con.execute(
                f"SELECT * FROM ({oracle[name]}) __typeq LIMIT 0"
            ).arrow().schema
            spark = pq.read_schema(files[0])
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1
            continue
        dmap = {f.name: family(f.type) for f in duck}
        smap = {f.name: family(f.type) for f in spark}
        bad = []
        if sorted(dmap) != sorted(smap):
            bad.append(f"columns duck={sorted(dmap)} spark={sorted(smap)}")
        else:
            for c in sorted(dmap):
                if diverges(dmap[c], smap[c]):
                    bad.append(f"{c}: duck={dmap[c]} spark={smap[c]}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            n_pass += 1
    print(f"\ntype-parity: {n_pass} pass / {n_fail} fail / {n_skip} skip")
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if check(sys.argv[1], sys.argv[2],
                        set(sys.argv[3].split(",")) if len(sys.argv) > 3
                        else None) else 0)
