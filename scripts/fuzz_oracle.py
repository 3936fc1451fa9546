#!/usr/bin/env python3
"""Property-based differential fuzz (SURVEY.md §5.5): generate seeded random
ANSI SQL over the star schema, run the IDENTICAL text in Spark (via
graft.SqlRunner) and DuckDB, and diff results exactly.

Usage: python3 scripts/fuzz_oracle.py <sfDir> <nQueries> <seed>
  (writes target/fuzz/queries.json, expects the caller to run SqlRunner,
   then diffs; or use --full to drive the whole loop via sbt)
"""
import json, os, random, subprocess, sys
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 30
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
rng = random.Random(seed)

# columns guaranteed FP-exact cross-engine: integer-valued doubles, keys,
# strings, dates (compared via strftime)
TABLES = {
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "qty": ["l_quantity"],
        "str": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
    },
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "qty": [],
        "str": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "qty": [],
        "str": ["c_name", "c_mktsegment"],
        "ts": [],
    },
    "events": {
        "int": ["event_id", "user_id"],
        "qty": [],
        "str": ["event_type"],
        "ts": ["ts"],
    },
}

def pred(t):
    kind = rng.choice(["cmp", "in", "like", "between", "null"])
    c = TABLES[t]
    if kind == "cmp" and c["int"]:
        col = rng.choice(c["int"])
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{col} {op} {rng.randint(0, 2000)}"
    if kind == "in" and c["str"]:
        col = rng.choice(c["str"])
        vals = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"],
                "o_orderstatus": ["O", "F", "P"],
                "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
                "c_mktsegment": ["BUILDING", "MACHINERY", "HOUSEHOLD"],
                "event_type": ["click", "view", "purchase", "error", "signup"],
                "c_name": ["Customer#000000001"]}.get(col, ["x"])
        picked = rng.sample(vals, min(len(vals), rng.randint(1, 2)))
        quoted = ", ".join(f"'{v}'" for v in picked)
        return f"{col} IN ({quoted})"
    if kind == "like" and c["str"]:
        col = rng.choice(c["str"])
        return f"{col} LIKE '%{rng.choice('AEIOURT')}%'"
    if kind == "between" and c["int"]:
        col = rng.choice(c["int"])
        lo = rng.randint(0, 1000)
        return f"{col} BETWEEN {lo} AND {lo + rng.randint(1, 1000)}"
    if kind == "null" and c["str"]:
        col = rng.choice(c["str"])
        return f"nullif({col}, 'ZZZ') IS NOT NULL"
    return "1 = 1"

def gen_join(i):
    """random lineitem-orders join with aggregate, or customer-orders outer."""
    if rng.random() < 0.5:
        w1, w2 = pred("lineitem"), pred("orders")
        g = rng.choice(["l_returnflag", "o_orderstatus", "o_orderpriority"])
        return (f"SELECT {g}, COUNT(*) AS cnt, SUM(l_quantity) AS sq, "
                f"MIN(l_orderkey) AS mn FROM lineitem JOIN orders "
                f"ON l_orderkey = o_orderkey WHERE {w1} AND {w2} "
                f"GROUP BY {g} ORDER BY {g}")
    else:
        w = pred("customer")
        return ("SELECT c_custkey, COUNT(o_orderkey) AS n FROM customer "
                f"LEFT JOIN orders ON c_custkey = o_custkey WHERE {w} "
                "GROUP BY c_custkey ORDER BY c_custkey")

def gen_join_shape(i):
    """randomized join shapes over the star schema — the planner surfaces
    (outer-join null fabrication, ON-clause vs WHERE-clause predicates,
    semi/anti decorrelation, multi-way reorder) where differential fuzzing
    pays."""
    shape = rng.choice(["left_on", "right_on", "full", "chain", "semi", "anti"])
    if shape == "left_on":
        # predicate in the ON clause of an outer join: filters the null-
        # supplying side BEFORE null fabrication — classic rewrite trap
        w = pred("orders")
        return ("SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok, "
                "o_orderkey IS NULL AS missing "
                f"FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND {w} "
                "ORDER BY c_custkey, ok")
    if shape == "right_on":
        w = pred("customer")
        return ("SELECT COALESCE(c_custkey, -1) AS ck, o_orderkey, "
                "c_custkey IS NULL AS missing "
                f"FROM customer RIGHT JOIN orders ON c_custkey = o_custkey AND {w} "
                "ORDER BY o_orderkey, ck")
    if shape == "full":
        w1, w2 = pred("customer"), pred("orders")
        return ("SELECT COALESCE(c_custkey, -1) AS ck, COALESCE(o_orderkey, -1) AS ok, "
                "c_custkey IS NULL AS left_null, o_orderkey IS NULL AS right_null "
                f"FROM (SELECT * FROM customer WHERE {w1}) c "
                f"FULL JOIN (SELECT * FROM orders WHERE {w2}) o "
                "ON c_custkey = o_custkey ORDER BY ck, ok")
    if shape == "chain":
        # 4-relation chain with a trailing outer edge: join-reorder +
        # null-handling under aggregation
        w = pred("orders")
        return ("SELECT n_name, COUNT(*) AS cnt, COUNT(l_orderkey) AS nl, "
                "CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing "
                "FROM nation JOIN customer ON n_nationkey = c_nationkey "
                f"JOIN orders ON c_custkey = o_custkey "
                "LEFT JOIN lineitem ON o_orderkey = l_orderkey AND l_linenumber = 1 "
                f"WHERE {w} GROUP BY n_name ORDER BY n_name")
    if shape == "semi":
        w = pred("orders")
        return ("SELECT c_custkey, c_mktsegment FROM customer WHERE EXISTS "
                f"(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND {w}) "
                "ORDER BY c_custkey")
    w = pred("orders")
    return ("SELECT c_custkey, c_mktsegment FROM customer WHERE NOT EXISTS "
            f"(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND {w}) "
            "ORDER BY c_custkey")

def gen_window_frame(i):
    """randomized window frames: ROWS with every boundary combination over a
    unique total order, RANGE (value-based peers) restricted to aggregates —
    the frame-boundary surface of W3."""
    t, part, order, key = rng.choice([
        ("orders", "o_custkey", "o_orderkey", "o_orderkey"),
        ("events", "user_id", "event_id", "event_id"),
        # NB (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # lineitem (11785 dup pairs at sf0.01) — the full 4-column key is,
        # and every candidate window value is one of those columns, so tied
        # rows are value-identical and the frame results are well-defined
        ("lineitem", "l_suppkey", "l_orderkey, l_linenumber, l_partkey, l_suppkey", "l_orderkey"),
    ])
    val = rng.choice(TABLES[t]["int"])
    a, b = rng.randint(0, 5), rng.randint(0, 5)
    if rng.random() < 0.7:
        frame = rng.choice([
            f"ROWS BETWEEN {a} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN CURRENT ROW AND {b} FOLLOWING",
            f"ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING",
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND {b} FOLLOWING",
            f"ROWS BETWEEN {a} PRECEDING AND UNBOUNDED FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ])
        over = f"PARTITION BY {part} ORDER BY {order} {frame}"
        exprs = rng.sample([
            f"CAST(SUM({val}) OVER ({over}) AS BIGINT) AS w1",
            f"CAST(COUNT(*) OVER ({over}) AS BIGINT) AS w2",
            f"CAST(MIN({val}) OVER ({over}) AS BIGINT) AS w3",
            f"CAST(MAX({val}) OVER ({over}) AS BIGINT) AS w4",
            f"CAST(FIRST_VALUE({val}) OVER ({over}) AS BIGINT) AS w5",
            f"CAST(LAST_VALUE({val}) OVER ({over}) AS BIGINT) AS w6",
            f"CAST(LEAD({val}, {a + 1}, -1) OVER (PARTITION BY {part} ORDER BY {order}) AS BIGINT) AS w7",
            f"CAST(LAG({val}, {b + 1}, -1) OVER (PARTITION BY {part} ORDER BY {order}) AS BIGINT) AS w8",
        ], 3)
    else:
        # RANGE frames are value-based: aggregates only (FIRST/LAST_VALUE
        # would depend on intra-peer order, which is not deterministic)
        lo, hi = rng.randint(0, 500), rng.randint(0, 500)
        frame = rng.choice([
            f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {hi} FOLLOWING",
            f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ])
        over = f"PARTITION BY {part} ORDER BY {key} {frame}"
        exprs = rng.sample([
            f"CAST(SUM({val}) OVER ({over}) AS BIGINT) AS w1",
            f"CAST(COUNT(*) OVER ({over}) AS BIGINT) AS w2",
            f"CAST(MIN({val}) OVER ({over}) AS BIGINT) AS w3",
            f"CAST(MAX({val}) OVER ({over}) AS BIGINT) AS w4",
        ], 3)
    w = pred(t)
    cols = order if "," in order else order
    return (f"SELECT {cols}, {', '.join(exprs)} FROM {t} "
            f"WHERE {w} ORDER BY {cols}")

def gen_window(i):
    t = rng.choice(["orders", "events"])
    if t == "orders":
        w = pred("orders")
        return ("SELECT o_orderkey, "
                "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn, "
                "RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rk "
                f"FROM orders WHERE {w} ORDER BY o_orderkey")
    else:
        w = pred("events")
        return ("SELECT event_id, "
                "LAG(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev, "
                "COUNT(*) OVER (PARTITION BY user_id) AS n_user "
                f"FROM events WHERE {w} ORDER BY event_id")

def gen_setop(i):
    t = rng.choice(["orders", "customer", "events"])
    c = TABLES[t]
    cols = ", ".join(rng.sample(c["int"] + c["str"], 2))
    w1, w2 = pred(t), pred(t)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    q = (f"SELECT {cols} FROM {t} WHERE {w1} {op} "
         f"SELECT {cols} FROM {t} WHERE {w2} ORDER BY 1, 2")
    return q

def gen_scalar(i):
    """scalar-function projections in the common Spark/DuckDB dialect:
    string, date-part, conditional, integer math — the f-family surface
    fuzzed cross-engine (CASTs align int-width differences)."""
    kind = rng.choice(["string", "date", "cond", "math"])
    if kind == "string":
        col, t = rng.choice([("c_name", "customer"), ("o_orderpriority", "orders"),
                             ("event_type", "events"), ("l_returnflag", "lineitem")])
        key = TABLES[t]["int"][0]
        exprs = rng.sample([
            f"upper({col}) AS e1", f"lower({col}) AS e2",
            f"CAST(length({col}) AS BIGINT) AS e3",
            f"substring({col}, 1, 3) AS e4",
            f"concat({col}, '_x') AS e5",
            f"replace({col}, 'E', '*') AS e6",
            f"reverse({col}) AS e7",
        ], 3)
        return (f"SELECT {key}, {', '.join(exprs)} FROM {t} "
                f"WHERE {pred(t)} ORDER BY {key}")
    if kind == "date":
        t, col = rng.choice([("orders", "o_orderdate"), ("lineitem", "l_shipdate"),
                             ("events", "ts")])
        key = TABLES[t]["int"][0]
        exprs = rng.sample([
            f"CAST(year({col}) AS BIGINT) AS e1",
            f"CAST(month({col}) AS BIGINT) AS e2",
            f"CAST(day({col}) AS BIGINT) AS e3",
            f"CAST(quarter({col}) AS BIGINT) AS e4",
            f"CAST(hour({col}) AS BIGINT) AS e5",
        ], 3)
        return (f"SELECT {key}, {', '.join(exprs)} FROM {t} "
                f"WHERE {pred(t)} ORDER BY {key}")
    if kind == "cond":
        t = rng.choice(["orders", "customer", "events"])
        key = TABLES[t]["int"][0]
        scol = TABLES[t]["str"][0]
        exprs = [
            f"CASE WHEN {key} % 2 = 0 THEN 'even' ELSE 'odd' END AS e1",
            f"coalesce(nullif({scol}, {scol}), 'nulled') AS e2",
            f"CAST(least({key}, 500) AS BIGINT) AS e3",
            f"CAST(greatest({key}, 500) AS BIGINT) AS e4",
        ]
        return (f"SELECT {key}, {', '.join(rng.sample(exprs, 3))} FROM {t} "
                f"WHERE {pred(t)} ORDER BY {key}")
    t = rng.choice(["orders", "lineitem", "customer"])
    key = TABLES[t]["int"][0]
    exprs = rng.sample([
        f"CAST(abs({key} - 1000) AS BIGINT) AS e1",
        f"CAST({key} % 7 AS BIGINT) AS e2",
        f"CAST(floor({key} / 3.0) AS BIGINT) AS e3",
        f"CAST({key} * 2 + 1 AS BIGINT) AS e4",
    ], 3)
    return (f"SELECT {key}, {', '.join(exprs)} FROM {t} "
            f"WHERE {pred(t)} ORDER BY {key}")

def gen_subquery(i):
    """correlated/uncorrelated subquery shapes — the decorrelation surface
    (correlated COUNT compare, IN, Q17-style correlated aggregate
    threshold, uncorrelated scalar threshold). FP-safety: every compared
    aggregate is over integer-valued columns, so sums are exact in any
    partial-aggregation order and the single AVG division is bit-identical
    across engines."""
    shape = rng.choice(["scalar_cmp", "in_sub", "corr_agg", "scalar_uncorr"])
    if shape == "scalar_cmp":
        k = rng.randint(0, 8)
        w = pred("orders")
        return ("SELECT c_custkey, c_mktsegment FROM customer "
                "WHERE (SELECT COUNT(*) FROM orders "
                f"WHERE o_custkey = c_custkey AND {w}) > {k} "
                "ORDER BY c_custkey")
    if shape == "in_sub":
        w = pred("orders")
        return ("SELECT c_custkey FROM customer WHERE c_custkey IN "
                f"(SELECT o_custkey FROM orders WHERE {w}) ORDER BY c_custkey")
    if shape == "corr_agg":
        # Q17 shape over integer-valued quantities (exact sums, one division)
        frac = rng.choice(["0.5", "0.8", "1.0"])
        return ("SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem l1 "
                f"WHERE l_quantity < {frac} * (SELECT AVG(l_quantity) "
                "FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey) "
                "ORDER BY l_orderkey, l_partkey, l_linenumber")
    w = pred("orders")
    return ("SELECT o_orderkey, o_custkey FROM orders "
            f"WHERE o_custkey > (SELECT AVG(o_custkey) FROM orders WHERE {w}) "
            "ORDER BY o_orderkey")

def gen_lateral(i):
    """LATERAL + EXISTS/NOT-EXISTS decorrelation shapes (the J11/P8/Q21
    planner surface): correlated ORDER BY/LIMIT subqueries must decorrelate
    to window-rank + join, anti/semi chains to left-anti/semi joins.
    Determinism: every LATERAL LIMIT carries a total-order tiebreak."""
    shape = rng.choice(["lateral_topn", "not_exists", "exists_chain"])
    if shape == "lateral_topn":
        k = rng.randint(1, 3)
        wl = pred("lineitem")
        wo = pred("orders")
        return ("SELECT o_orderkey, t.l_linenumber, t.l_quantity "
                "FROM orders o, LATERAL ("
                "SELECT l_linenumber, l_quantity FROM lineitem "
                f"WHERE l_orderkey = o_orderkey AND {wl} "
                f"ORDER BY l_quantity DESC, l_linenumber LIMIT {k}) t "
                f"WHERE {wo} ORDER BY o_orderkey, t.l_linenumber")
    if shape == "not_exists":
        w = pred("orders")
        wc = pred("customer")
        return ("SELECT c_custkey FROM customer WHERE NOT EXISTS "
                f"(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND {w}) "
                f"AND {wc} ORDER BY c_custkey")
    q = rng.randint(10, 45)
    wl = pred("lineitem")
    return ("SELECT o_orderkey FROM orders o WHERE EXISTS "
            f"(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND {wl}) "
            "AND NOT EXISTS (SELECT 1 FROM lineitem l2 "
            f"WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity > {q}) "
            "ORDER BY o_orderkey")

def gen_rollup(i):
    # grouping-set machinery: subtotal rows materialize NULL group keys, and
    # default null ordering DIFFERS between the engines (Spark NULLS FIRST,
    # DuckDB NULLS LAST) — the explicit NULLS FIRST makes the shared text
    # deterministic, and the generated columns carry no natural nulls so a
    # NULL key always means "subtotal row" in both engines
    t = rng.choice(["orders", "lineitem", "customer"])
    c = TABLES[t]
    g = rng.sample(c["str"] + c["int"][:2], 2)
    form = rng.choice(["ROLLUP", "CUBE", "GROUPING SETS"])
    if form == "GROUPING SETS":
        clause = f"GROUPING SETS (({g[0]}, {g[1]}), ({g[0]}), ())"
    else:
        clause = f"{form} ({g[0]}, {g[1]})"
    where = pred(t)
    aggs = ["COUNT(*) AS cnt"]
    if c["qty"]:
        aggs.append(f"SUM({c['qty'][0]}) AS sq")
    # HAVING cnt > 0: on an EMPTY input the engines genuinely diverge —
    # DuckDB emits the standard global () subtotal row (cnt=0), Spark emits
    # nothing. The clause filters only that row, equalizing the semantics
    # without touching any non-empty grouping (every real group has cnt>=1).
    return (f"SELECT {g[0]}, {g[1]}, {', '.join(aggs)} FROM {t} WHERE {where} "
            f"GROUP BY {clause} HAVING COUNT(*) > 0 "
            f"ORDER BY {g[0]} NULLS FIRST, {g[1]} NULLS FIRST, cnt")


def gen(i):
    # the rollup family takes its share from the base aggregate/projection
    # bucket at the end — every earlier family keeps its original share
    r = rng.random()
    if r < 0.12:
        return gen_join(i)
    if r < 0.24:
        return gen_join_shape(i)
    if r < 0.32:
        return gen_window(i)
    if r < 0.44:
        return gen_window_frame(i)
    if r < 0.52:
        return gen_setop(i)
    if r < 0.60:
        return gen_scalar(i)
    if r < 0.70:
        return gen_subquery(i)
    if r < 0.78:
        return gen_rollup(i)
    if r < 0.85:
        return gen_lateral(i)
    t = rng.choice(list(TABLES))
    c = TABLES[t]
    where = " AND ".join(pred(t) for _ in range(rng.randint(1, 3)))
    if rng.random() < 0.6 and (c["str"] or c["int"]):
        # aggregate query
        gcols = rng.sample(c["str"] + c["int"][:2], rng.randint(1, 2))
        aggs = ["COUNT(*) AS cnt"]
        if c["int"]:
            col = rng.choice(c["int"])
            aggs.append(f"MIN({col}) AS mn")
            aggs.append(f"MAX({col}) AS mx")
            aggs.append(f"COUNT(DISTINCT {col}) AS dc")
        if c["qty"]:
            aggs.append(f"SUM({c['qty'][0]}) AS sq")
        sel = ", ".join(gcols + aggs)
        order = ", ".join(gcols)
        having = f" HAVING COUNT(*) >= {rng.randint(2, 5)}" if rng.random() < 0.3 else ""
        return (f"SELECT {sel} FROM {t} WHERE {where} "
                f"GROUP BY {', '.join(gcols)}{having} ORDER BY {order}")
    else:
        # projection query
        cols = rng.sample(c["int"] + c["str"], min(3, len(c["int"] + c["str"])))
        sel = ", ".join(cols)
        order = ", ".join(cols)
        lim = rng.choice(["", f" LIMIT {rng.randint(5, 100)}"])
        return (f"SELECT {sel} FROM {t} WHERE {where} ORDER BY {order}{lim}")

queries = {f"fz{i:03d}": gen(i) for i in range(n_q)}
os.makedirs("target/fuzz", exist_ok=True)
with open("target/fuzz/queries.json", "w") as f:
    json.dump(queries, f)
print(f"wrote {len(queries)} queries to target/fuzz/queries.json")

# run Spark side
r = subprocess.run(
    ["sbt", "-batch", f"runMain graft.SqlRunner {sf_dir} target/fuzz/queries.json target/fuzz/out"],
    capture_output=True, text=True, timeout=1200)
errs = [l for l in r.stderr.splitlines() if "[sqlrunner]" in l]
for e in errs:
    print(e)

# diff vs duckdb
con = duckdb.connect()
import glob
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    if name == "events":
        con.sql(f"CREATE VIEW {name} AS SELECT * EXCLUDE (ts), CAST(ts AS TIMESTAMP) AS ts FROM '{p}'")
    else:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

n_pass = n_fail = 0
for name, sql in sorted(queries.items()):
    try:
        mine = pd.read_parquet(f"target/fuzz/out/{name}")
        want = con.sql(sql).fetchdf()
        a = mine.reindex(sorted(mine.columns), axis=1)
        b = want.reindex(sorted(want.columns), axis=1)
        if "LIMIT" not in sql:  # limit-free: sort rows for safety
            a = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
            b = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
        same = a.shape == b.shape and all(
            (a[c].astype(object).where(~a[c].isna(), None).tolist() ==
             b[c].astype(object).where(~b[c].isna(), None).tolist())
            for c in a.columns)
        if same:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {sql}")
            print(f"  mine {a.shape} vs duckdb {b.shape}")
    except Exception as e:
        n_fail += 1
        print(f"FAIL {name}: {type(e).__name__}: {e}\n  {sql}")

print(f"\nfuzz: {n_pass} pass, {n_fail} fail (seed={seed})")
sys.exit(1 if n_fail else 0)
