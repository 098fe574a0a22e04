"""Differential fuzzer: random operator pipelines vs a DuckDB oracle.

The 98 fixed registry queries are green; this attacks the inputs we
did NOT hand-write. Each seeded case plans a random pipeline
(base-table or FK join → filters / computed projections → optional
group-aggregate → optional HAVING-style filter → optional
total-order sort+limit) in a two-phase design:

1. ``plan_case(rng)`` chooses a list of serializable ops while
   tracking the evolving schema — pure planning, no Spark;
2. ``build_case(ops)`` deterministically compiles the SAME ops into
   (a) a DataFrame program built from the library's own helpers
   (``functions.pg``: ilike / pandas_dow / month_trunc /
   amount_bucket / keyword_flag / pg sort orders) and (b) an
   equivalent DuckDB SQL string.

Both run on the same parquet and must agree under the dual gate of
``tests/oracle.py`` (exact-value + pandas-roundtrip driver-hash
replica). Failures shrink automatically: droppable ops (filters,
unused projections, sort/limit) are removed one at a time while the
case still fails, and the minimal op list + SQL + seed are printed —
rerun any case with ``python tools/fuzz_oracle.py --seed N``.

Dialect traps this deliberately exercises (SURVEY.md §4.3.1): null
ordering (ASC/DESC nulls placement differs), decimal-exact aggregate
math (float sum order), Spark rlike vs DuckDB regexp_matches
(both find-anywhere), ILIKE lowering, Postgres-dow remaps
(DuckDB dayofweek is 0=Sunday, Spark dayofweek is 1=Sunday), and
int-width canonicalization (all int outputs cast to BIGINT so the
pandas gate can't flap on int32/HUGEINT).

Round-4 grammar extensions (VERDICT r3 next-round #2) attack the
join/set-op/null surface the r1-r3 grammar avoided: fan-out joins on
NON-unique right keys (one left row multiplies), left/semi/anti joins
against filtered right sides, EXCEPT / EXCEPT ALL / INTERSECT /
INTERSECT ALL, IS [NOT] NULL and `col = NULL` three-valued-logic
predicates, NULLIF/COALESCE null fountains and plugs, COUNT(col) vs
COUNT(*) over nullable columns, and total-order sorts with direction
AND nulls placement chosen per column (the exact fragment where Spark
asc = NULLS FIRST diverges from DuckDB/Postgres asc = NULLS LAST).
The planner tracks which columns CAN be null (left-join right side,
lag, NULLIF) and biases null probes toward them.

Round-6 grammar extensions (VERDICT r5 next-round #8): explicit
window FRAMES — sum/min/max/count OVER (... ROWS BETWEEN a AND b)
with the established total-order key, and RANGE BETWEEN over one
non-null int column (frame membership by VALUE, deterministic under
ties); correlated [NOT] EXISTS whose subquery carries a SECOND,
non-equi predicate tying a right column to a LEFT column (compiled to
a Spark semi/anti join with a composite condition); and decimal-typed
join keys (a table joined to the DISTINCT DECIMAL(12,2) cast of one
of its own raw 2-dp columns — decimal hash/compare parity, plus
decimal output canonicalization: final dec outputs cast to DOUBLE on
both sides, since Spark hands back Decimal objects where DuckDB's
pandas bridge hands back float64).

Round-7 grammar extensions: grouping-set terminals — GROUP BY
ROLLUP/CUBE over the planned group keys (subtotal rows carry NULL
group keys on both engines; the planner marks the groups nullable so
downstream null probes target them), and row fan-out via
explode/UNNEST (Spark ``explode(array(a, b))`` vs DuckDB
``UNNEST([a, b])`` — both keep NULL elements; after the fan-out no
column subset is unique, so window total order falls back to
every-column ordering, the fan-out-join precedent).

Round-9 second-sitting extensions guard the sketch/bitset idioms the
engine now leans on: proj_md5mod (md5 -> first-8-hex -> int -> % width;
Spark conv(,16,10) vs DuckDB CAST('0x'||.. AS UBIGINT) — the CMS/LSH
bucket hash), proj_bitmask (shiftleft into a signed BIGINT word & mask,
shift bounded to [0,29] — the Bloom word fold), and the bit_or
aggregate (integer OR fold: exact, order-independent on both engines).

Usage:
    python tools/fuzz_oracle.py [--n 200] [--sf-dir DIR] [--seed N]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------- schema

TABLES: dict[str, list[tuple[str, str]]] = {
    "lineitem": [
        ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
        ("l_linenumber", "int"), ("l_quantity", "double"),
        ("l_extendedprice", "double"), ("l_discount", "double"),
        ("l_tax", "double"), ("l_returnflag", "str"),
        ("l_linestatus", "str"), ("l_shipdate", "ts"),
    ],
    "orders": [
        ("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"),
        ("o_totalprice", "double"), ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ],
    "customer": [
        ("c_custkey", "int"), ("c_name", "str"), ("c_nationkey", "int"),
        ("c_acctbal", "double"), ("c_mktsegment", "str"),
    ],
    "part": [
        ("p_partkey", "int"), ("p_name", "str"), ("p_brand", "str"),
        ("p_type", "str"), ("p_size", "int"), ("p_retailprice", "double"),
    ],
    "supplier": [
        ("s_suppkey", "int"), ("s_name", "str"), ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "events": [
        ("event_id", "int"), ("ts", "ts"), ("user_id", "int"),
        ("event_type", "str"), ("value", "double"), ("props", "str"),
    ],
    "documents": [
        ("doc_id", "int"), ("text", "str"), ("lang", "str"),
        ("source", "str"), ("n_chars", "int"),
    ],
}

# 3-table chains: (t1, t2, k1, k2, t3, k3src, k3) — t1 joins t2 on
# k1=k2, then k3src (a t1 column) joins t3 on k3src=k3. FK targets are
# unique keys, so t1's row count (and unique key) is preserved.
JOINS3 = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey",
     "customer", "o_custkey", "c_custkey"),
    ("lineitem", "part", "l_partkey", "p_partkey",
     "supplier", "l_suppkey", "s_suppkey"),
]

# (left_table, right_table, left_key, right_key, right_key_unique).
# The first four are FK→unique-key (row count preserved, left key
# survives); the rest are FAN-OUT joins — the right key is NOT unique,
# so one left row multiplies and the output is a multiset with no
# usable unique key (VERDICT r3 #2: the r1-r3 grammar only exercised
# the FK-unique direction).
JOINS = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey", True),
    ("lineitem", "part", "l_partkey", "p_partkey", True),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey", True),
    ("orders", "customer", "o_custkey", "c_custkey", True),
    ("orders", "lineitem", "o_orderkey", "l_orderkey", False),
    ("part", "lineitem", "p_partkey", "l_partkey", False),
    ("supplier", "lineitem", "s_suppkey", "l_suppkey", False),
    ("customer", "orders", "c_custkey", "o_custkey", False),
]

# numeric columns per table for the correlated-EXISTS extra predicate
NUM_COLS = {
    t: [n for n, k in cols if k in ("int", "double")]
    for t, cols in TABLES.items()
}

# raw 2-dp money/quantity columns that are SAFE to CAST AS DECIMAL on
# both engines (the dialect rule from fuzz seed 995: only decimal-cast
# RAW parquet doubles — computed doubles round differently at the
# target scale's last digit). These drive the decimal-typed-join-key
# grammar (VERDICT r5 #8).
DEC_JOIN = [
    ("lineitem", "l_discount"), ("lineitem", "l_tax"),
    ("lineitem", "l_quantity"), ("orders", "o_totalprice"),
    ("customer", "c_acctbal"), ("supplier", "s_acctbal"),
    ("part", "p_retailprice"),
]

# point columns eligible for the binned-range-join production
# (VERDICT r8 #7): raw 2-dp money columns, incl. a negative-capable
# one so grid binning exercises floor() on negatives
RANGE_POINTS = [
    ("lineitem", "l_extendedprice"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"),
]

NUM_RANGE: dict[str, tuple[float, float, int]] = {
    # fuzz-generated columns: as-of payloads + range-join band bounds
    "rval_x": (0, 1000, 2), "rid_x": (1, 6000, 0),
    "fz_lo": (-999, 400000, 2), "fz_hi": (-999, 400000, 2),
    "l_quantity": (1, 50, 0), "l_extendedprice": (1000, 90000, 2),
    "l_discount": (0.0, 0.1, 2), "l_tax": (0.0, 0.08, 2),
    "l_orderkey": (1, 6000, 0), "l_partkey": (1, 200, 0),
    "l_suppkey": (1, 10, 0), "l_linenumber": (1, 7, 0),
    "o_orderkey": (1, 6000, 0), "o_custkey": (1, 150, 0),
    "o_totalprice": (1000, 400000, 2),
    "c_custkey": (1, 150, 0), "c_nationkey": (0, 24, 0),
    "c_acctbal": (-999, 9999, 2),
    "p_partkey": (1, 200, 0), "p_size": (1, 50, 0),
    "p_retailprice": (900, 2000, 2),
    "s_suppkey": (1, 10, 0), "s_nationkey": (0, 24, 0),
    "s_acctbal": (-999, 9999, 2),
    "event_id": (1, 6000, 0), "user_id": (1, 500, 0), "value": (0, 1000, 2),
    "doc_id": (1, 500, 0), "n_chars": (1, 5000, 0),
}

STR_VOCAB: dict[str, list[str]] = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY",
                     "HOUSEHOLD", "FURNITURE"],
    "event_type": ["signup", "click", "error", "view", "purchase"],
    "lang": ["en", "de", "zh", "fr", "es"],
    "source": [f"src{i}" for i in range(20)],
    "p_brand": [f"Brand#{i}" for i in range(1, 26)],
    "p_type": ["PROMO", "ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD"],
}

LIKE_PATTERNS = ["%an%", "%1%", "%or%", "%a_", "_o%", "%er%", "%scan%", "%join%"]

# per-table total-order key for window fragments. NOTE the driver's
# synthetic lineitem does NOT honor TPC-H uniqueness — (l_orderkey,
# l_linenumber) has duplicate groups (found by fuzz seeds 78/234), so
# lineitem orders by EVERY column: full-duplicate ties then carry
# identical rows and any tie resolution yields the same window-output
# multiset. FK joins to a unique right key never fan out, so the LEFT
# table's key stays valid through base_join.
UNIQ_KEY: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}

TS_RANGE: dict[str, tuple[int, int]] = {  # (start_year, end_year)
    "l_shipdate": (1995, 2001), "o_orderdate": (1995, 2001),
}

KEYWORD_REGEXES = [
    "hotel|airbnb|inn|resort",
    "scan|join|sort",
    "uber|lyft|taxi|bart",
    "interest",
    "window|batch|hash",
]

# low-cardinality columns eligible as raw group keys
GROUPABLE_KINDS = {"str"}


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _fmt_num(v: float, scale: int) -> str:
    return str(int(v)) if scale == 0 else repr(round(v, scale))


# ---------------------------------------------------------------- planning
#
# Each op is a dict {"op": str, ...params}. The plan tracks the live
# schema as a list of (name, kind); kinds: int double str ts date.


def _pick_ts_literal(rng: random.Random, col: str) -> str:
    if col in TS_RANGE:
        y0, y1 = TS_RANGE[col]
        return f"{rng.randint(y0, y1)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} 00:00:00"
    # events.ts: January 2024
    return f"2024-01-{rng.randint(1, 30):02d} {rng.randint(0, 23):02d}:00:00"


def _plan_filter(
    rng: random.Random,
    cols: list[tuple[str, str]],
    nullable: frozenset[str] = frozenset(),
) -> dict | None:
    cands = [c for c in cols if c[1] in ("int", "double", "str", "ts")]
    if not cands:
        return None
    # IS [NOT] NULL — biased toward columns that CAN be null (left-join
    # right side, lag, NULLIF outputs); on never-null columns it is a
    # trivially-full/empty but still legal differential probe.
    null_cands = [c for c in cands if c[0] in nullable]
    if null_cands and rng.random() < 0.30:
        name, _ = rng.choice(null_cands)
        return {"op": "filter_null", "col": name, "neg": rng.random() < 0.5}
    if rng.random() < 0.05:
        name, _ = rng.choice(cands)
        return {"op": "filter_null", "col": name, "neg": rng.random() < 0.5}
    # null-literal comparison: `col = NULL` is NULL → WHERE drops every
    # row on both engines (three-valued logic parity probe).
    if rng.random() < 0.04:
        name, _ = rng.choice(cands)
        return {"op": "filter_null_lit", "col": name}
    name, kind = rng.choice(cands)
    if kind in ("int", "double") and name in NUM_RANGE:
        lo, hi, scale = NUM_RANGE[name]
        lit = _fmt_num(rng.uniform(lo, hi), scale)
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        return {"op": "filter_num", "col": name, "cmp": op, "lit": lit}
    if kind == "str":
        if name in STR_VOCAB and rng.random() < 0.6:
            vals = rng.sample(STR_VOCAB[name],
                              k=rng.randint(1, min(3, len(STR_VOCAB[name]))))
            neg = rng.random() < 0.3
            return {"op": "filter_in", "col": name, "vals": vals, "neg": neg}
        return {"op": "filter_ilike", "col": name,
                "pat": rng.choice(LIKE_PATTERNS), "neg": rng.random() < 0.25}
    if kind == "ts":
        return {"op": "filter_ts", "col": name,
                "cmp": rng.choice(["<", ">="]),
                "lit": _pick_ts_literal(rng, name)}
    return None


def _plan_window(rng: random.Random, cols: list[tuple[str, str]],
                 uniq: list[str], counter: list[int]) -> dict | None:
    """Windowed projection: rank/row_number/lag partitioned by a
    low-cardinality column, ordered by the table's unique key (total
    order => deterministic cross-engine)."""
    names = {n for n, _ in cols}
    if not uniq or not all(k in names for k in uniq):
        return None
    parts = [n for n, k in cols if k == "str" and n in STR_VOCAB]
    part = rng.choice(parts) if parts and rng.random() < 0.8 else None
    fn = rng.choice(["row_number", "rank", "lag"])
    valcol = None
    if fn == "lag":
        nums = [n for n, k in cols if k in ("int", "double")]
        if not nums:
            return None
        valcol = rng.choice(nums)
    counter[0] += 1
    return {"op": "proj_window", "fn": fn, "part": part, "order": list(uniq),
            "col": valcol, "as": f"fz{counter[0]}",
            "kind": ("int" if fn != "lag"
                     else dict(cols)[valcol])}


def _plan_wframe(
    rng: random.Random,
    cols: list[tuple[str, str]],
    uniq: list[str],
    counter: list[int],
    nullable: frozenset[str] = frozenset(),
) -> dict | None:
    """Framed window aggregate (VERDICT r5 #8): sum/min/max/count OVER
    (PARTITION BY p ORDER BY ... {ROWS|RANGE} BETWEEN a AND b).

    ROWS frames order by the established total-order key (ties are
    full-duplicate rows, so any tie-break yields the same multiset);
    RANGE frames order by ONE non-null int column — the frame then
    depends only on order VALUES, deterministic regardless of ties.
    Aggregates are order-insensitive (decimal-exact sum over raw
    doubles only, per the seed-995 rule; min/max/count)."""
    names = {n for n, _ in cols}
    kind_of = dict(cols)
    mode = rng.choice(["rows", "rows", "range"])
    if mode == "rows":
        if not uniq or not all(k in names for k in uniq):
            return None
        if any(k in nullable for k in uniq):
            return None  # null order keys: peer semantics diverge
        order = list(uniq)
    else:
        ints = [n for n, k in cols if k == "int" and n not in nullable]
        if not ints:
            return None
        order = [rng.choice(ints)]
    parts = [n for n, k in cols if k == "str" and n in STR_VOCAB]
    part = rng.choice(parts) if parts and rng.random() < 0.7 else None
    fn = rng.choice(["sum_dec", "min", "max", "count"])
    valcol, kind = None, "int"
    if fn == "sum_dec":
        raws = [n for n, k in cols if k == "double" and n in NUM_RANGE]
        if not raws:
            return None
        valcol, kind = rng.choice(raws), "double"
    elif fn in ("min", "max"):
        cands = [(n, k) for n, k in cols if k in ("int", "double", "str")]
        if not cands:
            return None
        valcol, kind = rng.choice(cands)
    lo = rng.choice([None, 0, 1, 2, 5])  # None = UNBOUNDED PRECEDING
    hi = rng.choice([0, 1, 3] if mode == "rows" else [0, 2, 10])
    counter[0] += 1
    return {"op": "proj_wframe", "fn": fn, "mode": mode, "part": part,
            "order": order, "col": valcol, "lo": lo, "hi": hi,
            "as": f"fz{counter[0]}", "kind": kind}


def _plan_project(rng: random.Random, cols: list[tuple[str, str]],
                  counter: list[int],
                  nullable: frozenset[str] = frozenset()) -> dict | None:
    kinds = {}
    for n, k in cols:
        kinds.setdefault(k, []).append(n)
    # NULLIF targets: str-vocab columns (literal picked from the vocab
    # so it actually fires) or small-range ints. Doubles excluded on
    # purpose — float equality as a null trigger is a flakiness trap,
    # not a dialect probe.
    nullif_str = [n for n in kinds.get("str", []) if n in STR_VOCAB]
    nullif_int = [n for n in kinds.get("int", [])
                  if n in NUM_RANGE and NUM_RANGE[n][1] - NUM_RANGE[n][0] <= 30]
    coalesce_cands = [(n, k) for n, k in cols
                      if n in nullable and k in ("int", "double", "str")]
    choices = []
    if "double" in kinds:
        choices += ["bucket", "arith"]
    if "ts" in kinds:
        choices += ["dow", "month"]
    if "str" in kinds:
        choices += ["keyword"]
    if "int" in kinds:
        choices += ["mod", "bitmask"]
    if kinds.get("int") or kinds.get("str"):
        choices += ["md5mod"]
    if nullif_str or nullif_int:
        choices += ["nullif"]
    if coalesce_cands:
        choices += ["coalesce", "coalesce"]
    if not choices:
        return None
    kind = rng.choice(choices)
    counter[0] += 1
    new = f"fz{counter[0]}"
    if kind == "bucket":
        return {"op": "proj_bucket", "col": rng.choice(kinds["double"]), "as": new}
    if kind == "arith":
        a = rng.choice(kinds["double"])
        b = rng.choice(kinds["double"])
        form = rng.choice(["mul1m", "add", "abs"])
        return {"op": "proj_arith", "a": a, "b": b, "form": form, "as": new}
    if kind == "dow":
        return {"op": "proj_dow", "col": rng.choice(kinds["ts"]), "as": new}
    if kind == "month":
        return {"op": "proj_month", "col": rng.choice(kinds["ts"]), "as": new}
    if kind == "keyword":
        return {"op": "proj_keyword", "col": rng.choice(kinds["str"]),
                "pat": rng.choice(KEYWORD_REGEXES), "as": new}
    if kind == "nullif":
        if nullif_str and (not nullif_int or rng.random() < 0.6):
            c = rng.choice(nullif_str)
            return {"op": "proj_nullif", "col": c, "kind": "str",
                    "lit": rng.choice(STR_VOCAB[c]), "as": new}
        c = rng.choice(nullif_int)
        lo, hi, _ = NUM_RANGE[c]
        return {"op": "proj_nullif", "col": c, "kind": "int",
                "lit": str(rng.randint(int(lo), int(hi))), "as": new}
    if kind == "bitmask":
        # the Bloom-filter idiom: shift-left into a signed-BIGINT word,
        # mask with &. abs()%30 keeps the shift in [0,29] — below
        # DuckDB's 1<<63 overflow and the sign bit — on both engines.
        return {"op": "proj_bitmask", "col": rng.choice(kinds["int"]),
                "mask": rng.choice([1431655765, 2863311530, 4042322160]),
                "as": new}
    if kind == "md5mod":
        # the sketch-bucket idiom: md5 -> first 8 hex -> int -> % width
        # (Spark conv(,16,10) vs DuckDB CAST('0x'||... AS UBIGINT));
        # doubles excluded — their string forms differ across engines.
        c = rng.choice(kinds.get("int", []) + kinds.get("str", []))
        return {"op": "proj_md5mod", "col": c,
                "m": rng.choice([16, 64, 256, 1024]), "as": new}
    if kind == "coalesce":
        c, k = rng.choice(coalesce_cands)
        if k == "str":
            lit = rng.choice(STR_VOCAB[c]) if c in STR_VOCAB else "zz"
        elif c in NUM_RANGE:
            lo, hi, scale = NUM_RANGE[c]
            lit = _fmt_num(rng.uniform(lo, hi), scale)
        else:
            lit = "0"
        return {"op": "proj_coalesce", "col": c, "kind": k, "lit": lit, "as": new}
    return {"op": "proj_mod", "col": rng.choice(kinds["int"]),
            "m": rng.choice([3, 5, 7, 11]), "as": new}


def _apply_to_schema(op: dict, cols: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Mirror build-time schema effects during planning/shrinking."""
    o = op["op"]
    if o in ("proj_window", "proj_wframe", "proj_nullif", "proj_coalesce"):
        return cols + [(op["as"], op["kind"])]
    if o.startswith("proj_"):
        kind = {"proj_bucket": "int", "proj_dow": "int", "proj_keyword": "int",
                "proj_mod": "int", "proj_month": "date", "proj_arith": "double",
                "proj_explode": "double", "proj_bitmask": "int",
                "proj_md5mod": "int"}[o]
        return cols + [(op["as"], kind)]
    if o == "agg":
        out = [(g, k) for g, k in cols if g in op["groups"]]
        return out + [(a["as"], a["kind"]) for a in op["aggs"]]
    if o == "distinct":
        return [(n, k) for n, k in cols if n in op["keep"]]
    return cols


def _plan_explode(rng: random.Random, cols: list[tuple[str, str]],
                  counter: list[int]) -> dict | None:
    """Row fan-out via array construction + explode (round 7): Spark
    ``explode(array(a, b))`` vs DuckDB ``UNNEST([a, b])`` — both emit
    one row per element and KEEP null elements (explode only skips a
    null/empty array, never a null element)."""
    nums = [n for n, k in cols if k == "double"]
    if len(nums) < 2:
        return None
    a, b = rng.sample(nums, 2)
    counter[0] += 1
    return {"op": "proj_explode", "a": a, "b": b, "as": f"fzex{counter[0]}"}


def _plan_agg(rng: random.Random, cols: list[tuple[str, str]],
              nullable: frozenset[str] = frozenset()) -> dict:
    groupable = [(n, k) for n, k in cols
                 if k in GROUPABLE_KINDS or n.startswith("fz")]
    rng.shuffle(groupable)
    groups = [n for n, _ in groupable[: rng.randint(0, 2)]]
    # decimal-cast aggregates (sum_dec/avg_dec) only over RAW parquet
    # doubles: their stored values are clean 2-dp quantities, so
    # CAST(x AS DECIMAL(18,2)) is exact on both engines. A COMPUTED
    # double (proj_arith product) has >2 meaningful decimal digits and
    # the engines' double->decimal conversions round boundary values
    # differently (Spark: shortest-decimal-repr HALF_UP; DuckDB: exact
    # binary expansion) — found by fuzz seed 995. min/max/
    # count_distinct compare raw doubles exactly and stay safe.
    numeric = [n for n, k in cols if k == "double" and n in NUM_RANGE]
    anycol = [n for n, _ in cols if n not in groups]
    null_cands = [n for n in anycol if n in nullable]
    aggs = [{"fn": "count_star", "as": "cnt", "kind": "int"}]
    n_extra = rng.randint(1, 3)
    for _ in range(n_extra):
        pick = rng.random()
        # COUNT(col) skips NULLs — only interesting when the column can
        # actually hold them, so it is gated on the nullable set.
        if null_cands and pick < 0.25:
            c = rng.choice(null_cands)
            aggs.append({"fn": "count_col", "col": c,
                         "as": f"cc_{c}", "kind": "int"})
        elif numeric and pick < 0.45:
            c = rng.choice(numeric)
            fn = rng.choice(["sum_dec", "avg_dec", "min", "max"])
            kind = "double"
            aggs.append({"fn": fn, "col": c, "as": f"{fn}_{c}", "kind": kind})
        elif anycol and pick < 0.8:
            c = rng.choice(anycol)
            aggs.append({"fn": "count_distinct", "col": c,
                         "as": f"cd_{c}", "kind": "int"})
        elif (int_cands := [n for n, k in cols
                            if k == "int" and n not in groups]) and pick < 0.9:
            # bit_or: the Bloom/bitset fold — integer OR is exact and
            # order-independent on both engines (two's complement)
            c = rng.choice(int_cands)
            aggs.append({"fn": "bit_or", "col": c,
                         "as": f"bo_{c}", "kind": "int"})
        elif anycol:
            c, k = rng.choice([(n, k) for n, k in cols if n not in groups])
            fn = rng.choice(["min", "max"])
            aggs.append({"fn": fn, "col": c, "as": f"{fn}_{c}", "kind": k})
    # dedupe output aliases
    seen, uniq = set(), []
    for a in aggs:
        if a["as"] not in seen:
            seen.add(a["as"])
            uniq.append(a)
    # grouping-set modes (round 7): ROLLUP/CUBE add subtotal rows with
    # NULL group keys — the fragment where Spark's grouping-set NULLs
    # must land identically to DuckDB's (both engines also keep a
    # data-NULL group distinct from the subtotal ROW, but equal-valued
    # under the multiset compare, which is what the driver hashes)
    mode = "plain"
    if groups and rng.random() < 0.30:
        mode = rng.choice(["rollup", "cube"])
    return {"op": "agg", "groups": groups, "aggs": uniq, "mode": mode}


def plan_case(seed: int) -> list[dict]:
    rng = random.Random(seed)
    ops: list[dict] = []
    counter = [0]
    nullable: set[str] = set()  # columns that can hold NULL at this point
    start = rng.random()
    if start < 0.10:
        t1, t2, k1, k2, t3, k3src, k3 = rng.choice(JOINS3)
        ops.append({"op": "base_join3", "t1": t1, "t2": t2, "k1": k1,
                    "k2": k2, "t3": t3, "k3src": k3src, "k3": k3})
        cols = list(TABLES[t1])
        cols += [(n, k) for n, k in TABLES[t2] if n != k2]
        cols += [(n, k) for n, k in TABLES[t3] if n != k3]
        uniq = list(UNIQ_KEY.get(t1, []))
    elif start < 0.34:
        left, right, lk, rk, runiq = rng.choice(JOINS)
        how = rng.choice(["inner", "inner", "left", "semi", "anti"])
        right_filter = None
        if how in ("semi", "anti") or rng.random() < 0.4:
            right_filter = _plan_filter(rng, TABLES[right])
        ops.append({"op": "base_join", "left": left, "right": right,
                    "lk": lk, "rk": rk, "how": how, "rfilter": right_filter})
        cols = list(TABLES[left])
        if how in ("inner", "left"):
            cols += [(n, k) for n, k in TABLES[right] if n != rk]
            if how == "left":
                # right side of a LEFT join is the null fountain
                nullable.update(n for n, _ in TABLES[right] if n != rk)
        if runiq:
            uniq = list(UNIQ_KEY.get(left, []))
        else:
            # fan-out join: left key multiplies, so no subset of the
            # left columns is unique — but ordering by EVERY output
            # column is still a valid window total order (ties are
            # full-duplicate rows, so any tie-break yields the same
            # window-output multiset)
            uniq = [n for n, _ in cols]
    elif start < 0.42:
        # correlated [NOT] EXISTS (VERDICT r5 #8): the equi-join
        # correlation PLUS a second non-equi predicate tying a right
        # column to a LEFT column — the fragment a plain semi/anti
        # join with a right-side filter can't express
        left, right, lk, rk, _ = rng.choice(JOINS)
        lcol = rng.choice(NUM_COLS[left])
        rcol = rng.choice(NUM_COLS[right])
        ops.append({"op": "base_join_corr", "left": left, "right": right,
                    "lk": lk, "rk": rk,
                    "how": rng.choice(["semi", "anti"]),
                    "lcol": lcol, "rcol": rcol,
                    "cmp": rng.choice(["<", "<=", ">", ">="])})
        cols = list(TABLES[left])
        uniq = list(UNIQ_KEY.get(left, []))
    elif start < 0.50:
        # decimal-typed join key (VERDICT r5 #8): join a table to the
        # DISTINCT decimal cast of one of its own raw 2-dp columns —
        # exercises decimal hash/compare parity and decimal output
        # canonicalization. Every row matches exactly one key (NULL
        # keys drop on both engines), so the unique key survives.
        t, c = rng.choice(DEC_JOIN)
        ops.append({"op": "base_join_dec", "table": t, "col": c})
        cols = list(TABLES[t]) + [("fzdec", "dec")]
        uniq = list(UNIQ_KEY.get(t, []))
    elif start < 0.60:
        # UNION ALL of the same table under two filters (duplicates
        # allowed — the compare is multiset); a row matching both
        # filters must appear twice on BOTH engines
        t = rng.choice(list(TABLES))
        f1 = _plan_filter(rng, TABLES[t])
        f2 = _plan_filter(rng, TABLES[t])
        if f1 is None or f2 is None:
            ops.append({"op": "base", "table": t})
        else:
            ops.append({"op": "base_union", "table": t, "f1": f1, "f2": f2})
        cols = list(TABLES[t])
        uniq = []  # union duplicates the key
    elif start < 0.70:
        # EXCEPT / INTERSECT (and the ALL variants) of two filtered
        # projections of the same table — the set-op surface the r1-r3
        # grammar never emitted (VERDICT r3 #2). DISTINCT variants make
        # the projection a unique key; ALL variants only ever tie on
        # full-duplicate rows, so `keep` works as the window order
        # either way.
        t = rng.choice(list(TABLES))
        names = [n for n, _ in TABLES[t]]
        keep = rng.sample(names, k=rng.randint(2, min(4, len(names))))
        f1 = _plan_filter(rng, TABLES[t])
        f2 = _plan_filter(rng, TABLES[t])
        kind = rng.choice(["except", "except_all", "intersect", "intersect_all"])
        ops.append({"op": "base_setop", "table": t, "keep": keep,
                    "f1": f1, "f2": f2, "kind": kind})
        by_name = dict(TABLES[t])
        cols = [(n, by_name[n]) for n in keep]
        uniq = list(keep)
    elif start < 0.76:
        # as-of backward join (VERDICT r8 #7): one event type picks up
        # the latest earlier-or-simultaneous row of another per user —
        # the operators/asof.py union+running-last plan vs DuckDB's
        # native ASOF JOIN. The right side pre-aggregates to one row
        # per (user, ts) (both implementations' determinism contract);
        # unmatched left rows keep NULL payloads (the null fountain).
        types = STR_VOCAB["event_type"]
        lt, rt = rng.sample(types, 2)
        payload = rng.choice(["value", "event_id"])
        ops.append({"op": "base_asof", "lt": lt, "rt": rt,
                    "payload": payload})
        pname = "rval_x" if payload == "value" else "rid_x"
        pkind = "double" if payload == "value" else "int"
        cols = [("event_id", "int"), ("user_id", "int"), ("ts", "ts"),
                ("value", "double"), (pname, pkind), ("ts_x", "ts")]
        uniq = ["event_id"]  # asof preserves the left row count
        nullable.update({pname, "ts_x"})
    elif start < 0.82:
        # binned range join (VERDICT r8 #7): points against seeded
        # random (possibly overlapping, possibly empty) literal bands —
        # operators/range_join.py's grid-binned equi-join + residual
        # BETWEEN vs DuckDB's native interval join (IEJoin). The bin
        # width is varied against the band widths so cell-boundary
        # rounding (incl. floor() on negative points) gets exercised.
        t, pc = rng.choice(RANGE_POINTS)
        lo_r, hi_r, _ = NUM_RANGE[pc]
        bands = []
        for i in range(rng.randint(2, 4)):
            a = round(rng.uniform(lo_r, hi_r), 2)
            b = round(rng.uniform(lo_r, hi_r), 2)
            bands.append((f"band{i}", min(a, b), max(a, b)))
        width = max(h - l for _, l, h in bands) or 1.0
        bin_w = round(width / rng.choice([1, 2, 4]) + 0.01, 2)
        ops.append({"op": "base_range", "table": t, "point": pc,
                    "bands": bands, "bin": bin_w})
        cols = list(TABLES[t]) + [("fzband", "str"), ("fz_lo", "double"),
                                  ("fz_hi", "double")]
        # fan-out: a point inside two overlapping bands emits two rows
        # that differ in the band columns, so ordering by EVERY output
        # column is a total order (full-duplicate ties only)
        uniq = [n for n, _ in cols]
    else:
        t = rng.choice(list(TABLES))
        ops.append({"op": "base", "table": t})
        cols = list(TABLES[t])
        uniq = list(UNIQ_KEY.get(t, []))

    exploded = False
    for _ in range(rng.randint(1, 4)):
        pick = rng.random()
        if pick < 0.45:
            op = _plan_filter(rng, cols, frozenset(nullable))
        elif pick < 0.72:
            op = _plan_project(rng, cols, counter, frozenset(nullable))
        elif pick < 0.80 and not exploded:
            op = _plan_explode(rng, cols, counter)
        elif pick < 0.90:
            op = _plan_wframe(rng, cols, uniq, counter, frozenset(nullable))
        else:
            op = _plan_window(rng, cols, uniq, counter)
        if op is None:
            continue
        ops.append(op)
        cols = _apply_to_schema(op, cols)
        o = op["op"]
        if o == "proj_explode":
            # fan-out: no column subset stays unique, but ordering by
            # EVERY column is still a valid window total order (ties
            # are full-duplicate rows — same precedent as fan-out
            # joins above)
            exploded = True
            uniq = [n for n, _ in cols]
            if op["a"] in nullable or op["b"] in nullable:
                nullable.add(op["as"])
        if o == "proj_nullif" or (o == "proj_window" and op["fn"] == "lag"):
            nullable.add(op["as"])
        elif o == "proj_wframe" and op["fn"] != "count" and op["col"] in nullable:
            nullable.add(op["as"])  # all-null frame → NULL aggregate
        elif o == "filter_null" and op["neg"]:
            nullable.discard(op["col"])  # IS NOT NULL proves it non-null

    terminal = rng.random()
    if terminal < 0.55:
        op = _plan_agg(rng, cols, frozenset(nullable))
        ops.append(op)
        cols = _apply_to_schema(op, cols)
        # min/max propagate NULL only if every grouped value is NULL;
        # everything else (counts, decimal sums over raw columns) is
        # non-null — reset the tracker accordingly
        nullable = {a["as"] for a in op["aggs"]
                    if a.get("col") in nullable and a["fn"] in ("min", "max")}
        if op.get("mode", "plain") != "plain":
            # ROLLUP/CUBE subtotal rows carry NULL group keys
            nullable |= set(op["groups"])
        if rng.random() < 0.4:
            ops.append({"op": "filter_num", "col": "cnt", "cmp": ">",
                        "lit": str(rng.randint(0, 3))})
    elif terminal < 0.75:
        lowcard = [n for n, k in cols if k in ("str", "date")
                   or n.startswith("fz")]
        if lowcard:
            rng.shuffle(lowcard)
            ops.append({"op": "distinct", "keep": lowcard[: rng.randint(1, 3)]})
            cols = _apply_to_schema(ops[-1], cols)
    if len(cols) > 8:
        keep = [n for n, _ in cols[:8]]
        ops.append({"op": "select", "keep": keep})
        cols = [(n, k) for n, k in cols if n in keep]
    if rng.random() < 0.40:
        # total-order sort with per-column direction AND nulls
        # placement chosen independently — the exact fragment surface
        # where Spark (asc = NULLS FIRST) and DuckDB/Postgres (asc =
        # NULLS LAST) defaults diverge, so both sides must pin it
        names = [n for n, _ in cols]
        rng.shuffle(names)
        specs = [{"col": n, "desc": rng.random() < 0.5,
                  "nf": rng.random() < 0.5} for n in names]
        ops.append({"op": "sort_limit", "n": rng.choice([5, 20, 100]),
                    "specs": specs})
    return ops


# ---------------------------------------------------------------- build


def build_case(ops: list[dict]):
    """Compile an op list into (spark_fn, sql). Deterministic."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.functions import pg
    from doin_fine_ance__spark.sources.testdata import load_table

    def col_expr_sql(op):
        o = op["op"]
        if o == "proj_bucket":
            c = op["col"]
            return (f"CAST(CASE WHEN {c} IS NULL THEN 5"
                    f" WHEN abs({c}) <= 10 THEN 0 WHEN abs({c}) <= 50 THEN 1"
                    f" WHEN abs({c}) <= 100 THEN 2 WHEN abs({c}) <= 500 THEN 3"
                    f" ELSE 4 END AS INTEGER)")
        if o == "proj_dow":
            return f"CAST((dayofweek({op['col']}) + 6) % 7 AS INTEGER)"
        if o == "proj_month":
            return f"CAST(date_trunc('month', {op['col']}) AS DATE)"
        if o == "proj_keyword":
            return (f"CAST(CASE WHEN regexp_matches(lower(coalesce({op['col']}, '')),"
                    f" {_q(op['pat'])}) THEN 1 ELSE 0 END AS INTEGER)")
        if o == "proj_mod":
            return f"CAST({op['col']} % {op['m']} AS BIGINT)"
        if o == "proj_bitmask":
            c = op["col"]
            return (f"((CAST(1 AS BIGINT) << CAST(abs({c}) % 30 AS INT))"
                    f" & CAST({op['mask']} AS BIGINT))")
        if o == "proj_md5mod":
            c = op["col"]
            return (f"CAST(CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8))"
                    f" AS UBIGINT) % {op['m']} AS BIGINT)")
        if o == "proj_nullif":
            lit = _q(op["lit"]) if op["kind"] == "str" else op["lit"]
            return f"NULLIF({op['col']}, {lit})"
        if o == "proj_coalesce":
            lit = _q(op["lit"]) if op["kind"] == "str" else op["lit"]
            return f"COALESCE({op['col']}, {lit})"
        if o == "proj_arith":
            a, b = op["a"], op["b"]
            # trailing "+ 0.0" normalizes IEEE negative zero: 0 * negative
            # yields -0.0, and while both engines GROUP -0.0 with 0.0,
            # DuckDB reports the key as -0.0 where Spark's
            # NormalizeFloatingNumbers emits +0.0 — numerically equal,
            # sign-distinct under the value-hash (fuzz seed 2472).
            # -0.0 + 0.0 = +0.0 and x + 0.0 = x otherwise, identically
            # on both engines.
            return {"mul1m": f"(({a} * (1.0 - {b})) + 0.0)",
                    "add": f"(({a} + {b}) + 0.0)",
                    "abs": f"abs({a})"}[op["form"]]
        raise AssertionError(o)

    def col_expr_spark(op):
        if op["op"] == "proj_bucket":
            return pg.amount_bucket(op["col"])
        if op["op"] == "proj_dow":
            return pg.pandas_dow(op["col"])
        if op["op"] == "proj_month":
            return pg.month_trunc(op["col"])
        if op["op"] == "proj_keyword":
            return pg.keyword_flag(op["col"], op["pat"])
        if op["op"] == "proj_mod":
            return (F.col(op["col"]) % op["m"]).cast("bigint")
        if op["op"] == "proj_bitmask":
            c = op["col"]
            return F.expr(
                f"shiftleft(1L, cast(abs({c}) % 30 as int))"
                f" & cast({op['mask']} as bigint)"
            )
        if op["op"] == "proj_md5mod":
            return F.pmod(
                F.conv(
                    F.substring(F.md5(F.col(op["col"]).cast("string")), 1, 8), 16, 10
                ).cast("bigint"),
                F.lit(op["m"]),
            )
        if op["op"] == "proj_nullif":
            lit = op["lit"] if op["kind"] == "str" else int(op["lit"])
            c = F.col(op["col"])
            return F.when(c == F.lit(lit), F.lit(None)).otherwise(c)
        if op["op"] == "proj_coalesce":
            if op["kind"] == "str":
                lit = F.lit(op["lit"])
            elif "." in op["lit"]:
                lit = F.lit(float(op["lit"]))
            else:
                lit = F.lit(int(op["lit"]))
            return F.coalesce(F.col(op["col"]), lit)
        a, b = F.col(op["a"]), F.col(op["b"])
        # + 0.0 mirrors the SQL side's negative-zero normalization
        return {"mul1m": a * (F.lit(1.0) - b) + F.lit(0.0),
                "add": a + b + F.lit(0.0),
                "abs": F.abs(a)}[op["form"]]

    def filter_sql(op):
        o = op["op"]
        if o == "filter_num":
            return f"{op['col']} {op['cmp']} {op['lit']}"
        if o == "filter_in":
            lst = ", ".join(_q(v) for v in op["vals"])
            return f"{op['col']} {'NOT IN' if op['neg'] else 'IN'} ({lst})"
        if o == "filter_ilike":
            e = f"lower({op['col']}) LIKE {_q(op['pat'].lower())}"
            return f"NOT ({e})" if op["neg"] else e
        if o == "filter_ts":
            return f"{op['col']} {op['cmp']} TIMESTAMP {_q(op['lit'])}"
        if o == "filter_null":
            return f"{op['col']} IS {'NOT ' if op['neg'] else ''}NULL"
        if o == "filter_null_lit":
            # three-valued logic: `col = NULL` is NULL, WHERE drops all
            return f"{op['col']} = NULL"
        raise AssertionError(o)

    def filter_spark(op):
        o = op["op"]
        c = F.col(op["col"])
        if o == "filter_num":
            lit = float(op["lit"]) if "." in op["lit"] else int(op["lit"])
            return {"<": c < lit, "<=": c <= lit, ">": c > lit,
                    ">=": c >= lit, "<>": c != lit}[op["cmp"]]
        if o == "filter_in":
            e = c.isin(op["vals"])
            return ~e if op["neg"] else e
        if o == "filter_ilike":
            e = pg.ilike(op["col"], op["pat"])
            return ~e if op["neg"] else e
        if o == "filter_null":
            return c.isNotNull() if op["neg"] else c.isNull()
        if o == "filter_null_lit":
            return c == F.lit(None)
        lit = F.lit(op["lit"]).cast("timestamp")
        return c < lit if op["cmp"] == "<" else c >= lit

    # --- walk the ops, building sql text + a spark-program closure list
    cols: list[tuple[str, str]] = []
    sql = ""
    steps = []  # list of callables df -> df

    base = ops[0]
    if base["op"] == "base":
        t = base["table"]
        cols = list(TABLES[t])
        sql = f"SELECT * FROM {t}"
        steps.append(lambda spark, sf, _t=t: load_table(spark, sf, _t))
    elif base["op"] == "base_join3":
        t1, t2, k1, k2 = base["t1"], base["t2"], base["k1"], base["k2"]
        t3, k3src, k3 = base["t3"], base["k3src"], base["k3"]
        cols = list(TABLES[t1])
        m_cols = [n for n, _ in TABLES[t2] if n != k2]
        r_cols = [n for n, _ in TABLES[t3] if n != k3]
        cols += [(n, k) for n, k in TABLES[t2] if n != k2]
        cols += [(n, k) for n, k in TABLES[t3] if n != k3]
        outlist = ", ".join(
            ["l.*"] + [f"m.{n}" for n in m_cols] + [f"r.{n}" for n in r_cols]
        )
        src_alias = "l" if k3src in {n for n, _ in TABLES[t1]} else "m"
        sql = (f"SELECT {outlist} FROM {t1} l"
               f" JOIN {t2} m ON l.{k1} = m.{k2}"
               f" JOIN {t3} r ON {src_alias}.{k3src} = r.{k3}")

        def _join3(spark, sf, _b=base):
            t1df = load_table(spark, sf, _b["t1"])
            t2df = load_table(spark, sf, _b["t2"])
            t3df = load_table(spark, sf, _b["t3"])
            j = t1df.join(t2df, t1df[_b["k1"]] == t2df[_b["k2"]]).drop(
                t2df[_b["k2"]]
            )
            j = j.join(t3df, j[_b["k3src"]] == t3df[_b["k3"]]).drop(
                t3df[_b["k3"]]
            )
            return j

        steps.append(_join3)
    elif base["op"] == "base_union":
        t = base["table"]
        cols = list(TABLES[t])
        sql = (f"SELECT * FROM {t} WHERE {filter_sql(base['f1'])}"
               f" UNION ALL SELECT * FROM {t} WHERE {filter_sql(base['f2'])}")

        def _union(spark, sf, _b=base):
            src = load_table(spark, sf, _b["table"])
            return src.filter(filter_spark(_b["f1"])).unionByName(
                src.filter(filter_spark(_b["f2"]))
            )

        steps.append(_union)
    elif base["op"] == "base_setop":
        t, keep, kind = base["table"], base["keep"], base["kind"]
        by_name = dict(TABLES[t])
        cols = [(n, by_name[n]) for n in keep]
        sel = ", ".join(keep)
        w1 = f" WHERE {filter_sql(base['f1'])}" if base.get("f1") else ""
        w2 = f" WHERE {filter_sql(base['f2'])}" if base.get("f2") else ""
        kw = {"except": "EXCEPT", "except_all": "EXCEPT ALL",
              "intersect": "INTERSECT", "intersect_all": "INTERSECT ALL"}[kind]
        sql = (f"SELECT {sel} FROM {t}{w1}"
               f" {kw} SELECT {sel} FROM {t}{w2}")

        def _setop(spark, sf, _b=base):
            src = load_table(spark, sf, _b["table"])
            a = src.filter(filter_spark(_b["f1"])) if _b.get("f1") else src
            b = src.filter(filter_spark(_b["f2"])) if _b.get("f2") else src
            a, b = a.select(*_b["keep"]), b.select(*_b["keep"])
            return {"except": a.subtract, "except_all": a.exceptAll,
                    "intersect": a.intersect,
                    "intersect_all": a.intersectAll}[_b["kind"]](b)

        steps.append(_setop)
    elif base["op"] == "base_join_corr":
        left, right, lk, rk = base["left"], base["right"], base["lk"], base["rk"]
        ex = "EXISTS" if base["how"] == "semi" else "NOT EXISTS"
        sql = (f"SELECT l.* FROM {left} l WHERE {ex}"
               f" (SELECT 1 FROM {right} r WHERE r.{rk} = l.{lk}"
               f" AND r.{base['rcol']} {base['cmp']} l.{base['lcol']})")
        cols = list(TABLES[left])

        def _join_corr(spark, sf, _b=base):
            ldf = load_table(spark, sf, _b["left"])
            rdf = load_table(spark, sf, _b["right"])
            rc, lc = rdf[_b["rcol"]], ldf[_b["lcol"]]
            extra = {"<": rc < lc, "<=": rc <= lc,
                     ">": rc > lc, ">=": rc >= lc}[_b["cmp"]]
            cond = (ldf[_b["lk"]] == rdf[_b["rk"]]) & extra
            how = "left_semi" if _b["how"] == "semi" else "left_anti"
            return ldf.join(rdf, cond, how)

        steps.append(_join_corr)
    elif base["op"] == "base_join_dec":
        t, c = base["table"], base["col"]
        cols = list(TABLES[t]) + [("fzdec", "dec")]
        sql = (f"SELECT a.*, b.fzdec FROM {t} a JOIN"
               f" (SELECT DISTINCT CAST({c} AS DECIMAL(12,2)) AS fzdec"
               f" FROM {t}) b ON CAST(a.{c} AS DECIMAL(12,2)) = b.fzdec")

        def _join_dec(spark, sf, _b=base):
            src = load_table(spark, sf, _b["table"])
            keyed = src.select(
                F.col(_b["col"]).cast("decimal(12,2)").alias("fzdec")
            ).distinct()
            return src.join(
                keyed,
                F.col(_b["col"]).cast("decimal(12,2)") == F.col("fzdec"),
            )

        steps.append(_join_dec)
    elif base["op"] == "base_asof":
        lt, rt, payload = base["lt"], base["rt"], base["payload"]
        pname = "rval_x" if payload == "value" else "rid_x"
        # NOT DuckDB's native ASOF JOIN: fuzz seeds 10233/11030 (r9)
        # caught duckdb 1.0.0's ASOF silently matching a STALE (older
        # than latest) right row on this data shape — an independently
        # verified pure-Python replay sided with Spark. The oracle is
        # the greatest-per-group formulation instead: scalar-subquery
        # max(ts <= l.ts) then an equi-join back for the payload
        # (still independent of Spark's union+running-last plan).
        sql = (
            f"WITH fzl AS (SELECT event_id, user_id,"
            f" CAST(ts AS TIMESTAMP) AS ts, value FROM events"
            f" WHERE event_type = {_q(lt)}),"
            f" fzr AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,"
            f" MAX({payload}) AS rpay FROM events"
            f" WHERE event_type = {_q(rt)}"
            f" GROUP BY user_id, CAST(ts AS TIMESTAMP)),"
            f" fzm AS (SELECT fzl.*, (SELECT MAX(r2.ts) FROM fzr r2"
            f" WHERE r2.user_id = fzl.user_id AND r2.ts <= fzl.ts)"
            f" AS t_match FROM fzl)"
            f" SELECT m.event_id, m.user_id, m.ts, m.value,"
            f" r.rpay AS {pname}, m.t_match AS ts_x"
            f" FROM fzm m LEFT JOIN fzr r"
            f" ON r.user_id = m.user_id AND r.ts = m.t_match"
        )

        def _asof(spark, sf, _b=base, _pn=pname):
            from doin_fine_ance__spark.operators.asof import asof_join

            ev = load_table(spark, sf, "events")
            left = ev.filter(F.col("event_type") == _b["lt"]).select(
                "event_id", "user_id", "ts", "value"
            )
            right = (
                ev.filter(F.col("event_type") == _b["rt"])
                .groupBy("user_id", "ts")
                .agg(F.max(_b["payload"]).alias("rpay"))
            )
            out = asof_join(
                left, right, by=["user_id"], left_ts="ts", right_ts="ts",
                value_cols=["rpay"], suffix="_x",
            )
            return out.select(
                "event_id", "user_id", "ts", "value",
                F.col("rpay_x").alias(_pn), "ts_x",
            )

        cols = [("event_id", "int"), ("user_id", "int"), ("ts", "ts"),
                ("value", "double"), (pname, "double" if payload == "value"
                                      else "int"), ("ts_x", "ts")]
        steps.append(_asof)
    elif base["op"] == "base_range":
        t, pc = base["table"], base["point"]
        # CAST the band bounds to DOUBLE: a bare 2-dp literal would
        # type as DECIMAL in DuckDB and the output column's type (and
        # the driver's schema hash) would diverge from Spark's double
        vals = ", ".join(
            f"({_q(nm)}, CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
            for nm, lo, hi in base["bands"]
        )
        sql = (
            f"SELECT l.*, b.fzband, b.fz_lo, b.fz_hi FROM {t} l JOIN"
            f" (VALUES {vals}) AS b(fzband, fz_lo, fz_hi)"
            f" ON l.{pc} BETWEEN b.fz_lo AND b.fz_hi"
        )

        def _range(spark, sf, _b=base):
            from doin_fine_ance__spark.operators.range_join import range_join

            src = load_table(spark, sf, _b["table"])
            bands_df = spark.createDataFrame(
                _b["bands"], "fzband string, fz_lo double, fz_hi double"
            )
            return range_join(
                src, bands_df, _b["point"], "fz_lo", "fz_hi",
                bin_width=_b["bin"],
            )

        cols = list(TABLES[t]) + [("fzband", "str"), ("fz_lo", "double"),
                                  ("fz_hi", "double")]
        steps.append(_range)
    else:
        left, right, lk, rk, how = (base["left"], base["right"], base["lk"],
                                    base["rk"], base["how"])
        rf = base.get("rfilter")
        rsql = f"SELECT * FROM {right}"
        if rf:
            rsql += f" WHERE {filter_sql(rf)}"
        cols = list(TABLES[left])
        if how in ("inner", "left"):
            rcols = [n for n, _ in TABLES[right] if n != rk]
            cols += [(n, k) for n, k in TABLES[right] if n != rk]
            outlist = ", ".join(["l.*"] + [f"r.{n}" for n in rcols])
            kw = "JOIN" if how == "inner" else "LEFT JOIN"
            sql = (f"SELECT {outlist} FROM {left} l {kw} ({rsql}) r"
                   f" ON l.{lk} = r.{rk}")
        else:
            ex = "EXISTS" if how == "semi" else "NOT EXISTS"
            sql = (f"SELECT l.* FROM {left} l WHERE {ex}"
                   f" (SELECT 1 FROM ({rsql}) r WHERE r.{rk} = l.{lk})")

        def _join(spark, sf, _b=base):
            ldf = load_table(spark, sf, _b["left"])
            rdf = load_table(spark, sf, _b["right"])
            if _b.get("rfilter"):
                rdf = rdf.filter(filter_spark(_b["rfilter"]))
            howmap = {"inner": "inner", "left": "left",
                      "semi": "left_semi", "anti": "left_anti"}
            cond = ldf[_b["lk"]] == rdf[_b["rk"]]
            j = ldf.join(rdf, cond, howmap[_b["how"]])
            if _b["how"] in ("inner", "left"):
                j = j.drop(rdf[_b["rk"]])
            return j

        steps.append(_join)

    for op in ops[1:]:
        o = op["op"]
        if o.startswith("filter_"):
            sql = f"SELECT * FROM ({sql}) t WHERE {filter_sql(op)}"
            steps.append(lambda df, _op=op: df.filter(filter_spark(_op)))
        elif o == "proj_window":
            part_sql = f"PARTITION BY {op['part']} " if op["part"] else ""
            # Spark asc = NULLS FIRST; DuckDB asc default = NULLS LAST
            order_sql = ", ".join(f"{c} NULLS FIRST" for c in op["order"])
            if op["fn"] == "lag":
                wexpr = f"lag({op['col']}, 1) OVER ({part_sql}ORDER BY {order_sql})"
            else:
                wexpr = f"{op['fn']}() OVER ({part_sql}ORDER BY {order_sql})"
                wexpr = f"CAST({wexpr} AS BIGINT)"
            sql = f"SELECT t.*, {wexpr} AS {op['as']} FROM ({sql}) t"

            def _win(df, _op=op):
                from pyspark.sql import Window

                w = (Window.partitionBy(_op["part"]) if _op["part"]
                     else Window.partitionBy())
                w = w.orderBy(*[F.col(k).asc() for k in _op["order"]])
                if _op["fn"] == "lag":
                    e = F.lag(_op["col"], 1).over(w)
                elif _op["fn"] == "rank":
                    e = F.rank().over(w).cast("bigint")
                else:
                    e = F.row_number().over(w).cast("bigint")
                return df.withColumn(_op["as"], e)

            steps.append(_win)
            cols = _apply_to_schema(op, cols)
        elif o == "proj_wframe":
            part_sql = f"PARTITION BY {op['part']} " if op["part"] else ""
            order_sql = ", ".join(f"{c} NULLS FIRST" for c in op["order"])
            lo, hi = op["lo"], op["hi"]
            lo_s = ("UNBOUNDED PRECEDING" if lo is None
                    else "CURRENT ROW" if lo == 0 else f"{lo} PRECEDING")
            hi_s = "CURRENT ROW" if hi == 0 else f"{hi} FOLLOWING"
            frame = f"{op['mode'].upper()} BETWEEN {lo_s} AND {hi_s}"
            over = f"OVER ({part_sql}ORDER BY {order_sql} {frame})"
            if op["fn"] == "sum_dec":
                wexpr = (f"CAST(SUM(CAST({op['col']} AS DECIMAL(18,2)))"
                         f" {over} AS DOUBLE)")
            elif op["fn"] == "count":
                wexpr = f"CAST(COUNT(*) {over} AS BIGINT)"
            else:
                wexpr = f"{op['fn']}({op['col']}) {over}"
            sql = f"SELECT t.*, {wexpr} AS {op['as']} FROM ({sql}) t"

            def _wframe(df, _op=op):
                from pyspark.sql import Window

                w = (Window.partitionBy(_op["part"]) if _op["part"]
                     else Window.partitionBy())
                w = w.orderBy(*[F.col(k).asc() for k in _op["order"]])
                start = (Window.unboundedPreceding if _op["lo"] is None
                         else -_op["lo"])
                if _op["mode"] == "rows":
                    w = w.rowsBetween(start, _op["hi"])
                else:
                    w = w.rangeBetween(start, _op["hi"])
                if _op["fn"] == "sum_dec":
                    e = F.sum(
                        F.col(_op["col"]).cast("decimal(18,2)")
                    ).over(w).cast("double")
                elif _op["fn"] == "count":
                    e = F.count(F.lit(1)).over(w).cast("bigint")
                elif _op["fn"] == "min":
                    e = F.min(_op["col"]).over(w)
                else:
                    e = F.max(_op["col"]).over(w)
                return df.withColumn(_op["as"], e)

            steps.append(_wframe)
            cols = _apply_to_schema(op, cols)
        elif o == "proj_explode":
            sql = (f"SELECT t.*, UNNEST([{op['a']}, {op['b']}])"
                   f" AS {op['as']} FROM ({sql}) t")
            steps.append(
                lambda df, _op=op: df.withColumn(
                    _op["as"],
                    F.explode(F.array(F.col(_op["a"]), F.col(_op["b"]))),
                )
            )
            cols = _apply_to_schema(op, cols)
        elif o.startswith("proj_"):
            sql = f"SELECT t.*, {col_expr_sql(op)} AS {op['as']} FROM ({sql}) t"
            steps.append(lambda df, _op=op: df.withColumn(_op["as"],
                                                          col_expr_spark(_op)))
            cols = _apply_to_schema(op, cols)
        elif o == "agg":
            groups, aggs = op["groups"], op["aggs"]

            def agg_sql(a):
                fn = a["fn"]
                if fn == "count_star":
                    return f"CAST(COUNT(*) AS BIGINT) AS {a['as']}"
                if fn == "count_col":
                    return f"CAST(COUNT({a['col']}) AS BIGINT) AS {a['as']}"
                if fn == "count_distinct":
                    return f"CAST(COUNT(DISTINCT {a['col']}) AS BIGINT) AS {a['as']}"
                if fn == "sum_dec":
                    return (f"CAST(SUM(CAST({a['col']} AS DECIMAL(18,2)))"
                            f" AS DOUBLE) AS {a['as']}")
                if fn == "avg_dec":
                    return (f"CAST(SUM(CAST({a['col']} AS DECIMAL(18,2))) AS DOUBLE)"
                            f" / CAST(COUNT({a['col']}) AS DOUBLE) AS {a['as']}")
                if fn == "bit_or":
                    return f"CAST(bit_or({a['col']}) AS BIGINT) AS {a['as']}"
                return f"{fn}({a['col']}) AS {a['as']}"

            sel = ", ".join(list(groups) + [agg_sql(a) for a in aggs])
            mode = op.get("mode", "plain")
            if not groups:
                gb = ""
            elif mode == "rollup":
                gb = f" GROUP BY ROLLUP ({', '.join(groups)})"
            elif mode == "cube":
                gb = f" GROUP BY CUBE ({', '.join(groups)})"
            else:
                gb = f" GROUP BY {', '.join(groups)}"
            if mode != "plain":
                # dialect rule (fuzz seed 4037): on EMPTY input,
                # DuckDB/Postgres grouping sets emit the global `()`
                # row (COUNT(*)=0) where Spark's rollup/cube emit
                # nothing. Every grouping-set row over NON-empty input
                # aggregates >=1 rows, so this HAVING only drops the
                # empty-input global row — equalizing the two engines
                # without touching any populated case.
                gb += " HAVING COUNT(*) > 0"
            sql = f"SELECT {sel} FROM ({sql}) t{gb}"

            def _agg(df, _op=op):
                exprs = []
                for a in _op["aggs"]:
                    fn = a["fn"]
                    if fn == "count_star":
                        e = F.count(F.lit(1)).cast("bigint")
                    elif fn == "count_col":
                        e = F.count(F.col(a["col"])).cast("bigint")
                    elif fn == "count_distinct":
                        e = F.countDistinct(a["col"]).cast("bigint")
                    elif fn == "sum_dec":
                        e = F.sum(F.col(a["col"]).cast("decimal(18,2)")).cast("double")
                    elif fn == "avg_dec":
                        e = (F.sum(F.col(a["col"]).cast("decimal(18,2)")).cast("double")
                             / F.count(a["col"]).cast("double"))
                    elif fn == "bit_or":
                        e = F.expr(f"bit_or({a['col']})").cast("bigint")
                    elif fn == "min":
                        e = F.min(a["col"])
                    else:
                        e = F.max(a["col"])
                    exprs.append(e.alias(a["as"]))
                mode_ = _op.get("mode", "plain")
                if not _op["groups"]:
                    g = df.groupBy()
                elif mode_ == "rollup":
                    g = df.rollup(*_op["groups"])
                elif mode_ == "cube":
                    g = df.cube(*_op["groups"])
                else:
                    g = df.groupBy(*_op["groups"])
                return g.agg(*exprs)

            steps.append(_agg)
            cols = _apply_to_schema(op, cols)
        elif o == "distinct":
            keep = [n for n in op["keep"] if n in {c for c, _ in cols}]
            sql = f"SELECT DISTINCT {', '.join(keep)} FROM ({sql}) t"
            steps.append(lambda df, _k=keep: df.select(*_k).distinct())
            cols = [(n, k) for n, k in cols if n in keep]
        elif o == "select":
            keep = [n for n in op["keep"] if n in {c for c, _ in cols}]
            sql = f"SELECT {', '.join(keep)} FROM ({sql}) t"
            steps.append(lambda df, _k=keep: df.select(*_k))
            cols = [(n, k) for n, k in cols if n in keep]
        elif o == "sort_limit":
            # per-column direction + nulls placement, pinned explicitly
            # on BOTH sides (Spark asc defaults NULLS FIRST, DuckDB
            # NULLS LAST — never rely on either default). Specs cover
            # every column at plan time, so the order is total modulo
            # full-duplicate rows and LIMIT is deterministic.
            live = {n for n, _ in cols}
            specs = [s for s in op["specs"] if s["col"] in live]
            # keep the order TOTAL even if shrinking changed the live
            # column set: append any uncovered column with a pinned
            # direction so LIMIT stays deterministic
            covered = {s["col"] for s in specs}
            specs += [{"col": n, "desc": False, "nf": True}
                      for n, _ in cols if n not in covered]
            ob = ", ".join(
                f"{s['col']} {'DESC' if s['desc'] else 'ASC'}"
                f" NULLS {'FIRST' if s['nf'] else 'LAST'}"
                for s in specs)
            sql = f"SELECT * FROM ({sql}) t ORDER BY {ob} LIMIT {op['n']}"

            def _sort(df, _specs=specs, _op=op):
                order = []
                for s in _specs:
                    c = F.col(s["col"])
                    order.append(
                        (c.desc_nulls_first() if s["nf"] else c.desc_nulls_last())
                        if s["desc"]
                        else (c.asc_nulls_first() if s["nf"] else c.asc_nulls_last())
                    )
                return df.orderBy(*order).limit(_op["n"])

            steps.append(_sort)
        else:
            raise AssertionError(o)

    # final canonicalization: every int output → BIGINT, every decimal
    # output → DOUBLE, on both sides (a DECIMAL(12,2) value is ≤ 10
    # significant digits, so the double cast is exact and identical on
    # both engines; without it Spark hands back Decimal objects where
    # DuckDB's pandas bridge hands back float64 — same values,
    # repr-distinct under the value hash)
    casts_sql, final_names = [], []
    for n, k in cols:
        final_names.append(n)
        if k == "int":
            casts_sql.append(f"CAST({n} AS BIGINT) AS {n}")
        elif k == "dec":
            casts_sql.append(f"CAST({n} AS DOUBLE) AS {n}")
        else:
            casts_sql.append(n)
    sql = f"SELECT {', '.join(casts_sql)} FROM ({sql}) t"
    int_cols = [n for n, k in cols if k == "int"]
    dec_cols = [n for n, k in cols if k == "dec"]

    def _canon(df, _ints=tuple(int_cols), _decs=tuple(dec_cols),
               _names=tuple(final_names)):
        out = df
        for n in _ints:
            out = out.withColumn(n, F.col(n).cast("bigint"))
        for n in _decs:
            out = out.withColumn(n, F.col(n).cast("double"))
        return out.select(*_names)

    steps.append(_canon)

    def spark_fn(spark, sf_dir):
        df = steps[0](spark, sf_dir)
        for s in steps[1:]:
            df = s(df)
        return df

    return spark_fn, sql


# ---------------------------------------------------------------- shrink


def _droppable(ops: list[dict], i: int) -> bool:
    op = ops[i]
    o = op["op"]
    if o in ("base", "base_join", "agg"):
        return False
    if o in ("sort_limit", "distinct", "select") or o.startswith("filter_"):
        return True
    if o.startswith("proj_"):
        added = op["as"]
        for later in ops[i + 1:]:
            blob = repr(later)
            if f"'{added}'" in blob:
                return False
        return True
    return False


def shrink(ops: list[dict], still_fails) -> list[dict]:
    cur = list(ops)
    changed = True
    while changed:
        changed = False
        for i in range(len(cur) - 1, 0, -1):
            if not _droppable(cur, i):
                continue
            trial = cur[:i] + cur[i + 1:]
            try:
                if still_fails(trial):
                    cur = trial
                    changed = True
            except Exception:
                continue
    return cur


# ---------------------------------------------------------------- runner


def run_case(spark, con, seed: int, sf_dir: str):
    """Return (ok, detail, ops, sql) for one seed."""
    from tests.oracle import compare_query

    ops = plan_case(seed)
    spark_fn, sql = build_case(ops)
    name = f"fuzz_{seed}"
    ok, detail = compare_query(spark, name, sf_dir, {name: spark_fn}, {name: sql})
    return ok, detail, ops, sql


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--seed", type=int, default=None,
                    help="run exactly one seed (prints ops + SQL)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from doin_fine_ance__spark.session import get_spark
    from tests.oracle import duck_connection

    spark = get_spark("fuzz-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(args.sf_dir)

    seeds = [args.seed] if args.seed is not None else range(
        args.start, args.start + args.n)
    fails = []
    for seed in seeds:
        ok, detail, ops, sql = run_case(spark, con, seed, args.sf_dir)
        tag = "ok " if ok else "FAIL"
        print(f"{tag} seed={seed} {detail[:120]}", flush=True)
        if args.seed is not None:
            for op in ops:
                print("   ", op)
            print("   SQL:", sql)
        if not ok:
            def still_fails(trial, _s=seed):
                fn, s = build_case(trial)
                from tests.oracle import compare_query
                k = f"shrink_{_s}"
                bad, _ = compare_query(spark, k, args.sf_dir, {k: fn}, {k: s})
                return not bad
            small = shrink(ops, still_fails)
            fn, s = build_case(small)
            print(f"  SHRUNK seed={seed} to {len(small)} ops:")
            for op in small:
                print("   ", op)
            print("   SQL:", s)
            fails.append(seed)
    print(f"\n{len(seeds) - len(fails)}/{len(seeds)} green"
          + (f"; FAILING seeds: {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
