"""Property-based tests (hypothesis) for the numeric-formatting and
partition-planning kernels — independent Python models, randomized inputs.

Spark round-trips are expensive, so each property batches all generated
examples into ONE DataFrame/job instead of one job per example.
"""

import decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from professional_services_data_validator_spark.functions.calculated import (
    to_char_number,
)
from professional_services_data_validator_spark.operators.partitioning import (
    partition_where_clauses,
)


# --- independent to_char model (decimal module, not the Spark expression) ---

def _py_to_char(v, int_fmt: str, frac_fmt: str, fm: bool) -> str:
    if v is None:
        return None
    q = decimal.Decimal(1).scaleb(-len(frac_fmt)) if frac_fmt else decimal.Decimal(1)
    dv = decimal.Decimal(repr(v)) if isinstance(v, float) else decimal.Decimal(v)
    with decimal.localcontext() as ctx:
        ctx.prec = 60  # quantize of 38-digit values needs headroom
        d = dv.quantize(q, rounding=decimal.ROUND_HALF_UP)
    sign = "-" if d < 0 else ("" if fm else " ")
    d = abs(d)
    txt = f"{d:f}"
    ip, _, fp = txt.partition(".")
    fp = fp.ljust(len(frac_fmt), "0")[: len(frac_fmt)]
    ip_sig = ip.lstrip("0")
    has_point = bool(frac_fmt) or False
    first_zero = int_fmt.find("0")
    min_int = len(int_fmt) - first_zero if first_zero >= 0 else 0
    if not frac_fmt and ip_sig == "":
        ip_sig = "0"
    if len(ip_sig) < min_int:
        ip_sig = ip_sig.rjust(min_int, "0")
    width = len(int_fmt) + (1 if frac_fmt else 0) + len(frac_fmt) + 1
    if len(ip.lstrip("0") or ("" if frac_fmt else "0")) > len(int_fmt):
        return "#" * width
    if fm and frac_fmt:
        last_zero = frac_fmt.rfind("0")
        min_frac = last_zero + 1 if last_zero >= 0 else 0
        fp = fp.rstrip("0")
        if len(fp) < min_frac:
            fp = fp.ljust(min_frac, "0")
    body = sign + ip_sig + (("." + fp) if frac_fmt else "")
    if not fm and len(body) < width:
        body = body.rjust(width, " ")
    return body


_NUM = st.one_of(
    st.integers(min_value=-999, max_value=999).map(lambda x: x / 8.0),
    st.integers(min_value=-99999, max_value=99999).map(lambda x: x / 100.0),
)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(_NUM, min_size=1, max_size=40),
    int_fmt=st.sampled_from(["9", "90", "99", "900", "999"]),
    frac_fmt=st.sampled_from(["", "0", "09", "099", "99"]),
    fm=st.booleans(),
)
def test_to_char_matches_decimal_model(spark, vals, int_fmt, frac_fmt, fm):
    fmt = ("FM" if fm else "") + int_fmt + (("." + frac_fmt) if frac_fmt else "")
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.s
        for r in df.coalesce(1)
        .select(to_char_number(F.col("v"), fmt).alias("s"))
        .collect()
    ]
    want = [_py_to_char(v, int_fmt, frac_fmt, fm) for v in vals]
    assert got == want, f"fmt={fmt}"


# --- exact decimal path: values far above 2^53 (VERDICT r2 #7) ------------

_BIG_INT = st.integers(min_value=-(10 ** 30), max_value=10 ** 30)


@settings(max_examples=6, deadline=None)
@given(
    ints=st.lists(_BIG_INT, min_size=1, max_size=30),
    scale=st.sampled_from([0, 2, 4]),
    fm=st.booleans(),
)
def test_to_char_exact_decimal_above_2_53(spark, ints, scale, fm):
    """decimal(38,s) inputs format from the exact value: the double path
    would corrupt digits above 2^53 (repr-level divergence), the exact path
    must match the Python decimal model digit-for-digit. scale=4 also
    exercises HALF_UP rounding down to the model's 3-digit fraction."""
    vals = [decimal.Decimal(i).scaleb(-scale) for i in ints]
    int_fmt, frac_fmt = "9" * 33, "099"
    fmt = ("FM" if fm else "") + int_fmt + "." + frac_fmt
    df = spark.createDataFrame([(v,) for v in vals], f"v decimal(38,{scale})")
    got = [
        r.s
        for r in df.coalesce(1)
        .select(
            to_char_number(F.col("v"), fmt, exact_decimal=True).alias("s")
        )
        .collect()
    ]
    want = [_py_to_char(v, int_fmt, frac_fmt, fm) for v in vals]
    assert got == want, f"fmt={fmt} scale={scale}"


# --- partition clause properties: disjoint + exhaustive for any key set ----


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=4,
        max_size=60,
        unique=True,
    ),
    n_parts=st.integers(min_value=2, max_value=5),
)
def test_where_clauses_disjoint_exhaustive(spark, keys, n_parts):
    from professional_services_data_validator_spark.operators.partitioning import (
        partition_boundaries,
    )

    df = spark.createDataFrame(keys, "k string, i int")
    rows = partition_boundaries(df, ["k", "i"], n_parts).collect()
    clauses = partition_where_clauses(rows, ["k", "i"])
    marked = df.select(
        "k",
        "i",
        *[
            F.expr(c).cast("int").alias(f"m{j}")
            for j, c in enumerate(clauses)
        ],
    ).collect()
    for r in marked:
        hits = sum(r[f"m{j}"] for j in range(len(clauses)))
        assert hits == 1, f"row {(r.k, r.i)} matched {hits} partitions"


# --- connected components vs a driver-side union-find ---------------------

def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda p: p[0] != p[1]),
        max_size=40,
    ),
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a classic union-find on random
    graphs — including chains, cycles, and forests, not just the near-clique
    dedup shape it is optimized for."""
    from professional_services_data_validator_spark.operators.dedup import (
        connected_components,
    )

    nodes = sorted({0, 31} | {x for e in edges for x in e})
    pairs = spark.createDataFrame(
        edges or [(0, 0)], ["id_a", "id_b"]
    ).filter(F.col("id_a") != F.col("id_b"))
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["id"])
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            pairs, nodes_df, max_iter=40
        ).collect()
    }
    assert got == _uf_components(edges, nodes)


# --- hash_split: partition of the key space, proportional, stable ---------

@settings(max_examples=6, deadline=None)
@given(
    weights=st.lists(
        st.floats(min_value=0.05, max_value=1.0), min_size=1, max_size=4
    ),
    seed=st.integers(min_value=0, max_value=99),
)
def test_hash_split_is_total_and_proportional(spark, weights, seed):
    """Every row gets exactly one of the declared split names, and observed
    fractions track normalized weights within a generous tolerance."""
    from professional_services_data_validator_spark.operators.sampling import (
        hash_split,
    )

    names = [f"s{i}" for i in range(len(weights))]
    w = dict(zip(names, weights))
    df = spark.range(1500).withColumnRenamed("id", "k")
    counts = {
        r["split"]: r["n"]
        for r in hash_split(df, ["k"], w, seed=seed)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) <= set(names) and sum(counts.values()) == 1500
    total = sum(weights)
    for name, wt in w.items():
        frac = counts.get(name, 0) / 1500
        assert abs(frac - wt / total) < 0.12


# --- pack_sequences: per-shard layout invariants ---------------------------

@settings(max_examples=6, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=300), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=1, max_value=400),
)
def test_pack_sequences_layout_invariants(spark, sizes, budget):
    """For any doc sizes and budget: offsets/bins replay the exclusive
    prefix sum exactly, offsets stay inside the budget, bin ids are
    monotone in id order within a shard."""
    from professional_services_data_validator_spark.operators.text import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        list(enumerate(sizes)), ["doc_id", "n_tokens"]
    )
    rows = sorted(
        pack_sequences(
            df, "doc_id", "n_tokens", budget=budget, num_shards=3
        ).collect(),
        key=lambda r: (r["shard"], r["id"]),
    )
    cum = {}
    last_bin = {}
    for r in rows:
        c = cum.get(r["shard"], 0)
        assert r["bin_id"] == c // budget
        assert r["offset_in_bin"] == c % budget
        assert 0 <= r["offset_in_bin"] < budget
        assert r["bin_id"] >= last_bin.get(r["shard"], 0)
        last_bin[r["shard"]] = r["bin_id"]
        cum[r["shard"]] = c + r["n_tokens"]
    assert len(rows) == len(sizes)


# --- snapshot_diff: statuses partition the PK universe -----------------------

@st.composite
def _version_pair(draw):
    ids = draw(st.sets(st.integers(0, 30), min_size=1, max_size=15))
    def table(keys):
        return {
            k: draw(st.integers(0, 3))  # small value space forces overlaps
            for k in keys
        }
    old_keys = draw(st.sets(st.sampled_from(sorted(ids)), max_size=12))
    new_keys = draw(st.sets(st.sampled_from(sorted(ids)), max_size=12))
    return table(old_keys), table(new_keys)


@settings(max_examples=10, deadline=None)
@given(_version_pair())
def test_snapshot_diff_statuses_partition_pk_universe(spark, pair):
    """For ANY version pair: added = new-only keys, removed = old-only,
    changed/unchanged split the intersection by value equality, and every
    key appears exactly once."""
    from professional_services_data_validator_spark.operators.snapshot import (
        snapshot_diff,
    )

    old_map, new_map = pair
    schema = "id int, val int"
    old = spark.createDataFrame(sorted(old_map.items()) or [(None, None)],
                                schema).filter(F.col("id").isNotNull())
    new = spark.createDataFrame(sorted(new_map.items()) or [(None, None)],
                                schema).filter(F.col("id").isNotNull())
    got = {
        r["id"]: r["diff_status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    ok, on = set(old_map), set(new_map)
    want = {}
    for k in ok | on:
        if k not in ok:
            want[k] = "added"
        elif k not in on:
            want[k] = "removed"
        elif old_map[k] == new_map[k]:
            want[k] = "unchanged"
        else:
            want[k] = "changed"
    assert got == want


# --- group_exact_dedup: keep-rank matches an independent model --------------

@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=4),
        min_size=1, max_size=10,
    )
)
def test_group_exact_dedup_matches_model(spark, convs):
    """For ANY set of conversations (key -> ordered texts): the drop list
    is every key whose ordered transcript equals an earlier key's, with
    keep_rank = its 1-based position among equal transcripts."""
    from professional_services_data_validator_spark.operators.dedup import (
        group_exact_dedup,
    )

    rows = [
        (k, i, t) for k, texts in convs.items()
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "conv string, idx int, text string")
    got = {
        r["conv"]: r["keep_rank"]
        for r in group_exact_dedup(df, ["conv"], "idx", "text").collect()
    }
    by_transcript = {}
    for k in sorted(convs):
        by_transcript.setdefault(tuple(convs[k]), []).append(k)
    want = {
        k: rank + 1
        for keys in by_transcript.values()
        for rank, k in enumerate(keys)
        if rank > 0
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    labels=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.sampled_from(["a", "b", "c", None]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cohens_kappa_matches_pure_python(spark, labels):
    """Distributed kappa == an independent pure-Python replay (confusion
    counts -> po, pe = sum of marginal products, kappa), including the
    NULL-sentinel class and the pe=1 degenerate convention."""
    from collections import Counter

    from professional_services_data_validator_spark.operators.aggregates import (
        cohens_kappa,
    )

    src = spark.createDataFrame(
        [(i, a) for i, (a, _) in enumerate(labels)], "pk int, lab string"
    )
    tgt = spark.createDataFrame(
        [(i, b) for i, (_, b) in enumerate(labels)], "pk int, lab string"
    )
    r = cohens_kappa(src, tgt, ["pk"], "lab").collect()[0]

    sent = "\x00NULL"
    pairs = [(a or sent, b or sent) for a, b in labels]
    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n
    ca, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    pe = sum((ca[c] / n) * (cb[c] / n) for c in set(ca) | set(cb))
    kappa = (po - pe) / (1 - pe) if (1 - pe) > 1e-12 else 1.0
    assert r["n_pairs"] == n
    assert abs(r["observed_agreement"] - round(po, 6)) < 1e-9
    assert abs(r["expected_agreement"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round(kappa, 6)) < 2e-6
