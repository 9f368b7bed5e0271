"""Semantics of operators/kg_query.match_pattern (the BGP query surface).

The kg_pattern driver key value-checks a 2-hop pattern against DuckDB at
sf0.01; these tests pin the operator's SEMANTICS on a hand-built KG where
every expected binding is enumerable by eye: chains, constants in subject
and object position, existence-only patterns, self-loops, bag-vs-set
output, and the refusal of disconnected (cartesian) patterns.
"""

from __future__ import annotations

import pytest

from nary_relation_extraction_decomposed_spark.operators.kg_query import match_pattern

TRIPLES = [
    # a small org KG: person -works_at-> org -in_city-> city
    ("alice", "works_at", "acme"),
    ("bob", "works_at", "acme"),
    ("carol", "works_at", "globex"),
    ("acme", "in_city", "berlin"),
    ("globex", "in_city", "paris"),
    ("dave", "knows", "alice"),
    ("dave", "knows", "dave"),  # self-loop
    # duplicate row: set-semantics must collapse it
    ("alice", "works_at", "acme"),
]


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_two_hop_chain(kg):
    out = match_pattern(
        kg, [("?p", "works_at", "?o"), ("?o", "in_city", "?c")]
    )
    assert out.columns == ["p", "o", "c"]
    assert _rows(out) == [
        ("alice", "acme", "berlin"),
        ("bob", "acme", "berlin"),
        ("carol", "globex", "paris"),
    ]


def test_constant_subject_and_object(kg):
    out = match_pattern(kg, [("?p", "works_at", "acme")])
    assert _rows(out) == [("alice",), ("bob",)]
    out2 = match_pattern(
        kg, [("dave", "knows", "?x"), ("?x", "works_at", "?o")]
    )
    assert _rows(out2) == [("alice", "acme")]


def test_three_hop_with_branch_variable_reuse(kg):
    # coworkers: two people at the same org (includes the trivial pair)
    out = match_pattern(
        kg, [("?a", "works_at", "?o"), ("?b", "works_at", "?o")]
    )
    rows = _rows(out)
    assert ("alice", "acme", "bob") in rows
    assert ("bob", "acme", "alice") in rows
    assert ("carol", "globex", "carol") in rows
    # only carol works at globex, so every globex row pairs carol with carol
    assert all(a == "carol" and b == "carol"
               for a, o, b in rows if o == "globex")


def test_self_loop_pattern(kg):
    out = match_pattern(kg, [("?x", "knows", "?x")])
    assert out.columns == ["x"]
    assert _rows(out) == [("dave",)]


def test_existence_guard_constant_pattern(kg):
    # fully-constant pattern keeps bindings iff the triple exists
    out = match_pattern(
        kg, [("?p", "works_at", "?o"), ("acme", "in_city", "berlin")]
    )
    assert len(_rows(out)) == 3
    out2 = match_pattern(
        kg, [("?p", "works_at", "?o"), ("acme", "in_city", "paris")]
    )
    assert _rows(out2) == []


def test_existence_guard_is_position_independent(kg):
    # guard FIRST must give the same result as guard last (same BGP)
    first = match_pattern(
        kg, [("acme", "in_city", "berlin"), ("?p", "works_at", "?o")]
    )
    last = match_pattern(
        kg, [("?p", "works_at", "?o"), ("acme", "in_city", "berlin")]
    )
    assert _rows(first) == _rows(last)
    assert len(_rows(first)) == 3
    # guards add no columns even when a variable is literally named like
    # an internal would be
    named = match_pattern(
        kg, [("?__hit", "works_at", "?o"), ("acme", "in_city", "berlin")]
    )
    assert named.columns == ["__hit", "o"]


def test_all_guard_pattern_refused(kg):
    with pytest.raises(ValueError, match="binds no variables"):
        match_pattern(kg, [("acme", "in_city", "berlin")])


def test_duplicate_bindings_collapse_and_bag_mode(kg):
    out = match_pattern(kg, [("?p", "works_at", "?o")])
    assert len(_rows(out)) == 3  # alice dup collapsed
    bag = match_pattern(kg, [("?p", "works_at", "?o")], distinct=False)
    assert len(bag.collect()) == 4


def test_disconnected_pattern_refused(kg):
    with pytest.raises(ValueError, match="disconnected"):
        match_pattern(kg, [("?a", "works_at", "?o"), ("?x", "knows", "?y")])


def test_variable_predicate_refused(kg):
    with pytest.raises(ValueError, match="predicate"):
        match_pattern(kg, [("?a", "?p", "?b")])


def test_empty_pattern_refused(kg):
    with pytest.raises(ValueError, match="empty"):
        match_pattern(kg, [])


def test_hop_plan_prunes_union_branch(kg, spark):
    """The pred filter must reach each union branch at plan time: a 1-hop
    pattern over a union-of-two-predicates table should scan only one
    side (no Union node survives in the optimized plan)."""
    import pyspark.sql.functions as F

    # literal pred per branch, as the kg_pattern driver key builds its
    # edge union — the hop filter constant-folds one branch away
    e1 = kg.filter(F.col("pred") == "works_at").select(
        "subj", F.lit("works_at").alias("pred"), "obj"
    )
    e2 = kg.filter(F.col("pred") == "in_city").select(
        "subj", F.lit("in_city").alias("pred"), "obj"
    )
    out = match_pattern(e1.unionByName(e2), [("?a", "in_city", "?b")])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_inverse_predicate_path(kg):
    # (acme ^works_at ?p) == (?p works_at acme): acme's employees,
    # queried from the org side
    out = match_pattern(kg, [("acme", "^works_at", "?p")])
    assert _rows(out) == [("alice",), ("bob",)]
    # inverse chains compose with forward hops
    out2 = match_pattern(
        kg, [("?c", "^in_city", "?o"), ("?p", "works_at", "?o")]
    )
    assert ("berlin", "acme", "alice") in _rows(out2)


def test_predicate_alternation(kg):
    out = match_pattern(kg, [("dave", "knows|works_at", "?x")])
    assert _rows(out) == [("alice",), ("dave",)]
    # inverse applies to the whole alternation
    inv = match_pattern(kg, [("alice", "^knows|works_at", "?x")])
    assert _rows(inv) == [("dave",)]
    with pytest.raises(ValueError, match="empty predicate"):
        match_pattern(kg, [("?a", "^", "?b")])
    # empty alternation branches raise instead of silently matching ''
    for bad in ("knows|", "|knows", "knows||works_at"):
        with pytest.raises(ValueError, match="empty"):
            match_pattern(kg, [("?a", bad, "?b")])


def test_predicate_path_chars_escapable(spark):
    """Predicate VALUES containing '^' or '|' stay queryable via
    backslash escapes — path syntax cannot silently reinterpret them."""
    t = spark.createDataFrame(
        [("a", "either|or", "b"), ("c", "^up", "d"), ("e", "either", "f")],
        "subj string, pred string, obj string",
    )
    lit_alt = match_pattern(t, [("?s", "either\\|or", "?o")])
    assert sorted(map(tuple, lit_alt.collect())) == [("a", "b")]
    lit_caret = match_pattern(t, [("?s", "\\^up", "?o")])
    assert sorted(map(tuple, lit_caret.collect())) == [("c", "d")]
    # unescaped forms keep their path meaning
    alt = match_pattern(t, [("?s", "either|missing", "?o")])
    assert sorted(map(tuple, alt.collect())) == [("e", "f")]
    inv = match_pattern(t, [("?s", "^\\^up", "?o")])  # inverse of literal ^up
    assert sorted(map(tuple, inv.collect())) == [("d", "c")]


def test_optional_left_joins_and_nulls(kg):
    out = match_pattern(
        kg, [("?p", "works_at", "?o")],
        optional=[("?x", "knows", "?p")],
    )
    assert out.columns == ["p", "o", "x"]
    rows = _rows(out)
    # dave knows alice -> bound; bob/carol have no knower -> NULL
    assert ("alice", "acme", "dave") in rows
    assert ("bob", "acme", None) in rows
    assert ("carol", "globex", None) in rows
    assert len(rows) == 3


def test_optional_requires_shared_and_new_var(kg):
    with pytest.raises(ValueError, match="optional"):
        match_pattern(kg, [("?p", "works_at", "?o")],
                      optional=[("?a", "knows", "?b")])  # no shared var
    with pytest.raises(ValueError, match="optional"):
        match_pattern(kg, [("?p", "works_at", "?o")],
                      optional=[("?p", "knows", "?o")])  # no new var


def test_filters_apply_after_joins(kg):
    import pyspark.sql.functions as F

    out = match_pattern(
        kg, [("?p", "works_at", "?o"), ("?o", "in_city", "?c")],
        filters=[F.col("c") != "berlin"],
    )
    assert _rows(out) == [("carol", "globex", "paris")]


def test_construct_emits_new_triples(kg):
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        construct_triples,
    )

    bind = match_pattern(
        kg, [("?p", "works_at", "?o"), ("?o", "in_city", "?c")],
        optional=[("?x", "knows", "?p")],
    )
    out = construct_triples(bind, [
        ("?p", "lives_in", "?c"),
        ("?x", "knows_someone_in", "?c"),
    ])
    rows = sorted(map(tuple, out.collect()))
    assert ("alice", "lives_in", "berlin") in rows
    assert ("carol", "lives_in", "paris") in rows
    assert ("dave", "knows_someone_in", "berlin") in rows
    # NULL optional bindings are dropped, not emitted as null triples
    assert not any(r[0] is None for r in rows)
    with pytest.raises(ValueError, match="empty template"):
        construct_triples(bind, [])


def test_reorder_preserves_bindings_and_column_order(kg):
    pat = [("?p", "works_at", "?o"), ("?o", "in_city", "?c")]
    plain = match_pattern(kg, pat)
    opt = match_pattern(kg, pat, reorder=True)
    assert opt.columns == plain.columns == ["p", "o", "c"]
    assert _rows(opt) == _rows(plain)
    # with a constant term and a guard mixed in
    pat2 = [("?p", "works_at", "?o"), ("acme", "in_city", "berlin"),
            ("dave", "knows", "?p")]
    assert _rows(match_pattern(kg, pat2, reorder=True)) == _rows(
        match_pattern(kg, pat2)
    )


def test_reorder_picks_selective_hop_first(kg):
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        _reorder_pattern,
    )

    # works_at has 4 rows, in_city 2, knows 2; a constant-term hop is a
    # point lookup and must lead; guards stay last
    pat = [("?p", "works_at", "?o"), ("?x", "knows", "?p"),
           ("?o", "in_city", "berlin"), ("acme", "in_city", "berlin")]
    ordered = _reorder_pattern(kg, pat)
    assert ordered[0] == ("?o", "in_city", "berlin")  # est 1 (constant)
    assert ordered[-1] == ("acme", "in_city", "berlin")  # guard last
    # disconnected input is returned unchanged for the usual refusal
    bad = [("?a", "works_at", "?o"), ("?x", "knows", "?y")]
    assert _reorder_pattern(kg, bad) == bad
    with pytest.raises(ValueError, match="disconnected"):
        match_pattern(kg, bad, reorder=True)


def test_hop_partition_pruning_on_stored_triples(spark, kg, tmp_path):
    """Over a triple table written by the catalog sink (partitionBy pred),
    every BGP hop's pred filter must become a PARTITION filter — each hop
    reads only its predicate's directory, the layout that keeps pattern
    queries scan-bounded at 100 TB."""
    from nary_relation_extraction_decomposed_spark.plans.catalog import (
        write_triples_table,
    )

    path = str(tmp_path / "triples")
    write_triples_table(kg, path)
    stored = spark.read.parquet(path)
    out = match_pattern(
        stored, [("?p", "works_at", "?o"), ("?o", "in_city", "?c")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [isnotnull(pred") == 2
    assert _rows(out) == [
        ("alice", "acme", "berlin"),
        ("bob", "acme", "berlin"),
        ("carol", "globex", "paris"),
    ]


def test_reach_pairs_chain_cycle_diamond(spark):
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        reach_pairs,
    )

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),  # chain
         ("x", "p", "y"), ("y", "p", "x"),                    # 2-cycle
         ("d1", "p", "d2"), ("d1", "p", "d3"),                # diamond
         ("d2", "p", "d4"), ("d3", "p", "d4"),
         ("s", "p", "s"),                                     # self-loop
         ("a", "q", "zzz")],                                  # other pred
        "subj string, pred string, obj string",
    )
    got = {(r.src, r.dst): r.min_hops for r in reach_pairs(t, "p", 3).collect()}
    assert got[("a", "b")] == 1 and got[("a", "c")] == 2 and got[("a", "d")] == 3
    assert ("a", "zzz") not in got  # pred-filtered
    assert got[("x", "x")] == 2 and got[("y", "y")] == 2  # cycle closes
    assert got[("d1", "d4")] == 2  # diamond: min over two paths
    assert got[("s", "s")] == 1  # self-loop is a real 1-hop edge
    # bounded: max_hops=2 must not contain the 3-hop pair
    got2 = {(r.src, r.dst) for r in reach_pairs(t, "p", 2).collect()}
    assert ("a", "d") not in got2 and ("a", "c") in got2


def test_reach_pairs_seeded_sources(spark):
    """sources= restricts the seed frontier: result == all-pairs result
    filtered to those sources (semantics), computed seed-first (scale)."""
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        reach_pairs,
    )

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("z", "p", "b")],
        "subj string, pred string, obj string",
    )
    seeded = sorted(map(tuple, reach_pairs(t, "p", 3, sources=["a"]).collect()))
    full = sorted(
        tuple(r) for r in reach_pairs(t, "p", 3).collect() if r.src == "a"
    )
    assert seeded == full == [("a", "b", 1), ("a", "c", 2), ("a", "d", 3)]


def test_reach_pairs_null_terms_cannot_form_edges(spark):
    """Null subj/obj rows are dropped before the frontier loop (a null is
    not an entity, and would defeat the non-null-safe anti-join dedup)."""
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        reach_pairs,
    )

    t = spark.createDataFrame(
        [(None, "p", "b"), ("b", "p", "c"), ("c", "p", None), ("a", "p", "b")],
        "subj string, pred string, obj string",
    )
    got = sorted(map(tuple, reach_pairs(t, "p", 4).collect()))
    assert got == [("a", "b", 1), ("a", "c", 2), ("b", "c", 1)]
    # exactly one row per (src, dst): the dedup held
    assert len({(s, d) for s, d, _ in got}) == len(got)


def test_reach_pairs_early_stop_equals_exhaustive(spark):
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        reach_pairs,
    )

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")],
        "subj string, pred string, obj string",
    )
    fast = sorted(map(tuple, reach_pairs(t, "p", 50).collect()))
    slow = sorted(map(tuple, reach_pairs(t, "p", 50, early_stop=False).collect()))
    assert fast == slow == [("a", "b", 1), ("a", "c", 2), ("b", "c", 1)]

    with pytest.raises(ValueError, match="max_hops"):
        reach_pairs(t, "p", 0)


def test_reach_pairs_equals_bfs_on_random_digraphs(spark):
    """Property (hypothesis, derandomized): reach_pairs == per-source BFS
    min-hop distances (bounded) on random small digraphs."""
    from collections import deque

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        reach_pairs,
    )

    nodes = list("abcdef")
    edge = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes))
    graph = st.lists(edge, min_size=1, max_size=12)

    def bfs_ref(edges, k):
        adj = {}
        for s, d in set(edges):
            adj.setdefault(s, set()).add(d)
        out = {}
        for s in {e[0] for e in edges}:
            seen = {}
            dq = deque([(s, 0)])
            while dq:
                v, h = dq.popleft()
                if h >= k:
                    continue
                for n in adj.get(v, ()):
                    if n not in seen:
                        seen[n] = h + 1
                        dq.append((n, h + 1))
            for d, h in seen.items():
                out[(s, d)] = h
        return out

    @settings(max_examples=6, deadline=None)
    @given(graph, st.integers(min_value=1, max_value=4))
    def check(edges, k):
        t = spark.createDataFrame(
            [(s, "p", d) for s, d in edges],
            "subj string, pred string, obj string",
        )
        got = {(r.src, r.dst): r.min_hops for r in reach_pairs(t, "p", k).collect()}
        assert got == bfs_ref(edges, k)

    check()


def _ref_match(triples, pattern):
    """Brute-force conjunctive-query evaluation (pure Python, set
    semantics): the executable spec match_pattern must agree with."""
    sols = [dict()]
    for s, p, o in pattern:
        nxt = []
        for b in sols:
            for ts, tp, to in set(triples):
                if tp != p:
                    continue
                nb, ok = dict(b), True
                for term, val in ((s, ts), (o, to)):
                    if term.startswith("?"):
                        k = term[1:]
                        if nb.get(k, val) != val:
                            ok = False
                            break
                        nb[k] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(nb)
        sols = nxt
    order = []
    for s, _, o in pattern:
        for t in (s, o):
            if t.startswith("?") and t[1:] not in order:
                order.append(t[1:])
    return sorted({tuple(b[v] for v in order) for b in sols})


def test_match_pattern_equals_bruteforce_on_random_kgs(spark):
    """Property (hypothesis, derandomized): on random tiny KGs and random
    CONNECTED chain patterns — fresh vars, back-references to earlier vars
    (cycles), and constant objects — match_pattern's distinct bindings
    must equal brute-force conjunctive-query evaluation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ents = ["a", "b", "c", "d"]
    preds = ["p", "q"]
    triple = st.tuples(
        st.sampled_from(ents), st.sampled_from(preds), st.sampled_from(ents)
    )
    kg = st.lists(triple, min_size=1, max_size=14)
    # each hop: (pred, object kind) where kind 0 = fresh var, 1 = reuse an
    # earlier var (cycle), 2 = constant entity
    hop = st.tuples(
        st.sampled_from(preds),
        st.integers(min_value=0, max_value=2),
        st.sampled_from(ents),
    )
    chain = st.lists(hop, min_size=1, max_size=3)

    @settings(max_examples=8, deadline=None)
    @given(kg, chain)
    def check(triples, hops):
        pattern = []
        prev = "?v0"
        fresh = 1
        for pred, okind, const in hops:
            if okind == 0:
                obj = f"?v{fresh}"
                fresh += 1
            elif okind == 1:
                obj = "?v0"
            else:
                obj = const
            pattern.append((prev, pred, obj))
            prev = obj if obj.startswith("?") else "?v0"
        df = spark.createDataFrame(
            triples, "subj string, pred string, obj string"
        )
        got = sorted(tuple(r) for r in match_pattern(df, pattern).collect())
        assert got == _ref_match(triples, pattern)
        reordered = sorted(
            tuple(r) for r in match_pattern(df, pattern, reorder=True).collect()
        )
        assert reordered == got

    check()
