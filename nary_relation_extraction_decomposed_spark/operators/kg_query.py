"""Basic-graph-pattern (BGP) matching over the constructed KG.

The engine's downstream query surface: once the pipeline has emitted a
(subj, pred, obj[, support]) triple table, users ask multi-hop pattern
queries over it — SPARQL-style conjunctive patterns like

    (?s supplies ?p) (?p ships_in ?o)

Spark-first design: a BGP is a chain of equi-joins, one per triple
pattern, joined on the variables the new pattern shares with the bindings
accumulated so far. We express exactly that with DataFrame joins and let
Catalyst/AQE pick the physical strategy per hop:

- the `pred` constant of each pattern is a pushed-down filter on the
  triple scan (partition/row-group pruning when the triple table is
  written partitioned by pred — see plans/catalog.py sinks);
- each hop is ONE shuffle hash/sort-merge equi-join on the shared
  variable(s); consecutive hops that share a variable reuse the shuffle
  partitioning (Exchange reuse), and AQE's skew-join splits hub entities
  (high-degree nodes) at runtime;
- a hop whose filtered triple side is small (rare predicate) is
  broadcast by AQE's size estimate — no hint needed, so a hub-heavy
  pattern can never accidentally broadcast a huge side.

At 100 TB the triple table is the SMALL artifact (orders of magnitude
below the page corpus); worst case for a hop is a hub join, which is the
canonical AQE-skew shape. No driver-side iteration: the whole pattern
compiles to one lazy plan.
"""

from __future__ import annotations

import shlex
from collections.abc import Sequence
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _parse_pred(p: str) -> tuple[bool, list[str]]:
    """Constant predicate term -> (inverse?, alternation values).

    One parser shared by hop compilation AND the reorder estimator, so
    they can never disagree. A leading '^' marks the inverse path; '|'
    separates alternation branches; a backslash escapes '^', '|', or
    '\\' so predicate VALUES containing the path characters stay
    queryable ("\\^p" = literal '^p', "a\\|b" = literal 'a|b'). Empty
    predicates and empty alternation branches ("p|", "|p", "p||q")
    raise instead of silently matching ''."""
    inverse = p.startswith("^")
    if inverse:
        p = p[1:]
    alts: list[str] = []
    cur = ""
    i = 0
    while i < len(p):
        c = p[i]
        if c == "\\" and i + 1 < len(p) and p[i + 1] in "|^\\":
            cur += p[i + 1]
            i += 2
        elif c == "|":
            alts.append(cur)
            cur = ""
            i += 1
        else:
            cur += c
            i += 1
    alts.append(cur)
    if any(a == "" for a in alts):
        raise ValueError(f"empty predicate (or empty alternation branch) in {p!r}")
    return inverse, alts


def parse_pattern(text: str) -> list[tuple[str, str, str]]:
    """Text form of a BGP: '.'-separated hops of three whitespace-separated
    terms, '?'-prefixed terms are variables. Multi-word constants (the
    normal shape of this pipeline's normalized entity ids, which map every
    non-alphanumeric char to a space) are shell-quoted:

        '?x supplies "acme corp" . "acme corp" in_city ?c'
    """
    pattern = []
    for hop in text.split("."):
        hop = hop.strip()
        if not hop:
            continue
        terms = shlex.split(hop)
        if len(terms) != 3:
            raise ValueError(
                f"each hop needs exactly 3 terms (subj pred obj), got {hop!r}"
            )
        pattern.append(tuple(terms))
    if not pattern:
        raise ValueError("empty pattern")
    return pattern


def _reorder_pattern(
    triples: DataFrame, pattern: Sequence[tuple[str, str, str]]
) -> list[tuple[str, str, str]]:
    """Greedy selectivity ordering for a BGP: estimate each hop's size
    from ONE tiny aggregate (the predicate vocabulary is small — a
    groupBy('pred').count() collected to the driver), with constant
    subj/obj terms treated as point lookups. Start from the cheapest
    var-bearing hop, then repeatedly take the cheapest hop connected to
    the variables bound so far — the textbook BGP join-ordering heuristic,
    done at the logical level where Catalyst (no CBO stats on a derived
    frame) won't reorder for us. Connectivity of a conjunction is
    order-independent, so a pattern this cannot fully consume is
    disconnected and is returned as-is for match_pattern to refuse with
    its usual error. Guards (fully-constant hops) keep their relative
    order at the end; they are deferred semi-joins either way."""
    counts = {
        r["pred"]: r["n"]
        for r in triples.groupBy("pred").agg(F.count("*").alias("n")).collect()
    }

    def est(p: tuple[str, str, str]) -> float:
        s, pred, o = p
        # same parser as hop compilation: ^inverse has the same
        # cardinality; alternation sums its branches
        try:
            _, alts = _parse_pred(pred)
        except ValueError:
            return 0.0  # malformed: order is irrelevant, _hop will raise
        n = float(sum(counts.get(q, 0) for q in alts))
        if not _is_var(s):
            n = min(n, 1.0)
        if not _is_var(o):
            n = min(n, 1.0)
        return n

    hops = [p for p in pattern if _is_var(p[0]) or _is_var(p[2])]
    guards = [p for p in pattern if not (_is_var(p[0]) or _is_var(p[2]))]
    if not hops:
        return list(pattern)
    remaining = list(hops)
    first = min(remaining, key=est)
    ordered = [first]
    remaining.remove(first)
    bound = {t[1:] for t in (first[0], first[2]) if _is_var(t)}
    while remaining:
        connected = [
            p for p in remaining
            if any(_is_var(t) and t[1:] in bound for t in (p[0], p[2]))
        ]
        if not connected:
            return list(pattern)  # disconnected: let match_pattern raise
        nxt = min(connected, key=est)
        ordered.append(nxt)
        remaining.remove(nxt)
        bound |= {t[1:] for t in (nxt[0], nxt[2]) if _is_var(t)}
    return ordered + guards


def match_pattern(
    triples: DataFrame,
    pattern: Sequence[tuple[str, str, str]],
    distinct: bool = True,
    reorder: bool = False,
    optional: Sequence[tuple[str, str, str]] = (),
    filters: Sequence = (),
) -> DataFrame:
    """Match a conjunctive triple pattern against a (subj, pred, obj)
    DataFrame; return one row per variable binding.

    `pattern` is a sequence of (s, p, o) terms. `p` must be a constant
    predicate string; `s`/`o` are either variables ("?name") or constant
    entity ids (filtered at the scan). Every pattern after the first must
    share at least one variable with the patterns before it (no cartesian
    hops — a disconnected BGP is almost always a query bug, and at scale
    it is a cross-join explosion; raise instead).

    Output columns are the variable names without the "?" sigil, in first-
    appearance order. With distinct=True (default) duplicate bindings
    collapse — the BGP set-semantics — via one hash aggregate on the
    binding row; Catalyst pushes a partial aggregate before the final
    exchange so hub-fanout duplicates combine map-side.

    Fully-constant patterns are existence GUARDS: they keep the bindings
    iff the triple exists. Guards are collected and applied LAST as
    broadcast left-semi joins against a 1-row side, so they are
    position-independent (a guard-first conjunction is the same query as
    a guard-last one) and add no columns. A pattern that binds no
    variable at all is refused — use a direct filter for a pure ASK.

    With reorder=True the hops are first greedily reordered by estimated
    selectivity (_reorder_pattern: one pred-histogram aggregate) so the
    cheapest connected hop joins first — bindings and output column order
    are unchanged (a conjunction is commutative; columns follow the
    CALLER's pattern order), only the join tree moves.

    `optional` hops are SPARQL OPTIONAL: each left-joins on its shared
    variables AFTER the required pattern, binding its new variables where
    a matching triple exists and NULL where none does (rows are never
    dropped). An optional hop must share a variable with the required
    pattern and must bind at least one new variable. `filters` are
    pyspark Column predicates over the variable columns, applied after
    all joins (SPARQL FILTER) — e.g. F.col("city") != "berlin".
    """
    if not pattern:
        raise ValueError("empty pattern")
    out_vars: list[str] = []
    for s, _, o in tuple(pattern) + tuple(optional):
        for t in (s, o):
            if _is_var(t) and t[1:] and t[1:] not in out_vars:
                out_vars.append(t[1:])
    if reorder:
        pattern = _reorder_pattern(triples, pattern)
    bound: list[str] = []
    out: DataFrame | None = None
    guards: list[DataFrame] = []
    for s, p, o in pattern:
        hop, hop_vars = _hop(triples, s, p, o)
        if not hop_vars:
            guards.append(hop.limit(1))
            continue
        if out is None:
            out, bound = hop, hop_vars
            continue
        shared = [v for v in hop_vars if v in bound]
        if not shared:
            raise ValueError(
                f"disconnected pattern ({s}, {p}, {o}): shares no variable "
                f"with {bound} — cartesian hops are refused"
            )
        out = out.join(hop, on=shared, how="inner")
        bound += [v for v in hop_vars if v not in bound]
    if out is None:
        raise ValueError(
            "pattern binds no variables (every pattern is a constant "
            "existence check) — filter the triple table directly instead"
        )
    for s, p, o in optional:
        hop, hop_vars = _hop(triples, s, p, o)
        shared = [v for v in hop_vars if v in bound]
        new = [v for v in hop_vars if v not in bound]
        if not shared or not new:
            raise ValueError(
                f"optional pattern ({s}, {p}, {o}) must share a bound "
                f"variable AND bind a new one (shared={shared}, new={new})"
            )
        out = out.join(hop, on=shared, how="left")
        bound += new
    for f in filters:
        out = out.filter(f)
    for g in guards:
        out = out.join(F.broadcast(g), F.lit(True), "left_semi")
    out = out.select(*out_vars)
    return out.distinct() if distinct else out


def _hop(
    triples: DataFrame, s: str, p: str, o: str
) -> tuple[DataFrame, list[str]]:
    """One triple pattern -> (frame of its variable columns, var names);
    constants become filters; a fully-constant pattern returns no vars
    (the caller treats it as an existence guard).

    Predicate term forms (SPARQL property-path fragments, all still
    constant — each compiles to a pushable filter, never a join):
      "p"      exact predicate
      "^p"     inverse path: match (o, p, s) — subj/obj roles swap
      "p1|p2"  alternation: pred IN (p1, p2); "^" may prefix the whole
               alternation ("^p1|p2" inverts every alternative)
    Predicate VALUES containing the path chars are escapable: "\\^p"
    matches a literal leading '^', "a\\|b" a literal '|' (see
    _parse_pred).
    """
    if _is_var(p):
        raise ValueError(f"predicate must be constant, got {p!r}")
    inverse, alts = _parse_pred(p)
    if inverse:
        # (?a ^p ?b) IS (?b p ?a): swap the term roles, nothing else
        s, o = o, s
    hop = triples.filter(
        F.col("pred") == alts[0] if len(alts) == 1 else F.col("pred").isin(alts)
    )
    cols = []
    hop_vars: list[str] = []
    for term, col in ((s, "subj"), (o, "obj")):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"bad variable {term!r}")
            cols.append(F.col(col).alias(name))
            hop_vars.append(name)
        else:
            hop = hop.filter(F.col(col) == term)
    if len(hop_vars) == 2 and hop_vars[0] == hop_vars[1]:
        # (?x p ?x): self-loop — a filter, one output column
        hop = hop.filter(F.col("subj") == F.col("obj"))
        cols, hop_vars = cols[:1], hop_vars[:1]
    return (hop.select(*cols) if cols else hop), hop_vars


def construct_triples(
    bindings: DataFrame, template: Sequence[tuple[str, str, str]]
) -> DataFrame:
    """SPARQL CONSTRUCT: emit new (subj, pred, obj) rows from a bindings
    frame (match_pattern output) through a template of terms — "?var"
    references a binding column, anything else is a constant. One select
    per template triple, unioned and deduped; rows where any referenced
    variable is NULL (unmatched OPTIONAL) are dropped, per CONSTRUCT
    semantics."""
    if not template:
        raise ValueError("empty template")

    def term(t: str):
        return F.col(t[1:]) if _is_var(t) else F.lit(t)

    parts = []
    for s, p, o in template:
        row = bindings.select(
            term(s).alias("subj"), term(p).alias("pred"), term(o).alias("obj")
        )
        parts.append(
            row.filter(
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & F.col("obj").isNotNull()
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts).distinct()


def reach_pairs(
    triples: DataFrame,
    pred: str,
    max_hops: int,
    early_stop: bool = True,
    sources: Sequence[str] | None = None,
) -> DataFrame:
    """Bounded property-path reachability (SPARQL `pred{1,k}`): all
    (src, dst, min_hops) pairs connected by 1..max_hops `pred` edges.

    Semi-naive (frontier/delta) evaluation — the Datalog TC idiom that
    scales: each round joins only the pairs DISCOVERED LAST ROUND against
    the edge set, then anti-joins the accumulated result so a pair is
    expanded exactly once, at its minimum hop count. Rounds are shuffle
    equi-joins keyed on the frontier's dst / edge src; the accumulator
    and frontier are lineage-truncated every round with localCheckpoint
    (the iterative-DataFrame pitfall, same as connected_components).
    With early_stop (default) a round that discovers nothing ends the
    loop — one count() action per round, the same driver-side convergence
    check the CC operator documents. Self-loops are real 1-hop edges
    (a -pred-> a yields (a, a, 1)). `sources` restricts the SEED frontier
    to those entities (single/multi-source BFS): every later round then
    joins only the seeds' expanding reach against the edge set instead of
    computing all-pairs and filtering after.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    edges = (
        triples.filter(F.col("pred") == pred)
        # a null subj/obj cannot form an edge — and would defeat the
        # (deliberately non-null-safe, hence fast) frontier anti-join
        .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed = edges.withColumn("min_hops", F.lit(1))
    if sources is not None:
        seed = seed.filter(F.col("src").isin(list(sources)))
    # per-round DELTAS, each checkpointed once; the accumulator is their
    # lazy union, so round r never REWRITES rounds 1..r-1's pairs (only
    # the new delta materializes per round)
    deltas = [seed]
    frontier = seed
    for hop in range(2, max_hops + 1):
        if early_stop and frontier.isEmpty():
            break
        step = (
            frontier.join(
                edges.select(
                    F.col("src").alias("dst"), F.col("dst").alias("nxt")
                ),
                on="dst",
            )
            .select("src", F.col("nxt").alias("dst"))
            .distinct()
        )
        acc = reduce(lambda a, b: a.unionByName(b), deltas)
        new = (
            step.join(acc.select("src", "dst"), on=["src", "dst"], how="left_anti")
            .withColumn("min_hops", F.lit(hop))
            .localCheckpoint(eager=False)
        )
        deltas.append(new)
        frontier = new
    return reduce(lambda a, b: a.unionByName(b), deltas)
