"""Blocked fuzzy-match join (edit-distance self-join without the n² cross).

The LLM-pipeline use case is entity/record fuzzy dedup: find all pairs of
strings within a small edit distance.  All-pairs levenshtein is O(n²) and
dead at corpus scale, so candidates come from *position-partitioned blocking*
— a Hamming-style LSH over the 9 key digits of ``Customer#ddddddddd``:

    split the digit positions into 3 round-robin sets; a single substitution
    falls in exactly one set, so any pair at distance <=1 agrees EXACTLY on
    the other TWO sets — candidates are three equi-joins, each on the
    concatenation of two position sets (6 digits), never a cross join.

The guarantee is the pigeonhole principle (k partitions catch k-1 edits; a
pair within distance d agrees on >= k-d sets), so recall is 1.0 by
construction — unlike MinHash this blocking is exact for its distance bound.
Joining on PAIRS of sets instead of single sets is the block-size lever:
6-digit compound keys versus the 2-way split's 4/5-digit keys cut measured
candidate volume at sf0.1 from 1.86M to 0.80M pairs (2.3x — not the
uniform-digit 8x, because sequential customer ids leave the leading digits
near-constant and blocks skewed), while pigeonhole still guarantees
distance-1 coverage.  The three branches are DISJOINT by construction
(later branches require an earlier branch's key to differ), so no
union+distinct shuffle exists and the banded edit distance runs pipelined
inside each join stage (8.7 s with union+distinct -> 4.4 s 2-way disjoint
-> 3.6 s 3-way, warm).  For real-world variable-length strings
the same scheme applies to any fixed-width normalized key; otherwise take
the n-gram Jaccard path in ``operators/dedup.py``.

Reference scope note: the reference models only operator complexity classes
(`/root/reference/src/templates/estimation.html:231-245`); fuzzy matching is
part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import t
from ..plans.registry import query

# digit positions (1-indexed within the string) for Customer#ddddddddd,
# round-robin partitioned into three sets
_SETS = (
    (10, 13, 16),
    (11, 14, 17),
    (12, 15, 18),
)


def _pos_key(col: Column, positions: tuple[int, ...]) -> Column:
    return F.concat(*[F.substring(col, p, 1) for p in positions])


def fuzzy_pairs(df: DataFrame, col: str, max_dist: int = 1) -> DataFrame:
    """All (a, b) string pairs with levenshtein(a,b) <= max_dist, a < b,
    via the 3-set position blocking described in the module docstring.

    Contract: the pair-of-sets join form bounds the pigeonhole guarantee to
    ``max_dist=1`` — a distance-2 pair can disagree with both sets of every
    branch, so larger distances would silently lose recall.  For
    variable-length strings or ``max_dist`` up to 2, use
    :func:`fuzzy_pairs_general` (deletion-neighborhood blocking).
    """
    if max_dist > 1:
        raise ValueError(
            "pair-of-sets position blocking guarantees recall only for "
            "max_dist <= 1; use fuzzy_pairs_general for larger distances"
        )
    names = df.select(F.col(col).alias("name")).distinct()
    with_keys = names.select(
        "name",
        *[_pos_key(F.col("name"), s).alias(f"k{i}") for i, s in enumerate(_SETS)],
    )
    a = with_keys.select(
        F.col("name").alias("name_a"),
        *[F.col(f"k{i}").alias(f"k{i}_a") for i in range(len(_SETS))],
    )
    b = with_keys.select(
        F.col("name").alias("name_b"),
        *[F.col(f"k{i}").alias(f"k{i}_b") for i in range(len(_SETS))],
    )
    lt = F.col("name_a") < F.col("name_b")

    def eq(i: int) -> Column:
        return F.col(f"k{i}_a") == F.col(f"k{i}_b")

    # disjoint branches: a distance-1 pair disagrees on exactly one set, so
    # it matches exactly one of (12), (13 & not 2), (23 & not 1)
    branches = [
        a.join(b, eq(0) & eq(1) & lt),
        a.join(b, eq(0) & eq(2) & ~eq(1) & lt),
        a.join(b, eq(1) & eq(2) & ~eq(0) & lt),
    ]
    # banded early-exit DP (Spark 3.5+): with a threshold, levenshtein
    # explores an O(len * max_dist) band and bails at the first row whose
    # minimum exceeds it, returning -1 — ~10x cheaper than the full O(len²)
    # table when max_dist << len.  The returned value below the threshold is
    # the true distance, so the output column is unchanged.
    dist = F.levenshtein("name_a", "name_b", max_dist).cast("long")
    cand = branches[0]
    for br in branches[1:]:
        cand = cand.unionByName(br)
    return (
        cand.select("name_a", "name_b", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
    )


def _one_deletion_variants(v: Column) -> Column:
    """array<string> of every single-character deletion of ``v``."""
    return F.when(F.length(v) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(v)),
            lambda i: F.concat(
                v.substr(F.lit(1), i - 1), v.substr(i + 1, F.length(v))
            ),
        )
    )


def fuzzy_pairs_general(df: DataFrame, col: str, max_dist: int = 1) -> DataFrame:
    """All (a, b) string pairs with levenshtein(a,b) <= max_dist, a < b, for
    ARBITRARY variable-length strings — deletion-neighborhood blocking.

    Candidates come from the symmetric-delete scheme (public algorithm,
    SymSpell/FastSS family): each string emits every variant reachable by up
    to ``max_dist`` character deletions; two strings within edit distance d
    always share a common member of their d-deletion neighborhoods (each
    edit — substitution, insertion, or deletion — is undone by at most one
    deletion on each side), so joining on a shared variant has recall 1.0 by
    construction, then the banded ``levenshtein`` prunes false candidates.

    Scale shape: a length-L string emits O(L^d) variants, but the join key
    is ``xxhash64(variant)`` — 8 bytes — so the candidate shuffle never
    carries variant text, only (key, name); hash collisions can only ADD
    candidates (removed by the distance filter), never lose them.  Block
    sizes follow true near-dup cluster sizes, the same sum(bucket^2) cost
    profile as the MinHash/SimHash banded joins.  Unlike
    :func:`fuzzy_pairs`, no fixed-width key format is assumed and indel
    edits (which shift every later position) are handled.
    """
    if max_dist < 1 or max_dist > 2:
        raise ValueError("deletion-neighborhood blocking supports max_dist in {1, 2}")
    names = df.select(F.col(col).alias("name")).distinct()
    nb = names.withColumn("_vars", F.array("name"))
    for _ in range(max_dist):
        nb = nb.withColumn(
            "_vars",
            F.array_distinct(
                F.concat(
                    "_vars",
                    F.flatten(F.transform("_vars", _one_deletion_variants)),
                )
            ),
        )
    keyed = nb.select(
        "name", F.explode("_vars").alias("_v")
    ).select("name", F.xxhash64("_v").alias("k"))
    a = keyed.select("k", F.col("name").alias("name_a"))
    b = keyed.select("k", F.col("name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b", max_dist).cast("long")
    return (
        a.join(b, "k")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .select("name_a", "name_b", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
    )


@query(
    "q_fuzzy_digit_pairs",
    oracle="""
        WITH n AS (
            SELECT DISTINCT ltrim(replace(c_name, 'Customer#', ''), '0') AS name
            FROM customer
        )
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        FROM n a JOIN n b ON a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 1
        ORDER BY name_a, name_b
    """,
    tags=("llm", "fuzzy", "join", "blocking", "symmetric-delete"),
)
def q_fuzzy_digit_pairs(spark, sf_dir):
    """Edit-distance-1 pairs over VARIABLE-LENGTH strings (customer ids with
    prefix and leading zeros stripped — lengths 0..5, where insertions and
    deletions genuinely occur, e.g. '123' vs '1234').  Spark side blocks via
    deletion neighborhoods; the DuckDB oracle brute-forces all pairs, so a
    green row certifies the blocking's recall-1.0 claim against exhaustive
    truth, not a mirrored plan."""
    c = t(spark, sf_dir, "customer")
    stripped = c.select(
        F.expr("trim(LEADING '0' FROM replace(c_name, 'Customer#', ''))").alias(
            "name"
        )
    )
    return fuzzy_pairs_general(stripped, "name", max_dist=1).orderBy(
        "name_a", "name_b"
    )


def _sql_key(alias: str, s: tuple[int, ...]) -> str:
    return "||".join(f"substr({alias}.c_name,{p},1)" for p in s)


_K = {
    (i, al): _sql_key(al, s)
    for i, s in enumerate(_SETS)
    for al in ("a", "b")
}


@query(
    "q_fuzzy_name_pairs",
    oracle=f"""
        WITH cand AS (
            SELECT a.c_name AS name_a, b.c_name AS name_b
            FROM customer a JOIN customer b
              ON {_K[(0,'a')]} = {_K[(0,'b')]} AND {_K[(1,'a')]} = {_K[(1,'b')]}
             AND a.c_name < b.c_name
            UNION ALL
            SELECT a.c_name, b.c_name
            FROM customer a JOIN customer b
              ON {_K[(0,'a')]} = {_K[(0,'b')]} AND {_K[(2,'a')]} = {_K[(2,'b')]}
             AND {_K[(1,'a')]} <> {_K[(1,'b')]}
             AND a.c_name < b.c_name
            UNION ALL
            SELECT a.c_name, b.c_name
            FROM customer a JOIN customer b
              ON {_K[(1,'a')]} = {_K[(1,'b')]} AND {_K[(2,'a')]} = {_K[(2,'b')]}
             AND {_K[(0,'a')]} <> {_K[(0,'b')]}
             AND a.c_name < b.c_name
        )
        SELECT name_a, name_b,
               CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        FROM cand
        WHERE levenshtein(name_a, name_b) <= 1
        ORDER BY name_a, name_b
    """,
    tags=("llm", "fuzzy", "join", "blocking"),
)
def q_fuzzy_name_pairs(spark, sf_dir):
    """Every customer-name pair within edit distance 1, found via exact
    3-set position blocking (three disjoint compound-key equi-joins)
    instead of an n² cross join — recall 1.0 by pigeonhole."""
    c = t(spark, sf_dir, "customer")
    return fuzzy_pairs(c, "c_name", max_dist=1).orderBy("name_a", "name_b")


@query(
    "q_entity_resolution",
    oracle=f"""
        WITH cust AS (
            SELECT c_name,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
            FROM customer WHERE c_nationkey = 3
        ),
        cand AS (
            SELECT a.c_name AS name_a, b.c_name AS name_b
            FROM cust a JOIN cust b
              ON {_K[(0,'a')]} = {_K[(0,'b')]} AND {_K[(1,'a')]} = {_K[(1,'b')]}
             AND a.c_name < b.c_name
            UNION ALL
            SELECT a.c_name, b.c_name
            FROM cust a JOIN cust b
              ON {_K[(0,'a')]} = {_K[(0,'b')]} AND {_K[(2,'a')]} = {_K[(2,'b')]}
             AND {_K[(1,'a')]} <> {_K[(1,'b')]}
             AND a.c_name < b.c_name
            UNION ALL
            SELECT a.c_name, b.c_name
            FROM cust a JOIN cust b
              ON {_K[(1,'a')]} = {_K[(1,'b')]} AND {_K[(2,'a')]} = {_K[(2,'b')]}
             AND {_K[(0,'a')]} <> {_K[(0,'b')]}
             AND a.c_name < b.c_name
        ),
        pairs AS (
            SELECT name_a, name_b FROM cand
            WHERE levenshtein(name_a, name_b) <= 1
        ),
        sym AS (
            SELECT name_a AS src, name_b AS dst FROM pairs
            UNION SELECT name_b, name_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS id FROM sym),
        reach AS (
            WITH RECURSIVE r(src, dst) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT r.src, s.dst FROM r JOIN sym s ON r.dst = s.src
            ) SELECT * FROM r
        ),
        lab AS (SELECT src AS name, min(dst) AS cluster FROM reach GROUP BY src)
        SELECT lab.cluster AS canonical_name,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(cust.cents) AS BIGINT) AS balance_cents
        FROM lab JOIN cust ON cust.c_name = lab.name
        GROUP BY 1
        ORDER BY canonical_name
    """,
    tags=("llm", "fuzzy", "entity-resolution", "graph", "capstone"),
)
def q_entity_resolution(spark, sf_dir):
    """Entity resolution end to end — the second COMPOSED capstone next to
    q_curation_funnel, chaining three gated operator families into the
    record-linkage pipeline every warehouse runs: (1) BLOCK on a hard key
    (nation — candidate pairs never cross blocks) + position-partitioned
    fuzzy blocking inside the block, (2) MATCH by banded edit distance
    (recall 1.0 by pigeonhole for distance 1), (3) RESOLVE matched pairs
    into entities by connected components (iterative min-label, the
    q_dedup_clusters machinery over STRING vertex ids), then (4) roll
    member accounts up to entity grain — canonical name (component
    minimum), member count, exact integer-cents balance.

    The gate checks the COMPOSITION: a blocking bug changes components, a
    CC bug changes canonical labels, a rollup bug changes the census.
    Scale: candidate volume is the blocked join's (never n²), and the
    census shuffles one row per matched member.  Block-restricted here to
    one nation exactly as production ER shards: every block resolves
    independently and in parallel, which is also why the RESOLVE step
    auto-routes (``resolve_entities``): within-block edge sets are small
    by construction, so under the cap the component labels come from a
    driver-local union-find over the collected block edges (the BPE
    auto-mode cutover pattern — a bounded collect, exact, microseconds),
    and only a beyond-cap block pays for the distributed pointer-doubling
    CC.  Edit-distance graphs CHAIN (…163 - …164 - …165), so the
    beyond-cap path is ``connected_components_jump`` (O(log diameter)
    rounds), not the near-clique min-label operator."""
    from ..plans._helpers import dec

    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3)
    edges = fuzzy_pairs(c, "c_name").select(
        F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b")
    )
    cc = resolve_entities(spark, edges)
    members = c.select(
        "c_name", (dec("c_acctbal") * 100).cast("bigint").alias("cents")
    )
    return (
        cc.join(members, cc.doc_id == members.c_name)
        .groupBy(F.col("cluster").alias("canonical_name"))
        .agg(
            F.count("*").alias("n_members"),
            F.sum("cents").cast("bigint").alias("balance_cents"),
        )
        .orderBy("canonical_name")
    )


_ER_LOCAL_CAP = 100_000  # block edge count below which union-find runs local


def resolve_entities(spark, edges: DataFrame, cap: int = _ER_LOCAL_CAP) -> DataFrame:
    """(doc_id, cluster) component labels for a BLOCK's edge set, with the
    production cutover: a block whose edge count fits under ``cap`` is
    resolved by driver-local union-find over the collected edges (bounded
    payload — blocking exists precisely to make this small; exact, and
    three orders of magnitude cheaper than iterative joins at this size),
    while a beyond-cap block routes to the distributed pointer-doubling
    ``connected_components_jump`` (edit-distance graphs chain, so the
    O(diameter) min-label operator is the wrong fallback).  Both paths
    produce identical labels (component minimum) — equality is pinned by
    tests/test_entity_resolution.py."""
    from ..plans._helpers import eager_checkpoint
    from .dedup import connected_components_jump

    # Routing (count) and resolution (collect / distributed CC) are two
    # actions on the same lineage: materialize the blocked fuzzy-pair join
    # once so the expensive edge computation doesn't execute per action.
    edges = eager_checkpoint(edges)
    if edges.count() > cap:
        return connected_components_jump(edges)
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = edges.collect()
    for r in pairs:
        a, b = r["id_a"], r["id_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for v in parent:
        r = find(v)
        m = comp_min.get(r)
        if m is None or v < m:
            comp_min[r] = v
    rows = [(v, comp_min[find(v)]) for v in sorted(parent)]
    return spark.createDataFrame(rows, "doc_id string, cluster string")
