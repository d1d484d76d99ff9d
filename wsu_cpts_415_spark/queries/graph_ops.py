"""Distributed graph operators over corpus and link graphs: near-duplicate
clustering (connected components over LSH-verified pairs) and PageRank over
the videos related-ids graph.

These extend the reference's graph surface (graph_filter.py builds SCCs
over related-ids; see pipelines/scc.py) with the two canonical iterative
graph computations a training-data pipeline needs:

* **near-dup clustering** is the step AFTER pair generation in every
  large-corpus dedup (MinHashLSH -> pairs -> connected components ->
  keep one canonical doc per cluster).  Pairs alone can't be acted on --
  transitively-linked groups must collapse together or the "keep the
  first, drop the rest" policy is order-dependent.
* **PageRank** is the classic link-popularity refinement of the
  reference's times-linked count (analyze_links.py:111-153 counts raw
  in-links; PageRank weights them by the linker's own rank).

Scale design:
  * The CC label loop runs ONLY on vertices incident to a near-dup pair
    (at real corpus scale that is a sliver of the corpus: the pair graph
    for a 100 TB crawl fits in a fraction of one executor's memory even
    when the corpus doesn't).  Min-label propagation converges in
    graph-diameter rounds; near-dup clusters are dense and tiny, so
    2-3 rounds suffice.  For adversarially long chains the same loop
    admits the large-star/small-star optimization (Kiveris et al. 2014)
    without changing the output contract.
  * Each PageRank iteration is one shuffle (contributions grouped by
    dst).  The edge+degree table is staged once (localCheckpoint here;
    a staged parquet table on a cluster) so iterations re-read a
    materialized slim table instead of recomputing the derivation.
  * Iterative lineage is truncated per round (localCheckpoint) exactly
    as in pipelines/scc.py -- unbounded lineage is what kills iterative
    jobs at scale, not the math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.pipelines.videos import VIDEOS_FLAT_DUCK_CTE, videos_flat
from wsu_cpts_415_spark.queries.similarity import (
    LSH_PAIRS_DUCK_CTES,
    lsh_verified_pairs,
)
from wsu_cpts_415_spark.registry import register

NEARDUP_THRESHOLD = 0.5  # exact-Jaccard cut for "these are the same doc"
MAX_CC_ROUNDS = 20  # safety bound; convergence is checked each round

PR_DAMPING = 0.85
PR_ITERS = 5

_NEARDUP_DUCK_CTES = f"""{LSH_PAIRS_DUCK_CTES},
    nd AS (
        SELECT doc_a, doc_b FROM lsh_pairs WHERE jaccard >= {NEARDUP_THRESHOLD}
    ),
    ud_edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM nd
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM nd
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, reach.r FROM ud_edges e JOIN reach ON reach.node = e.src
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )"""


def min_label_components(pairs: DataFrame) -> DataFrame:
    """Connected components of an undirected pair graph by min-label
    propagation: (doc_a, doc_b) pairs in, (doc_id, label) out for every
    vertex incident to a pair, label = component-minimum vertex id.
    Converges in graph-diameter rounds with per-round convergence check
    and lineage truncation (generic kernel; property-tested against a
    union-find oracle in tests/test_pipelines.py)."""
    # The pair graph is a sliver of the corpus; keep the iteration loop on
    # a handful of partitions so per-round task overhead tracks GRAPH size
    # (on a cluster this would be `coalesce(edges_bytes / target)`).
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    # Min-label sums are strictly decreasing until the fixpoint, so one
    # scalar aggregate per round doubles as the convergence test (no
    # old-vs-new join needed).
    prev_sum = None
    for _ in range(MAX_CC_ROUNDS):
        prop = edges.join(
            labels, edges["src"] == labels["doc_id"], "inner"
        ).select(F.col("dst").alias("doc_id"), "label")
        labels = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .coalesce(4)
            .localCheckpoint(eager=True)
        )
        label_sum = labels.agg(F.sum("label")).collect()[0][0]
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


def _neardup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every document: cluster_id is the minimum
    doc_id reachable through the >= {NEARDUP_THRESHOLD} Jaccard pair
    graph; documents in no pair are their own singleton cluster."""
    from wsu_cpts_415_spark.ops.staging import staged

    def build() -> DataFrame:
        pairs = (
            lsh_verified_pairs(spark, sf_dir)
            .filter(F.col("jaccard") >= NEARDUP_THRESHOLD)
            .select("doc_a", "doc_b")
        )
        # label loop over incident vertices only -- the corpus never
        # enters it; the result is session-staged because the clusters
        # query and the dedup summary share it verbatim.
        labels = min_label_components(pairs)
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        return docs.join(labels, "doc_id", "left").select(
            "doc_id",
            F.coalesce("label", "doc_id").cast("bigint").alias("cluster_id"),
        )

    return staged(spark, "neardup_labels", sf_dir, build)


@register(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_DUCK_CTES}
    SELECT doc_id, cluster_id, cluster_id = doc_id AS is_canonical
    FROM clusters
    ORDER BY doc_id
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components near-dup clustering: every document labeled
    with the min doc_id of its LSH near-dup component; ``is_canonical``
    marks the single survivor per cluster (deterministic winner policy,
    mirroring the ingest dedup sink's min-wins rule, io/ingest.py).

    The oracle computes the identical clustering via a recursive-CTE
    transitive closure over the same verified pair table -- feasible for
    DuckDB precisely because the pair graph is small, which is the same
    property the distributed loop exploits."""
    labels = _neardup_labels(spark, sf_dir)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("is_canonical"),
    ).orderBy("doc_id")


@register(
    "neardup_dedup_summary",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_DUCK_CTES}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - COUNT(DISTINCT cluster_id) AS BIGINT) AS n_dropped,
           ROUND((COUNT(*) - COUNT(DISTINCT cluster_id)) * 100.0 / COUNT(*), 6)
               AS dropped_pct
    FROM clusters
    """,
)
def neardup_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup report over the near-dup clustering: corpus size,
    canonical survivors, documents a dedup pass would drop, and the drop
    rate -- the headline number every corpus-curation run reports."""
    labels = _neardup_labels(spark, sf_dir)
    return labels.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_kept"),
        (F.count("*") - F.countDistinct("cluster_id")).alias("n_dropped"),
        F.round(
            (F.count("*") - F.countDistinct("cluster_id"))
            * 100.0
            / F.count("*"),
            6,
        ).alias("dropped_pct"),
    )


def _pagerank_duck_iters() -> str:
    """pr0..pr{PR_ITERS} chained CTEs; textual arithmetic mirrors the
    Spark expressions token-for-token so IEEE evaluation agrees."""
    ctes = ["pr0 AS (SELECT id, 1.0 / nn.n AS pr FROM verts CROSS JOIN nn)"]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
        SELECT v.id,
               (1 - {PR_DAMPING}) / nn.n
                   + {PR_DAMPING} * COALESCE(s.m, 0.0) AS pr
        FROM verts v CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS id, SUM(p.pr / e.deg) AS m
            FROM edges_deg e JOIN pr{i - 1} p ON p.id = e.src
            GROUP BY e.dst
        ) s ON s.id = v.id
    )"""
        )
    return ",\n    ".join(ctes)


@register(
    "pagerank_videos",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE},
    verts AS (SELECT id FROM videos_flat),
    nn AS (SELECT COUNT(*) AS n FROM verts),
    e0 AS (
        SELECT v.id AS src, unnest(v.related_ids) AS dst FROM videos_flat v
    ),
    live AS (
        SELECT e0.src, e0.dst FROM e0 JOIN verts t ON t.id = e0.dst
    ),
    edges_deg AS (
        SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS deg FROM live
    ),
    {_pagerank_duck_iters()}
    SELECT id, ROUND(pr, 9) AS pagerank
    FROM pr{PR_ITERS}
    ORDER BY pagerank DESC, id
    """,
)
def pagerank_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping {PR_DAMPING}, {PR_ITERS} synchronous iterations,
    uniform init) over the videos related-ids graph, dangling references
    dropped by a semi join exactly as the reference's link analysis drops
    them (analyze_links.py:140-141).

    Per iteration: contributions = rank/out-degree flow along edges, one
    hash aggregate by dst, one left join back to the vertex set (nodes
    with no in-links decay to (1-d)/N).  The staged (src, dst, deg)
    table is the only input re-read each round."""
    from pyspark.sql import Window

    from wsu_cpts_415_spark.ops.staging import staged

    # The videos derivation (wide expression tree -> codegen compile per
    # plan) is materialized ONCE as a slim (id, related_ids) projection;
    # vertex set, edge list, degrees, and the vertex count all derive from
    # that staged table instead of re-deriving the view per action.
    flat_slim = staged(
        spark,
        "videos_graph_slim",
        sf_dir,
        lambda: videos_flat(spark, sf_dir).select("id", "related_ids"),
    )
    verts = flat_slim.select("id")
    raw = flat_slim.select(
        F.col("id").alias("src"), F.explode("related_ids").alias("dst")
    )
    live = raw.join(verts.select(F.col("id").alias("dst")), "dst", "leftsemi")

    n = verts.count()  # scalar vertex count: one job, as in MLlib PageRank
    # iteration parallelism sized by the GRAPH, not the session default:
    # ~100k vertices per task keeps a 1000-executor cluster busy at web
    # scale while a fixture graph runs in single-digit tasks
    parts = max(1, min(spark.sparkContext.defaultParallelism, n // 100_000))
    edges_deg = (
        live.select(
            "src", "dst", F.count("*").over(Window.partitionBy("src")).alias("deg")
        )
        .coalesce(parts)
        .localCheckpoint(eager=True)
    )
    verts_c = verts.coalesce(parts).localCheckpoint(eager=True)
    # Each iteration's rank table is LAZILY checkpointed: without a
    # materialization boundary, iteration i's subtree is re-evaluated by
    # both consumers at level i+1 (the contribution join's broadcast AND
    # the vertex left join), compounding 2^iters; lazy checkpoints cache
    # each level on first evaluation while keeping the whole recurrence
    # inside one action.
    ranks = verts_c.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(PR_ITERS):
        contribs = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["id"], "inner")
            .select(
                F.col("dst").alias("id"), (F.col("pr") / F.col("deg")).alias("c")
            )
            .groupBy("id")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            verts_c.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1 - PR_DAMPING) / n)
                    + PR_DAMPING * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", F.round("pr", 9).alias("pagerank")).orderBy(
        F.col("pagerank").desc(), "id"
    )
