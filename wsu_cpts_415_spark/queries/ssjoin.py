"""Exact set-similarity join via prefix filtering (PPJoin-style).

The third exact-Jaccard kernel in the engine, complementing the
posting-list join (``text.ngram_jaccard_pairs``) and the block-matmul
(``text.ngram_jaccard_matmul``): order every document's shingles by a
single GLOBAL total order (ascending document frequency, then hash),
keep only the ``n - ceil(tau*n) + 1`` rarest shingles as the document's
*prefix*, and generate candidate pairs only from shared prefix shingles.
The prefix-filter lemma guarantees exact recall: any pair with
``J(A,B) >= tau`` must share at least one prefix token, because
``J >= tau`` forces ``|A ∩ B| >= ceil(tau * max(|A|,|B|))`` (given the
size filter ``tau*|A| <= |B| <= |A|/tau``), and two sets whose
intersection is that large cannot avoid each other's
rarest-``(n - ceil(tau*n) + 1)`` prefixes under a common total order
(Chaudhuri et al., SSJoin; Xiao et al., PPJoin).

Scale posture (100 TB): candidate generation cost is
``sum over prefix shingles of df_prefix(s)^2`` -- prefixes concentrate
on the RAREST shingles, so on a Zipfian corpus the blowup sits orders
of magnitude below the full posting-list join.  Plan shape:

  * tokens are 64-bit hashes from the first projection on -- strings
    never shuffle;
  * the document-frequency table is vocabulary-sized; it is broadcast
    into the tagging join under an explicit row bound
    (``VOCAB_BCAST_ROWS``) and falls back to a shuffle join above it;
  * size filter pushed into the self-join in exact integer form
    (``5*nb >= 4*na`` for tau=4/5 -- no float boundary risk);
  * positional filter: for the earliest shared prefix token at ranks
    ``(i, j)``, overlap ``<= 1 + min(na - i, nb - j)``; pairs whose
    bound misses ``ceil(tau/(1+tau)*(na+nb))`` die in one hash
    aggregate on the (doc_a, doc_b) pair key -- two columns, not the
    packed-long trick of ``text.exact_jaccard_pairs``, because SSJoin
    must accept full 64-bit doc ids -- before any intersection is
    computed;
  * verification joins only survivors back to the compact per-doc hash
    arrays and intersects two ~|doc| integer arrays per pair.

The prefix table is session-staged (ops/staging.py) so the self-join
reads one persisted table from both sides instead of re-aggregating
the corpus per alias -- the local analogue of writing the prefix index
as a staged layer, which is exactly how a 100 TB SSJoin deploys.

Honest fixture note: this synthetic corpus has a deliberately narrow
vocabulary (931 distinct shingles at sf0.1), so prefix df's stay large
and pruning is weaker than on real text; at the production near-dup
threshold tau=0.8 (all true dup pairs in the fixtures sit above 0.8)
the measured funnel at sf0.1 is still 10.3M sharing pairs -> 2.25M
prefix-join rows -> 0.67M after the positional filter -> 256 verified
results -- a 15x cut before the first intersection is computed.
Counted again at x10 and x100 (scale_probe_er_x{10,100}_r7.json):
every funnel stage grows exactly linearly in corpus size (226.8M ->
67.5M -> 25,743 at x100), wall 90.7x for 100x docs.

Reference scope: the reference engine's duplicate detection is exact
key equality (big_data/scripts/duplicate_checker.py:24-61); threshold
similarity joins belong to this repo's mandated LLM-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.registry import register

# tau = 4/5 exactly; every derived bound below is computed in integer
# arithmetic so Spark and the oracle cannot disagree at boundaries.
TAU_NUM, TAU_DEN = 4, 5

# Broadcast the (token, df) table only below this row count; above it
# the tagging join falls back to a shuffle join on the token hash.
VOCAB_BCAST_ROWS = 2_000_000

_DUCK_EXACT_ABOVE = """
    WITH shingles AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1]
               ))) AS shingle
        FROM documents
    ),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM shingles GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM shingles a
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    WHERE ROUND(CAST(n_common AS DOUBLE)
                / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.8
    ORDER BY doc_a, doc_b
"""


def _ceil_frac(expr, num: int, den: int):
    """ceil(num*expr/den) for a non-negative integer column, exactly."""
    return F.floor((num * expr + den - 1) / den)


def _prefix_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sh, doc_id, rk, n): one row per PREFIX shingle-hash of each
    document -- its ``n - ceil(tau*n) + 1`` globally-rarest shingles,
    ranked by the (df asc, hash asc) total order.  Session-staged so
    the self-join consumes one persisted table from both aliases."""
    from wsu_cpts_415_spark.ops.staging import staged
    from wsu_cpts_415_spark.queries.similarity import _hashed_staged

    def build() -> DataFrame:
        hashed = _hashed_staged(spark, sf_dir)
        ex = hashed.select(
            "doc_id",
            F.size("shingles").alias("n"),
            F.explode(
                F.expr("transform(shingles, s -> xxhash64(s))")
            ).alias("sh"),
        )
        dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
        if dfreq.count() <= VOCAB_BCAST_ROWS:
            dfreq = F.broadcast(dfreq)
        p = (F.col("n") - _ceil_frac(F.col("n"), TAU_NUM, TAU_DEN) + 1).cast(
            "int"
        )
        return (
            ex.join(dfreq, "sh")
            .groupBy("doc_id", "n")
            .agg(
                F.sort_array(F.collect_list(F.struct("df", "sh"))).alias(
                    "arr"
                )
            )
            .select(
                "doc_id", "n", F.posexplode(F.slice("arr", 1, p))
            )
            .select(
                F.col("col.sh").alias("sh"),
                "doc_id",
                (F.col("pos") + 1).alias("rk"),
                "n",
            )
        )

    return staged(spark, "ssjoin_prefix_tau45", sf_dir, build)


def _ssjoin_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The kernel's three stages as frames -- (prefix-join rows,
    candidates surviving the positional bound, verified pairs) -- so the
    registered query and the scale probe's candidate-funnel counter
    consume the same plan instead of two hand-kept copies."""
    from wsu_cpts_415_spark.queries.similarity import _hashed_staged

    prefix = _prefix_staged(spark, sf_dir)
    a, b = prefix.alias("a"), prefix.alias("b")
    joined = a.join(
        b,
        (F.col("a.sh") == F.col("b.sh"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        # size filter tau*na <= nb and tau*nb <= na, integer-exact
        & (TAU_DEN * F.col("b.n") >= TAU_NUM * F.col("a.n"))
        & (TAU_DEN * F.col("a.n") >= TAU_NUM * F.col("b.n")),
    ).select(
        # two-column pair key: unlike text.exact_jaccard_pairs' packed
        # long (ids < 2^32 by that table's contract), SSJoin must accept
        # 64-bit doc ids -- the x10 scale probe's key-shifted replicas
        # overflow a packed key, and production doc ids are often hashes
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.rk").alias("rka"),
        F.col("b.rk").alias("rkb"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    # Earliest shared prefix token: both rankings follow the one global
    # order, so MIN(rka) and MIN(rkb) name the same token.  Positional
    # bound: overlap <= 1 + min(na - i, nb - j); required overlap is
    # t = ceil(tau/(1+tau)*(na+nb)).
    cand = (
        joined.groupBy("doc_a", "doc_b")
        .agg(
            F.min("rka").alias("i"),
            F.min("rkb").alias("j"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .filter(
            1
            + F.least(F.col("na") - F.col("i"), F.col("nb") - F.col("j"))
            >= _ceil_frac(
                F.col("na") + F.col("nb"), TAU_NUM, TAU_NUM + TAU_DEN
            )
        )
        .select("doc_a", "doc_b", "na", "nb")
    )
    # Verify: intersect two compact 64-bit hash arrays per surviving
    # pair (the same compact form text.exact_pairs_above intersects;
    # document text never moves).
    compact = _hashed_staged(spark, sf_dir).select(
        "doc_id",
        F.expr("transform(shingles, s -> xxhash64(s))").alias("h64"),
    )
    verified = (
        cand.join(
            compact.select(
                F.col("doc_id").alias("doc_a"), F.col("h64").alias("hs_a")
            ),
            "doc_a",
        )
        .join(
            compact.select(
                F.col("doc_id").alias("doc_b"), F.col("h64").alias("hs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("ncomm"),
            "na",
            "nb",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("ncomm").cast("double")
                / (F.col("na") + F.col("nb") - F.col("ncomm")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= TAU_NUM / TAU_DEN)
    )
    return joined, cand, verified


@register("prefix_filter_jaccard_join", oracle=_DUCK_EXACT_ABOVE)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with shingle-Jaccard >= 0.8, found by an exact
    prefix-filtered set-similarity join (module docstring has the
    guarantee and the measured candidate funnel)."""
    _joined, _cand, verified = _ssjoin_frames(spark, sf_dir)
    return verified.orderBy("doc_a", "doc_b")


def ssjoin_candidate_funnel(spark: SparkSession, sf_dir: str) -> dict:
    """Measured candidate funnel for the probe (SCALE.md): prefix-join
    rows -> distinct pairs sharing a prefix token (post size filter) ->
    pairs surviving the positional bound -> verified results.  Counting
    the funnel is how sub-quadratic growth is PROVEN rather than argued
    from the plan shape."""
    joined, cand, verified = _ssjoin_frames(spark, sf_dir)
    return {
        "prefix_join_rows": joined.count(),
        "distinct_candidate_pairs": (
            joined.select("doc_a", "doc_b").distinct().count()
        ),
        "after_positional_bound": cand.count(),
        "verified_pairs": verified.count(),
    }
