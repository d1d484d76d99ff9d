"""Corpus scrubbing transforms: blocklist term redaction and exact
cross-document substring stripping (the transform face of span-level
dedup, after Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better" -- ``crossdoc_span_dedup`` in ``mixing.py`` is the
*detection* face; this module actually rewrites the text).

Scale design:
  * ``blocklist_scrub`` is a pure row-local array pipeline (split ->
    filter -> join) with the tiny denylist inlined as literals -- one
    scan, zero shuffle beyond the output sort; at 100 TB it is the same
    single pass with the list broadcast instead of inlined.
  * ``exact_substring_strip`` builds the span inverted index exactly like
    ``crossdoc_span_dedup`` (explode to (span-hash, doc, pos), one hash
    aggregate), then sends only the *duplicated* span starts back to
    each doc as a sorted int array and rebuilds the text row-locally
    with nested higher-order functions -- the corpus text itself never
    shuffles; only (int64 hash, int64 doc, int pos) triples do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

# denylist: one rare term and two common ones so the fixture exercises
# both the all-clean and the heavily-redacted paths deterministically
BLOCK_TERMS = ("dup", "slow", "big")

SPAN = 5  # tokens per span for exact-substring stripping

_BLOCK_SQL = "[" + ", ".join(f"'{t}'" for t in BLOCK_TERMS) + "]"


@register(
    "blocklist_scrub",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(t, x -> list_contains({_BLOCK_SQL}, x)))
                AS BIGINT) AS n_hits,
           ROUND(len(list_filter(t, x -> list_contains({_BLOCK_SQL}, x)))
                 / CAST(len(t) AS DOUBLE), 6) AS hit_frac,
           md5(array_to_string(
               list_filter(t, x -> NOT list_contains({_BLOCK_SQL}, x)),
               ' ')) AS scrubbed_md5
    FROM toks
    ORDER BY doc_id
    """,
)
def blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist term scrub (the wordlist-filter step of corpus curation,
    e.g. NSFW/blocklist screens): per document, count blocked-term hits
    and emit the md5 of the text with those tokens removed, so the
    transform itself is oracle-checked, not just the counts.

    Scale: row-local higher-order array functions over one scan -- the
    denylist is a literal array (broadcast at production size); no
    Python, no shuffle before the output sort."""
    docs = load_table(spark, sf_dir, "documents")
    den = F.array(*[F.lit(t) for t in BLOCK_TERMS])
    toks = F.split("text", " ")
    hits = F.filter(toks, lambda t: F.array_contains(den, t))
    kept = F.filter(toks, lambda t: ~F.array_contains(den, t))
    return (
        docs.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.size(hits).cast("bigint").alias("n_hits"),
            F.round(
                F.size(hits) / F.size(toks).cast("double"), 6
            ).alias("hit_frac"),
            F.md5(F.array_join(kept, " ")).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "exact_substring_strip",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, p,
               array_to_string(array_slice(t, p, p + {SPAN - 1}), ' ') AS g
        FROM toks, unnest(range(1, greatest(len(t) - {SPAN - 2}, 1))) AS u(p)
    ),
    hstats AS (
        SELECT g, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS keeper
        FROM grams GROUP BY g
    ),
    dstarts AS (
        SELECT doc_id, list_sort(list(p)) AS ds
        FROM grams JOIN hstats USING (g)
        WHERE nd >= 2 AND doc_id <> keeper
        GROUP BY doc_id
    ),
    joined AS (
        SELECT toks.doc_id, t, COALESCE(ds, []) AS ds
        FROM toks LEFT JOIN dstarts ON toks.doc_id = dstarts.doc_id
    ),
    kept AS (
        SELECT doc_id, t, ds,
               list_transform(
                   list_filter(range(1, len(t) + 1),
                       pos -> len(list_filter(ds,
                           s -> s <= pos AND pos < s + {SPAN})) = 0),
                   pos -> t[pos]) AS kt
        FROM joined
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(kt) AS BIGINT) AS n_removed,
           ROUND((len(t) - len(kt)) / CAST(len(t) AS DOUBLE), 6)
               AS removed_frac,
           md5(COALESCE(array_to_string(kt, ' '), '')) AS stripped_md5
    FROM kept
    ORDER BY doc_id
    """,
)
def exact_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document substring dedup, transform face: every
    {SPAN}-token span occurring in >= 2 distinct documents is kept only
    in the lowest-doc_id document; all other documents drop every token
    covered by such a span, and the md5 of the rewritten text is the
    checked output (Lee et al. 2022 keep-one semantics at span grain).

    Scale: the corpus shuffles once as (span-hash int64, doc_id, pos)
    triples to build the inverted index; duplicated starts return to
    each doc as ONE sorted int array (grouped by doc_id -- bounded by
    tokens-per-doc); the rewrite is then a row-local nested
    higher-order-function pass, so document text never moves.  The
    oracle groups the raw span string while Spark groups its xxhash64
    (collision odds ~1e-10 at fixture scale; 100 TB would swap in a
    128-bit hash)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    starts = F.when(
        n >= SPAN,
        F.sequence(F.lit(1), n - (SPAN - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(starts).alias("p"),
        F.col("t"),
    ).select(
        "doc_id",
        "p",
        F.xxhash64(F.array_join(F.slice("t", F.col("p"), SPAN), " ")).alias(
            "h"
        ),
    )
    hstats = grams.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd"),
        F.min("doc_id").alias("keeper"),
    )
    dstarts = (
        grams.join(hstats, "h")
        .filter((F.col("nd") >= 2) & (F.col("doc_id") != F.col("keeper")))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("p")).alias("ds"))
    )
    joined = toks.join(dstarts, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce("ds", F.array().cast("array<int>")).alias("ds"),
    )
    covered = lambda pos, ds: F.exists(  # noqa: E731
        ds, lambda s: (s <= pos) & (pos < s + SPAN)
    )
    kept = joined.select(
        "doc_id",
        "t",
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("t")),
                lambda pos: F.struct(
                    pos.alias("p"), F.element_at("t", pos).alias("w")
                ),
            ),
            lambda s: ~covered(s["p"], F.col("ds")),
        ).alias("ks"),
    )
    return (
        kept.select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            (F.size("t") - F.size("ks")).cast("bigint").alias("n_removed"),
            F.round(
                (F.size("t") - F.size("ks")) / F.size("t").cast("double"), 6
            ).alias("removed_frac"),
            F.md5(
                F.array_join(
                    F.transform("ks", lambda s: s["w"]), " "
                )
            ).alias("stripped_md5"),
        )
        .orderBy("doc_id")
    )
