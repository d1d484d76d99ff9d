"""Text-ranking operators: TF-IDF term scoring and BM25 retrieval over the
``documents`` corpus.

These extend the text-analysis suite (queries/text.py: stats, language id,
quality scoring, fingerprinting) with the two classic relevance-weighting
kernels a corpus pipeline needs -- TF-IDF for keyword/topic extraction per
document, BM25 for query-driven retrieval (e.g. sourcing domain-specific
training subsets by seed queries).

Determinism contract (registry.py rules): scores are rounded to 6 decimals
INSIDE each engine before any ranking window, and every window/sort has a
total tie-break, so a 1-ulp ln() difference between the JVM and C math
libraries can only matter if two scores collide within 1e-6 -- and then
the tie-break decides identically in both engines.

Scale design:
  * tf is one hash aggregate on (doc_id, term); df one more on term --
    both partial-aggregate map-side.  The tf<-df join shuffles on term
    (vocabulary scale, not corpus scale); the top-terms window
    repartitions by doc_id with rank pushdown (WindowGroupLimit).
  * BM25 prunes the token stream to the query's terms FIRST (an in-list
    filter that reaches the scan), so the per-doc aggregate only sees
    matching postings -- at 100 TB the score aggregate is proportional
    to the posting lists, not the corpus.
  * Document lengths are integer token counts; avgdl is computed as an
    exact integer sum over the corpus divided once, so both engines
    derive bit-identical normalization from whole-number inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

TOP_TERMS = 3
BM25_K1 = "1.2"
BM25_B = "0.75"
# mid/low-frequency probe terms from the fixture vocabulary ('dup' is the
# rare planted token, df ~5% of docs; the others are commonplace)
BM25_QUERY = ("dup", "vector", "key")
BM25_TOP_N = 20


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    dfc AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    nn AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               ROUND(t.tf * ln(CAST(nn.n_docs AS DOUBLE) / d.df), 6) AS tfidf
        FROM tf t JOIN dfc d USING (term) CROSS JOIN nn
    )
    SELECT doc_id, rnk, term, tf, df, tfidf
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS INT) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOP_TERMS}
    ORDER BY doc_id, rnk
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_TERMS} characteristic terms per document by TF-IDF
    (tf * ln(N/df)): the standard keyword-extraction pass.  Rare planted
    tokens ('dup') dominate where present; the uniform filler vocabulary
    scores near ln(1)=0."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_TERMS)
        .select("doc_id", "rnk", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rnk")
    )


# BM25 per-(doc, term) contribution; {{tf}}/{{dl}}/{{avgdl}}/{{idf}} are
# column references.  Kept as ONE textual template instantiated for both
# engines so the IEEE evaluation order is identical token-for-token.
_BM25_TERM = (
    "{idf} * ({tf} * ({k1} + 1))"
    " / ({tf} + {k1} * (1 - {b} + {b} * {dl} / {avgdl}))"
).format
_BM25_IDF = "ln((({n} - {df}) + 0.5) / ({df} + 0.5) + 1)".format


@register(
    "bm25_rank",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
    ),
    stats AS (
        SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               COUNT(*) AS n_docs
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok
        WHERE term IN {BM25_QUERY!r}
        GROUP BY doc_id, term
    ),
    dfc AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    contrib AS (
        SELECT t.doc_id,
               {_BM25_TERM(
                   idf=_BM25_IDF(n='s.n_docs', df='d.df'),
                   tf='t.tf', dl='l.dl', avgdl='s.avgdl',
                   k1=BM25_K1, b=BM25_B,
               )} AS c
        FROM tf t
        JOIN dfc d USING (term)
        JOIN dl l USING (doc_id)
        CROSS JOIN stats s
    ),
    scored AS (
        SELECT doc_id, ROUND(SUM(c), 6) AS bm25
        FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP_N}
    """,
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval for the fixed query {BM25_QUERY}: top-{BM25_TOP_N}
    documents by Okapi BM25 (k1={BM25_K1}, b={BM25_B}, Lucene idf
    variant).  The token stream is filtered to the query terms BEFORE
    any aggregate, so the heavy path scales with posting-list size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    tf = (
        tok.filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfc), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                _BM25_TERM(
                    idf=_BM25_IDF(n="n_docs", df="df"),
                    tf="tf",
                    dl="dl",
                    avgdl="avgdl",
                    k1=BM25_K1,
                    b=BM25_B,
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(F.round(F.sum("c"), 6).alias("bm25"))
    return (
        scored.orderBy(F.col("bm25").desc(), "doc_id").limit(BM25_TOP_N)
    )
