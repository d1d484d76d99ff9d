"""Training-data hygiene filters beyond the reference's surface: Gopher-
style intra-document repetition scoring and train/eval contamination
detection by n-gram containment.  Both are standard large-corpus curation
steps (repetition thresholds after Rae et al. 2021 "Scaling Language
Models" app. A; n-gram collision checks after Brown et al. 2020 app. C)
expressed as pure DataFrame plans over the ``documents`` fixture.

Scale design:
  * ``repetition_filter`` is one explode + two hash aggregates per doc --
    embarrassingly partition-parallel, shuffle key doc_id only.
  * ``contamination_containment`` broadcast-joins the EVAL shingle set
    against the corpus scan: the held-out benchmark is tiny by
    construction (that is what makes it a benchmark), so the corpus is
    never shuffled -- the contamination scan stays one pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.registry import register

# stand-in held-out eval set: ~1% of docs by a fixed residue class
BENCH_MOD = 97
CONTAIN_THRESHOLD = 0.2

# language rebalancing: keep-rate percent per language.  The fixture corpus
# is ~44% English; capping 'en' while keeping the tail languages whole is
# the standard multilingual-mix correction.
LANG_KEEP_PCT = {"en": 20}
DEFAULT_KEEP_PCT = 60


@register(
    "stratified_sample_lang",
    oracle=f"""
    SELECT doc_id, lang, bucket
    FROM (
        SELECT doc_id, lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 100 AS bucket
        FROM documents
    )
    WHERE bucket < CASE lang WHEN 'en' THEN {LANG_KEEP_PCT['en']}
                   ELSE {DEFAULT_KEEP_PCT} END
    ORDER BY doc_id
    """,
)
def stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: each document hashes
    to a stable [0,100) bucket (md5 of its id -- identical in every
    engine, every run, every cluster size), and a per-language keep-rate
    admits the bucket prefix.  Unlike ``df.sampleBy`` (seeded RNG over
    partition iteration order), hash-bucket sampling is reproducible
    under repartitioning and incremental reruns -- at 100 TB the sample
    is a pure row-local filter pushed at the scan, no shuffle at all."""
    from wsu_cpts_415_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "pmod(cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        " as bigint), 100)"
    )
    rate = F.when(F.col("lang") == "en", F.lit(LANG_KEEP_PCT["en"])).otherwise(
        F.lit(DEFAULT_KEEP_PCT)
    )
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
        .orderBy("doc_id")
    )

_DUCK_BIGRAMS_ALL = """
    SELECT doc_id,
           list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i + 1]
           ) AS grams
    FROM documents
"""


# Reusable CTE chain ending in ``rep(doc_id, total_2grams, dup_2gram_frac,
# top_2gram_frac, keep)`` -- selected by the registered query and composed
# into the curation-funnel oracle (queries/curation.py).
REPETITION_DUCK_CTES = f"""grams AS ({_DUCK_BIGRAMS_ALL}),
    rep_per_doc AS (
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS total_2grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_2grams
        FROM grams
    ),
    rep_tops AS (
        SELECT doc_id, MAX(c) AS top_c
        FROM (
            SELECT doc_id, g, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(grams) AS g FROM grams)
            GROUP BY doc_id, g
        )
        GROUP BY doc_id
    ),
    rep AS (
        SELECT p.doc_id,
               p.total_2grams,
               ROUND(1.0 - CAST(p.distinct_2grams AS DOUBLE) / p.total_2grams,
                     6) AS dup_2gram_frac,
               ROUND(CAST(t.top_c AS DOUBLE) / p.total_2grams, 6)
                   AS top_2gram_frac,
               (1.0 - CAST(p.distinct_2grams AS DOUBLE) / p.total_2grams)
                   <= 0.2
                   AND CAST(t.top_c AS DOUBLE) / p.total_2grams <= 0.1 AS keep
        FROM rep_per_doc p JOIN rep_tops t USING (doc_id)
    )"""


@register(
    "repetition_filter",
    oracle=f"""
    WITH {REPETITION_DUCK_CTES}
    SELECT doc_id, total_2grams, dup_2gram_frac, top_2gram_frac, keep
    FROM rep
    ORDER BY doc_id
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition scores per document: duplicate-bigram
    fraction (1 - distinct/total, with multiplicity) and top-bigram
    fraction (most frequent bigram / total), plus the keep verdict at
    the classic <=0.2 / <=0.1 thresholds.  Boilerplate-heavy documents
    (navigation bars, templated spam) light up both scores.

    Plan: ONE pass -- bigrams hashed to 64-bit per row (the shuffle
    carries (doc_id, long), never bigram strings), explode, count per
    (doc, gram-hash), then total = sum(c), distinct = count(*), top =
    max(c) from the same aggregate; both aggregates partial-combine
    map-side.  Within-doc 64-bit collisions are ~(grams^2 / 2^64) --
    vanishing, and only they could perturb the counts."""
    from wsu_cpts_415_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # tokens staged through a Project: the inline form re-evaluates
    # split(text) per element access, O(tokens^2) per doc (text.py:344)
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    # zip_with over slices: sequence(1, 0) descends for one-token docs
    # and element_at(toks, 0/2) throws under ANSI (text.py _shingle_rows
    # has the full note; the oracle's generate_series(1, 0) is empty)
    ex = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1),"
                " (x, y) -> xxhash64(concat(x, ' ', y)))"
            )
        ).alias("h"),
    )
    stats = (
        ex.groupBy("doc_id", "h")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total_2grams"),
            F.count("*").alias("distinct_2grams"),
            F.max("c").alias("top_c"),
        )
    )
    dup_frac = 1.0 - F.col("distinct_2grams").cast("double") / F.col("total_2grams")
    top_frac = F.col("top_c").cast("double") / F.col("total_2grams")
    return stats.select(
        "doc_id",
        F.col("total_2grams").cast("bigint").alias("total_2grams"),
        F.round(dup_frac, 6).alias("dup_2gram_frac"),
        F.round(top_frac, 6).alias("top_2gram_frac"),
        ((dup_frac <= 0.2) & (top_frac <= 0.1)).alias("keep"),
    ).orderBy("doc_id")


@register(
    "contamination_containment",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1]
               ))) AS shingle
        FROM documents
    ),
    bench AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
    bench_sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM bench GROUP BY doc_id
    ),
    hits AS (
        SELECT c.doc_id AS corpus_doc, b.doc_id AS bench_doc,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM corpus c JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc_id, b.doc_id
    )
    SELECT h.corpus_doc, h.bench_doc,
           ROUND(CAST(h.n_common AS DOUBLE) / s.n_sh, 6) AS containment
    FROM hits h JOIN bench_sizes s ON s.doc_id = h.bench_doc
    WHERE CAST(h.n_common AS DOUBLE) / s.n_sh >= {CONTAIN_THRESHOLD}
    ORDER BY containment DESC, corpus_doc, bench_doc
    """,
)
def contamination_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan: flag corpus documents whose bigram-
    shingle overlap CONTAINS >= {CONTAIN_THRESHOLD:.0%} of some held-out
    benchmark document's shingles (the GPT-3/PaLM-style n-gram collision
    check; containment is |corpus ∩ bench| / |bench|, asymmetric on
    purpose -- a giant page quoting a whole eval item must flag even
    though its Jaccard is tiny).

    Plan: the benchmark split (doc_id % {BENCH_MOD} == 0, ~1% stand-in
    for a real eval suite) is exploded to (shingle, doc) rows and
    BROADCAST; the corpus side streams through one equi-join + one hash
    aggregate -- the 100 TB corpus is never shuffled, which is the whole
    design: benchmark smallness is a precondition of being a benchmark.
    Shares the session-staged shingle projection with the minhash/ngram
    suites."""
    from wsu_cpts_415_spark.queries.similarity import _hashed_staged

    staged = _hashed_staged(spark, sf_dir).select("doc_id", "shingles")
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = (
        staged.filter(is_bench)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .withColumnRenamed("doc_id", "bench_doc")
    )
    bench_sizes = staged.filter(is_bench).select(
        F.col("doc_id").alias("bench_doc"),
        F.size("shingles").cast("bigint").alias("n_sh"),
    )
    corpus = (
        staged.filter(~is_bench)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .withColumnRenamed("doc_id", "corpus_doc")
    )
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("corpus_doc", "bench_doc")
        .agg(F.count("*").alias("n_common"))
    )
    containment = F.col("n_common").cast("double") / F.col("n_sh")
    return (
        hits.join(F.broadcast(bench_sizes), "bench_doc")
        .filter(containment >= CONTAIN_THRESHOLD)
        .select(
            "corpus_doc",
            "bench_doc",
            F.round(containment, 6).alias("containment"),
        )
        .orderBy(F.col("containment").desc(), "corpus_doc", "bench_doc")
    )


# CCNet-style boilerplate segmentation: fixed-width token windows stand in
# for "lines" (the fixture text has no newlines); a segment appearing in
# at least BOILERPLATE_DF distinct documents is boilerplate.
LINE_TOKENS = 8
BOILERPLATE_DF = 2


def _line_segments_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged (doc_id, line_no, digest) segment table: the corpus text
    split into LINE_TOKENS-token lines, each reduced to its xxhash64
    digest inside the build's scan stage -- the identical segmentation
    as streaming/line_gate.line_digests_of, with the line index kept.

    r12 (guide §1.2, don't compute things twice): four registry queries
    (boilerplate_line_filter / boilerplate_strip / boilerplate_top_lines
    / ingest_boilerplate_gate) each re-ran the split+slice+hash explode
    over every document per query; the segmentation is a pure function
    of the corpus, so it is built once per (corpus, LINE_TOKENS) and
    every consumer reads the fixed-width (8-byte digest) table.  Line
    TEXT is deliberately NOT staged -- consumers that need it
    (boilerplate_top_lines' payload recovery, boilerplate_strip's
    clean-text rebuild) still read it from the documents scan, so the
    staged layer stays digest-sized at 100 TB."""
    from wsu_cpts_415_spark.io.tables import load_table
    from wsu_cpts_415_spark.ops.staging import staged_table

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = F.split(F.col("text"), " ")
        n_lines = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
        return docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_lines - 1),
                    lambda i: F.xxhash64(
                        F.array_join(
                            F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS),
                            " ",
                        )
                    ),
                )
            ).alias("line_no", "digest"),
        )

    return staged_table(
        spark,
        "line_segments",
        sf_dir,
        build,
        salt=f"xx64:lt{LINE_TOKENS}",
        expect_cols=["doc_id", "line_no", "digest"],
    )


@register(
    "boilerplate_line_filter",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    ),
    lines AS (
        SELECT doc_id, (i - 1) // {LINE_TOKENS} AS line_no,
               md5(string_agg(tok, ' ' ORDER BY i)) AS digest
        FROM toks GROUP BY doc_id, (i - 1) // {LINE_TOKENS}
    ),
    freq AS (
        SELECT digest, COUNT(DISTINCT doc_id) AS df
        FROM lines GROUP BY digest
    )
    SELECT l.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN f.df >= {BOILERPLATE_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boilerplate,
           ROUND(CAST(SUM(CASE WHEN f.df >= {BOILERPLATE_DF} THEN 1 ELSE 0
                          END) AS DOUBLE) / COUNT(*), 4) AS bp_ratio
    FROM lines l JOIN freq f ON l.digest = f.digest
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
)
def boilerplate_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal audit (Wenzek et al. 2020 §4.1:
    dedup at line level across the corpus to strip headers/footers/nav
    chrome): documents are segmented into fixed LINE_TOKENS-token
    "lines", each line's corpus document-frequency is counted, and lines
    present in >= BOILERPLATE_DF distinct docs are flagged; per document
    the query reports how much of it is boilerplate.

    Scale design: line construction is a generator expression inside the
    scan stage (transform over token slices -- no shuffle, no UDF), and
    every line is reduced to an 8-byte xxhash64 digest BEFORE the
    aggregate, so the two shuffles (document-frequency agg, digest
    equi-join back) move fixed-width digests + ids only; text never
    leaves the scan, the df agg is map-side combinable, and the join
    co-partitions with the agg on the same key
    (tests/test_metrics.py asserts digest-sized shuffle rows).  The
    digest is internal -- the oracle groups lines by md5 instead, an
    equivalent partition of the line space -- and the within-doc
    flag-and-rollup rides the doc_id shuffle of the final aggregate.
    r12: the segmentation explode is read from the staged
    ``line_segments`` layer shared by all four boilerplate queries."""
    lines = _line_segments_staged(spark, sf_dir).select("doc_id", "digest")
    freq = lines.groupBy("digest").agg(
        F.count_distinct("doc_id").alias("df")
    )
    is_bp = F.when(F.col("df") >= BOILERPLATE_DF, 1).otherwise(0)
    return (
        lines.join(freq, "digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(is_bp).alias("n_boilerplate"),
            F.round(
                F.sum(is_bp).cast("double") / F.count("*"), 4
            ).alias("bp_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "boilerplate_strip",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    ),
    lines AS (
        SELECT doc_id, (i - 1) // {LINE_TOKENS} AS line_no,
               string_agg(tok, ' ' ORDER BY i) AS line
        FROM toks GROUP BY doc_id, (i - 1) // {LINE_TOKENS}
    ),
    freq AS (
        SELECT line, COUNT(DISTINCT doc_id) AS df
        FROM lines GROUP BY line
    )
    SELECT l.doc_id,
           COALESCE(string_agg(CASE WHEN f.df < {BOILERPLATE_DF}
                                    THEN l.line END,
                               ' ' ORDER BY l.line_no), '') AS clean_text,
           CAST(SUM(CASE WHEN f.df >= {BOILERPLATE_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM lines l JOIN freq f ON l.line = f.line
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
)
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM face of ``boilerplate_line_filter``: emit each
    document's cleaned text with corpus-frequent lines removed (what the
    CCNet stage actually writes downstream), plus how many lines were
    stripped.

    Scale design: line hashing and document-frequency counting reuse the
    audit query's digest-only shuffle posture; the per-doc list of
    boilerplate line numbers is a SPARSE table (only docs that contain a
    frequent line, one small int array each), and the clean-text rebuild
    is doc-local expression work (filter + slice over the token array)
    after one doc_id equi-join of that sparse table -- AQE picks a
    broadcast when the boilerplate table is small, and the fallback is a
    doc_id-keyed shuffle-hash join, never a corpus self-join.  The
    oracle groups lines by their text; the engine groups by xxhash64
    (an equivalent partition of the line space).  r12: the digest
    explode is read from the staged ``line_segments`` layer; only the
    clean-text rebuild still touches the documents scan."""
    from wsu_cpts_415_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
    line_at = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "
    )
    lines = _line_segments_staged(spark, sf_dir)
    freq = lines.groupBy("digest").agg(
        F.count_distinct("doc_id").alias("df")
    )
    bp = (
        lines.join(freq.filter(F.col("df") >= BOILERPLATE_DF), "digest")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("line_no")).alias("bp_lines"))
    )
    kept = F.filter(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: ~F.array_contains(F.col("bp_lines"), i),
    )
    return (
        docs.join(bp, "doc_id", "left")
        .withColumn("bp_lines", F.coalesce("bp_lines", F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.array_join(F.transform(kept, line_at), " ").alias("clean_text"),
            F.size("bp_lines").cast("bigint").alias("n_removed"),
        )
        .orderBy("doc_id")
    )


# batch-face split for the streaming line gate: same md5 bucket split as
# the dedup gate (queries/dedup_policy.py) -- bucket >= 90 is "the batch
# arriving now", the rest is the standing corpus
_GATE_BUCKET_SPARK = (
    "pmod(cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
    " as bigint), 100)"
)
_GATE_BUCKET_DUCK = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
)
_GATE_NEWB = 90
LINE_GATE_THRESHOLD = 0.5


@register(
    "ingest_boilerplate_gate",
    oracle=f"""
    WITH bucketed AS (
        SELECT doc_id, {_GATE_BUCKET_DUCK} AS bucket FROM documents
    ),
    toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    ),
    lines AS (
        SELECT doc_id, (i - 1) // {LINE_TOKENS} AS line_no,
               md5(string_agg(tok, ' ' ORDER BY i)) AS line
        FROM toks GROUP BY doc_id, (i - 1) // {LINE_TOKENS}
    ),
    std_df AS (
        SELECT line, COUNT(DISTINCT l.doc_id) AS sdf
        FROM lines l JOIN bucketed k ON k.doc_id = l.doc_id
        WHERE k.bucket < {_GATE_NEWB}
        GROUP BY line
    ),
    batch_lines AS (
        SELECT l.* FROM lines l JOIN bucketed k ON k.doc_id = l.doc_id
        WHERE k.bucket >= {_GATE_NEWB}
    ),
    bdf AS (
        SELECT line, COUNT(DISTINCT doc_id) AS b
        FROM batch_lines GROUP BY line
    )
    SELECT bl.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN COALESCE(s.sdf, 0) + f.b >= {BOILERPLATE_DF}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
           ROUND(CAST(SUM(CASE WHEN COALESCE(s.sdf, 0) + f.b
                                    >= {BOILERPLATE_DF}
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
               AS bp_ratio,
           (CAST(SUM(CASE WHEN COALESCE(s.sdf, 0) + f.b >= {BOILERPLATE_DF}
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
               < {LINE_GATE_THRESHOLD} AS admitted
    FROM batch_lines bl
    JOIN bdf f ON f.line = bl.line
    LEFT JOIN std_df s ON s.line = bl.line
    GROUP BY bl.doc_id
    ORDER BY bl.doc_id
    """,
)
def ingest_boilerplate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the streaming boilerplate gate
    (streaming/line_gate.py:gate_lines_against): the arriving batch (md5
    bucket >= 90, the dedup gate's split) is scored against the standing
    corpus's line-frequency table -- a line is boilerplate when its
    distinct-document count across standing + batch reaches
    BOILERPLATE_DF, and a document is admitted only while its
    boilerplate fraction stays below the threshold.  The DuckDB oracle
    recomputes the full admission decision end-to-end, putting the
    streaming sink's gating semantics inside the correctness gate.

    Scale: the standing side is reduced to (digest, n_docs) aggregates
    before any join (digest-sized shuffles, text stays in the scan);
    identical posture to boilerplate_line_filter.  r12: both sides'
    segmentations come from the staged ``line_segments`` layer (the
    bucket split is an expression over doc_id, so it applies to the
    digest table directly); the gating math itself still runs through
    the streaming sink's gate_lines_against/doc_line_counts code."""
    from wsu_cpts_415_spark.streaming.line_gate import (
        doc_line_counts,
        gate_lines_against,
    )

    segs = _line_segments_staged(spark, sf_dir).withColumn(
        "bucket", F.expr(_GATE_BUCKET_SPARK)
    )
    batch_lines = segs.filter(F.col("bucket") >= _GATE_NEWB).select(
        "doc_id", "digest"
    )
    standing_lines = segs.filter(F.col("bucket") < _GATE_NEWB).select(
        "doc_id", "digest"
    )
    return gate_lines_against(
        None,
        doc_line_counts(None, lines=standing_lines),
        LINE_GATE_THRESHOLD,
        lines=batch_lines,
    ).orderBy("doc_id")


@register(
    "boilerplate_top_lines",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    ),
    lines AS (
        SELECT doc_id, (i - 1) // {LINE_TOKENS} AS line_no,
               string_agg(tok, ' ' ORDER BY i) AS line
        FROM toks GROUP BY doc_id, (i - 1) // {LINE_TOKENS}
    ),
    freq AS (
        SELECT line, COUNT(DISTINCT doc_id) AS df
        FROM lines GROUP BY line
    )
    SELECT line, df FROM freq WHERE df >= {BOILERPLATE_DF}
    ORDER BY df DESC, line LIMIT 20
    """,
)
def boilerplate_top_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "what IS the boilerplate" report: the most corpus-frequent
    lines with their text, heaviest first.

    Scale design -- heavy hitters with payload recovery: the frequency
    pass runs digest-only (the line_gate posting aggregate, 8-byte
    rows), and line TEXT is recovered only for digests already flagged
    boilerplate -- the corpus-side segments join the (small) flagged-
    digest table, so line text reaches a shuffle only for matching rows
    (AQE broadcasts the flagged table when it fits; the fallback is a
    digest equi-join, never a text-keyed aggregate over the corpus).
    The final order-and-limit sorts only the recovered boilerplate set.
    r12: the frequency pass reads the staged ``line_segments`` layer;
    only the payload recovery re-splits text."""
    from wsu_cpts_415_spark.io.tables import load_table
    from wsu_cpts_415_spark.streaming.line_gate import doc_line_counts

    docs = load_table(spark, sf_dir, "documents")
    flagged = doc_line_counts(
        docs, lines=_line_segments_staged(spark, sf_dir)
    ).filter(F.col("n_docs") >= BOILERPLATE_DF)
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
    segs = docs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "
                ),
            )
        ).alias("line")
    ).withColumn("digest", F.xxhash64("line"))
    return (
        segs.join(flagged, "digest")
        .dropDuplicates(["digest"])
        .select("line", F.col("n_docs").alias("df"))
        .orderBy(F.col("df").desc(), "line")
        .limit(20)
    )
