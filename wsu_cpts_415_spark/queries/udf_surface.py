"""UDF-surface completion (SURVEY.md §2.12): the two quadrants the rest
of the engine doesn't already exercise.

  * ``pandas_udaf_weighted_median`` -- a GROUPED_AGG pandas UDF (Arrow-
    batched vectorized UDAF): per-language token-weighted median of
    document length.  Scalar pandas_udf, grouped-map applyInPandas,
    mapInPandas, and applyInPandasWithState are already on hot paths
    elsewhere (similarity2, text, multimodal, streaming); this adds the
    aggregate quadrant.
  * ``udtf_char_bigrams`` -- a Python UDTF (Spark 4 table function) in a
    LATERAL join, expanding character bigrams for a bounded top-k slice.
    UDTFs evaluate row-at-a-time in Python, so the demo deliberately
    runs AFTER a top-k reduction (10 rows) and the docstring pins that:
    on unbounded data the same expansion is the JVM-side
    explode/sequence expression used by ``posexplode_tokens`` and the
    shingle kernels -- the UDTF exists for API surface parity, not as a
    production path.

Both are oracle-checked like every other query; the UDAF's weighted
median is defined as the smallest value whose running weight reaches
half the total -- run-boundary cumulative weights are permutation-
invariant, so the answer is deterministic in both engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

TOP_K_DOCS = 10  # UDTF demo slice


def _make_weighted_median():
    """GROUPED_AGG kernel factory (pandas_udf parses its DDL type at
    definition time, which needs an active session -- so build lazily):
    smallest v with cum-weight >= total/2 under ascending value order.
    Sorting inside the kernel makes the result independent of Arrow
    batch arrival order."""

    @pandas_udf("double")
    def _weighted_median(values: pd.Series, weights: pd.Series) -> float:
        df = pd.DataFrame({"v": values, "w": weights}).sort_values(
            "v", kind="mergesort"
        )
        cw = df["w"].cumsum()
        half = df["w"].sum() / 2.0
        return float(df.loc[cw >= half, "v"].iloc[0])

    return _weighted_median


@register(
    "pandas_udaf_weighted_median",
    oracle="""
    WITH w AS (
        SELECT lang, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
        FROM documents
    ),
    ordered AS (
        SELECT lang, n_chars, wt,
               SUM(wt) OVER (PARTITION BY lang ORDER BY n_chars
                             ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(wt) OVER (PARTITION BY lang) AS tw
        FROM w
    )
    SELECT lang,
           CAST(MIN(CASE WHEN cw >= tw / 2.0 THEN n_chars END) AS DOUBLE)
               AS weighted_median_chars
    FROM ordered
    GROUP BY lang
    ORDER BY lang
    """,
)
def pandas_udaf_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language median document length weighted by token count,
    computed by a vectorized GROUPED_AGG pandas UDF (one Arrow batch per
    group, no per-row Python).  The definition (first value whose
    running weight crosses half the total) is permutation-invariant at
    run boundaries, so the UDAF and the SQL window mirror agree exactly.

    Scale: the aggregation shuffles (lang, n_chars, weight) triples --
    same movement as any groupBy -- and each group's kernel is a single
    vectorized sort+cumsum.  For groups too large for one executor's
    Arrow batch, the production form is the two-pass quantile (bucket
    counts, then in-bucket select); this query carries the UDAF API
    surface."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("wt"),
    )
    wm = _make_weighted_median()
    return (
        w.groupBy("lang")
        .agg(wm("n_chars", "wt").alias("weighted_median_chars"))
        .orderBy("lang")
    )


@register(
    "udtf_char_bigrams",
    oracle=f"""
    WITH top_docs AS (
        SELECT doc_id, text FROM documents
        ORDER BY n_chars, doc_id LIMIT {TOP_K_DOCS}
    ),
    grams AS (
        SELECT doc_id, substr(text, i, 2) AS bigram
        FROM top_docs, LATERAL UNNEST(generate_series(1, len(text) - 1))
             AS t(i)
    )
    SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams
    GROUP BY doc_id, bigram
    ORDER BY doc_id, bigram
    """,
)
def udtf_char_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram expansion of the {TOP_K_DOCS} shortest documents
    through a Python UDTF joined LATERAL -- the table-function quadrant
    of the UDF surface.  Bounded BY CONSTRUCTION: the UDTF runs after a
    TakeOrderedAndProject top-k, because Python UDTFs are row-at-a-time;
    the unbounded form of this exact expansion is the JVM-side
    transform/sequence expression the shingle kernels use."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="bigram: string")
    class CharBigrams:
        def eval(self, text: str):
            if text is None:
                return
            for i in range(len(text) - 1):
                yield (text[i : i + 2],)

    docs = load_table(spark, sf_dir, "documents")
    top = docs.select("doc_id", "text", "n_chars").orderBy(
        "n_chars", "doc_id"
    ).limit(TOP_K_DOCS)
    top.createOrReplaceTempView("_udtf_top_docs")
    spark.udtf.register("char_bigrams", CharBigrams)
    grams = spark.sql(
        "SELECT t.doc_id, g.bigram "
        "FROM _udtf_top_docs t, LATERAL char_bigrams(t.text) g"
    )
    return (
        grams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_id", "bigram")
    )


TRIM_FRAC = 0.1  # fraction trimmed from EACH tail, by rank


@register(
    "arrow_grouped_trimmed_mean",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(n) - 2 * FLOOR(MAX(n) * {TRIM_FRAC}) AS BIGINT) AS n_kept,
           ROUND(AVG(n_chars), 4) AS trimmed_mean_chars
    FROM ranked
    WHERE rnk > FLOOR(n * {TRIM_FRAC}) AND rnk <= n - FLOOR(n * {TRIM_FRAC})
    GROUP BY lang
    ORDER BY lang
    """,
)
def arrow_grouped_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow (Spark 4 arrow-NATIVE grouped map -- no pandas
    materialization, the group arrives as a pyarrow.Table and compute
    happens in Arrow kernels): per-language {TRIM_FRAC:.0%}-trimmed mean
    of document length, trimming floor(n*frac) rows from each tail by
    (n_chars, doc_id) rank so the statistic is deterministic and
    SQL-recomputable.

    This closes the last §2.12 quadrant: scalar pandas_udf, grouped-agg
    pandas_udf, applyInPandas, mapInPandas, applyInPandasWithState, and
    UDTF are exercised elsewhere; applyInArrow is the zero-copy path for
    logic that is per-group but not expressible as an aggregate.  Groups
    are language-grain (bounded count, each a corpus slice); at 100 TB
    the same kernel runs per (lang, shard) and the trims re-merge via
    the rank formulation the oracle shows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def trimmed(table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            table, sort_keys=[("n_chars", "ascending"), ("doc_id", "ascending")]
        )
        n = table.num_rows
        cut = int(n * TRIM_FRAC)
        kept = table.take(idx.slice(cut, n - 2 * cut))
        mean = pc.round(
            pc.mean(pc.cast(kept.column("n_chars"), pa.float64())), 4
        )
        return pa.table(
            {
                # explicit type: a NULL-lang group would otherwise make
                # Arrow infer null type for the column and fail the
                # schema check (null rows flow to their group, SQL-style)
                "lang": pa.array(
                    [table.column("lang")[0].as_py()], pa.string()
                ),
                "n_docs": pa.array([n], pa.int64()),
                "n_kept": pa.array([kept.num_rows], pa.int64()),
                "trimmed_mean_chars": pa.array([mean.as_py()], pa.float64()),
            }
        )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return (
        docs.groupBy("lang")
        .applyInArrow(
            trimmed,
            "lang string, n_docs bigint, n_kept bigint,"
            " trimmed_mean_chars double",
        )
        .orderBy("lang")
    )


FIXED_WIDTHS = "6,4,8"  # literal split spec the polymorphic UDTF analyzes
TOP_K_PARTS = 12  # bounded slice, same discipline as udtf_char_bigrams


@register(
    "udtf_polymorphic_fixed_width",
    oracle=f"""
    WITH top_parts AS (
        SELECT p_partkey, p_name FROM part
        ORDER BY p_partkey LIMIT {TOP_K_PARTS}
    )
    SELECT p_partkey,
           substr(p_name, 1, 6) AS f1,
           substr(p_name, 7, 4) AS f2,
           substr(p_name, 11, 8) AS f3
    FROM top_parts
    ORDER BY p_partkey
    """,
)
def udtf_polymorphic_fixed_width(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 static ``analyze``): the output
    schema is computed AT ANALYSIS TIME from the literal widths argument
    -- '{FIXED_WIDTHS}' yields columns f1..f3 here, any other spec yields
    a different arity, with no code change.  This is the piece plain
    UDTFs lack (udtf_char_bigrams has a fixed returnType): the
    fixed-width record splitter every mainframe/log ingest needs, where
    the layout is data, not code.  Same bounded-slice discipline as the
    other UDTF (row-at-a-time Python, so it runs after a top-k; the
    unbounded form is the JVM substring projection the oracle shows)."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import StringType, StructType

    @udtf
    class FixedWidth:
        @staticmethod
        def analyze(line: AnalyzeArgument, widths: AnalyzeArgument):
            if not widths.isConstantExpression or widths.value is None:
                raise ValueError("widths must be a constant string")
            n = len(str(widths.value).split(","))
            schema = StructType()
            for i in range(n):
                schema = schema.add(f"f{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, line: str, widths: str):
            spans = [int(w) for w in widths.split(",")]
            out, pos = [], 0
            for w in spans:
                out.append(line[pos : pos + w] if line is not None else None)
                pos += w
            yield tuple(out)

    part = load_table(spark, sf_dir, "part")
    top = part.select("p_partkey", "p_name").orderBy("p_partkey").limit(
        TOP_K_PARTS
    )
    top.createOrReplaceTempView("_udtf_top_parts")
    spark.udtf.register("fixed_width", FixedWidth)
    return spark.sql(
        f"SELECT t.p_partkey, g.* FROM _udtf_top_parts t, "
        f"LATERAL fixed_width(t.p_name, '{FIXED_WIDTHS}') g "
        f"ORDER BY t.p_partkey"
    )


@register(
    "arrow_map_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(text) AS BIGINT) AS n_chars_exact
    FROM documents
    ORDER BY doc_id
    """,
)
def arrow_map_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (the UNGROUPED arrow-native map, completing the Arrow
    API matrix next to applyInArrow's grouped form): per-document token
    and character counts computed with pyarrow compute kernels on
    RecordBatches -- no pandas conversion, no per-row Python.  Like
    udtf_char_bigrams this exists for API-surface parity with a
    deliberately SQL-recomputable statistic; the production path for
    THIS particular stat is the JVM-side split/size expression
    (queries/text.py text_stats), and the docstring pins that.  Where
    mapInArrow earns its keep for real is logic Arrow kernels have but
    Spark lacks -- the batch shape here (stream of RecordBatches in,
    stream out, pipelined inside the scan stage, zero shuffle) is
    exactly what that production use looks like."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            text = t.column("text")
            toks = pc.list_value_length(
                pc.split_pattern(text, " ")
            ).cast(pa.int64())
            chars = pc.utf8_length(text).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [t.column("doc_id").combine_chunks(), toks.combine_chunks(),
                 chars.combine_chunks()],
                ["doc_id", "n_tokens", "n_chars_exact"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        stats, "doc_id bigint, n_tokens bigint, n_chars_exact bigint"
    ).orderBy("doc_id")
