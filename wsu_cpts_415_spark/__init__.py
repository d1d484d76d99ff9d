"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference workload (GrTravis2/WSU_Cpts_415).

Architecture is Spark-first: every operator is declared through the
DataFrame / SQL API so Catalyst + Tungsten pick the physical strategy;
Python only orchestrates. See SURVEY.md for the operator inventory this
package covers and engine/README for layout.

Layout:
    session.py    -- parameterized SparkSession builder (local[*]/cluster)
    schemas.py    -- canonical explicit StructTypes (no schema-on-read)
    io/           -- sources & sinks (parquet tables, TSV ingest, JSON lines)
    queries/      -- named relational/time/text/vector query library
    graph/        -- iterative DataFrame graph algorithms (SCC)
    pipelines/    -- reference-parity analyses (links, trending, corr, scc)
    streaming/    -- Structured Streaming variants of the time ops
"""

__version__ = "0.1.0"
