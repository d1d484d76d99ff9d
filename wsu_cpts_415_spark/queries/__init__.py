"""Named query library.  Importing this package registers every query in
``wsu_cpts_415_spark.registry.REGISTRY``."""

from wsu_cpts_415_spark.queries import (  # noqa: F401
    aggregates,
    clustering,
    cohorts,
    curation,
    events,
    filters,
    graph_ops,
    joins,
    llm_filters,
    multimodal_q,
    ranking,
    reference_parity,
    relational,
    setops,
    shapes,
    similarity,
    similarity2,
    sql_surface,
    stats_ops,
    streaming_q,
    text,
    tpch,
    tpch2,
    windows,
)
