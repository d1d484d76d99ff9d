"""Reference-parity pipelines: the four analyses of the reference repo
(link analysis, trending prediction, Pearson correlation matrix, SCC graph
clustering), re-expressed Spark-first over the canonical videos schema
(SURVEY.md §2.9-2.10, §7.2 P5)."""
