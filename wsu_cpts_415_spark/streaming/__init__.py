"""Structured Streaming surface (SURVEY.md §2.11, §7.2 P6).

The reference is batch-only; the engine runs the same event-table queries
under Structured Streaming: readStream -> window/session aggregation with
watermarks -> writeStream, plus an arbitrary-stateful sessionizer via
applyInPandasWithState."""
