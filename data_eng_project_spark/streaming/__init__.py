"""Structured Streaming surface: exactly-once incremental file ingest
(the reference's Redis ledger, reimagined as a checkpoint) and event-time
windowed aggregations with watermarks."""
