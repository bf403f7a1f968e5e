"""Readers: delimited CSV (drop-malformed), fixed-width text, JSON
resource metadata, and the incremental-file ledger."""
