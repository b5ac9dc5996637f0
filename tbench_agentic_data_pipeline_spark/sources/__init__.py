"""Sources & sinks (SURVEY.md §2.1): drift-tolerant CSV/JSON ingest,
directory-tree scans, and snapshot-versioned table commits."""
