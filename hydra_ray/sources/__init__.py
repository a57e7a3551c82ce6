"""Sources & sinks: versioned tables, catalog ingest."""
