"""Pipeline compositions: the crawl loop, catalog ingest, queries."""
