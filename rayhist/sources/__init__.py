"""Binary ingest sources (the .osh.pbf-shaped block codec)."""
