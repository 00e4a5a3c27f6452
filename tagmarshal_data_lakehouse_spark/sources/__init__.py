"""Source connectors: bronze round-document readers and seed CSVs."""
