"""Query-registry families composed by __spark_entry__.py."""
