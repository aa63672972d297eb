"""Schema + ingestion layer (reference src/schema_manager.cc, src/index_schema.cc)."""
