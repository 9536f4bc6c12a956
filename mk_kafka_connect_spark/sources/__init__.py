"""Custom data sources (paginated REST CDC source, Kafka wrappers)."""
