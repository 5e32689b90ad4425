"""Pipeline stages: data synthesis, stop-places DAG, routing, export."""
