"""External source connectors (CSV organisations import, routing source
synthesizer lives in pipeline/routing.py)."""
