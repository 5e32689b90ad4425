"""Engine operators: two-phase spatial joins, kNN, clustering, dedup,
similarity search, text analysis.
"""
