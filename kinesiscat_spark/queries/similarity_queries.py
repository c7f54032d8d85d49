"""Similarity-search queries over `embeddings` (extension surface X3/X4).

Phase C fills this with brute-force cosine top-k (oracle: DuckDB
list_cosine_similarity) and an LSH-bucketed approximate variant.
"""
