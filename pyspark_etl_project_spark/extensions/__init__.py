"""Large-scale training-data pipeline operators over documents/embeddings:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
search (brute-force + LSH-bucketed ANN), text analysis (language-ID,
quality, tokens, fingerprints), multimodal column plumbing.

These generalize the reference's H1 (row-hash identity) and E1
(keep-one-per-key) semantics to fuzzy identity at corpus scale.
"""
