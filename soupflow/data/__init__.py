"""Large-scale training-data pipeline operators built on Ray Data:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force + IVF cosine top-k), text analysis
(token counts, quality scoring, language ID, fingerprinting) and
multimodal column plumbing (binary payload decode/feature stages)."""
