"""Operators: the engine's query surface (SURVEY.md §2b).

- relational: joins, aggregations, windows, sort/limit, set ops
- dedup: exact / fuzzy (MinHash-LSH, SimHash, n-gram Jaccard) deduplication
- similarity: embedding cosine top-k (brute-force + LSH-bucketed)
- text: language-ID, quality scoring, token counting, fingerprinting
- multimodal: binary-column plumbing (decode/resize/frame-sample stubs)
"""
