"""Large-scale training-data pipeline operators.

Beyond the reference's query surface, these are the data-processing
operators a 100 TB training-data pipeline needs over the same engine:
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
cosine), approximate nearest-neighbour search, text analysis
(token counting, quality scoring, language-ID, fingerprinting), and
multimodal column plumbing.  Everything is expressed DataFrame-first
(JVM expressions / Arrow-batched pandas UDFs; no per-row Python).
"""
