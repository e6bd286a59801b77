"""Large-scale training-data operators beyond the reference's own surface:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text analysis, multimodal column plumbing."""
