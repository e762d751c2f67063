"""Distributed operators for large-scale training-data pipelines:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
sessionization, multimodal column plumbing."""
