"""Large-scale data-pipeline extensions (SURVEY §7.0).

Beyond the reference's clustering surface: deduplication, similarity
search, text analysis, multimodal plumbing, and a Structured Streaming
demo — each designed for 100 TB (shuffle-minimal, broadcast-aware,
LSH/banding instead of quadratic joins).
"""
