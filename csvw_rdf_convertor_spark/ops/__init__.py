"""Large-scale training-data operators: dedup, similarity search, text
analysis, multimodal plumbing. All JVM-side column expressions except where
noted (vectorized pandas UDFs only)."""
