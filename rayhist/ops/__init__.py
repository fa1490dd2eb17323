"""Generic large-scale data-processing operators: relational
primitives, deduplication, text analysis, multimodal plumbing."""
