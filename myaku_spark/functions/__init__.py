"""Scalar / text functions: width normalization, alnum count, hashing,
sentence segmentation, tokenization, HTML extraction. All heavy paths are
Arrow-vectorized pandas UDFs or pure Catalyst expressions."""
