from lynxkite_spark.functions import dedup, multimodal, similarity, text, text_embedding

__all__ = ["dedup", "multimodal", "similarity", "text", "text_embedding"]
