from .scalar import strtobool, strtobool_col, cosine_similarity, dot, l2_norm

__all__ = ["strtobool", "strtobool_col", "cosine_similarity", "dot", "l2_norm"]
