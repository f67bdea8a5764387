from .dataframe_engine import query_terms, bm25_topk

__all__ = ["query_terms", "bm25_topk"]
