from .build import (
    docs_from_pages,
    tokens_col,
    term_doc_tf,
    corpus_stats,
    term_df,
)

__all__ = ["docs_from_pages", "tokens_col", "term_doc_tf", "corpus_stats", "term_df"]
