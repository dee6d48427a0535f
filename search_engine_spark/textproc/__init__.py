from .tokenizer import tokenize, remove_stopwords
from .porter import porter_stem
from .pipeline import analyze_text, analyze_query, index_stopwords, query_stopwords

__all__ = [
    "tokenize",
    "remove_stopwords",
    "porter_stem",
    "analyze_text",
    "analyze_query",
    "index_stopwords",
    "query_stopwords",
]
