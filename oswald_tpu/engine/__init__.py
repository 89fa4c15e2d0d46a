from oswald_tpu.engine.search import SearchEngine, SearchConfig, SearchResult

__all__ = ["SearchEngine", "SearchConfig", "SearchResult"]
