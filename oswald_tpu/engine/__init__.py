from oswald_tpu.engine.search import SearchEngine, SearchConfig, SearchResult
from oswald_tpu.engine.align import Alignment, sw_align, align_hits, \
    format_alignment

__all__ = ["SearchEngine", "SearchConfig", "SearchResult",
           "Alignment", "sw_align", "align_hits", "format_alignment"]
