from .registry import REGISTRY, load_all, oracle_dict, queries_dict, query

__all__ = ["REGISTRY", "load_all", "oracle_dict", "queries_dict", "query"]
