from .registry import ORACLES, QUERIES, get_oracles, get_queries  # noqa: F401
