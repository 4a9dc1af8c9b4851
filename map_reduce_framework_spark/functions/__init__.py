from .rounding import rnd, rnd_sql  # noqa: F401
