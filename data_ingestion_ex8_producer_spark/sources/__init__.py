from .tables import STAR_TABLES, load_table  # noqa: F401
