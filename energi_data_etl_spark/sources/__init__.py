from .tables import TABLES, load_table, load_all  # noqa: F401
