from .tables import SCHEMAS, load, table_names

__all__ = ["SCHEMAS", "load", "table_names"]
