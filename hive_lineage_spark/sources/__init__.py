from .registry import TABLES, load_table, register_all

__all__ = ["TABLES", "load_table", "register_all"]
