from .readers import add_lineage, load_tables, read_table
from .writers import write_table

__all__ = ["read_table", "load_tables", "add_lineage", "write_table"]
