from harkdb_tpu.sql.ast_nodes import (
    Lit, Col, Star, BinOp, UnOp, Agg, SelectItem, TableRef, JoinClause,
    OrderItem, SelectStmt,
)
from harkdb_tpu.sql.parser import parse_sql, SqlError

__all__ = [
    "Lit", "Col", "Star", "BinOp", "UnOp", "Agg", "SelectItem", "TableRef",
    "JoinClause", "OrderItem", "SelectStmt", "parse_sql", "SqlError",
]
