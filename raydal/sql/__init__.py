"""OGR SQL dialect for raydal — parser + Ray-Data executor.

Usage::

    from raydal.sql import execute_sql
    ds = execute_sql("SELECT eas_id, COUNT(*) ... FROM poly WHERE ...",
                     {"poly": dataset_or_arrow_table})

Covers the reference's OGR SQL SELECT surface (``ogr/swq*.cpp``,
``ogr/ogrsf_frmts/generic/ogr_gensql.cpp``); see
:mod:`raydal.sql.parser` and :mod:`raydal.sql.engine` for the exact
semantics matrix and distributed execution notes.
"""

from .engine import execute_sql, execute_sql_table
from .parser import OGRSQLError, parse_select

__all__ = ["execute_sql", "execute_sql_table", "parse_select",
           "OGRSQLError"]
