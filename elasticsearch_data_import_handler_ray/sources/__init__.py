"""Sources: named-Dataset catalog + readers (SURVEY.md §2.A1/A2).

The reference registered every JDBC/file source as a Spark SQL temp view;
here each source becomes a named ``ray.data.Dataset`` in a ``Catalog``.
"""

from .catalog import Catalog

__all__ = ["Catalog"]
