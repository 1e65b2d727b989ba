"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved-extraction pipeline on
sf0.001; ``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 (plus the training-data operators); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from soupflow.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents →
    interleaved spans → ExtractActor → span summary Dataset."""
    return QUERIES["extract_interleaved"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
