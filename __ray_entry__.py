"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No ray.init()/ray.shutdown() here or in the library code these use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from data_deduplication_service_ray import api

    return api.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from data_deduplication_service_ray import api

    return dict(api.QUERIES)


def oracle_sql() -> dict[str, str]:
    from data_deduplication_service_ray import api

    return dict(api.ORACLE_SQL)
