"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pages->tiers pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator battery from
``prom_tsdb_copyer_ray.pipelines.queries`` (one entry per implemented
operator of SURVEY.md §2 plus the training-data operators).  Ray is
initialised by the driver before import — nothing here calls ray.init().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages (derived from the
    documents table) -> extraction actor pool -> 5m/1h/1d rollup tiers;
    returns the 5m tier chunk Dataset."""
    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers
    from prom_tsdb_copyer_ray.sources.pages import read_pages_from_documents

    pages = read_pages_from_documents("/root/testdata/sf0.001")
    return build_tiers(pages, tiers=("5m",), concurrency=(1, 4))["5m"]


def queries() -> dict[str, Callable[[str], Any]]:
    from prom_tsdb_copyer_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from prom_tsdb_copyer_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
