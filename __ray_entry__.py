"""Driver contract for the graft builder (Ray Data target).

entry(): flagship crawl pipeline on sf0.001 — synthesize the seed
catalog from documents, run three crawl iterations (frontier →
politeness → fetch → checks → analysis → interleaved span docs), and
return the checks log.

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 plus the training-data operators (dedup, similarity,
text analysis, multimodal plumbing); see hydra_ray/pipelines/queries.py.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from hydra_ray.pipelines.queries import q_crawl_checks

    return q_crawl_checks("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from hydra_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hydra_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
