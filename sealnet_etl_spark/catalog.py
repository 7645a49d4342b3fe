"""Import every query module so registry registration runs.

Add one import line per module as operators land (SURVEY.md §7.3 order).
"""

from .functions import families  # noqa: F401
from .operators import (  # noqa: F401
    aggregates,
    dedup,
    etl,
    joins,
    multimodal,
    projections,
    similarity,
    sorts_sets,
    textstats,
    udfs,
    windows,
)
from .sources import ingest  # noqa: F401
from .streaming import incremental, queries_str  # noqa: F401
from .plans import flagship  # noqa: F401
