"""Import every query module so registry registration runs.

Add one import line per module as operators land (SURVEY.md §7.3 order).
"""

from .operators import aggregates, joins, projections, sorts_sets, windows  # noqa: F401
from .plans import flagship  # noqa: F401
