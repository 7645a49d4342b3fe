"""Import every query module so registry registration runs.

Add one import line per module as operators land (SURVEY.md §7.3 order).
"""

from .plans import flagship  # noqa: F401
