"""Data sources (SURVEY.md §2.1)."""

from .files import read_table  # noqa: F401
from .huggingface import read_top_models  # noqa: F401
from .jdbc import jdbc_scan_options, read_jdbc_table  # noqa: F401
from .rest import (  # noqa: F401
    FetchPolicy,
    fetch_pages,
    fetch_pages_distributed,
    fetch_to_dataframe,
    union_pages,
)
