"""Sources: parquet table loaders + transcript corpus builders."""

from .tables import TESTDATA_TABLES, load_table  # noqa: F401
from .transcripts import load_transcripts  # noqa: F401
