from .dedup import stream_exact_dedup  # noqa: F401
from .extract import stream_extract  # noqa: F401
