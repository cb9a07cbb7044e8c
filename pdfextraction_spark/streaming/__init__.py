from .extract import stream_extract  # noqa: F401
