from .extract_stream import build_extract_stream, host_rate_stream

__all__ = ["build_extract_stream", "host_rate_stream"]
