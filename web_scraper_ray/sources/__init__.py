from .warc import read_warc, parse_warc_bytes, write_warc  # noqa: F401
