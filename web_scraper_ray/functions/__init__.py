from .urls import (  # noqa: F401
    canonicalize_url,
    domain_path_filename,
    extract_host,
    is_valid_url,
    matches_ignore_patterns,
    sanitize_filename,
    url_hash64,
)
