from .flagship import extract_pipeline, read_pages  # noqa: F401
