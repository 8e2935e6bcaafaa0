from .extract_stage import extract_batch, links_flat_batch  # noqa: F401
