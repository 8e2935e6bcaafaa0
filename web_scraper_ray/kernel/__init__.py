"""Pure-Python HTML extraction kernel.

Every function here is a deterministic pure function of its inputs — no
I/O, no wall-clock, no randomness — so the same kernel runs identically
inside Ray Data ``map_batches`` workers and in the sequential oracle
that generates the ``pages.text`` parity column (SURVEY.md §5.2).
"""

from .clean import clean_html, extract_og_metadata  # noqa: F401
from .markdown import html_to_markdown, format_markdown  # noqa: F401
from .extract import extract_page  # noqa: F401
from .tokens import count_tokens  # noqa: F401
