from .config import CrawlConfig  # noqa: F401
from .model import sequential_crawl  # noqa: F401
from .frontier import run_crawl  # noqa: F401
