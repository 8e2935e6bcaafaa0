"""Pipeline configuration — reproduces ``contxt/config.py`` semantics
(defaults + two-level defaults-merge + ``print_to_console`` back-compat,
``config.py:8-72``; SURVEY.md §2.3 M24) without requiring YAML: the
config is a plain nested dict; YAML loading is used when available.

Driver-side only — config never rides inside Dataset rows.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Optional

DEFAULT_CONFIG: dict = {
    # config.py:8-39
    "output": {
        "format": "markdown",
        "destination": "print",
        "directory": None,
        "saved_directories": [],
    },
    "scraping": {
        "mode": "basic",
        "include_images": False,
        "max_depth": 1,
        "ignore_patterns": [],
        "extract_og_metadata": True,
    },
    "organization": {
        "by_source": True,
        "by_topic": False,
        "single_file": True,
    },
    "performance": {
        "show_processing_time": True,
        "show_token_count": True,
    },
    "youtube": {
        "include_comments": False,
        "max_videos": 30,
        "include_description": True,
        "format_style": "complete",
    },
}


def merge_defaults(config: dict) -> dict:
    """config.py:59-70 — two-level merge of missing keys, plus the
    ``print_to_console`` back-compat mapping (config.py:60-62)."""
    config = copy.deepcopy(config)
    if config.get("output", {}).get("print_to_console") is not None:
        if "destination" not in config["output"]:
            config["output"]["destination"] = (
                "print" if config["output"]["print_to_console"] else "file"
            )
    for section, values in DEFAULT_CONFIG.items():
        if section not in config:
            config[section] = {}
        for key, value in values.items():
            if key not in config[section]:
                config[section][key] = copy.deepcopy(value)
    return config


def load_config(path: Optional[str] = None) -> dict:
    """Load + defaults-merge. Accepts YAML (if pyyaml present) or JSON;
    missing file → pure defaults (config.py:48-54)."""
    if path is None or not os.path.exists(path):
        return copy.deepcopy(DEFAULT_CONFIG)
    with open(path) as f:
        raw = f.read()
    try:
        import yaml  # type: ignore

        config = yaml.safe_load(raw) or {}
    except ImportError:
        config = json.loads(raw)
    return merge_defaults(config)


def save_config(config: dict, path: str) -> None:
    """config.py:75-80 analog (JSON fallback when pyyaml absent)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import yaml  # type: ignore

        with open(path, "w") as f:
            yaml.dump(config, f, default_flow_style=False)
    except ImportError:
        with open(path, "w") as f:
            json.dump(config, f, indent=2, sort_keys=True)


def crawl_config_from(config: dict):
    """Bridge the reference config surface to CrawlConfig (wiring the
    documented-but-unwired ``ignore_patterns``, SURVEY.md M5)."""
    from .crawl.config import CrawlConfig

    scraping = merge_defaults(config).get("scraping", {})
    return CrawlConfig(
        max_depth=int(scraping.get("max_depth", 1)),
        ignore_patterns=tuple(scraping.get("ignore_patterns", []) or ()),
    )
