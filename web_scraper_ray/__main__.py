"""CLI entry point mirroring the reference's flag surface
(``contxt/cli.py:120-144`` click options → argparse):

    python -m web_scraper_ray URL... [--format markdown|xml|raw]
        [--output print|file] [--directory DIR] [--custom-name NAME]
        [--single-file] [--include-images] [--max-depth N]
        [--ignore-pattern PAT ...] [--corpus PATH] [--crawl]

Offline by default: URLs resolve against a Parquet pages corpus
(``--corpus``); ``--crawl`` runs the full frontier engine from the
given URLs as seeds instead of fetching them one-shot.

This script OWNS its Ray session (init/shutdown) — the only module in
the package allowed to."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="web_scraper_ray")
    p.add_argument("urls", nargs="*", help="seed URLs")
    p.add_argument("--format", default="markdown", choices=["markdown", "xml", "raw"])
    p.add_argument("--output", default="print", choices=["print", "file"])
    p.add_argument("--directory", default=None)
    p.add_argument("--custom-name", default=None)
    p.add_argument("--single-file", action="store_true")
    p.add_argument("--include-images", action="store_true")
    p.add_argument("--max-depth", type=int, default=1)
    p.add_argument("--ignore-pattern", action="append", default=[])
    p.add_argument("--corpus", required=True,
                   help="pages corpus dir (offline fetch backing)")
    p.add_argument("--crawl", action="store_true",
                   help="run the frontier crawl from the seeds")
    p.add_argument("--checkpoint-dir", default="/tmp/wsr_cli_ckpt")
    p.add_argument("--release", default=None, metavar="DIR",
                   help="after --crawl, run the webtext release "
                        "pipeline (host-boilerplate strip + C4 line "
                        "filter) over the checkpoint and write the "
                        "cleaned corpus + manifest to DIR")
    p.add_argument("--resume", action="store_true",
                   help="continue from an existing checkpoint dir")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        config = {
            "output": {
                "format": args.format,
                "destination": args.output,
                "directory": args.directory,
                "custom_name": args.custom_name,
            },
            "scraping": {
                "include_images": args.include_images,
                "max_depth": args.max_depth,
                "ignore_patterns": args.ignore_pattern,
            },
            "organization": {"single_file": args.single_file},
        }
        if args.crawl:
            import pyarrow as pa
            import pyarrow.parquet as pq
            import tempfile
            import os

            from .config import crawl_config_from
            from .crawl import run_crawl

            seeds = pa.table({
                "seed_index": pa.array(range(len(args.urls)), pa.int64()),
                "url": pa.array(args.urls, pa.string()),
            })
            seeds_path = os.path.join(tempfile.mkdtemp(prefix="wsr_seeds_"),
                                      "seeds.parquet")
            pq.write_table(seeds, seeds_path)
            robots = os.path.join(args.corpus, "robots.parquet")
            if not args.resume:
                # a stale checkpoint from a previous crawl would mix its
                # rounds into this one's crawl-order view
                import shutil

                shutil.rmtree(args.checkpoint_dir, ignore_errors=True)
            res = run_crawl(
                f"{args.corpus}/pages", seeds_path, args.checkpoint_dir,
                robots_path=robots if os.path.exists(robots) else None,
                config=crawl_config_from(config),
                resume=args.resume,
            )
            summary = {
                "rounds": res.rounds,
                "admitted": res.n_admitted,
                "fetched": res.n_fetched,
                "seen": res.seen.size(),
                "checkpoint_dir": res.checkpoint_dir,
            }
            if args.release:
                from .pipelines.webtext import webtext_release

                summary["release"] = webtext_release(
                    args.checkpoint_dir, args.release,
                    from_checkpoint=True)
            print(json.dumps(summary))
        else:
            from .pipelines.job import run_job

            result = run_job(args.urls, config, pages_path=f"{args.corpus}/pages")
            for doc in result.printed:
                print(doc)
            summary = dict(result.stats)
            if result.combined_path:
                summary["combined_path"] = result.combined_path
            if result.files:
                summary["files"] = len(result.files)
            print(json.dumps(summary), file=sys.stderr)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
