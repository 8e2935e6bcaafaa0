"""YouTube-side semantics ported from the reference (URL classification,
transcript parsing/stripping, chapter as-of assignment, top-k comments)
plus their Ray-Data table analogs.

The network sources (yt-dlp / youtube-transcript-api,
``contxt/youtube_handler.py:33-70,115-204``) are NOT reproduced as live
fetchers — no network in this environment; the *data shape* they return
is modeled by the ``transcript_lines`` / ``chapters`` / ``comments``
tables (FIXTURES.md §5) and the functions below operate on those.
"""

from __future__ import annotations

import re
from typing import Tuple

import pandas as pd

import ray.data

VIDEO_ID_RE = re.compile(r"^[\w-]{11}$")  # youtube_handler.py:8
VIDEO_ID_EXTRACT_RE = re.compile(r"(?:v=|youtu\.be/)([\w-]{11})")  # youtube_handler.py:10
PLAYLIST_ID_RE = re.compile(r"list=([\w-]+)")  # youtube_handler.py:21
TS_LINE_RE = re.compile(r"\[([\d\.]+)s\] (.*)")  # youtube_handler.py:83


def is_youtube_url(url: str) -> bool:
    """scraper.py:69-70 routing predicate."""
    return "youtube.com" in url or "youtu.be" in url


def extract_video_id(url: str) -> str:
    """youtube_handler.py:6-13."""
    if VIDEO_ID_RE.match(url):
        return url
    match = VIDEO_ID_EXTRACT_RE.search(url)
    if match:
        return match.group(1)
    raise ValueError("Invalid YouTube URL or video ID")


def identify_youtube_url_type(url: str) -> Tuple[str, str]:
    """youtube_handler.py:15-31."""
    if "youtube.com/playlist" in url or "list=" in url:
        playlist_id = PLAYLIST_ID_RE.search(url)
        return ("playlist", playlist_id.group(1) if playlist_id else "")
    elif (
        "youtube.com/channel" in url
        or "youtube.com/c/" in url
        or "youtube.com/@" in url
    ):
        return ("channel", url.split("/")[-1])
    else:
        try:
            return ("video", extract_video_id(url))
        except ValueError:
            return ("unknown", "")


# ---------------------------------------------------------------------------
# transcript lines <-> text

def format_transcript(entries: list[dict], include_timestamps: bool = True) -> str:
    """youtube_handler.py:44-49 — entries [{start, text}] → joined text."""
    if include_timestamps:
        return "\n".join(f"[{e['start']:.1f}s] {e['text']}" for e in entries)
    return "\n".join(e["text"] for e in entries)


def parse_transcript_line(line: str) -> Tuple[float, str]:
    """youtube_handler.py:81-90 — ``-1`` marks no-timestamp lines."""
    m = TS_LINE_RE.match(line)
    if m:
        return float(m.group(1)), m.group(2)
    return -1.0, line


def strip_timestamps_find_bracket(transcript: str) -> str:
    """Variant A — youtube_formatter.py:62-72: find first ``]``, take the
    rest lstripped; lines without brackets pass through (note: the
    reference drops bracketless lines inside a bracket-containing
    transcript — reproduced)."""
    if "[" in transcript and "]" in transcript:
        lines = []
        for line in transcript.split("\n"):
            if "[" in line and "]" in line:
                idx = line.find("]")
                if idx != -1 and idx + 1 < len(line):
                    lines.append(line[idx + 1 :].lstrip())
                else:
                    lines.append(line)
        return "\n".join(lines)
    return transcript


def strip_timestamps_split(transcript: str) -> str:
    """Variant B — youtube_formatter.py:110-117 / 250-256:
    ``split("] ", 1)`` on lines starting with ``[``."""
    lines = []
    for line in transcript.split("\n"):
        if line.startswith("[") and "]" in line:
            lines.append(line.split("] ", 1)[1] if "] " in line else line)
        else:
            lines.append(line)
    return "\n".join(lines)


def organize_transcript_by_chapters(transcript: str, chapters: list[dict]) -> str:
    """Exact port of youtube_handler.py:72-113: forward scan with a
    monotone chapter cursor; ``-1`` lines stay in the current chapter."""
    if not chapters or not transcript:
        return transcript

    parsed_lines = [parse_transcript_line(line) for line in transcript.split("\n")]

    result = []
    current_chapter = 0
    if chapters:
        result.append(f"## {chapters[0]['title']}")

    for time_seconds, text in parsed_lines:
        while (
            current_chapter < len(chapters) - 1
            and time_seconds >= chapters[current_chapter + 1]["start_time"]
        ):
            current_chapter += 1
            result.append(f"\n## {chapters[current_chapter]['title']}")
        result.append(text)

    return "\n".join(result)


def top_comments(comments: list[dict], limit: int = 30) -> list[dict]:
    """youtube_handler.py:144-158: top-level only (parent == 'root'),
    sorted by like_count desc (None→0), first ``limit``. The sort is
    stable, preserving API order among ties — reproduced via a stable
    sort on the negated count."""
    top_level = [c for c in comments if c.get("parent") == "root"]
    return sorted(top_level, key=lambda x: -(x.get("like_count", 0) or 0))[:limit]


# ---------------------------------------------------------------------------
# Ray-Data table analogs

def assign_chapters_ds(
    transcript_lines: ray.data.Dataset, chapters: ray.data.Dataset
) -> ray.data.Dataset:
    """As-of join: each transcript line joins the LAST chapter with
    ``start_time <= start`` of its video (J2, youtube_handler.py:100-104).
    ``-1``-marked lines inherit the running cursor (i.e. the previous
    line's chapter), exactly like the sequential scan.

    Shuffle key: video_id groupby. Within a video, lines are processed
    in ``line_no`` (transcript) order — NOT sorted by start — because
    the reference's cursor walks the transcript in API order and ``-1``
    lines must stay in whatever chapter the cursor is in
    (youtube_handler.py:100-111; SURVEY.md §2.9)."""
    import ray

    chap_df = chapters.to_pandas()  # chapters are tiny (bounded per video)
    chap_ref = ray.put(chap_df)

    def per_video(g: pd.DataFrame) -> pd.DataFrame:
        chap = ray.get(chap_ref)
        vid = g["video_id"].iloc[0]
        ch = chap[chap["video_id"] == vid].sort_values("start_time")
        g = g.sort_values("line_no", kind="mergesort").copy()
        if len(ch) == 0:
            g["chapter_title"] = None
            return g
        # cursor semantics: -1 rows keep the previous assignment
        titles = []
        cur = 0
        starts = ch["start_time"].tolist()
        names = ch["title"].tolist()
        for t in g["start"]:
            while cur < len(starts) - 1 and t >= starts[cur + 1]:
                cur += 1
            titles.append(names[cur])
        g["chapter_title"] = titles
        return g

    return transcript_lines.groupby("video_id").map_groups(
        per_video, batch_format="pandas"
    )


def expand_collections_ds(
    collections: ray.data.Dataset, max_videos: int = 30
) -> ray.data.Dataset:
    """Playlist/channel expansion (S8/S9): one collection row
    ``(collection_id, kind, video_ids: list<string>)`` → ≤ ``max_videos``
    video rows with the watch URL and a stable ``video_index``
    (the reference's ``playlistend=max_videos`` cap + enumerate
    numbering, ``youtube_handler.py:165-204``, ``scraper.py:577``)."""
    import pyarrow as pa

    def expand(batch: pa.Table) -> pa.Table:
        cids, kinds, vids, idxs, urls = [], [], [], [], []
        for cid, kind, ids in zip(
            batch["collection_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["video_ids"].to_pylist(),
        ):
            for i, vid in enumerate((ids or [])[:max_videos]):  # T3 cap
                cids.append(cid)
                kinds.append(kind)
                vids.append(vid)
                idxs.append(i)
                urls.append(f"https://www.youtube.com/watch?v={vid}")
        return pa.table(
            {
                "collection_id": pa.array(cids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "video_id": pa.array(vids, pa.string()),
                "video_index": pa.array(idxs, pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )

    return collections.map_batches(expand, batch_format="pyarrow")


def top_comments_ds(comments: ray.data.Dataset, limit: int = 30) -> ray.data.Dataset:
    """Per-video top-k comments by like_count (T1) — groupby(video_id) +
    stable in-group sort, the distributed form of
    youtube_handler.py:151-156."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["parent"] == "root"].copy()
        g["__lc"] = g["like_count"].fillna(0)
        g = g.sort_values("__lc", ascending=False, kind="mergesort").head(limit)
        return g.drop(columns="__lc")

    return comments.groupby("video_id").map_groups(topk, batch_format="pandas")
