"""YouTube output formatter — reproduces
``contxt.formatters.youtube_formatter.YouTubeFormatter``
(`/root/reference/contxt/formatters/youtube_formatter.py:23-380`):
``raw`` / ``complete`` / ``chapters`` styles for single videos and
playlist/channel collections, including the per-style timestamp-strip
variants (SURVEY.md §2.3 M22) and the 10/5-comment display caps (T2).
"""

from __future__ import annotations

from ..functions.youtube import (
    organize_transcript_by_chapters,
    strip_timestamps_find_bracket,
    strip_timestamps_split,
)


def format_youtube(record: dict, format_style: str = "complete") -> str:
    """youtube_formatter.py:23-48."""
    if not record.get("youtube_data"):
        return "# Error: Not YouTube Content\n\nThe provided content is not from YouTube."
    youtube_data = record.get("youtube_data", {})
    content_type = youtube_data.get("type", "unknown")

    if format_style == "raw":
        format_func = _format_raw
    elif format_style == "chapters":
        format_func = _format_chapters
    else:
        format_func = _format_complete

    if content_type == "video":
        return format_func(youtube_data, record["url"])
    elif content_type == "playlist":
        return _format_collection(youtube_data, record["url"], format_func,
                                  format_style, kind="playlist")
    elif content_type == "channel":
        return _format_collection(youtube_data, record["url"], format_func,
                                  format_style, kind="channel")
    return "# Error: Unknown YouTube Content Type\n\nCould not identify the YouTube content type."


def _format_raw(video_data: dict, url: str) -> str:
    """youtube_formatter.py:50-91."""
    if "video_info" in video_data:
        video_info = video_data.get("video_info", {})
        if video_data.get("transcript_no_times"):
            transcript = video_data["transcript_no_times"]
        else:
            transcript = video_data.get("transcript", "No transcript available")
            transcript = strip_timestamps_find_bracket(transcript)
        output = [
            f"Title: {video_info.get('title', 'Unknown Video')}",
            f"Channel: {video_info.get('channel', 'Unknown')}",
            f"URL: {url}",
            "",
            "Transcript:",
            transcript
            if transcript and transcript != "No transcript available"
            else "No transcript available for this video.",
        ]
        return "\n".join(output)
    return _format_video_raw(video_data, video_data.get("url", url))


def _format_video_raw(video: dict, url: str) -> str:
    """youtube_formatter.py:93-125."""
    output = [
        f"Title: {video.get('title', 'Unknown Video')}",
        f"Channel: {video.get('channel', 'Unknown')}",
        f"URL: {url}",
        "",
    ]
    if video.get("transcript_no_times"):
        transcript = video["transcript_no_times"]
    else:
        transcript = video.get("transcript", "")
        if transcript:
            transcript = strip_timestamps_split(transcript)
    if transcript:
        output.append("Transcript:")
        output.append(transcript)
    else:
        output.append("No transcript available for this video.")
    return "\n".join(output)


def _format_complete(video_data: dict, url: str) -> str:
    """youtube_formatter.py:127-173."""
    if "video_info" in video_data:
        video_info = video_data.get("video_info", {})
        transcript = video_data.get("transcript", "No transcript available")
        output = [
            f"# {video_info.get('title', 'Unknown Video')}",
            f"Channel: **{video_info.get('channel', 'Unknown')}**",
            f"URL: [{url}]({url})",
            "",
        ]
        if video_info.get("description"):
            output += ["## Description", video_info["description"], ""]
        output.append("## Transcript")
        if transcript and transcript != "No transcript available":
            output += ["```", transcript, "```"]
        else:
            output.append("*No transcript available for this video.*")
        output.append("")
        if video_info.get("comments"):
            output.append("## Top Comments")
            for comment in video_info["comments"][:10]:  # display cap, T2
                output.append(
                    f"**{comment.get('author', 'Anonymous')}**: {comment.get('text', '')}"
                )
                output.append("")
        return "\n".join(output)
    return _format_video_complete(video_data, video_data.get("url", url))


def _format_video_complete(video: dict, url: str) -> str:
    """youtube_formatter.py:175-211."""
    output = [
        f"## {video.get('title', 'Unknown Video')}",
        f"Channel: **{video.get('channel', 'Unknown')}**",
        f"URL: [{url}]({url})",
        "",
    ]
    if video.get("description"):
        output += ["### Description", video["description"], ""]
    output.append("### Transcript")
    transcript = video.get("transcript", "")
    if transcript:
        output += ["```", transcript, "```"]
    else:
        output.append("*No transcript available for this video.*")
    output.append("")
    if video.get("comments"):
        output.append("### Top Comments")
        for comment in video["comments"][:5]:  # display cap, T2
            output.append(
                f"**{comment.get('author', 'Anonymous')}**: {comment.get('text', '')}"
            )
            output.append("")
    return "\n".join(output)


def _format_chapters(video_data: dict, url: str) -> str:
    """youtube_formatter.py:213-270."""
    if "video_info" in video_data:
        video_info = video_data.get("video_info", {})
        transcript = video_data.get("transcript", "No transcript available")
        chapters = video_data.get("chapters", [])
        output = [
            f"# {video_info.get('title', 'Unknown Video')}",
            f"Channel: **{video_info.get('channel', 'Unknown')}**",
            f"URL: [{url}]({url})",
            "",
        ]
        if video_info.get("description"):
            output += ["## Description", video_info["description"], ""]
        output.append("# Transcript")
        if chapters and transcript and transcript != "No transcript available":
            if video_data.get("transcript_by_chapters"):
                output.append(video_data["transcript_by_chapters"])
            else:
                output.append(organize_transcript_by_chapters(transcript, chapters))
        elif transcript and transcript != "No transcript available":
            output.append("## Full Transcript")
            output.append(strip_timestamps_split(transcript))
        else:
            output.append("*No transcript available for this video.*")
        output.append("")
        return "\n".join(output)
    return _format_video_complete(video_data, video_data.get("url", url))


def _format_collection(data: dict, url: str, format_func, format_style: str,
                       kind: str) -> str:
    """youtube_formatter.py:272-373 (playlist and channel share shape)."""
    videos = data.get("videos", [])
    if kind == "playlist":
        if not videos:
            return (
                f"# YouTube Playlist\n\nURL: [{url}]({url})\n\n*No videos found in this playlist.*"
                if format_style != "raw"
                else f"YouTube Playlist\nURL: {url}\n\nNo videos found in this playlist."
            )
        head_md = "# YouTube Playlist"
        head_raw = "YouTube Playlist"
        list_header = "## Videos in this Playlist"
    else:
        if not videos:
            return (
                f"# YouTube Channel\n\nURL: [{url}]({url})\n\n*No videos found from this channel.*"
                if format_style != "raw"
                else f"YouTube Channel\nURL: {url}\n\nNo videos found from this channel."
            )
        channel_name = videos[0].get("channel", "Unknown Channel")
        head_md = f"# YouTube Channel: {channel_name}"
        head_raw = f"YouTube Channel: {channel_name}"
        list_header = "## Recent Videos"

    output = []
    if format_style == "raw":
        output += [head_raw, f"URL: {url}", f"Videos: {len(videos)}"]
    else:
        output += [head_md, f"URL: [{url}]({url})", f"Videos: {len(videos)}"]
    output.append("")

    if format_style != "raw":
        output.append(list_header)
        for i, video in enumerate(videos):
            output.append(f"{i + 1}. [{video.get('title', 'Unknown')}]({video.get('url', '#')})")
        output.append("")

    for i, video in enumerate(videos):
        if format_style == "raw":
            output.append(f"Video {i + 1}:")
        output.append(format_func(video, video.get("url", "#")))
        if i < len(videos) - 1:
            output.append("-" * 40 if format_style == "raw" else "---")
            output.append("")

    return "\n".join(output)
