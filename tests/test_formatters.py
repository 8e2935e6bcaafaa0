"""XML / clean-HTML / YouTube formatters + registry + sinks + config."""

import pandas as pd
import pytest

RECORD = {
    "url": "https://e.x/a/b",
    "title": "Doc & Title",
    "content": '<body><main><h1>H</h1><p>text <a href="u">l</a></p>'
    '<div></div><script>x</script></main></body>',
    "content_html": '<body><main><h1>H</h1><p>text <a href="u">l</a></p></main></body>',
    "og_metadata": {"og_title": "OT", "og_description": "OD", "og_image": "OI"},
    "images": [{"url": "https://e.x/i.png", "alt": "pic", "width": "10", "height": "20"}],
}


def test_xml_envelope_structure():  # xml_formatter.py:104-212
    from web_scraper_ray.kernel.xmlfmt import format_xml

    out = format_xml(RECORD)
    assert out.startswith('<?xml version="1.0" ?>')
    assert "<content>" in out and "<metadata>" in out and "<body>" in out
    assert "<open_graph>" in out and "<title>OT</title>" in out
    # the [document] root quirk is reproduced
    assert "<_document_>" in out
    # skip set removes script
    assert "<script" not in out and "tag_script" not in out
    # text double-escaping quirk reproduced (html.escape then ET escape)
    assert "Doc &amp;amp; Title" in out


def test_xml_empty_element_pruned():
    from web_scraper_ray.kernel.xmlfmt import format_xml

    out = format_xml({**RECORD, "content": "<body><div></div><p>x</p></body>"})
    assert "<div" not in out
    assert ">x</p>" in out or "<p>x</p>" in out


def test_xml_class_attr_rename():  # xml_formatter.py:383-387
    from web_scraper_ray.kernel.xmlfmt import format_xml

    out = format_xml({**RECORD, "content": '<body><p class="c1">x</p></body>'})
    assert 'class_attr="c1"' in out


def test_xml_error_record():  # xml_formatter.py:114-115
    from web_scraper_ray.kernel.xmlfmt import format_xml

    out = format_xml({"url": "u", "title": "T", "content": ""})
    assert out == '<?xml version="1.0" ?>\n<error url="u">T</error>'


def test_xml_images_section():
    from web_scraper_ray.kernel.xmlfmt import format_xml

    out = format_xml(RECORD, include_images=True,
                     image_map={"https://e.x/i.png": "/local/i.png"})
    assert "<images>" in out and "<path>/local/i.png</path>" in out
    out2 = format_xml(RECORD, include_images=True)
    assert "<url>https://e.x/i.png</url>" in out2
    assert 'width="10"' in out2


def test_html_boilerplate_document():  # html_formatter.py:101-183
    from web_scraper_ray.kernel.htmlfmt import format_html

    out = format_html(RECORD)
    assert out.startswith("<!DOCTYPE html>")
    assert "<title>Doc &amp; Title</title>" in out
    assert '<meta property="og:title" content="OT">' in out
    assert ".source-link" in out  # CSS included
    assert 'Source: <a href="https://e.x/a/b"' in out
    assert out.rstrip().endswith("</html>")
    # script removed by the clean pass
    assert "<script>" not in out


def test_html_no_boilerplate():  # html_formatter.py:184-206
    from web_scraper_ray.kernel.htmlfmt import format_html

    out = format_html(RECORD, add_boilerplate=False)
    assert out.startswith("<!-- Title: Doc & Title -->")
    assert "<!-- Source: https://e.x/a/b -->" in out


def test_html_indentation_and_pre():
    from web_scraper_ray.kernel.htmlfmt import _clean_and_format

    out = _clean_and_format(
        "<body><div><p>a</p><pre>x\n  y</pre></div></body>"
    )
    lines = out.split("\n")
    assert any(l.startswith("  <div>") for l in lines)
    assert any(l.startswith("    <p>") for l in lines)
    assert "x\n  y" in out  # pre content preserved verbatim


def test_html_attr_allowlist():
    from web_scraper_ray.kernel.htmlfmt import _clean_and_format

    out = _clean_and_format(
        '<body><p>z</p><a href="u" data-x="1" title="t">l</a></body>'
    )
    assert 'href="u"' in out and 'title="t"' in out and "data-x" not in out


def test_html_single_inline_child_collapse_quirk():
    # bs4 Tag.string forwards through single-element chains, so the
    # reference collapses <body><a>l</a></body> to "<body>l</body>"
    # (html_formatter.py:303-306) — reproduced
    from web_scraper_ray.kernel.htmlfmt import _clean_and_format

    out = _clean_and_format('<body><a href="u">l</a></body>')
    assert out == "<body>l</body>"


def test_html_error_record():  # html_formatter.py:58-59
    from web_scraper_ray.kernel.htmlfmt import format_html

    out = format_html({"url": "u", "title": "T", "content": ""})
    assert out == "<!-- Error fetching content from u -->\n<h1>T</h1>"


# ---------------------------------------------------------------------------
# YouTube


def _yt_video_record():
    transcript = "[0.0s] hello world\n[5.5s] second line\nno timestamp\n[61.0s] in chapter two"
    return {
        "url": "https://www.youtube.com/watch?v=abcdefghijk",
        "youtube_data": {
            "type": "video",
            "video_info": {
                "title": "Vid",
                "channel": "Chan",
                "description": "Desc",
                "comments": [
                    {"author": f"a{i}", "text": f"t{i}", "parent": "root",
                     "like_count": i} for i in range(15)
                ],
            },
            "transcript": transcript,
            "transcript_no_times": "hello world\nsecond line\nno timestamp\nin chapter two",
            "chapters": [
                {"title": "Intro", "start_time": 0.0},
                {"title": "Part Two", "start_time": 60.0},
            ],
            "transcript_by_chapters": None,
        },
    }


def test_youtube_url_classification():  # youtube_handler.py:15-31
    from web_scraper_ray.functions.youtube import identify_youtube_url_type

    assert identify_youtube_url_type("https://www.youtube.com/watch?v=abcdefghijk") == ("video", "abcdefghijk")
    assert identify_youtube_url_type("https://youtu.be/abcdefghijk") == ("video", "abcdefghijk")
    assert identify_youtube_url_type("https://www.youtube.com/playlist?list=PL123") == ("playlist", "PL123")
    assert identify_youtube_url_type("https://www.youtube.com/watch?v=x&list=PL9") == ("playlist", "PL9")
    assert identify_youtube_url_type("https://www.youtube.com/@handle") == ("channel", "@handle")
    assert identify_youtube_url_type("https://www.youtube.com/junk") == ("unknown", "")


def test_transcript_roundtrip():  # youtube_handler.py:44-49,81-90
    from web_scraper_ray.functions.youtube import (
        format_transcript,
        parse_transcript_line,
    )

    entries = [{"start": 1.25, "text": "a"}, {"start": 2.0, "text": "b"}]
    txt = format_transcript(entries)
    assert txt == "[1.2s] a\n[2.0s] b"  # %.1f formatting
    assert parse_transcript_line("[1.2s] a") == (1.2, "a")
    assert parse_transcript_line("plain") == (-1.0, "plain")


def test_organize_by_chapters_cursor():  # youtube_handler.py:72-113
    from web_scraper_ray.functions.youtube import organize_transcript_by_chapters

    rec = _yt_video_record()["youtube_data"]
    out = organize_transcript_by_chapters(rec["transcript"], rec["chapters"])
    lines = out.split("\n")
    assert lines[0] == "## Intro"
    assert "hello world" in out and "in chapter two" in out
    # -1 line stays in current chapter (before Part Two)
    assert out.index("no timestamp") < out.index("## Part Two")
    assert out.index("in chapter two") > out.index("## Part Two")


def test_top_comments_sorting():  # youtube_handler.py:144-158
    from web_scraper_ray.functions.youtube import top_comments

    comments = [
        {"author": "x", "parent": "root", "like_count": 5},
        {"author": "y", "parent": "child", "like_count": 99},
        {"author": "z", "parent": "root", "like_count": None},
        {"author": "w", "parent": "root", "like_count": 7},
    ]
    out = top_comments(comments, limit=2)
    assert [c["author"] for c in out] == ["w", "x"]


def test_youtube_formats():
    from web_scraper_ray.kernel.youtubefmt import format_youtube

    rec = _yt_video_record()
    complete = format_youtube(rec, "complete")
    assert complete.startswith("# Vid")
    assert "## Transcript" in complete and "```" in complete
    assert "## Top Comments" in complete
    assert complete.count("**a") == 10  # display cap 10

    raw = format_youtube(rec, "raw")
    assert raw.startswith("Title: Vid")
    assert "[0.0s]" not in raw  # timestamps stripped

    chapters = format_youtube(rec, "chapters")
    assert "## Intro" in chapters and "## Part Two" in chapters

    assert format_youtube({"url": "u"}, "complete").startswith("# Error: Not YouTube")


def test_youtube_playlist_format():
    from web_scraper_ray.kernel.youtubefmt import format_youtube

    rec = {
        "url": "https://www.youtube.com/playlist?list=PL1",
        "youtube_data": {
            "type": "playlist",
            "videos": [
                {"title": "V1", "channel": "C", "url": "u1", "transcript": "[1.0s] x"},
                {"title": "V2", "channel": "C", "url": "u2", "transcript": ""},
            ],
        },
    }
    md = format_youtube(rec, "complete")
    assert "# YouTube Playlist" in md and "Videos: 2" in md
    assert "1. [V1](u1)" in md and "---" in md
    raw = format_youtube(rec, "raw")
    assert "Video 1:" in raw and "-" * 40 in raw


def test_chapter_assignment_ds(ray_session):
    import ray.data
    from web_scraper_ray.functions.youtube import assign_chapters_ds

    lines = ray.data.from_items(
        [
            {"video_id": "v1", "line_no": 0, "start": 0.0, "text": "a"},
            {"video_id": "v1", "line_no": 1, "start": -1.0, "text": "marker"},
            {"video_id": "v1", "line_no": 2, "start": 65.0, "text": "b"},
            {"video_id": "v2", "line_no": 0, "start": 5.0, "text": "c"},
        ]
    )
    chapters = ray.data.from_items(
        [
            {"video_id": "v1", "start_time": 0.0, "title": "One"},
            {"video_id": "v1", "start_time": 60.0, "title": "Two"},
        ]
    )
    out = assign_chapters_ds(lines, chapters).to_pandas().set_index(["video_id", "line_no"])
    assert out.loc[("v1", 0), "chapter_title"] == "One"
    assert out.loc[("v1", 1), "chapter_title"] == "One"  # -1 keeps cursor
    assert out.loc[("v1", 2), "chapter_title"] == "Two"
    assert out.loc[("v2", 0), "chapter_title"] is None


def test_top_comments_ds(ray_session):
    import ray.data
    from web_scraper_ray.functions.youtube import top_comments_ds

    rows = [
        {"video_id": "v1", "author": "a", "text": "x", "parent": "root", "like_count": 3},
        {"video_id": "v1", "author": "b", "text": "y", "parent": "root", "like_count": 9},
        {"video_id": "v1", "author": "c", "text": "z", "parent": "a", "like_count": 99},
        {"video_id": "v2", "author": "d", "text": "w", "parent": "root", "like_count": None},
    ]
    out = top_comments_ds(ray.data.from_items(rows), limit=1).to_pandas()
    v1 = out[out["video_id"] == "v1"]
    assert list(v1["author"]) == ["b"]
    assert len(out[out["video_id"] == "v2"]) == 1


# ---------------------------------------------------------------------------
# registry / sinks / config


def test_registry_dispatch():
    from web_scraper_ray.formatters import get_extension, get_formatter

    assert get_formatter("markdown")(RECORD).startswith("---")
    assert get_formatter("xml")(RECORD).startswith('<?xml version="1.0" ?>')
    assert get_formatter("raw")(RECORD).startswith("<!DOCTYPE html>")
    assert get_formatter("unknown")(RECORD).startswith("---")  # default markdown
    assert get_extension("markdown") == "md"
    assert get_extension("xml") == "xml"
    assert get_extension("raw") == "html"
    assert get_extension("youtube", "raw") == "txt"
    assert get_extension("youtube", "complete") == "md"


def test_derive_filename_rules():  # outputs.py:90-127
    from web_scraper_ray.sinks import derive_filename

    assert derive_filename(source="https://d.e/a/b", custom_name="pre") == "pre_d.e"
    assert derive_filename(source="notaurl", custom_name="pre") == "pre_notaurl"
    assert derive_filename(custom_name="only") == "only"
    assert derive_filename(source="https://d.e/a/b", title="My Title") == "My_Title"
    assert derive_filename(source="https://d.e/a/b/") == "d.e_a_b"
    assert derive_filename(source="https://d.e") == "d.e_index"
    assert derive_filename() == "contxt_output"
    assert derive_filename(source="https://d.e/a", extension="md").endswith(".md")
    a = derive_filename(source="https://d.e/a", unique_suffix=True)
    b = derive_filename(source="https://d.e/b", unique_suffix=True)
    assert a != b
    assert a == derive_filename(source="https://d.e/a", unique_suffix=True)


def test_format_stage_and_sinks(ray_session, small_corpus, tmp_path):
    import glob

    import ray.data
    from web_scraper_ray.formatters import FormatStage
    from web_scraper_ray.pipelines.flagship import extract_pipeline
    from web_scraper_ray.sinks import combined_single_file, run_stats, write_formatted_files

    extracted = extract_pipeline(f"{small_corpus}/pages")
    formatted = extracted.map_batches(FormatStage("markdown"), batch_format="pandas",
                                      concurrency=2)
    paths = write_formatted_files(formatted, str(tmp_path / "files"), "md")
    assert len(paths) == 120
    assert len(glob.glob(str(tmp_path / "files" / "*.md"))) == 120

    sample = formatted.limit(4)
    combined = combined_single_file(sample, ["url"])
    assert combined.count("=" * 50) == 3

    stats = run_stats(extracted)
    assert stats["successful_urls"] == 120
    assert stats["total_tokens"] > 0
    assert stats["total_images"] == 120  # one img per generated page


def test_config_merge():  # config.py:48-72
    from web_scraper_ray.config import DEFAULT_CONFIG, crawl_config_from, merge_defaults

    merged = merge_defaults({"output": {"print_to_console": False}})
    assert merged["output"]["destination"] == "file"
    assert merged["scraping"]["mode"] == "basic"
    merged2 = merge_defaults({})
    assert merged2 == DEFAULT_CONFIG

    cc = crawl_config_from({"scraping": {"max_depth": 3, "ignore_patterns": ["/x/"]}})
    assert cc.max_depth == 3 and cc.ignore_patterns == ("/x/",)


def test_expand_collections_ds(ray_session):
    import ray.data
    from web_scraper_ray.functions.youtube import expand_collections_ds

    rows = [
        {"collection_id": "PL1", "kind": "playlist",
         "video_ids": [f"vid{i:08d}xyz"[:11] for i in range(40)]},
        {"collection_id": "ch1", "kind": "channel", "video_ids": ["abcdefghijk"]},
        {"collection_id": "PL2", "kind": "playlist", "video_ids": []},
    ]
    out = expand_collections_ds(ray.data.from_items(rows), max_videos=30).to_pandas()
    pl1 = out[out["collection_id"] == "PL1"]
    assert len(pl1) == 30  # T3 cap
    assert list(pl1["video_index"]) == list(range(30))
    assert out[out["collection_id"] == "ch1"]["url"].iloc[0] == \
        "https://www.youtube.com/watch?v=abcdefghijk"
    assert len(out[out["collection_id"] == "PL2"]) == 0


def test_token_stage(ray_session):
    import ray.data
    from web_scraper_ray.stages.token_stage import token_stage

    ds = ray.data.from_items([{"content_html": "<p>" + "abcd" * 25 + "</p>"}])
    out = token_stage(ds, concurrency=1).to_pandas()
    # fallback estimator: len including tags // 4 (scraper.py:426)
    assert out["token_count"].iloc[0] == (100 + 7) // 4


def test_write_jsonl_shards(ray_session, tmp_path):
    """JSONL export: shard count tracks rows_per_shard, every row
    round-trips, manifest counts are exact and atomic."""
    import json
    import os

    import ray.data

    from web_scraper_ray.sinks import write_jsonl_shards

    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(250)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "exp")
    man = write_jsonl_shards(ds, out, rows_per_shard=100)
    assert man["n_rows"] == 250 and man["n_files"] >= 3
    assert sum(man["files"].values()) == 250
    got = []
    for f in sorted(man["files"]):
        with open(os.path.join(out, f)) as fh:
            got += [json.loads(line) for line in fh]
    assert sorted(r["doc_id"] for r in got) == list(range(250))
    assert json.load(open(os.path.join(out, "_manifest.json")))["n_rows"] == 250
    # rerun overwrites cleanly (no stale shard mixing)
    man2 = write_jsonl_shards(ds, out, rows_per_shard=100)
    assert sum(man2["files"].values()) == 250
