"""C4-style line filtering (ops/lines.py)."""

import pandas as pd

import ray.data

from web_scraper_ray.ops.lines import c4_clean, line_filter_stats


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_line_rules(ray_session):
    doc = ("one two three four five six.\n"      # kept
           "too short.\n"                         # < 5 words
           "no terminal punctuation at all here\n"  # no punct
           "uses javascript so one two three.\n"  # drop token
           'ends in quote one two three four"')   # kept
    got = line_filter_stats(_ds([{"doc_id": 1, "text": doc}])).to_pandas()
    assert got["n_lines"][0] == 5
    assert got["n_kept"][0] == 2
    assert bool(got["kept"][0])
    assert got["clean_text"][0] == (
        'one two three four five six.\nends in quote one two three four"')


def test_doc_level_drops(ray_session):
    rows = [
        {"doc_id": 1, "text": "good line one two three four."},
        {"doc_id": 2, "text": "fine line one two three { four."},  # brace
        {"doc_id": 3, "text": "Lorem Ipsum one two three four."},  # lorem
        {"doc_id": 4, "text": "no lines survive here"},            # 0 kept
        {"doc_id": 5, "text": ""},                                 # empty
    ]
    got = line_filter_stats(_ds(rows)).to_pandas().set_index("doc_id")
    assert got["kept"].to_dict() == {1: True, 2: False, 3: False,
                                     4: False, 5: False}
    clean = c4_clean(_ds(rows)).to_pandas()
    assert list(clean["doc_id"]) == [1]
    assert "kept" not in clean.columns


def test_explicit_rstrip_class(ray_session):
    # trailing explicit whitespace is stripped before the punct test;
    # a line ending in punct + unicode space is NOT rescued (parity
    # with the SQL twin's rtrim char set)
    rows = [{"doc_id": 1, "text": "one two three four five. \t"},
            {"doc_id": 2, "text": "one two three four five. "}]
    got = line_filter_stats(_ds(rows)).to_pandas().set_index("doc_id")
    assert bool(got.loc[1, "kept"]) and not bool(got.loc[2, "kept"])
