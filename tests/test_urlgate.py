"""URL pre-fetch gate (ops/urlgate.py): per-rule kernel checks plus
the filter form. Oracle-parity at corpus scale is covered by the
auto-parametrized tests/test_queries_oracle.py::[url_gate] entry."""

import pandas as pd

from web_scraper_ray.ops.urlgate import (
    BANNED_TOKEN, BLOCKED_HOST, DIGIT_HEAVY, TOO_DEEP, TOO_LONG,
    url_gate, url_gate_filter, url_gate_frame,
)


def _frame(urls):
    return pd.DataFrame({"url": urls})


def test_each_rule_fires_alone():
    df = _frame([
        "https://ok.example.com/a",                    # clean
        "https://bad.example.com/a",                   # blocked host
        "https://ok.example.com/casino-night",         # banned token
        "https://ok.example.com/" + "x" * 200,         # too long
        "https://ok.example.com/" + "d/" * 9 + "p",    # too deep
        "https://ok.example.com/1234567890123",        # digit heavy
    ])
    out = url_gate_frame(
        df, blocked_hosts=frozenset({"bad.example.com"}),
        banned_tokens=("casino",), max_len=100, max_depth=6,
        max_digit_pct=25)
    assert list(out["flags"]) == [
        0, BLOCKED_HOST, BANNED_TOKEN, TOO_LONG, TOO_DEEP, DIGIT_HEAVY]
    assert list(out["kept"]) == [1, 0, 0, 0, 0, 0]
    assert out["host"].iloc[0] == "ok.example.com"


def test_flags_compose_as_bitmask():
    out = url_gate_frame(
        _frame(["https://bad.example.com/casino"]),
        blocked_hosts=frozenset({"bad.example.com"}),
        banned_tokens=("casino",))
    assert out["flags"].iloc[0] == BLOCKED_HOST | BANNED_TOKEN


def test_token_match_is_case_insensitive_and_literal():
    out = url_gate_frame(
        _frame(["https://a.example.com/CASINO", "https://a.example.com/cas.no"]),
        banned_tokens=("casino",))
    assert list(out["flags"]) == [BANNED_TOKEN, 0]  # '.' not a regex dot


def test_filter_form_drops_rows_and_keeps_schema(ray_session):
    import ray.data

    ds = ray.data.from_pandas(_frame([
        "https://ok.example.com/a",
        "https://bad.example.com/b",
    ]))
    kept = url_gate_filter(
        ds, blocked_hosts=frozenset({"bad.example.com"}))
    rows = kept.take_all()
    assert [r["url"] for r in rows] == ["https://ok.example.com/a"]
    assert kept.schema().names == ["url"]


def test_gate_dataset_is_total(ray_session):
    import ray.data

    ds = ray.data.from_pandas(_frame(
        [f"https://h{i}.example.com/p{i}" for i in range(10)]))
    out = url_gate(ds)
    assert out.count() == 10
    assert {"host", "flags", "kept"} <= set(out.schema().names)
