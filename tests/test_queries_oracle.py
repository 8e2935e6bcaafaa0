"""Driver emulation: run every __ray_entry__ query at sf0.001 and
compare against its DuckDB oracle — row count, schema (column names),
and order-insensitive values — mirroring CORRECTNESS_r{N}.json."""

import duckdb
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_module(ray_session):
    import __ray_entry__

    return __ray_entry__


def _sql_queries():
    import __ray_entry__

    return sorted(__ray_entry__.oracle_sql().keys())


@pytest.mark.parametrize("name", _sql_queries())
def test_query_matches_oracle(name, entry_module, oracle_con, sf_dir):
    ray_df = _normalize(_to_pandas(entry_module.queries()[name](sf_dir)))
    sql_df = _normalize(oracle_con.execute(entry_module.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} != {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=False,
                                  rtol=1e-9, atol=1e-9)


def test_rows_only_queries_run(entry_module, sf_dir):
    """Every non-SQL query must at least execute and return rows with a
    stable schema (the driver's weaker check)."""
    qs = entry_module.queries()
    sql = set(entry_module.oracle_sql())
    for name, fn in qs.items():
        if name in sql:
            continue
        df = _to_pandas(fn(sf_dir))
        assert df is not None, name
        if len(df) > 0:
            assert len(df.columns) > 0, name


def test_entry_runs(entry_module):
    ds = entry_module.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert "text" in df.columns and "url" in df.columns


def test_no_duplicate_contract_keys():
    """A duplicate key in the queries()/oracle_sql() dict literals is a
    silent bug (later entry wins, the earlier one is unreachable — the
    crawl_budget/crawl_max_pages collision in round 5 shipped shadowed
    until the emulator's row count looked wrong). Scan the AST."""
    import ast
    import collections

    src = open("__ray_entry__.py").read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
                "queries", "oracle_sql"):
            rets = [n for n in ast.walk(node)
                    if isinstance(n, ast.Return)
                    and isinstance(n.value, ast.Dict)]
            names = [k.value for k in rets[-1].value.keys]
            dupes = [n for n, c in collections.Counter(names).items()
                     if c > 1]
            assert not dupes, f"{node.name}: duplicate keys {dupes}"
