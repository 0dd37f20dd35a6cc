"""Unit tests for templating helpers (SURVEY §2 rows 31-33) — pure
Python, no Spark."""

import json

from gluestick_ts_spark.functions.templating import (
    build_string_format_variables,
    format_str_safely,
    get_index_safely,
)


def test_get_index_safely():
    assert get_index_safely([1, 2], 0) == 1
    assert get_index_safely([1, 2], 5) is None
    assert get_index_safely(None, 0) is None


def test_format_str_safely_replaces_truthy_only():
    out = format_str_safely("{tenant}/{flow}/{missing}", {"tenant": "t1", "flow": ""})
    assert out == "t1/{flow}/{missing}"


def test_format_str_safely_never_raises_on_unknown():
    assert format_str_safely("{nope}", {}) == "{nope}"


def test_build_vars_env_and_tenant_split(monkeypatch):
    monkeypatch.setenv("TENANT", "acme_sub1")
    monkeypatch.setenv("FLOW", "f-123")
    v = build_string_format_variables()
    assert v["tenant"] == "acme_sub1"
    assert v["flow"] == "f-123"
    assert v["root_tenant_id"] == "acme"
    assert v["sub_tenant_id"] == "sub1"


def test_build_vars_kwargs_win(monkeypatch):
    monkeypatch.setenv("FLOW", "env-flow")
    v = build_string_format_variables(kwargs={"flow": "kw-flow"})
    assert v["flow"] == "kw-flow"


def test_build_vars_tenant_metadata(tmp_path, monkeypatch):
    cfg = tmp_path / "tenant-config.json"
    cfg.write_text(json.dumps({"hotglue_metadata": {"metadata": {"region": "eu"}}}))
    v = build_string_format_variables(
        use_tenant_metadata=True, snapshot_dir=str(tmp_path)
    )
    assert v["region"] == "eu"
