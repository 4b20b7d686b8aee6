"""Grok compiler units (no Spark)."""

import re

import pytest

from llogtail_spark.functions.grok import BASE_PATTERNS, compile_grok, group_names


def test_simple_named_groups():
    rx = compile_grok(r"^%{LOGLEVEL:level} %{WORD:component} %{GREEDYDATA:msg}$")
    m = rx.match("ERROR auth connection failed code=42")
    assert m.group("level") == "ERROR"
    assert m.group("component") == "auth"
    assert m.group("msg") == "connection failed code=42"


def test_unnamed_refs_do_not_capture():
    rx = compile_grok(r"%{LOGLEVEL} %{WORD:c}")
    m = rx.match("WARN db rest")
    assert m.groupdict() == {"c": "db"}


def test_nested_custom_pattern():
    rx = compile_grok(
        r"%{HOSTPORT:hp}", extra={"HOSTPORT": r"%{WORD}:%{INT}"}
    )
    assert rx.match("web1:8080").group("hp") == "web1:8080"


def test_unknown_pattern_raises():
    with pytest.raises(KeyError):
        compile_grok(r"%{NOPE:x}")


def test_group_names_ordered():
    assert group_names(r"%{WORD:a} %{INT:b} %{DATA:c}.") == ["a", "b", "c"]


def test_number_and_ip():
    assert re.fullmatch(BASE_PATTERNS["NUMBER"], "-3.25")
    assert re.fullmatch(BASE_PATTERNS["IP"], "10.0.0.255")
