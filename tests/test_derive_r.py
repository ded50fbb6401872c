"""DeriveR seam (operators/derive_r.py): security gate, declaration
grammar, env-blocked executable contract — and the live path when an R
installation exists (skipped in this sandbox)."""

import shutil

import pytest

from lynxkite_spark.operators.derive_r import (
    derive_r,
    parse_output_fields,
    r_allowed,
)

HAS_R = shutil.which("Rscript") is not None


def test_output_declaration_grammar():
    assert parse_output_fields(["vs.score: double", "vs.name :character"]) == [
        ("score", "double"), ("name", "character"),
    ]
    assert parse_output_fields(["es.w: vector"]) == [("w", "vector")]
    with pytest.raises(ValueError, match="cannot parse"):
        parse_output_fields(["score double"])
    with pytest.raises(ValueError, match="unknown R output type"):
        parse_output_fields(["vs.x: matrix"])


def test_kite_allow_r_gate(monkeypatch):
    # unset / no → refused; yes → allowed; anything else → hard error
    monkeypatch.delenv("KITE_ALLOW_R", raising=False)
    assert r_allowed() is False
    monkeypatch.setenv("KITE_ALLOW_R", "no")
    assert r_allowed() is False
    monkeypatch.setenv("KITE_ALLOW_R", "yes")
    assert r_allowed() is True
    monkeypatch.setenv("KITE_ALLOW_R", "maybe")
    with pytest.raises(ValueError, match="KITE_ALLOW_R"):
        r_allowed()


def test_disabled_without_optin(spark, monkeypatch):
    monkeypatch.delenv("KITE_ALLOW_R", raising=False)
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(PermissionError, match="security"):
        derive_r(df, "vs$y <- vs$x", ["vs.y: double"])


@pytest.mark.skipif(HAS_R, reason="R present: the env-block path is moot")
def test_env_blocked_contract(spark, monkeypatch):
    monkeypatch.setenv("KITE_ALLOW_R", "yes")
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(EnvironmentError, match="Rscript"):
        derive_r(df, "vs$y <- vs$x", ["vs.y: double"])


@pytest.mark.skipif(not HAS_R, reason="no R installation in this sandbox")
def test_live_r_roundtrip(spark, monkeypatch):
    monkeypatch.setenv("KITE_ALLOW_R", "yes")
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, "c")], "x double, s string"
    )
    out = derive_r(
        df,
        "vs$y <- vs$x * 2\nvs$label <- paste0(vs$s, '!')",
        ["vs.y: double", "vs.label: character"],
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(2.0, "a!"), (4.0, "b!"), (6.0, "c!")]
