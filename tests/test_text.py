"""Text-analysis function units vs hand-computed values."""

import os
import pytest
from pyspark.sql import functions as F

from llogtail_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_features,
    rolling_fingerprint,
    ws_token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on a mat"),
        (2, "der hund und die katze"),
        (3, "foo-bar, baz! qux?"),
        (4, "zzz yyy xxx"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def test_token_counts(docs):
    got = {r["id"]: (r["ws"], r["bpe"]) for r in docs.select(
        "id", ws_token_count("text").alias("ws"),
        bpe_ish_token_count("text").alias("bpe")).collect()}
    assert got[1] == (6, 6)
    # "foo-bar, baz! qux?" -> foo - bar , baz ! qux ?  = 8 BPE-ish
    assert got[3] == (3, 8)


def test_quality_features(docs):
    r = docs.filter("id = 1").select(quality_features("text").alias("q")).first()["q"]
    # words: the cat sat on a mat -> stopwords: the, a => 2/6
    assert r["stop_x10000"] == 3333
    assert r["n_punct"] == 0
    # mean word len = (3+3+3+2+1+3)/6 = 2.5
    assert r["wlen_x100"] == 250
    r3 = docs.filter("id = 3").select(quality_features("text").alias("q")).first()["q"]
    assert r3["n_punct"] == 4  # - , ! ?


def test_lang_id(docs):
    got = {r["id"]: r["l"] for r in docs.select("id", lang_id("text").alias("l")).collect()}
    assert got[1] == "en"   # the, a
    assert got[2] == "de"   # der, und, die
    assert got[4] == "und"  # no markers


def test_rolling_fingerprint_formula(spark):
    df = spark.createDataFrame([(1, "ab cde")], "id int, text string")
    # fp = 1*(31*2+97) + 2*(31*3+99) = 159 + 384 = 543
    assert df.select(rolling_fingerprint("text").alias("fp")).first()["fp"] == 543


def test_fingerprint_position_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "bb aa")], "id int, text string"
    )
    fps = [r["fp"] for r in df.select(rolling_fingerprint("text").alias("fp")).collect()]
    assert fps[0] != fps[1]  # same bag of words, different order


def test_redact_pii_planted_and_matches_duckdb(spark):
    """Planted emails/IPs/phones: counts and the REDACTED STRING must
    agree exactly between Spark (Java regex) and DuckDB (RE2) — the
    patterns are written to the dialect intersection."""
    import duckdb
    import pandas as pd

    from llogtail_spark.functions.text import (
        EMAIL_RX,
        IPV4_RX,
        PHONE_RX,
        pii_count,
        redact_pii,
    )

    rows = [
        (1, "contact bob.smith+x@example.co.uk or alice@test.io now"),
        (2, "server at 10.0.255.3 and 192.168.1.1 rebooted"),
        (3, "call +1-555-0100-123 about ticket"),
        (4, "mixed a@b.io via 8.8.8.8 dial +49-30-1234567 end"),
        (5, "clean text with no pii at all"),
        (6, "v1.2.3 is not an ip, nor is 1.2.3.4.5 a clean one"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = (
        df.select(
            "id",
            pii_count("text", EMAIL_RX).alias("ne"),
            pii_count("text", IPV4_RX).alias("ni"),
            pii_count("text", PHONE_RX).alias("np"),
            redact_pii("text").alias("red"),
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "text"]))
    want = con.execute(f"""
        SELECT id,
               len(regexp_extract_all(text, '{EMAIL_RX}')) AS ne,
               len(regexp_extract_all(text, '{IPV4_RX}')) AS ni,
               len(regexp_extract_all(text, '{PHONE_RX}')) AS np,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{EMAIL_RX}', '<EMAIL>', 'g'),
                   '{IPV4_RX}', '<IP>', 'g'),
                   '{PHONE_RX}', '<PHONE>', 'g') AS red
        FROM t ORDER BY id
    """).df()
    assert got["red"].tolist() == want["red"].tolist()
    for c in ("ne", "ni", "np"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
    # semantic spot checks
    red = dict(zip(got["id"], got["red"]))
    assert red[1] == "contact <EMAIL> or <EMAIL> now"
    assert red[2] == "server at <IP> and <IP> rebooted"
    assert "<PHONE>" in red[3] and "<EMAIL>" in red[4] and "<IP>" in red[4]
    assert red[5] == "clean text with no pii at all"


def test_dup_fraction_repetition_signals(spark):
    """Gopher-style repetition: hand-computed duplicate-token and
    duplicate-bigram fractions, including the empty and single-token
    edge cases."""
    from llogtail_spark.functions.text import dup_fraction_x10000
    from pyspark.sql import functions as F

    rows = [
        (1, "a a a a"),          # 4 toks, 1 distinct -> 7500; 3 bigrams "a a" -> 6666
        (2, "w x y z"),          # all unique -> 0; bigrams unique -> 0
        (3, "spam spam x spam spam"),  # 5 toks 2 distinct -> 6000
        (4, "solo"),             # 1 tok -> 0 dup; no bigrams -> 0
        (5, ""),                 # empty -> all zeros
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    grams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = {
        r["doc_id"]: (r["dt"], r["db"])
        for r in df.select(
            "doc_id",
            dup_fraction_x10000(toks).alias("dt"),
            dup_fraction_x10000(grams).alias("db"),
        ).collect()
    }
    assert got == {
        1: (7500, 6666),
        2: (0, 0),
        3: (6000, 2500),
        4: (0, 0),
        5: (0, 0),
    }


def test_quality_filter_rules_fire_individually(spark, tmp_path):
    """Each gate rule fires on a crafted document and the reasons list
    keeps rule order; a clean doc passes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    long_unique = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, long_unique),                          # clean -> keep
        (2, "short doc"),                          # too_short
        (3, " ".join(["spam"] * 40)),              # repetitive
        (4, long_unique + " mail me a@b.com"),     # pii
        (5, "tiny " + " ".join(["x"] * 9)),        # too_short AND repetitive
    ]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    got = {
        r["doc_id"]: (r["keep"], r["reasons"])
        for r in entry._q_quality_filter_docs(spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, "")
    assert got[2] == (0, "too_short")
    assert got[3] == (0, "repetitive")
    assert got[4] == (0, "pii")
    assert got[5] == (0, "too_short,repetitive")


def test_normalize_text_units_and_duckdb_parity(spark):
    """NFC composition, control deletion, Unicode-space mapping,
    whitespace collapse, trim — and byte-identical output from the
    DuckDB twin on the same adversarial strings."""
    import duckdb

    from llogtail_spark.functions.text import normalize_text, normalize_text_sql

    cases = [
        (1, "étude  x"),          # decomposed accent -> NFC 'étude x'
        (2, "a\x00b\x0bc"),             # controls deleted (incl. \x0B)
        (3, "a b　c"),         # NBSP / ideographic space -> ' '
        (4, "  tab\there\n\nline  "),   # ASCII ws collapse + trim
        (5, " only seps"),    # line/para separators
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(cases, "id int, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text("text").alias("n")).collect()
    }
    assert got[1] == "étude x"
    assert got[2] == "abc"
    assert got[3] == "a b c"
    assert got[4] == "tab here line"
    assert got[5] == "only seps"
    assert got[6] == ""
    assert got[7] is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    want = dict(con.execute(
        f"SELECT id, {normalize_text_sql('text')} FROM t").fetchall())
    assert got == want


def test_normalize_text_single_arrow_eval(spark):
    """Reusing the normalized column for both the text and its length
    must plan ONE ArrowEvalPython (the NFC pass), not one per
    reference — the aliased-expr re-inlining pathology."""
    from llogtail_spark.functions.text import normalize_text

    df = spark.createDataFrame([(1, "x  y")], "id int, text string")
    n = normalize_text("text")
    plan = df.select(
        "id", n.alias("t"), F.length(n).alias("l")
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 1


def test_char_diversity_hand_values(spark):
    """Integer Gini-Simpson: 'aaaa'->0, 'ab'->5000, 'abcd'->7500,
    case-folded, NULL for empty/NULL text."""
    from llogtail_spark.functions.text import char_diversity_bp

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, "AaAa"), (5, ""),
         (6, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["d"] for r in df.select(
        "doc_id", char_diversity_bp("text").alias("d")).collect()}
    assert out == {1: 0, 2: 5000, 3: 7500, 4: 0, 5: None, 6: None}


def test_char_diversity_plan_scan_only(spark):
    """One pass, JVM-only: no Exchange and no Python eval — the
    run-length fold replaces the explode+groupBy a naive version
    would shuffle on."""
    from llogtail_spark.functions.text import char_diversity_bp

    df = spark.range(0, 200).selectExpr(
        "id AS doc_id", "concat('text', id) AS text")
    plan = df.select("doc_id", char_diversity_bp("text").alias("d"))\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_char_diversity_query_single_fold(spark):
    """Regression pin: the driver-contract char_diversity query must
    evaluate the sort+fold exactly once — a post-hoc
    isNotNull(diversity_bp) filter gets pushed below the parallelism
    exchange and re-inlines the whole aggregate (measured 2x)."""
    import __spark_entry__ as entry

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver testdata fixture not present")
    df = entry.queries()["char_diversity"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("aggregate(array_sort") == 1, plan
