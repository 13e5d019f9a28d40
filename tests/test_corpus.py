"""Corpus-prep operators: repetition filters, deterministic
splits/samples, sequence packing — hand-built cases plus DuckDB parity
on the documents fixture (same oracle style as the driver gate)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hadoop__spark.operators import corpus
from hadoop__spark.session import load_tables
from tests.conftest import SF_DIR


def _docs(spark):
    return load_tables(spark, SF_DIR)["documents"]


def test_repetition_stats_hand_cases(spark):
    rows = [
        # lines: "a b","a b","x","y" -> 1/4 dup; tokens a b a b x y ->
        # 2/6 dup; 2-grams a_b b_a a_b b_x x_y -> 1/5 dup
        (1, "a b\na b\nx\ny"),
        (2, ""),  # empty: all fractions 0, no NaN/null
        (3, "unique words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r for r in corpus.repetition_stats(df).collect()}
    r1 = got[1]
    assert r1.n_lines == 4 and r1.dup_line_frac == pytest.approx(0.25)
    assert r1.n_tokens == 6 and r1.dup_token_frac == pytest.approx(1.0 / 3.0)
    assert r1.dup_2gram_frac == pytest.approx(0.2)
    r2 = got[2]
    assert r2.n_lines == 0 and r2.n_tokens == 0
    assert r2.dup_line_frac == 0.0 and r2.dup_3gram_frac == 0.0
    r3 = got[3]
    assert r3.dup_token_frac == 0.0 and r3.dup_2gram_frac == 0.0


def test_repetition_stats_duckdb_parity(spark):
    got = {
        r.doc_id: (r.n_tokens, r.dup_token_frac, r.dup_2gram_frac)
        for r in corpus.repetition_stats(_docs(spark)).collect()
    }
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', "
        "'g'), ' +', ' ', 'g'))"
    )
    words = f"list_filter(string_split({norm}, ' '), x -> x <> '')"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        doc_id: (n, dt, d2)
        for doc_id, n, dt, d2 in con.execute(
            f"""
WITH t AS (SELECT doc_id, {words} AS w FROM documents),
g AS (SELECT doc_id, w,
        CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
          i -> array_to_string(list_slice(w, i, i + 1), ' '))
        ELSE [] END AS g2 FROM t)
SELECT doc_id, len(w),
  CASE WHEN len(w) > 0
       THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
       ELSE 0.0 END,
  CASE WHEN len(g2) > 0
       THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
       ELSE 0.0 END
FROM g
"""
        ).fetchall()
    }
    assert set(got) == set(want)
    for doc_id in got:
        gn, gdt, gd2 = got[doc_id]
        wn, wdt, wd2 = want[doc_id]
        assert gn == wn, doc_id
        assert math.isclose(gdt, wdt, rel_tol=0, abs_tol=0), doc_id
        assert math.isclose(gd2, wd2, rel_tol=0, abs_tol=0), doc_id


def test_deterministic_split_stable_and_proportional(spark):
    docs = _docs(spark)
    a = {
        (r.doc_id, r.split)
        for r in corpus.deterministic_split(docs).select("doc_id", "split").collect()
    }
    # invariant under physical layout: repartition must not move a row
    b = {
        (r.doc_id, r.split)
        for r in corpus.deterministic_split(docs.repartition(7))
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    by_split = {}
    for _, s in a:
        by_split[s] = by_split.get(s, 0) + 1
    n = sum(by_split.values())
    assert 0.8 <= by_split["train"] / n <= 0.97
    assert by_split.get("val", 0) > 0 and by_split.get("test", 0) > 0
    # a different salt derives an independent split (some rows move)
    c = {
        (r.doc_id, r.split)
        for r in corpus.deterministic_split(docs, salt="split-v2")
        .select("doc_id", "split")
        .collect()
    }
    assert c != a


def test_deterministic_split_validates_fractions(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="sum to 1"):
        corpus.deterministic_split(docs, splits={"a": 0.5, "b": 0.1})


def test_deterministic_sample_nested_and_duckdb_parity(spark):
    docs = _docs(spark)
    s10 = {r.doc_id for r in corpus.deterministic_sample(docs, 0.10).collect()}
    s50 = {r.doc_id for r in corpus.deterministic_sample(docs, 0.50).collect()}
    assert s10 <= s50, "samples at one salt must be nested"
    n = docs.count()
    assert 0.02 * n <= len(s10) <= 0.2 * n
    # cross-engine: DuckDB computes the identical membership
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    threshold = corpus._hex_threshold(0.10)
    want = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents "
            f"WHERE md5(CAST(doc_id AS VARCHAR) || 'sample-v1') < '{threshold}'"
        ).fetchall()
    }
    assert s10 == want


def test_pack_sequences_hand_case(spark):
    rows = [(1, 3), (2, 5), (3, 4), (4, 0), (5, 2)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_tokens BIGINT")
    got = {
        r.doc_id: (r.offset, r.pack_id, r.pack_pos, r.n_packs)
        for r in corpus.pack_sequences(df, seq_len=4).collect()
    }
    # stream: d1 [0,3) d2 [3,8) d3 [8,12) d4 [12,12) d5 [12,14)
    assert got[1] == (0, 0, 0, 1)
    assert got[2] == (3, 0, 3, 2)  # straddles windows 0 and 1
    assert got[3] == (8, 2, 0, 1)
    assert got[4] == (12, 3, 0, 0)  # empty doc spans no window
    assert got[5] == (12, 3, 0, 1)


def test_pack_sequences_invariants_and_duckdb_parity(spark):
    from hadoop__spark.operators import text

    counts = text.token_stats(_docs(spark)).select("doc_id", "n_tokens")
    packed = corpus.pack_sequences(counts, seq_len=256)
    rows = sorted(packed.collect(), key=lambda r: r.doc_id)
    # offsets are the exclusive prefix sum in doc_id order
    run = 0
    for r in rows:
        assert r.offset == run, f"offset drift at doc {r.doc_id}"
        assert 0 <= r.pack_pos < 256
        assert r.pack_id == r.offset // 256
        run += r.n_tokens
    # window-function oracle (fine at oracle scale; the operator itself
    # avoids the single-task global window)
    con = duckdb.connect()
    pdf = counts.toPandas()
    con.register("counts", pdf)
    want = {
        (doc_id, off, pack_id)
        for doc_id, off, pack_id in con.execute(
            """
WITH c AS (
  SELECT doc_id,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM counts)
SELECT doc_id, CAST(off AS BIGINT) AS off,
       CAST(floor(off / 256) AS BIGINT) AS pack_id
FROM c
"""
        ).fetchall()
    }
    got = {(r.doc_id, r.offset, r.pack_id) for r in rows}
    assert got == want


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, 3)], "doc_id BIGINT, n_tokens BIGINT")
    with pytest.raises(ValueError, match="seq_len"):
        corpus.pack_sequences(df, seq_len=0)


def test_redact_pii_hand_cases(spark):
    rows = [
        (1, "mail me at jane.doe+x@corp-site.co.uk or visit https://ex.io/a?b=1"),
        (2, "server 10.0.255.3 answered; call +1 (555) 123-4567 now"),
        (3, "clean text with no pii at all"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r for r in corpus.redact_pii(df).collect()}
    r1 = got[1]
    assert r1.n_email == 1 and r1.n_url == 1 and r1.n_pii == 2
    assert "[EMAIL]" in r1.text_redacted and "[URL]" in r1.text_redacted
    assert "jane.doe" not in r1.text_redacted and "ex.io" not in r1.text_redacted
    r2 = got[2]
    assert r2.n_ipv4 == 1 and r2.n_phone >= 1
    assert "[IPV4]" in r2.text_redacted and "[PHONE]" in r2.text_redacted
    assert "555" not in r2.text_redacted
    r3 = got[3]
    assert r3.n_pii == 0 and r3.text_redacted == r3.text
    assert got[4].n_pii == 0


def test_redact_pii_no_double_count_on_overlap(spark):
    """A span consumed by an earlier pattern must not count again under
    a later one: the digits inside a URL are not also a phone run, and
    n_pii equals the number of replacement tokens in the output."""
    df = spark.createDataFrame(
        [(1, "book via https://a.b/call?tel=5551234567 thanks")],
        "doc_id BIGINT, text STRING",
    )
    r = corpus.redact_pii(df).collect()[0]
    assert r.n_url == 1 and r.n_phone == 0 and r.n_pii == 1
    assert r.text_redacted == "book via [URL] thanks"


def test_redact_pii_duckdb_parity(spark):
    """The patterns live in the Java-regex ∩ RE2 subset: DuckDB must
    count and redact identically on the same rows."""
    rows = [
        (1, "a@b.io and c.d@e-f.org wrote https://x.y/z"),
        (2, "ping 192.168.0.1 then 8.8.8.8, fax +44 20 7946 0958"),
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: (r.n_email, r.n_url, r.n_ipv4, r.n_phone, r.text_redacted)
        for r in corpus.redact_pii(df).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql_redacted = "text"
    selects = []
    for kind, pat in corpus.PII_PATTERNS.items():
        # counts run against the progressively redacted text, exactly
        # like the Spark implementation
        selects.append(
            f"len(regexp_extract_all({sql_redacted}, '{pat}')) AS n_{kind}"
        )
        sql_redacted = (
            f"regexp_replace({sql_redacted}, '{pat}', '[{kind.upper()}]', 'g')"
        )
    want = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            f"SELECT doc_id, {', '.join(selects)}, {sql_redacted} FROM t"
        ).fetchall()
    }
    assert got == want


def test_contamination_report_duckdb_parity(spark):
    """Per-doc benchmark n-gram overlap must equal a from-first-
    principles DuckDB recomputation on the fixture documents, with the
    benchmark carved from the corpus itself (every 17th doc)."""
    docs = load_tables(spark, SF_DIR)["documents"]
    bench = docs.where(F.col("doc_id") % 17 == 0)
    got = {
        r.doc_id: (r.n_shingles, r.n_hits, round(r.overlap_frac, 12))
        for r in corpus.contamination_report(docs, bench, n=3).collect()
    }
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
        " ' +', ' ', 'g'))"
    )
    words = f"list_filter(string_split({norm}, ' '), x -> x <> '')"
    sh3 = (
        "list_distinct(CASE WHEN len(w) >= 3 THEN "
        "list_transform(range(1, len(w) - 1), i -> "
        "array_to_string(list_slice(w, i, i + 2), ' ')) "
        "ELSE [array_to_string(w, ' ')] END)"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        row[0]: (row[1], row[2], round(row[3], 12))
        for row in con.execute(
            f"""
WITH t AS (SELECT doc_id, {words} AS w FROM documents),
sh AS (SELECT doc_id, unnest({sh3}) AS s FROM t),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
hits AS (
  SELECT sh.doc_id, COUNT(*) AS h FROM sh JOIN bench USING (s)
  GROUP BY sh.doc_id
)
SELECT sizes.doc_id, sizes.n, COALESCE(hits.h, 0),
       CAST(COALESCE(hits.h, 0) AS DOUBLE) / sizes.n
FROM sizes LEFT JOIN hits ON sizes.doc_id = hits.doc_id
"""
        ).fetchall()
    }
    assert got == want and len(got) > 0
    # benchmark docs are fully contaminated against themselves
    assert all(
        got[d][2] == 1.0 for d in got if d % 17 == 0
    ), "benchmark members must self-overlap completely"


def test_decontaminate_drops_flagged_keeps_rest(spark):
    """decontaminate removes exactly the docs above max_overlap and
    keeps shingle-less docs (nothing to leak)."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),   # shares 'alpha beta gamma'
        (3, "totally unrelated words here"),
        (4, ""),                            # no shingles -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id BIGINT, text STRING"
    )
    kept = {r.doc_id for r in corpus.decontaminate(df, bench).collect()}
    assert kept == {3, 4}
    # permissive threshold keeps partial overlap: docs 1 and 2 share
    # 1 of their 2 shingles with the benchmark (overlap 0.5 <= 0.9)
    kept_loose = {
        r.doc_id
        for r in corpus.decontaminate(df, bench, max_overlap=0.9).collect()
    }
    assert kept_loose == {1, 2, 3, 4}


def test_decontaminate_self_removes_everything(spark):
    """Decontaminating a corpus against itself drops every document
    with real content; empty/whitespace-only docs are KEPT (nothing to
    leak) even when the benchmark also contains empty rows — the ""
    fallback shingle never counts as contamination."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "totally unrelated words here"),
        (3, ""),
        (4, "   \n  "),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    kept = {r.doc_id for r in corpus.decontaminate(df, df).collect()}
    assert kept == {3, 4}


def test_redact_pii_composes_with_streaming(spark, tmp_path):
    """redact_pii is a pure projection, so it must run unchanged on a
    stream: replaying the documents fixture through readStream with the
    redaction applied equals the batch output row-for-row."""
    import os
    import shutil

    from hadoop__spark import streaming

    src = os.path.join(SF_DIR, "documents.parquet")
    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    batch = load_tables(spark, SF_DIR)["documents"]
    want = {
        (r.doc_id, r.text_redacted, r.n_pii)
        for r in corpus.redact_pii(batch).collect()
    }
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(str(d))
    streaming.run_stream_to_memory(
        corpus.redact_pii(stream).select("doc_id", "text_redacted", "n_pii"),
        "redact_stream",
        output_mode="append",
    )
    got = {
        (r.doc_id, r.text_redacted, r.n_pii)
        for r in spark.table("redact_stream").collect()
    }
    assert got == want and len(got) > 0


def test_stratified_sample_per_group_and_duckdb_parity(spark):
    """Per-group fractions apply independently with the same
    engine-portable md5 membership rule; unlisted groups keep
    default_fraction; nested across a weight raise."""
    docs = _docs(spark).withColumn(
        "src", (F.col("doc_id") % 3).cast("string")
    )
    fr = {"0": 1.0, "1": 0.2}
    got = {
        r.doc_id
        for r in corpus.stratified_deterministic_sample(
            docs, fr, group_col="src"
        ).collect()
    }
    # group 0 fully kept, group 2 (unlisted) fully dropped
    all_ids = {r.doc_id for r in docs.collect()}
    assert {i for i in all_ids if i % 3 == 0} <= got
    assert not {i for i in got if i % 3 == 2}
    # raising group 1's weight only adds documents (nested samples)
    more = {
        r.doc_id
        for r in corpus.stratified_deterministic_sample(
            docs, {"0": 1.0, "1": 0.6}, group_col="src"
        ).collect()
    }
    assert got <= more
    # cross-engine membership parity for the fractional group
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    t = corpus._hex_threshold(0.2)
    want_g1 = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id % 3 = 1 "
            f"AND md5(CAST(doc_id AS VARCHAR) || 'mix-v1') < '{t}'"
        ).fetchall()
    }
    assert {i for i in got if i % 3 == 1} == want_g1


def test_cluster_keepers_quality_argmax(spark):
    """Highest score wins the cluster; score ties fall to the smallest
    id; singleton clusters keep their only member."""
    from hadoop__spark.operators import dedup

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id BIGINT, cluster_id BIGINT",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.7), (6, 0.7)],
        "doc_id BIGINT, quality_score DOUBLE",
    )
    got = {
        r.cluster_id: (r.doc_id, r.quality_score)
        for r in dedup.cluster_keepers(clusters, scores).collect()
    }
    assert got == {1: (2, 0.9), 4: (4, 0.1), 5: (5, 0.7)}
    # string ids (URL/UUID corpora) work identically — the argmax is a
    # min over struct(-score, id), no id arithmetic (round-7: the old
    # negated-id tie-break required numeric ids); ties fall to the
    # LEXICOGRAPHIC minimum for strings
    s_clusters = clusters.withColumn(
        "doc_id", F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    )
    s_scores = scores.withColumn(
        "doc_id", F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    )
    s_got = {
        r.cluster_id: (r.doc_id, r.quality_score)
        for r in dedup.cluster_keepers(s_clusters, s_scores).collect()
    }
    assert s_got == {1: ("u2", 0.9), 4: ("u4", 0.1), 5: ("u5", 0.7)}


def test_prepare_corpus_chain(spark):
    """The one-call prep chain equals its stages run by hand: same
    surviving ids, redaction columns present, repetition-filtered,
    deduped, split assigned."""
    from hadoop__spark.operators.dedup import dedup_corpus

    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    got = corpus.prepare_corpus(docs, benchmark=bench)
    rows = got.collect()
    assert rows, "chain must keep some documents"
    cols = set(got.columns)
    assert {"text_redacted", "n_pii", "split", "dup_token_frac"} <= cols

    # by-hand chain for the surviving-id set
    clean = corpus.decontaminate(docs, bench)
    stats = corpus.repetition_stats(clean).select("doc_id", "dup_token_frac")
    kept = clean.join(stats, "doc_id").where(F.col("dup_token_frac") <= 0.6)
    want = {
        r.doc_id for r in dedup_corpus(kept, method="fingerprint").collect()
    }
    assert {r.doc_id for r in rows} == want
    # split assignment matches the standalone operator (same salt)
    split_want = {
        (r.doc_id, r.split)
        for r in corpus.deterministic_split(docs).select("doc_id", "split").collect()
        if r.doc_id in want
    }
    assert {(r.doc_id, r.split) for r in rows} == split_want


def test_prepare_corpus_full_chain_equals_piecewise(spark):
    """The fully-wired one-call chain (line_dedup stage + quality-score
    passthrough to minhash cluster keepers) equals the same stages run
    by hand from the tested primitives — the r5-verdict integration
    gap, closed."""
    from hadoop__spark.operators import dedup, text as text_ops

    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    scores = text_ops.quality_score(docs).select("doc_id", "quality_score")
    got = corpus.prepare_corpus(
        docs,
        benchmark=bench,
        line_dedup=True,
        dedup_method="minhash",
        scores=scores,
    )
    got_rows = {(r.doc_id, r.text, r.split) for r in got.collect()}
    assert got_rows, "chain must keep some documents"

    # by hand: decontaminate -> line-dedup the text -> redact ->
    # repetition filter -> score-aware minhash dedup -> split
    clean = corpus.decontaminate(docs, bench)
    ld = dedup.line_dedup(clean, "text", "doc_id").select(
        F.col("doc_id").alias("_i"), "text_deduped"
    )
    swapped = (
        clean.drop("text")
        .join(ld, F.col("doc_id") == F.col("_i"))
        .withColumnRenamed("text_deduped", "text")
        .drop("_i")
    )
    red = corpus.redact_pii(swapped, "text")
    stats = corpus.repetition_stats(red.select("doc_id", "text")).select(
        "doc_id", "dup_token_frac"
    )
    kept = red.join(stats, "doc_id").where(F.col("dup_token_frac") <= 0.6)
    surv = dedup.dedup_corpus(
        kept, method="minhash", scores=scores
    )
    want_rows = {
        (r.doc_id, r.text, r.split)
        for r in corpus.deterministic_split(surv).collect()
    }
    assert got_rows == want_rows


def test_prepare_corpus_non_default_id_col(spark):
    """prepare_corpus with renamed id/text columns survives end-to-end
    (ADVICE r5: repetition_stats hardcoded doc_id) and keeps the same
    documents as the default-named run."""
    docs = _docs(spark)
    want = {r.doc_id for r in corpus.prepare_corpus(docs).collect()}
    renamed = docs.withColumnRenamed("doc_id", "dkey").withColumnRenamed(
        "text", "body"
    )
    got = corpus.prepare_corpus(renamed, text_col="body", id_col="dkey")
    assert {r.dkey for r in got.collect()} == want and len(want) > 0


def test_prepare_corpus_materialized_equals_lazy(spark, tmp_path):
    """materialize_dir writes each stage boundary as a parquet table
    and re-reads it — identical output to the fully lazy chain, with
    the boundary tables actually on disk (the 100 TB resume points)."""
    import os

    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    want = {
        (r.doc_id, r.text, r.split)
        for r in corpus.prepare_corpus(
            docs, benchmark=bench, line_dedup=True
        ).collect()
    }
    mdir = str(tmp_path / "stages")
    got = {
        (r.doc_id, r.text, r.split)
        for r in corpus.prepare_corpus(
            docs, benchmark=bench, line_dedup=True, materialize_dir=mdir
        ).collect()
    }
    assert got == want and len(want) > 0
    for stage in ("decontaminated", "line_deduped", "filtered", "deduped"):
        assert os.path.isdir(os.path.join(mdir, stage)), stage


def test_select_token_budget_quality_ordered(spark):
    """Budget selection == the Python reference greedy (sort by score
    desc then id, exact integer prefix sums), is layout-invariant, and
    plans through the range-partitioned prefix-sum (no global
    window)."""
    from hadoop__spark.operators import text as text_ops

    docs = _docs(spark)
    scored = text_ops.quality_score(docs).select(
        "doc_id", "n_tokens", "quality_score"
    )
    BUDGET = 30_000
    sel = corpus.select_token_budget(
        scored, BUDGET, score_col="quality_score"
    )
    got = {(r.doc_id, r.cum_tokens) for r in sel.collect()}

    rows = sorted(
        scored.collect(), key=lambda r: (-r.quality_score, r.doc_id)
    )
    want, run = set(), 0
    for r in rows:
        run += r.n_tokens
        if run > BUDGET:
            break
        want.add((r.doc_id, run))
    assert got == want and len(want) > 0
    # layout invariance
    got2 = {
        (r.doc_id, r.cum_tokens)
        for r in corpus.select_token_budget(
            scored.repartition(7), BUDGET, score_col="quality_score"
        ).collect()
    }
    assert got2 == got
    # unscored mode falls back to id order (the pp01 shape)
    by_id = corpus.select_token_budget(scored, BUDGET)
    run, want_id = 0, set()
    for r in sorted(scored.collect(), key=lambda r: r.doc_id):
        run += r.n_tokens
        if run > BUDGET:
            break
        want_id.add((r.doc_id, run))
    assert {(r.doc_id, r.cum_tokens) for r in by_id.collect()} == want_id
    # plan: distributed prefix-sum, not a single-task global window
    plan = sel._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan
    with pytest.raises(ValueError, match="budget"):
        corpus.select_token_budget(scored, -1)


def test_cap_per_group_duckdb_parity_and_nesting(spark):
    """Unscored per-source cap must match DuckDB's row_number rank on
    the documents fixture, and raising the cap must only ADD documents
    (the nesting property the docstring promises)."""
    docs = _docs(spark)
    got3 = {r.doc_id for r in corpus.cap_per_group(docs, "source", 3).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want3 = {
        r[0]
        for r in con.execute(
            """
SELECT doc_id FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents) WHERE rn <= 3
"""
        ).fetchall()
    }
    assert got3 == want3 and len(got3) > 0
    got5 = {r.doc_id for r in corpus.cap_per_group(docs, "source", 5).collect()}
    assert got3 <= got5


def test_cap_per_group_scored_order_and_rank(spark):
    """With scores, the cap keeps the best-scoring k per group (ties by
    ascending id, null scores last) and rank_out exposes the 1-based
    within-group rank."""
    rows = [
        (1, "a", 0.9), (2, "a", 0.5), (3, "a", 0.9), (4, "a", None),
        (5, "b", 0.1), (6, "b", 0.7),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, s DOUBLE")
    got = {
        (r.doc_id, r.rk)
        for r in corpus.cap_per_group(
            df, "src", 2, score_col="s", rank_out="rk"
        ).collect()
    }
    # group a: 0.9@1 then 0.9@3 (id tie-break); null ranks last, cut
    # group b: 0.7@6 then 0.1@5
    assert got == {(1, 1), (3, 2), (6, 1), (5, 2)}
    with pytest.raises(ValueError, match="k must be positive"):
        corpus.cap_per_group(df, "src", 0)


def test_keep_top_fraction_exact_on_small_input(spark):
    """At sketch accuracy >> n the approximate quantile is exact: the
    survivors of keep_frac are precisely the rows at or above the true
    cutoff, ties at the cutoff all survive, null scores never do."""
    rows = [(i, float(i)) for i in range(1, 11)] + [(11, None), (12, 8.0)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, quality_score DOUBLE")
    got = {
        r.doc_id for r in corpus.keep_top_fraction(df, 0.3).collect()
    }
    # 11 non-null scores [1..10, 8.0]; 0.7-quantile = 8.0 -> survivors
    # are scores >= 8.0 including BOTH ties at 8.0
    assert got == {8, 9, 10, 12}
    # keep everything: all non-null survive, null never does
    all_kept = {r.doc_id for r in corpus.keep_top_fraction(df, 1.0).collect()}
    assert all_kept == {i for i in range(1, 11)} | {12}
    # keep_frac=0 degenerates to the max-score ties
    top = {r.doc_id for r in corpus.keep_top_fraction(df, 0.0).collect()}
    assert top == {10}
    with pytest.raises(ValueError, match="keep_frac"):
        corpus.keep_top_fraction(df, 1.5)


def test_keep_top_fraction_on_fixture_quality(spark):
    """Composition with the quality scorer on the documents fixture:
    the kept share lands near keep_frac and every survivor outscores
    every dropped document (up to cutoff ties)."""
    from hadoop__spark.operators.text import quality_score

    docs = _docs(spark)
    scored = quality_score(docs).select("doc_id", "quality_score")
    n = scored.count()
    kept = corpus.keep_top_fraction(scored, 0.25)
    nk = kept.count()
    assert 0.2 * n <= nk <= 0.35 * n, (nk, n)
    min_kept = kept.agg(F.min("quality_score")).first()[0]
    dropped_above = scored.join(
        kept.select("doc_id"), "doc_id", "left_anti"
    ).where(F.col("quality_score") > min_kept)
    assert dropped_above.count() == 0


def test_prepare_corpus_quality_gate_and_group_cap(spark):
    """The keep_frac quantile gate and per-source cap stages must equal
    the piecewise composition (repetition filter -> keep_top_fraction
    semi-join -> cap_per_group best-scored -> fingerprint dedup ->
    split), and keep_frac without scores must refuse."""
    from hadoop__spark.operators import dedup, text as text_ops

    docs = _docs(spark)
    scores = text_ops.quality_score(docs).select("doc_id", "quality_score")
    got = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs,
            redact=False,
            keep_frac=0.5,
            group_cap=("source", 4),
            scores=scores,
        ).collect()
    }

    stats = corpus.repetition_stats(docs).select("doc_id", "dup_token_frac")
    kept = docs.join(stats, "doc_id").where(F.col("dup_token_frac") <= 0.6)
    # the gate's quantile is over the SURVIVORS' scores (round-7
    # semantics), so the piecewise composition semi-joins first
    surv_scores = scores.join(kept.select("doc_id"), "doc_id", "left_semi")
    q_ids = corpus.keep_top_fraction(surv_scores, 0.5).select("doc_id")
    kept = kept.join(q_ids, "doc_id", "left_semi")
    slim = kept.select("doc_id", "source").join(scores, "doc_id", "left")
    cap_ids = corpus.cap_per_group(
        slim, "source", 4, score_col="quality_score"
    ).select("doc_id")
    kept = kept.join(cap_ids, "doc_id", "left_semi")
    want = {
        r.doc_id for r in dedup.dedup_corpus(kept, method="fingerprint").collect()
    }
    assert got == want and got, "stage wiring must match the primitives"
    # the cap must actually bind: no source keeps more than 4 docs
    per_src = (
        corpus.prepare_corpus(
            docs, redact=False, keep_frac=0.5,
            group_cap=("source", 4), scores=scores,
        )
        .groupBy("source").count().agg(F.max("count")).first()[0]
    )
    assert per_src <= 4
    with pytest.raises(ValueError, match="scores"):
        corpus.prepare_corpus(docs, keep_frac=0.5)


def test_prepare_corpus_simhash_route_and_dedup_kwargs(spark):
    """Round-7: prepare_corpus routes the new dedup_corpus methods and
    forwards pair-generator knobs via dedup_kwargs — equal to the
    piecewise composition."""
    from hadoop__spark.operators import dedup

    docs = _docs(spark)
    got = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs,
            redact=False,
            dedup_method="simhash",
            dedup_kwargs={"max_hamming": 3},
        ).collect()
    }
    stats = corpus.repetition_stats(docs).select("doc_id", "dup_token_frac")
    kept = docs.join(stats, "doc_id").where(F.col("dup_token_frac") <= 0.6)
    want = {
        r.doc_id
        for r in dedup.dedup_corpus(
            kept, method="simhash", max_hamming=3
        ).collect()
    }
    assert got == want and got


def test_shuffle_key_deterministic_and_feeds_packing(spark):
    """shuffle_key is a stable pseudo-random permutation: identical
    across runs/partitionings, different under a different salt, and
    usable as pack_sequences' order_col."""
    docs = _docs(spark).select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    a = {(r.doc_id, r.shuffle_key) for r in corpus.shuffle_key(docs).collect()}
    b = {
        (r.doc_id, r.shuffle_key)
        for r in corpus.shuffle_key(docs.repartition(7)).collect()
    }
    assert a == b
    c = {(r.doc_id, r.shuffle_key) for r in corpus.shuffle_key(docs, salt="epoch-2").collect()}
    assert {k for k, _ in c} == {k for k, _ in a} and c != a
    packed = corpus.pack_sequences(
        corpus.shuffle_key(docs), seq_len=512, order_col="shuffle_key"
    )
    rows = sorted(packed.collect(), key=lambda r: r.shuffle_key)
    # offsets follow the shuffled order exactly
    run = 0
    for r in rows:
        assert r.offset == run, (r.doc_id, r.offset, run)
        run += r.n_tokens


def test_corpus_stats_sketch_merge_equals_single_pass(spark):
    """Sharded accounting must be lossless: sketches built on two
    halves and merged give EXACTLY the single-pass estimates (HLL
    union is a per-register max), counts add exactly, and estimates
    sit within HLL error of the true distinct counts."""
    docs = _docs(spark)
    whole = {
        r.source: r
        for r in corpus.corpus_stats(docs).collect()
    }
    h1 = corpus.corpus_stats_sketch(docs.where(F.col("doc_id") % 2 == 0))
    h2 = corpus.corpus_stats_sketch(docs.where(F.col("doc_id") % 2 == 1))
    merged = {
        r.source: r
        for r in corpus.corpus_stats(
            corpus.merge_corpus_stats(h1.unionByName(h2)),
            from_sketches=True,
        ).collect()
    }
    assert set(whole) == set(merged) and whole
    for src, w in whole.items():
        m = merged[src]
        assert (w.n_docs, w.n_tokens) == (m.n_docs, m.n_tokens), src
        assert w.distinct_content_est == m.distinct_content_est, src
        assert w.vocab_est == m.vocab_est, src
    # accuracy vs exact ground truth (lgk=12 -> ~1.6% rel. std error)
    from hadoop__spark.operators.text import normalized

    exact = {
        r.source: (r.nd, r.nfp)
        for r in docs.groupBy("source")
        .agg(
            F.count("doc_id").alias("nd"),
            F.countDistinct(F.md5(normalized(F.col("text")))).alias("nfp"),
        )
        .collect()
    }
    for src, (nd, nfp) in exact.items():
        w = whole[src]
        assert w.n_docs == nd
        assert abs(w.distinct_content_est - nfp) <= max(2, 0.05 * nfp), src


def test_corpus_stats_tokenless_group_vocab_zero(spark):
    """A group whose documents hold no tokens reports vocab_est 0 (not
    null), directly and through a sharded merge where one shard's
    sketch is null."""
    df = spark.createDataFrame(
        [(1, "", "empty"), (2, "   ", "empty"), (3, "hello world", "ok")],
        "doc_id LONG, text STRING, source STRING",
    )
    direct = {r.source: r.vocab_est for r in corpus.corpus_stats(df).collect()}
    assert direct == {"empty": 0, "ok": 2}
    h1 = corpus.corpus_stats_sketch(df.where("doc_id <= 2"))
    h2 = corpus.corpus_stats_sketch(df.where("doc_id = 3"))
    merged = {
        r.source: r.vocab_est
        for r in corpus.corpus_stats(
            corpus.merge_corpus_stats(h1.unionByName(h2)), from_sketches=True
        ).collect()
    }
    assert merged == direct


def test_prepare_corpus_semantic_stage_equals_piecewise(spark):
    """The optional semantic-dedup stage must equal running
    semantic_dedup by hand on the text-dedup survivors' embeddings,
    and documents without an embedding row must pass through."""
    from hadoop__spark.operators import dedup
    from hadoop__spark.session import load_tables

    docs = _docs(spark)
    # treat the embeddings fixture as document embeddings (same id range)
    embs = (
        load_tables(spark, SF_DIR)["embeddings"]
        .select(F.col("vec_id").alias("doc_id"), "embedding")
        .where(F.col("doc_id") % 3 != 0)  # a third of docs unembedded
    )
    got = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs,
            redact=False,
            embeddings=embs,
            semantic_threshold=0.4,
        ).collect()
    }

    # by hand: filter -> fingerprint dedup -> semantic dedup on the
    # survivors' embeddings -> drop the semantically-deduped ids
    stats = corpus.repetition_stats(docs).select("doc_id", "dup_token_frac")
    kept = docs.join(stats, "doc_id").where(F.col("dup_token_frac") <= 0.6)
    surv = dedup.dedup_corpus(kept, method="fingerprint")
    emb_surv = embs.join(surv.select("doc_id"), "doc_id", "left_semi")
    sem_kept = {
        r.doc_id
        for r in dedup.semantic_dedup(
            emb_surv, vec_col="embedding", id_col="doc_id", threshold=0.4
        ).collect()
    }
    emb_ids = {r.doc_id for r in emb_surv.select("doc_id").collect()}
    want = {
        r.doc_id
        for r in surv.select("doc_id").collect()
        if r.doc_id not in emb_ids or r.doc_id in sem_kept
    }
    assert got == want and got
    assert emb_ids - sem_kept, "semantic stage must actually drop docs"
    unembedded = {d for d in want if d % 3 == 0}
    assert unembedded & got, "unembedded docs must pass through"


def test_streaming_sketch_accounting_equals_batch(spark, tmp_path):
    """The 100 TB accounting loop on a live stream: each micro-batch
    appends its per-group sketch rows (corpus_stats_sketch inside
    foreachBatch) to a parquet sketch table, and merging that table
    yields EXACTLY the single-pass batch statistics — counts and HLL
    estimates alike — regardless of how ingest was batched."""
    import os

    docs = _docs(spark)
    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    # two ingest rounds against ONE checkpoint: file lands, the
    # accounting query drains it (availableNow), stops, and resumes
    # for the next file — the restart-resume shape of a real ingest
    # loop.  Files are copied as plain files (the file stream source
    # does not recurse into subdirectories).
    import glob
    import shutil

    sketch_dir = str(tmp_path / "sketches")

    def account(batch_df, batch_id):
        corpus.corpus_stats_sketch(batch_df).write.mode("append").parquet(
            sketch_dir
        )

    # split by RANGE, not parity: the fixture's source is modulo-
    # assigned, so a parity split would give each batch disjoint
    # sources and the merge would never have to combine sketches
    halves = (
        docs.where(F.col("doc_id") < 250),
        docs.where(F.col("doc_id") >= 250),
    )
    for i, half in enumerate(halves):
        d = tmp_path / f"half{i}"
        half.coalesce(1).write.parquet(str(d))
        shutil.copy(
            glob.glob(str(d / "part-*.parquet"))[0], src_dir / f"f{i}.parquet"
        )
        stream = spark.readStream.schema(docs.schema).parquet(str(src_dir))
        q = (
            stream.writeStream.foreachBatch(account)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shards = spark.read.parquet(sketch_dir)
    assert shards.count() > len(
        corpus.corpus_stats_sketch(docs).collect()
    ), "ingest must have produced multiple per-batch shards"
    merged = {
        r.source: (r.n_docs, r.n_tokens, r.distinct_content_est, r.vocab_est)
        for r in corpus.corpus_stats(
            corpus.merge_corpus_stats(shards), from_sketches=True
        ).collect()
    }
    want = {
        r.source: (r.n_docs, r.n_tokens, r.distinct_content_est, r.vocab_est)
        for r in corpus.corpus_stats(docs).collect()
    }
    assert merged == want and want


def test_corpus_stats_null_group_key_keeps_vocab(spark):
    """Review finding: a NULL group value must keep its vocabulary
    (null-safe key join) and an all-null-text group reports 0 (not
    null) for both estimates."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta", None),
            (2, "alpha gamma", None),
            (3, "delta", "src1"),
            (4, None, "deadtext"),
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {r.source: r for r in corpus.corpus_stats(df).collect()}
    assert got[None].n_docs == 2 and got[None].vocab_est == 3
    assert got[None].distinct_content_est == 2
    assert got["deadtext"].distinct_content_est == 0
    assert got["deadtext"].vocab_est == 0
    # ADVICE r6: counts agree with estimates — n_tokens is 0, not
    # NULL, for the all-null-text group, directly and through a merge
    assert got["deadtext"].n_tokens == 0
    merged = {
        r.source: r.n_tokens
        for r in corpus.corpus_stats(
            corpus.merge_corpus_stats(corpus.corpus_stats_sketch(df)),
            from_sketches=True,
        ).collect()
    }
    assert merged["deadtext"] == 0 and merged[None] == 4


def test_keep_top_fraction_cutoff_name_collision(spark):
    """ADVICE r6: an input frame that already has a '_cutoff' column
    must not produce an ambiguous internal join column."""
    df = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(1, 21)],
        "doc_id LONG, quality_score DOUBLE, _cutoff DOUBLE",
    )
    kept = corpus.keep_top_fraction(df, 0.25)
    ids = {r.doc_id for r in kept.collect()}
    # 0.75-quantile of 1..20 at exact accuracy = 15 -> scores >= 15
    assert ids == {15, 16, 17, 18, 19, 20}
    assert set(kept.columns) == {"doc_id", "quality_score", "_cutoff"}
    # the caller's _cutoff values survive untouched
    assert {r._cutoff for r in kept.collect()} == {-float(i) for i in ids}


def test_prepare_corpus_duplicate_score_rows_collapse(spark):
    """ADVICE r6: duplicate ids in the scores frame must not fan out
    the group_cap join (a doc occupying several rank slots starves its
    group below k) — scores collapse to max-per-id up front."""
    from hadoop__spark.operators import text as text_ops

    docs = _docs(spark)
    scores = text_ops.quality_score(docs).select("doc_id", "quality_score")
    dup_scores = scores.unionByName(
        scores.withColumn(
            "quality_score", F.col("quality_score") - F.lit(1000.0)
        )
    )
    want = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs, redact=False, group_cap=("source", 4), scores=scores
        ).collect()
    }
    got = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs, redact=False, group_cap=("source", 4), scores=dup_scores
        ).collect()
    }
    assert got == want and got


def test_prepare_corpus_unscored_keep_policy(spark):
    """Round-7 knob: unscored='keep' passes documents with no score
    row through the keep_frac gate (only scored-below-cutoff rows are
    removed); 'drop' (default) removes them; anything else refuses."""
    from hadoop__spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, f"every document body here is unique number {i}") for i in range(1, 21)],
        "doc_id LONG, text STRING",
    )
    # only even ids scored (score = id); odd ids are unscored
    scores = spark.createDataFrame(
        [(i, float(i)) for i in range(2, 21, 2)],
        "doc_id LONG, quality_score DOUBLE",
    )
    dropped = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs, redact=False, keep_frac=0.5, scores=scores
        ).collect()
    }
    kept = {
        r.doc_id
        for r in corpus.prepare_corpus(
            docs, redact=False, keep_frac=0.5, scores=scores,
            unscored="keep",
        ).collect()
    }
    # 0.5-quantile of the 10 even scores = 10 -> scored survivors are
    # the evens >= 10 under BOTH policies; odds pass only under 'keep'
    assert dropped == {10, 12, 14, 16, 18, 20}
    assert kept == dropped | {i for i in range(1, 21, 2)}
    with pytest.raises(ValueError, match="unscored"):
        corpus.prepare_corpus(
            docs, keep_frac=0.5, scores=scores, unscored="maybe"
        )


def test_score_sketch_merge_and_quantiles(spark):
    """KLL score accounting: sharded-merge quantiles EXACTLY equal the
    single-pass quantiles (groups below the sketch's exact regime),
    and the readable view is identical from raw scores or sketches."""
    docs = _docs(spark)
    from hadoop__spark.operators import text as text_ops

    scores = text_ops.quality_score(docs).select(
        "doc_id", "quality_score"
    ).join(docs.select("doc_id", "source"), "doc_id")
    direct = {
        tuple(r)
        for r in corpus.score_quantiles(scores, group_cols=["source"]).collect()
    }
    h1 = corpus.score_sketch(
        scores.where("doc_id % 2 = 0"), ["source"]
    )
    h2 = corpus.score_sketch(
        scores.where("doc_id % 2 = 1"), ["source"]
    )
    merged = {
        tuple(r)
        for r in corpus.score_quantiles(
            corpus.merge_score_sketches(h1.unionByName(h2), ["source"]),
            group_cols=["source"],
            from_sketches=True,
        ).collect()
    }
    assert merged == direct and direct
    # a group whose every score is null reports null quantiles (its
    # sketch buffer is EMPTY, not null — must not crash get_quantile)
    nullg = spark.createDataFrame(
        [(1, None, "dead"), (2, 3.0, "ok")],
        "doc_id LONG, quality_score DOUBLE, source STRING",
    )
    got = {
        r.source: (r.n_scores, r.q_0_5)
        for r in corpus.score_quantiles(
            nullg, quantiles=(0.5,), group_cols=["source"]
        ).collect()
    }
    assert got == {"dead": (0, None), "ok": (1, 3.0)}


def test_keep_top_fraction_from_sketch_matches_direct(spark):
    """The incremental quality gate reads its cutoff from merged KLL
    state; on exact-regime inputs it keeps exactly what the direct
    keep_top_fraction keeps — and gating a NEW batch against
    HISTORICAL sketches uses the corpus-wide cutoff, not the batch's."""
    rows = [(i, float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id LONG, quality_score DOUBLE")
    sk = corpus.score_sketch(df)
    got = {
        r.doc_id
        for r in corpus.keep_top_fraction_from_sketch(df, sk, 0.25).collect()
    }
    want = {
        r.doc_id for r in corpus.keep_top_fraction(df, 0.25).collect()
    }
    assert got == want == {15, 16, 17, 18, 19, 20}
    # historical state: scores 1..20; new batch scores 1..5 — the
    # corpus cutoff (15) rejects the whole low-scoring batch
    batch = spark.createDataFrame(
        [(100 + i, float(i)) for i in range(1, 6)],
        "doc_id LONG, quality_score DOUBLE",
    )
    assert corpus.keep_top_fraction_from_sketch(batch, sk, 0.25).count() == 0
    # sharded state merges inside the gate
    sk2 = corpus.score_sketch(df.where("doc_id <= 10")).unionByName(
        corpus.score_sketch(df.where("doc_id > 10"))
    )
    got2 = {
        r.doc_id
        for r in corpus.keep_top_fraction_from_sketch(df, sk2, 0.25).collect()
    }
    assert got2 == want
    with pytest.raises(ValueError, match="keep_frac"):
        corpus.keep_top_fraction_from_sketch(df, sk, 1.5)
    # empty state (no scores ever sketched) keeps nothing — no
    # distribution, no evidence any row clears the bar
    empty_sk = corpus.score_sketch(df.where("doc_id < 0"))
    assert corpus.keep_top_fraction_from_sketch(df, empty_sk, 0.5).count() == 0


def test_corpus_overlap_exact_and_mergeable(spark):
    """Theta-sketch overlap: exact pairwise intersection/jaccard at
    fixture cardinalities (below the sketch's sampling regime), equal
    from raw documents or merged shard sketches."""
    rows = (
        [(f"A{i}", f"shared text number {i}", "A") for i in range(10)]
        + [(f"B{i}", f"shared text number {i}", "B") for i in range(5, 15)]
        + [(f"C{i}", f"unique c body {i}", "C") for i in range(4)]
        + [("Cdup", "shared text number 0", "C")]
    )
    df = spark.createDataFrame(rows, "doc_id STRING, text STRING, source STRING")
    got = {
        (r.group_a, r.group_b): (
            r.distinct_a,
            r.distinct_b,
            r.overlap_est,
            round(r.jaccard_est, 6),
        )
        for r in corpus.corpus_overlap(df).collect()
    }
    # A: 10 distinct; B: 10 distinct (5..14, 5 shared with A's 0..9);
    # C: 5 distinct (4 unique + one copy of A's text 0)
    assert got == {
        ("A", "B"): (10, 10, 5, round(5 / 15, 6)),
        ("A", "C"): (10, 5, 1, round(1 / 14, 6)),
        ("B", "C"): (10, 5, 0, 0.0),
    }
    # sharded write + theta-union merge gives the same report
    s1 = corpus.overlap_sketch(df.where("doc_id like '%0' or doc_id like '%1'"))
    s2 = corpus.overlap_sketch(
        df.where("not (doc_id like '%0' or doc_id like '%1')")
    )
    merged = {
        (r.group_a, r.group_b): (
            r.distinct_a,
            r.distinct_b,
            r.overlap_est,
            round(r.jaccard_est, 6),
        )
        for r in corpus.corpus_overlap(
            corpus.merge_overlap_sketches(s1.unionByName(s2)),
            from_sketches=True,
        ).collect()
    }
    assert merged == got


def test_corpus_overlap_null_group_kept(spark):
    """A NULL group key stays in the overlap report (ordered last),
    matching corpus_stats's null-group policy — a plain a<b join
    condition would silently drop it from every pair."""
    rows = (
        [(f"A{i}", f"shared text number {i}", "A") for i in range(6)]
        + [("N0", "shared text number 0", None),
           ("N1", "null group own body", None)]
    )
    df = spark.createDataFrame(rows, "doc_id STRING, text STRING, source STRING")
    got = {
        (r.group_a, r.group_b): (r.distinct_b, r.overlap_est)
        for r in corpus.corpus_overlap(df).collect()
    }
    assert got == {("A", None): (2, 1)}


def test_overlap_sketch_null_text_counting(spark):
    """ADVICE r7: n_docs counts every document (count(*), matching
    corpus_stats_sketch), not just those with non-null text; an
    all-null-text group reports 0 distinct/overlap, not null."""
    rows = [
        ("A0", "alpha body", "A"),
        ("A1", None, "A"),
        ("Z0", None, "Z"),
        ("Z1", None, "Z"),
    ]
    df = spark.createDataFrame(rows, "doc_id STRING, text STRING, source STRING")
    n = {r.source: r.n_docs for r in corpus.overlap_sketch(df).collect()}
    assert n == {"A": 2, "Z": 2}
    got = {
        (r.group_a, r.group_b): (
            r.distinct_a, r.distinct_b, r.overlap_est, r.jaccard_est
        )
        for r in corpus.corpus_overlap(df).collect()
    }
    # Z's sketch is null (no fingerprints) -> estimates coalesce to 0
    assert got == {("A", "Z"): (1, 0, 0, 0.0)}


def test_kll_gate_rank_error_above_exact_regime(spark):
    """r7 verdict #6: above the sketch's exact regime (N >> k=200),
    the realized kept fraction of keep_top_fraction_from_sketch must
    track keep_frac within the documented ~1.7% normalized rank error
    (corpus.score_sketch docstring), across distribution shapes —
    uniform, heavy-tailed, and heavy ties, where ties AT the cutoff
    all survive by contract and widen only the upper bound.

    The sketch state is built SHARDED and merged (the lifecycle a real
    pipeline uses).  The 1.7% figure is a 99%-confidence bound and KLL
    compaction is internally randomized, so the assertion allows 1.5x
    headroom to keep the test deterministic in practice."""
    import numpy as np

    rng = np.random.default_rng(8)
    N = 5000
    dists = {
        "uniform": rng.uniform(0.0, 1.0, N),
        "lognormal": rng.lognormal(0.0, 2.0, N),
        "ties": np.round(rng.uniform(0.0, 1.0, N), 1),
    }
    err = 0.017 * 1.5
    for name, vals in dists.items():
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)],
            "doc_id LONG, quality_score DOUBLE",
        )
        sk = corpus.score_sketch(
            df.withColumn("_shard", F.col("doc_id") % 4),
            group_cols=["_shard"],
        )
        for keep_frac in (0.25, 0.75):
            kept = corpus.keep_top_fraction_from_sketch(
                df, sk, keep_frac
            ).collect()
            frac = len(kept) / N
            cutoff = min(r.quality_score for r in kept)
            tie_mass = float((vals == cutoff).sum()) / N
            assert keep_frac - err <= frac <= keep_frac + err + tie_mass, (
                name, keep_frac, frac, tie_mass
            )


def test_null_keys_get_deterministic_assignment(spark):
    """A NULL key must behave like any other key value, not propagate
    NULL through the hash: md5(concat(NULL, salt)) is NULL, which
    silently DROPPED null-key rows from samples (even at fraction 1.0)
    and dumped them all into the LAST-named split (every when() is
    NULL -> otherwise) — contaminating a held-out set with exactly the
    rows most likely to be data bugs."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "doc_id LONG"
    )
    assert corpus.deterministic_sample(df, 1.0).count() == 4
    split = corpus.deterministic_split(df).collect()
    assert len(split) == 4
    # all null keys share ONE deterministic assignment (they hash as
    # one sentinel value), chosen by the hash rather than fallthrough
    assert len({r.split for r in split if r.doc_id is None}) == 1
    assert (
        len(
            {
                r.split
                for r in corpus.deterministic_split(
                    df, salt="other"
                ).collect()
                if r.doc_id is None
            }
        )
        == 1
    )
