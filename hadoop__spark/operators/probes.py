"""Probe registry for the pipeline operators (dedup / similarity /
text / multimodal) — each an entry in ``queries()`` with, where the
semantics are SQL-expressible, a DuckDB oracle that recomputes the
same result from first principles (e.g. MinHash-LSH is checked against
exact all-pairs Jaccard, which it provably approximates with recall
~1 at the configured S-curve).

The DuckDB text normalization mirrors ``operators.text.normalized``:
lower → non-alnum→space → squeeze → trim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop__spark.operators import (
    dedup,
    multimodal,
    pinned_oracles,
    similarity,
    text,
)
from hadoop__spark.operators.corpus import _hex_threshold as _corpus_hex_threshold
from hadoop__spark.queries import Probe
from hadoop__spark.session import load_tables

# -- shared DuckDB SQL fragments -------------------------------------------

_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
# the exact-dedup key / fingerprint: normalization falls back to the
# RAW text when it strips everything (text.exact_key's contract — two
# distinct pure-CJK/punctuation docs must not both key as '')
_EXACT_KEY = f"coalesce(nullif({_NORM}, ''), text)"
_FP = f"md5({_EXACT_KEY})"
_WORDS = f"list_filter(string_split({_NORM}, ' '), x -> x <> '')"
# distinct 3-gram shingles: short docs fall back to the whole
# normalized text, TOKEN-LESS docs to the raw text (exact_key rule —
# see dedup._shingles_with_fallback); requires the CTE to carry `text`
_SHINGLES3 = (
    f"list_distinct(CASE WHEN len(w) >= 3 THEN "
    "list_transform(range(1, len(w) - 1), i -> "
    "array_to_string(list_slice(w, i, i + 2), ' ')) "
    "ELSE [coalesce(nullif(array_to_string(w, ' '), ''), text)] END)"
)
# exact all-pairs jaccard over 3-gram shingles at a threshold
def _jaccard_oracle(threshold: float) -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
"""


_DOT = (
    "list_sum(list_transform(range(1, 65), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


# -- probe impls ------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["embeddings"]


def _dd01(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


def _dd02(spark, sf_dir):
    return dedup.fingerprint_dedup(_docs(spark, sf_dir))


def _dd03(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.8)


def _dd04(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def _dd05(spark, sf_dir):
    return dedup.simhash_pairs(
        _docs(spark, sf_dir), max_hamming=6, n_chunks=8
    )


def _dd06(spark, sf_dir):
    return dedup.embedding_dedup_pairs(_embs(spark, sf_dir), threshold=0.4)


def _dd07(spark, sf_dir):
    # nlist=8 was so coarse at sf0.1 (2000 vectors) that the
    # bucket-local join did nearly brute-force work; 16 buckets with
    # 3-way multi-assign measures 87% pair recall at this (loose) 0.4
    # threshold in ~1/4 the time.
    return dedup.embedding_dedup_pairs_bucketed(
        _embs(spark, sf_dir), threshold=0.4, nlist=16, n_assign=3
    )


def _ann01(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return similarity.cosine_topk(embs, embs.where(F.col("vec_id") < 5), k=10)


def _ann02(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return similarity.ivf_topk(embs, embs.where(F.col("vec_id") < 5), k=10)


def _ts01(spark, sf_dir):
    return text.token_stats(_docs(spark, sf_dir))


def _ts02(spark, sf_dir):
    return text.quality_score(_docs(spark, sf_dir))


def _ts03(spark, sf_dir):
    return text.lang_id(_docs(spark, sf_dir))


def _ts04(spark, sf_dir):
    return text.fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp_md5")


def _mm01(spark, sf_dir):
    return multimodal.extract_features(multimodal.to_media(_docs(spark, sf_dir)))


def _mm02(spark, sf_dir):
    media = multimodal.to_media(_docs(spark, sf_dir))
    return (
        multimodal.frame_sample(media, every_n_bytes=64)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum(F.octet_length("frame")).cast("bigint").alias("total_bytes"),
        )
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


def _tj01(spark, sf_dir):
    from hadoop__spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    # right side: per-user purchase anchors, unique per (user, ts)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="user_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_purchase_value").alias("last_purchase_value"),
    )


def _tj02(spark, sf_dir):
    from hadoop__spark.operators.temporal import range_join

    ev = _events(spark, sf_dir)
    # deterministic 90-minute interval grid from midnight of min day
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    intervals = bounds.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(
                    (F.unix_timestamp("t1") - F.unix_timestamp("t0")) / 5400
                ).cast("int"),
            )
        ).alias("interval_idx"),
        "t0",
    ).select(
        "interval_idx",
        F.timestamp_seconds(
            F.unix_timestamp("t0") + F.col("interval_idx") * 5400
        ).alias("start"),
        F.timestamp_seconds(
            F.unix_timestamp("t0") + (F.col("interval_idx") + 1) * 5400
        ).alias("end"),
    )
    return (
        range_join(ev, intervals, bucket_seconds=5400)
        .groupBy("interval_idx")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )


def _tj03(spark, sf_dir):
    from hadoop__spark.operators.temporal import time_bucket_rollup

    ev = _events(spark, sf_dir)
    return time_bucket_rollup(
        ev,
        levels=("1 hour", "1 day"),
        aggs=[
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        ],
    )


def _tj04(spark, sf_dir):
    from hadoop__spark.operators.temporal import sessionize_batch

    return sessionize_batch(
        _events(spark, sf_dir).select("user_id", "ts"), gap_seconds=1800
    ).select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
    )


def _dd08(spark, sf_dir):
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)
    return dedup.dedup_clusters(pairs)


def _ts05(spark, sf_dir):
    return text.top_vocabulary(_docs(spark, sf_dir), k=100)


def _pp01(spark, sf_dir):
    """End-to-end corpus prep: benchmark-decontaminate → quality-filter
    → exact-dedup → running token budget (the composed pipeline a
    training-data run executes, as one declarative plan).  The
    "benchmark" is carved from the corpus itself (every 17th doc) so
    the stage is self-contained and oracle-checkable; max_overlap=0
    drops any document sharing a 3-gram shingle with it.  The running
    total is the distributed prefix-sum (`util.global_running_sum`) —
    a bare ``Window.orderBy`` would funnel the corpus through one
    task.

    Scale note (r15): the decontaminated frame feeds TWO consumers
    (quality scoring + dedup), and the lazy composition re-derived it
    — the full contaminate-join subtree included — for each (r14
    before-plan: 6 pushed-filter corpus scans, 70 Exchanges).  It is
    now persisted inside the operator run (MEMORY_AND_DISK, lineage
    kept — the same strategy as ``dedup.minhash_lsh_pairs``; at
    100 TB this stage boundary becomes a materialized table, write
    clean → read clean).  The persist is physical only: the oracle
    checks the composed semantics, which are unchanged."""
    from pyspark.storagelevel import StorageLevel

    from hadoop__spark.operators import corpus
    from hadoop__spark.operators.dedup import _register_probe_cache
    from hadoop__spark.operators.util import global_running_sum

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    clean = _register_probe_cache(
        corpus.decontaminate(docs, bench).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    scored = text.quality_score(clean).select(
        "doc_id", "n_tokens", "quality_score"
    )
    keepers = dedup.fingerprint_dedup(clean).select(
        F.col("keep_id").alias("doc_id")
    )
    surviving = (
        scored.join(keepers, "doc_id")
        .where(F.col("quality_score") >= 0.5)
    )
    return global_running_sum(
        surviving, "doc_id", "n_tokens", out_col="_cum"
    ).select(
        "doc_id",
        "n_tokens",
        F.col("_cum").cast("bigint").alias("cum_tokens"),
    ).where(F.col("cum_tokens") <= 100_000)


def _pp02(spark, sf_dir):
    """Training-data prep: repetition-filter → deterministic train
    split → contiguous sequence packing.  The three corpus operators
    composed as one declarative plan: a narrow per-row projection
    (repetition stats), a stateless hash filter (split), and ONE range
    shuffle (the distributed prefix-sum inside pack_sequences) — no
    global window, no driver loop, 100 TB-shaped end to end."""
    from hadoop__spark.operators import corpus

    docs = _docs(spark, sf_dir)
    stats = corpus.repetition_stats(docs).select(
        "doc_id", "n_tokens", "dup_token_frac"
    )
    kept = stats.where(F.col("dup_token_frac") <= 0.6)
    train = corpus.deterministic_split(kept).where(
        F.col("split") == "train"
    )
    return corpus.pack_sequences(train, seq_len=512).select(
        "doc_id", "n_tokens", "offset", "pack_id", "pack_pos"
    )


def _ann03(spark, sf_dir):
    """Persisted-IVF path: write the centroid-partitioned index to a
    scratch dir, then answer top-k through the partition-pruned scan —
    the operator's actual 100 TB story (tests assert PartitionFilters
    prune to the probe buckets)."""
    import tempfile

    embs = _embs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivf_probe_")
    similarity.ivf_write_index(embs, path, nlist=8)
    return similarity.ivf_read_topk(
        spark, path, embs.where(F.col("vec_id") < 5), k=10, nprobe=4
    )


def _sj01(spark, sf_dir):
    from hadoop__spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    sup = t["supplier"].select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return (
        salted_join(li, sup, on="suppkey", salt=8)
        .groupBy("s_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


#: dd05's expected (id_a, id_b, hamming) pairs on the sf0.01 fixture —
#: the driver's correctness gate runs at sf0.01 only, and the fixture
#: plus xxhash64 make the output fully deterministic.  Regenerate by
#: running the probe if the fixture is ever regenerated.
_SIMHASH_PAIRS_SF001 = [
    (8, 245, 1), (31, 383, 4), (44, 446, 4), (45, 267, 0), (45, 413, 1),
    (58, 293, 4), (61, 185, 2), (70, 447, 2), (72, 377, 3), (87, 134, 5),
    (92, 450, 1), (98, 290, 6), (120, 332, 4), (166, 323, 2),
    (267, 413, 1), (285, 301, 1), (295, 374, 6), (310, 389, 5),
    (393, 420, 1), (435, 486, 6), (458, 462, 2),
]

_SIMHASH_VALUES_ORACLE = (
    "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, "
    "CAST(hamming AS INT) AS hamming FROM (VALUES "
    + ", ".join(f"({a}, {b}, {h})" for a, b, h in _SIMHASH_PAIRS_SF001)
    + ") AS t(id_a, id_b, hamming) ORDER BY id_a, id_b"
)


OPERATOR_PROBES: list[Probe] = [
    Probe(
        name="dd01_dedup_exact",
        fn=_dd01,
        oracle=(
            f"SELECT min(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies "
            f"FROM documents GROUP BY {_EXACT_KEY}"
        ),
    ),
    Probe(
        name="dd02_dedup_fingerprint",
        fn=_dd02,
        oracle=(
            f"SELECT {_FP} AS fp, min(doc_id) AS keep_id, "
            f"CAST(COUNT(*) AS BIGINT) AS n_copies "
            f"FROM documents GROUP BY {_FP}"
        ),
    ),
    Probe(name="dd03_minhash_lsh", fn=_dd03, oracle=_jaccard_oracle(0.8)),
    Probe(name="dd04_ngram_jaccard", fn=_dd04, oracle=_jaccard_oracle(0.8)),
    # SimHash signatures are xxhash64-specific and the Hamming-ball pair
    # set is not a SQL-expressible function of the text, so no
    # independent oracle exists.  The fixture is fixed, though, and
    # xxhash64 is deterministic — the expected pair set at sf0.01 is
    # static, so it is pinned as a VALUES regression oracle (same move
    # as the ln01/ln02 lineage probes).  Semantic correctness (recall
    # vs exact Jaccard) is carried by tests/test_operators.py; this
    # oracle catches drift in the signature/banding pipeline.
    Probe(
        name="dd05_simhash",
        fn=_dd05,
        oracle=_SIMHASH_VALUES_ORACLE,
        pinned_sf_dir=pinned_oracles.PINNED_SF_DIR,
    ),
    Probe(
        name="dd06_embedding_dedup",
        fn=_dd06,
        oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cos('a.embedding', 'b.embedding')} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_cos('a.embedding', 'b.embedding')} >= 0.4
""",
    ),
    # IVF-bucketed dedup is approximate (recall vs brute force asserted
    # in tests/test_skew_and_bucketed_dedup.py); the output is
    # nonetheless deterministic (seeded k-means, sequential double
    # folds — measured bit-identical across session configs), so the
    # sf0.01 result is pinned as a VALUES regression oracle
    # (pinned_oracles.py).
    Probe(
        name="dd07_embedding_dedup_bucketed",
        fn=_dd07,
        oracle=pinned_oracles.DD07_ORACLE,
        pinned_sf_dir=pinned_oracles.PINNED_SF_DIR,
    ),
    Probe(
        name="ann01_cosine_topk",
        fn=_ann01,
        oracle=f"""
WITH s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos('q.embedding', 'c.embedding')} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
FROM s
QUALIFY rank <= 10
""",
    ),
    # IVF is approximate by construction (k-means bucketing), so no
    # independent SQL oracle exists; recall vs brute force is asserted
    # in tests/test_operators.  The deterministic sf0.01 output is
    # pinned as a VALUES regression oracle (pinned_oracles.py).
    Probe(
        name="ann02_ivf_topk",
        fn=_ann02,
        oracle=pinned_oracles.ANN02_ORACLE,
        pinned_sf_dir=pinned_oracles.PINNED_SF_DIR,
    ),
    # Same caveats for the persisted-index path; the partition-pruning
    # plan shape is asserted in tests/test_skew_and_bucketed_dedup.py.
    Probe(
        name="ann03_ivf_persisted",
        fn=_ann03,
        oracle=pinned_oracles.ANN03_ORACLE,
        pinned_sf_dir=pinned_oracles.PINNED_SF_DIR,
    ),
    # Salting is physical-only: result must equal the plain equi-join.
    Probe(
        name="sj01_salted_join",
        fn=_sj01,
        oracle=(
            "SELECT s_name, COUNT(*) AS n_items, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
            "AS sum_price "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY s_name"
        ),
    ),
    Probe(
        name="dd08_dedup_clusters",
        fn=_dd08,
        oracle=f"""
WITH RECURSIVE pairs AS ({_jaccard_oracle(0.8)}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
)
SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
""",
    ),
    Probe(
        name="ts05_top_vocabulary",
        fn=_ts05,
        oracle=f"""
WITH w AS (
  SELECT unnest({_WORDS}) AS token FROM documents
), counted AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY token
)
SELECT token, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
FROM counted
QUALIFY rank <= 100
""",
    ),
    # decontamination oracle: any shared 3-gram shingle with the
    # benchmark subset (doc_id % 17 = 0) disqualifies — identical
    # shingle semantics as the dd03/dd04 oracles.
    Probe(
        name="pp01_corpus_prep_pipeline",
        fn=_pp01,
        oracle=f"""
WITH t0 AS (
  SELECT doc_id, text, {_WORDS} AS w FROM documents
), sh AS (
  SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t0
), bench AS (
  -- mirror decontaminate's content-free-shingle filter
  SELECT DISTINCT s FROM sh
  WHERE doc_id % 17 = 0 AND NOT regexp_matches(s, '^\\s*$')
), contam AS (
  SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
), t AS (
  SELECT * FROM t0 WHERE doc_id NOT IN (SELECT doc_id FROM contam)
), m AS (
  SELECT doc_id,
    CAST(len(w) AS DOUBLE) AS n_tok,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(len(list_filter(list_distinct(w),
      x -> list_contains(['the','and','of','is','a'], x))) AS DOUBLE) AS n_stop,
    CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
      AS DOUBLE) AS n_punct,
    CAST(length(array_to_string(w, '')) AS DOUBLE) AS sum_word_len,
    CAST(len(list_distinct(w)) AS DOUBLE) AS n_distinct
  FROM t
), q AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
    least(n_tok / 64.0, 1.0) * 0.4
      + (CASE WHEN n_tok > 0 THEN n_distinct / n_tok ELSE 0.0 END) * 0.3
      + (n_stop / 5.0) * 0.2
      + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars
                      ELSE 0.0 END) * 10.0, 1.0)) * 0.1 AS quality_score
  FROM m
), k AS (
  SELECT min(doc_id) AS doc_id FROM t GROUP BY md5(coalesce(nullif({_NORM}, ''), text))
), s AS (
  SELECT q.doc_id, q.n_tokens FROM q JOIN k USING (doc_id)
  WHERE q.quality_score >= 0.5
)
SELECT doc_id, n_tokens,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_tokens
FROM s QUALIFY cum_tokens <= 100000
""",
    ),
    # oracle recomputes the whole chain live: repetition fraction with
    # list functions, split membership via the identical md5-threshold
    # trick (string compare on fixed-width hex IS numeric compare),
    # packing via a window prefix-sum (fine at oracle scale; the
    # operator avoids the single-task window).
    Probe(
        name="pp02_training_prep",
        fn=_pp02,
        oracle=f"""
WITH t AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), st AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
    CASE WHEN len(w) > 0
         THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
         ELSE 0.0 END AS dup_token_frac
  FROM t
), kept AS (
  SELECT doc_id, n_tokens FROM st
  WHERE dup_token_frac <= 0.6
    AND md5(CAST(doc_id AS VARCHAR) || 'split-v1')
        < '{{train_threshold}}'
), c AS (
  SELECT doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS off
  FROM kept
)
SELECT doc_id, n_tokens, off AS "offset",
       CAST(floor(off / 512) AS BIGINT) AS pack_id,
       CAST(off % 512 AS BIGINT) AS pack_pos
FROM c
""".replace("{train_threshold}", _corpus_hex_threshold(0.9)),
    ),
    Probe(
        name="tj01_asof_join",
        fn=_tj01,
        oracle="""
WITH purchases AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, p.purchase_value AS last_purchase_value
FROM events e ASOF LEFT JOIN purchases p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    ),
    Probe(
        name="tj02_range_join",
        fn=_tj02,
        oracle="""
-- equivalent closed form of the inner interval join over a complete
-- 90-min grid anchored at midnight of the first event day: each event
-- belongs to exactly floor((ts - t0)/5400); empty intervals drop out
-- of the inner join on both sides
WITH t AS (SELECT date_trunc('day', MIN(ts)) AS t0 FROM events)
SELECT CAST(floor(epoch(ev.ts - t.t0) / 5400) AS BIGINT) AS interval_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events ev, t
GROUP BY 1
""",
    ),
    Probe(
        name="tj03_time_rollup",
        fn=_tj03,
        oracle="""
SELECT '1 hour' AS level, date_trunc('hour', ts) AS bucket_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY date_trunc('hour', ts)
UNION ALL
SELECT '1 day', date_trunc('day', ts),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
FROM events GROUP BY date_trunc('day', ts)
""",
    ),
    Probe(
        name="tj04_sessionize_batch",
        fn=_tj04,
        oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), idx AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(MIN(ts) AS VARCHAR) AS session_start,
       CAST(MAX(ts) AS VARCHAR) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM idx GROUP BY user_id, session_idx
""",
    ),
    Probe(
        name="ts01_token_stats",
        fn=_ts01,
        oracle=f"""
WITH t AS (SELECT doc_id, n_chars, {_WORDS} AS w, {_NORM} AS norm FROM documents)
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       length(norm) / 4.0 AS subword_est,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens
FROM t JOIN documents USING (doc_id)
""",
    ),
    Probe(
        name="ts02_quality_score",
        fn=_ts02,
        oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_WORDS} AS w FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(w) AS DOUBLE) AS n_tok,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(len(list_filter(list_distinct(w),
      x -> list_contains(['the','and','of','is','a'], x))) AS DOUBLE) AS n_stop,
    CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
      AS DOUBLE) AS n_punct,
    CAST(length(array_to_string(w, '')) AS DOUBLE) AS sum_word_len,
    CAST(len(list_distinct(w)) AS DOUBLE) AS n_distinct
  FROM t
)
SELECT doc_id,
  CAST(n_tok AS BIGINT) AS n_tokens,
  CASE WHEN n_tok > 0 THEN sum_word_len / n_tok ELSE 0.0 END
    AS mean_word_len,
  CASE WHEN n_tok > 0 THEN n_distinct / n_tok ELSE 0.0 END
    AS type_token_ratio,
  CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END
    AS punct_ratio,
  n_stop / 5.0 AS stopword_ratio,
  least(n_tok / 64.0, 1.0) * 0.4
    + (CASE WHEN n_tok > 0 THEN n_distinct / n_tok ELSE 0.0 END) * 0.3
    + (n_stop / 5.0) * 0.2
    + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars
                    ELSE 0.0 END) * 10.0, 1.0)) * 0.1 AS quality_score
FROM m
""",
    ),
    Probe(
        name="ts03_lang_id",
        fn=_ts03,
        oracle="""
WITH s AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(lower(text), '\\bthe\\b'))
       + len(regexp_extract_all(lower(text), '\\band\\b'))
       + len(regexp_extract_all(lower(text), '\\bof\\b'))
       + len(regexp_extract_all(lower(text), '\\bis\\b'))
       + len(regexp_extract_all(lower(text), '\\ba\\b')) AS BIGINT) AS s_en,
    CAST(len(regexp_extract_all(lower(text), '\\bder\\b'))
       + len(regexp_extract_all(lower(text), '\\bdie\\b'))
       + len(regexp_extract_all(lower(text), '\\bund\\b'))
       + len(regexp_extract_all(lower(text), '\\bist\\b'))
       + len(regexp_extract_all(lower(text), '\\bdas\\b')) AS BIGINT) AS s_de,
    CAST(len(regexp_extract_all(lower(text), '\\bel\\b'))
       + len(regexp_extract_all(lower(text), '\\bla\\b'))
       + len(regexp_extract_all(lower(text), '\\blos\\b'))
       + len(regexp_extract_all(lower(text), '\\bes\\b'))
       + len(regexp_extract_all(lower(text), '\\bde\\b')) AS BIGINT) AS s_es,
    CAST(len(regexp_extract_all(lower(text), '\\ble\\b'))
       + len(regexp_extract_all(lower(text), '\\bles\\b'))
       + len(regexp_extract_all(lower(text), '\\bet\\b'))
       + len(regexp_extract_all(lower(text), '\\best\\b'))
       + len(regexp_extract_all(lower(text), '\\bune\\b')) AS BIGINT) AS s_fr,
    CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS BIGINT) AS s_zh
  FROM documents
)
SELECT doc_id,
  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
       WHEN s_fr >= s_zh THEN 'fr'
       ELSE 'zh' END AS pred_lang,
  greatest(s_en, s_de, s_es, s_fr, s_zh) AS marker_hits
FROM s
""",
    ),
    Probe(
        name="ts04_fingerprint",
        fn=_ts04,
        oracle=f"SELECT doc_id, {_FP} AS fp_md5 FROM documents",
    ),
    Probe(
        name="mm01_multimodal_features",
        fn=_mm01,
        oracle="""
-- first_byte is the first UTF-8 *byte* (hex of the blob), not the
-- first character's codepoint: ascii() would diverge on multibyte
-- leading characters (e.g. zh documents)
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
       ELSE CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT)
       END AS BIGINT) AS first_byte,
  'text/plain' AS mime
FROM documents
""",
    ),
    Probe(
        name="mm02_frame_sample",
        fn=_mm02,
        oracle="""
SELECT doc_id,
  CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
  CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
FROM documents WHERE octet_length(encode(text)) > 0
""",
    ),
]
