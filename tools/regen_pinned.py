#!/usr/bin/env python
"""Regenerate the pinned VALUES oracle row lists after an intentional
fixture / seed / parameter change.

Runs the pinned probes (dd05, dd07, ann02, ann03) at the driver's
correctness-gate SF (sf0.01) under a vanilla SparkSession — the same
conditions the driver gate uses — and prints the Python literal lists
to paste into ``hadoop__spark/operators/pinned_oracles.py``
(``_DD07_…/_ANN02_…/_ANN03_…``) and ``operators/probes.py``
(``_SIMHASH_PAIRS_SF001``).  Print-only by design: pinned expectations
are reviewed source, not generated artifacts — a silent rewrite would
defeat their purpose as regression tripwires.

Usage: python tools/regen_pinned.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("regen-pinned")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hadoop__spark.queries import probe_map

    probes = probe_map()
    specs = {
        # probe -> (sort key columns, float columns rendered via repr)
        "dd05_simhash": (["id_a", "id_b"], []),
        "dd07_embedding_dedup_bucketed": (["id_a", "id_b"], ["cosine"]),
        "ann02_ivf_topk": (["query_id", "rank"], ["cosine"]),
        "ann03_ivf_persisted": (["query_id", "rank"], ["cosine"]),
    }
    for name, (keys, float_cols) in specs.items():
        df = probes[name].run(spark, SF_DIR)
        rows = sorted(
            ([row[c] for c in df.columns] for row in df.collect()),
            key=lambda r: tuple(r[df.columns.index(k)] for k in keys),
        )
        print(f"\n# {name} — {len(rows)} rows, columns {df.columns}")
        for r in rows:
            rendered = ", ".join(
                repr(v) if c in float_cols else str(v)
                for c, v in zip(df.columns, r)
            )
            print(f"    ({rendered}),")


if __name__ == "__main__":
    main()
