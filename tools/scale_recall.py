"""Recall audit for the r06 bounded scale tiers, at a scale where BOTH
arms still complete (default x10 = 50k docs / 20k vectors).

Bounding work is only half the story — this records what each bounded
form gives up against its exhaustive twin:

- capped jaccard (least(frac·N, 30) df cap) vs the fractional-only
  posting join: pair-identity recall at threshold 0.5;
- simhash component edges vs the full pairwise generator: the
  connected-component PARTITIONS must be identical (exactness claim,
  verified at scale, not just on unit-test graphs);
- scaled-bits SRP-LSH candidates vs the exact blocked-GEMM all-pairs
  tier: pair recall at cosine ≥ 0.35.

Emits one JSON file. Usage:
  python tools/scale_recall.py [DIR] [--out bench_runs/r06_recall.json]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hebrew_tutor_data_pipeline_spark.operators import dedup  # noqa: E402
from hebrew_tutor_data_pipeline_spark.session import get_spark  # noqa: E402
from hebrew_tutor_data_pipeline_spark.sources.readers import (  # noqa: E402
    load_table,
    spread,
)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("--") else "/root/scale_data/x10"
    out_path = "bench_runs/r06_recall.json"
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    spark = get_spark("scale-recall")
    spark.sparkContext.setLogLevel("ERROR")
    d = spread(load_table(spark, sf_dir, "documents"))
    e = spread(load_table(spark, sf_dir, "embeddings"))
    report: dict = {"dir": sf_dir}

    # --- capped vs uncapped jaccard ------------------------------------
    t0 = time.perf_counter()
    unc = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=0.08
        ).collect()
    }
    cap = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5,
            max_shingle_freq=0.08, max_shingle_df=30,
        ).collect()
    }
    report["jaccard_capped"] = {
        "uncapped_pairs": len(unc),
        "capped_pairs": len(cap),
        "recall_of_uncapped": round(len(cap & unc) / len(unc), 4) if unc else None,
        "extra_pairs": len(cap - unc),
        "sec": round(time.perf_counter() - t0, 1),
    }

    # --- MinHash-LSH candidate tier vs the same truth ------------------
    # 16 bands × 2 rows: P[candidate] = 1-(1-J²)^16 ≈ 0.99 at J = 0.5
    t0 = time.perf_counter()
    mh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            d, "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    report["minhash_tier"] = {
        "pairs": len(mh),
        "recall_of_uncapped": round(len(mh & unc) / len(unc), 4) if unc else None,
        "sec": round(time.perf_counter() - t0, 1),
    }

    # --- component edges vs pairwise CC partitions ---------------------
    t0 = time.perf_counter()

    def labels(edge_df):
        cc = dedup.connected_components(edge_df, "id_a", "id_b", dedupe_edges=False)
        return {r["node"]: r["component"] for r in cc.collect()}

    kw = dict(bits=30, bands=2, max_distance=1)
    lp = labels(dedup.simhash_near_dup_pairs(d, "doc_id", "text", **kw))
    le = labels(dedup.simhash_component_edges(d, "doc_id", "text", **kw))

    def partition(lab):
        groups: dict = {}
        for n_, c in lab.items():
            groups.setdefault(c, set()).add(n_)
        return frozenset(frozenset(g) for g in groups.values())

    # nodes absent from an edge list are singletons — normalize over the
    # union of observed nodes
    all_nodes = set(lp) | set(le)
    lp_full = {n_: lp.get(n_, n_) for n_ in all_nodes}
    le_full = {n_: le.get(n_, n_) for n_ in all_nodes}
    report["component_edges"] = {
        "partitions_identical": partition(lp_full) == partition(le_full),
        "n_labeled_pairwise": len(lp),
        "n_labeled_edges": len(le),
        "sec": round(time.perf_counter() - t0, 1),
    }

    # --- scaled-bits LSH vs exact all-pairs ----------------------------
    t0 = time.perf_counter()
    n_vec = e.count()
    bits = max(6, math.ceil(math.log2(max(n_vec, 2) / 250)))
    exact_cos = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs_blocked(
            e, "vec_id", "embedding", threshold=0.35,
            num_blocks=max(8, n_vec // 2000),
        ).collect()
    }
    exact = set(exact_cos)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(
            e, "vec_id", "embedding", threshold=0.35,
            bucket_bits=bits, num_tables=8,
        ).collect()
    }

    def band_recall(lo: float, hi: float):
        band = {p for p, c in exact_cos.items() if lo <= c < hi}
        return round(len(lsh & band) / len(band), 4) if band else None

    report["lsh_scaled_bits"] = {
        "bits": bits,
        "exact_pairs": len(exact),
        "lsh_pairs": len(lsh),
        "recall": round(len(lsh & exact) / len(exact), 4) if exact else None,
        # SRP recall is similarity-graded by design: near-dups (the
        # pairs dedup acts on) collide with high probability, marginal
        # 0.35-cosine pairs with low — stratify to show it
        "recall_by_cosine": {
            "0.35-0.5": band_recall(0.35, 0.5),
            "0.5-0.7": band_recall(0.5, 0.7),
            "0.7-0.9": band_recall(0.7, 0.9),
            "0.9-1.0": band_recall(0.9, 1.01),
        },
        "sec": round(time.perf_counter() - t0, 1),
    }

    # --- incremental MinHash lookup vs the exhaustive posting truth ----
    # Truth = the uncapped posting join's ≥0.5 pairs restricted to
    # batch×index (one side ≡7 mod 10), best partner per batch doc by
    # (jaccard DESC, id ASC) — the same selection rule as the operator.
    # (The SimHash lookup needs no recall audit: d ≤ 1 < 2 bands is
    # exact by pigeonhole, and its oracle is the brute-force scan.)
    t0 = time.perf_counter()
    from pyspark.sql import functions as F  # noqa: PLC0415

    unc_j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=0.08
        ).collect()
    }
    truth_best: dict = {}
    for (a, b), j in unc_j.items():
        for me, other in ((a, b), (b, a)):
            if me % 10 == 7 and other % 10 != 7:
                cur = truth_best.get(me)
                if cur is None or (j, -other) > (cur[1], -cur[0]):
                    truth_best[me] = (other, j)
    lookup = {
        r["id"]: r["match_id"]
        for r in dedup.minhash_lookup_pairs(
            d.filter(F.col("doc_id") % 10 == 7),
            d.filter(F.col("doc_id") % 10 != 7),
            "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.5,
        ).collect()
        if r["match_id"] is not None
    }
    with_truth = set(truth_best)
    report["incremental_minhash_lookup"] = {
        "batch_docs_with_true_match": len(with_truth),
        "lookup_matched": len(lookup),
        "match_found_recall": round(
            len(with_truth & set(lookup)) / len(with_truth), 4
        ) if with_truth else None,
        "best_match_identity_rate": round(
            sum(1 for b_ in with_truth if lookup.get(b_) == truth_best[b_][0])
            / len(with_truth),
            4,
        ) if with_truth else None,
        "sec": round(time.perf_counter() - t0, 1),
    }

    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
