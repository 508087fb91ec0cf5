"""ANN recall at scale under DERIVED banding (VERDICT r8 #5).

``auto_n_planes`` raises P with corpus size to bound the 2^-P random-
collision pair floor — which necessarily lowers each band's TRUE-pair
collision probability too: a pair at angle theta collides in one P-plane
band with probability (1 - theta/pi)^P, so recall at fixed band count B is
``1 - (1 - (1-theta/pi)^P)^B`` and FALLS as P grows. Completion at 1000x
is measured (BASELINE.md); this tool measures what the derived P costs in
RECALL, against exact ground truth, at 1x and a scaled tier.

Two regimes, reported separately because they answer different questions:

1. ``topk`` — recall@k of ``lsh_bucket_topk(n_planes="auto")`` against
   ``brute_force_topk`` for corpus-sampled queries. The driver testdata
   embeddings are RANDOM (zero pairs above cos 0.6 even at sf0.01), so
   the true top-k sit near cos ~0.4-0.5 where single-bucket SRP recall is
   ~(1-theta/pi)^P ~= 0.6^P — near zero BY GEOMETRY at any useful P.
   This number documents the speed path's contract (recall < 1 by
   design; rows-only oracle), not a regression.
2. ``planted near-dups`` — the regime ANN DEDUP exists for. A sample of
   corpus vectors is copied under fresh ids with a deterministic
   hash-noise perturbation at several amplitudes, giving planted pairs
   whose EXACT cosines span ~0.90-0.999. The incremental verdict path
   (``incremental_cosine_dedup(n_planes="auto")``, B=4) then admits the
   planted copies against the corpus; recall is reported PER COSINE BAND
   (each planted pair's exact cosine is computed in-plan, so bands are
   measured, not assumed). Precision is 1.0 by construction (candidates
   verify with the exact cosine).

The documented floor (BASELINE.md round-9 row): when recall at the
deployment's cosine level sags under a derived-P rise, RAISE ``n_bands``
(B multiplies recall's outer exponent at linear index cost), never lower
P — that re-opens the random-pair floor the derived banding exists to
close. ``similarity.recommended_n_bands`` computes the B that restores a
target recall at a given P and cosine level.

Round-9 addition: each tier also runs the REMEDY arm — the same planted
admission under ``n_bands="auto"`` at threshold 0.95, where the operator
derives B = recommended_n_bands(P, 0.95, 0.9) inside the plan — so the
raise-bands advice is MEASURED through the wired operator path, not just
computed (``autoB_*`` keys).

Round-10 addition (VERDICT r9 #5): ``--minhash`` measures the Jaccard
twin the same way — planted token-substitution copies of corpus documents
whose EXACT shingle Jaccard is computed in-plan, admitted through
``incremental_lsh_dedup`` at the default B=8 and at ``bands="auto"``
(``recommended_minhash_bands``), recall reported per measured-Jaccard
band next to the analytic banding curve ``1 - (1 - s^r)^b`` so the curve
is confirmed by measurement, not just derived.

Usage: python tools/bench_ann_recall.py [--replicas 100] [--k 5]
       [--queries 1000] [--plant-frac 0.02] [--minhash]
Prints one JSON line per tier.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_flink_yb_spark.functions.cacheutil import release_cache  # noqa: E402
from gmall_flink_yb_spark.functions.similarity import (  # noqa: E402
    auto_n_planes,
    brute_force_topk,
    incremental_cosine_dedup,
    lsh_bucket_topk,
)
from gmall_flink_yb_spark.session import get_spark  # noqa: E402

_DIM = 64
# perturbation amplitudes -> planted cosines spanning ~0.90 .. 0.999
# (hash noise is ~U[-1,1] per dim, |g| ~ sqrt(64/3) ~ 4.6 x the unit-ish
# embedding norms; eps ~ tan(theta)/4.6 for a target cosine)
_EPSILONS = (0.10, 0.07, 0.03, 0.015)
_COS_BANDS = ((0.90, 0.95), (0.95, 0.99), (0.99, 1.0000001))


def _pairs(df, qc="q_id", nc="n_id"):
    return {(r[qc], r[nc]) for r in df.select(qc, nc).collect()}


def topk_recall(spark, corpus, queries, k) -> dict:
    truth = brute_force_topk(corpus, queries, k=k)
    approx = lsh_bucket_topk(corpus, queries, k=k, n_planes="auto", dim=_DIM)
    tp, ap = _pairs(truth), _pairs(approx)
    return {
        "topk_recall": round(len(tp & ap) / max(len(tp), 1), 4),
        "topk_truth_pairs": len(tp),
    }


def _plant(corpus, plant_mod: int, max_id: int):
    """Perturbed copies of every vec_id % plant_mod == 0 vector, one per
    epsilon, ids above max_id (so planted rows are the 'incoming' side and
    their originals are eligible index matches). Noise is hash-derived
    (deterministic, no RNG state): g_i ~ U[-1,1] from xxhash64(id, eps
    slot, i)."""
    base = corpus.filter(F.col("vec_id") % plant_mod == 0)

    def _noise(slot: int, eps: float):
        # two-arg lambda only (pyspark counts parameters; defaults break it)
        return F.transform(
            "embedding",
            lambda x, i: x + F.lit(eps) * (
                (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), F.lit(slot), i),
                        F.lit(10_000),
                    ).cast("double")
                    / F.lit(4999.5)
                )
                - F.lit(1.0)
            ),
        )

    variants = []
    for slot, eps in enumerate(_EPSILONS):
        noise = _noise(slot, eps)
        variants.append(
            base.select(
                (
                    F.col("vec_id") * F.lit(len(_EPSILONS))
                    + F.lit(slot + 1)
                    + F.lit(max_id)
                ).alias("vec_id"),
                noise.alias("embedding"),
                F.col("vec_id").alias("orig_id"),
            )
        )
    out = variants[0]
    for v in variants[1:]:
        out = out.unionByName(v)
    return out


def planted_recall(
    spark,
    corpus,
    plant_mod,
    n_corpus,
    threshold=0.90,
    n_bands=4,
    band_recall=0.9,
    prefix="",
) -> dict:
    max_id = corpus.agg(F.max("vec_id")).first()[0]
    planted = _plant(corpus, plant_mod, int(max_id)).persist()
    n_planted = planted.count()
    # pin P to the rule applied to the TRUE joined count (the operator's
    # own file-metadata estimate would see the planted union's leaf files
    # as a whole corpus and over-derive by ~1 plane)
    p_used = auto_n_planes(n_corpus + n_planted)

    # exact cosine of each planted pair, in-plan (band assignment is
    # measured, never assumed from epsilon)
    orig = corpus.select(
        F.col("vec_id").alias("orig_id"), F.col("embedding").alias("ov")
    )
    dot = F.aggregate(
        F.zip_with("embedding", "ov", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pair_cos = (
        planted.join(orig, "orig_id")
        .select(
            "vec_id",
            (dot / (norm(F.col("embedding")) * norm(F.col("ov")))).alias(
                "cos"
            ),
        )
    )
    truth = {r["vec_id"]: r["cos"] for r in pair_cos.collect()}

    verdicts = incremental_cosine_dedup(
        corpus, planted, "vec_id", "embedding", threshold=threshold,
        n_bands=n_bands, n_planes=p_used, dim=_DIM,
        band_recall=band_recall,
    )
    flagged = {
        r["id"] for r in verdicts.filter(F.col("keep") == 0).collect()
    }
    release_cache(verdicts)
    planted.unpersist()

    bands = {}
    for lo, hi in _COS_BANDS:
        ids = [i for i, c in truth.items() if lo <= c < hi and c >= threshold]
        hit = sum(1 for i in ids if i in flagged)
        bands[f"{prefix}recall_cos_{lo}_{hi}"] = (
            round(hit / len(ids), 4) if ids else None
        )
        bands[f"{prefix}n_cos_{lo}_{hi}"] = len(ids)
    from gmall_flink_yb_spark.functions.similarity import _resolve_n_bands

    b_used = _resolve_n_bands(n_bands, p_used, threshold, band_recall)
    return {
        f"{prefix}planted": n_planted,
        f"{prefix}verdict_p": p_used,
        f"{prefix}verdict_b": b_used,
        f"{prefix}threshold": threshold,
        **bands,
    }


# token-substitution rates -> planted shingle-Jaccard spanning ~0.5-0.9
# (a rate-q substitution keeps ~(1-q)^3 of a doc's 3-shingles, and
# J ~= s3 / (2 - s3); exact J is measured in-plan, never assumed)
_SUB_RATES = (0.03, 0.06, 0.09, 0.13)
_JAC_BANDS = ((0.5, 0.65), (0.65, 0.8), (0.8, 1.0000001))
_MH_HASHES = 32
_MH_SHINGLE_N = 3
_MH_THRESHOLD = 0.5


def _plant_docs(corpus, plant_mod: int, max_id: int):
    """Perturbed copies of every doc_id % plant_mod == 0 document, one per
    substitution rate, ids above max_id (incoming-side contract). Each
    token is replaced by a fresh planted-unique token with hash-derived
    probability q (deterministic, no RNG state)."""
    base = corpus.filter(F.col("doc_id") % plant_mod == 0)
    variants = []
    for slot, q in enumerate(_SUB_RATES):
        mutated = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                # two-arg lambda only (pyspark counts parameters)
                lambda t, i: F.when(
                    F.pmod(
                        F.xxhash64(F.col("doc_id"), F.lit(slot), i),
                        F.lit(1000),
                    )
                    < F.lit(int(q * 1000)),
                    F.concat(
                        F.lit("zq"),
                        F.col("doc_id").cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ).otherwise(t),
            ),
            " ",
        )
        variants.append(
            base.select(
                (
                    F.col("doc_id") * F.lit(len(_SUB_RATES))
                    + F.lit(slot + 1)
                    + F.lit(max_id)
                ).alias("doc_id"),
                mutated.alias("text"),
                F.col("doc_id").alias("orig_id"),
            )
        )
    out = variants[0]
    for v in variants[1:]:
        out = out.unionByName(v)
    return out


def minhash_planted_recall(
    spark, corpus, plant_mod, bands, prefix="", num_hashes=None
) -> dict:
    """Recall of ``incremental_lsh_dedup`` on planted near-dup documents,
    per EXACT-shingle-Jaccard band (computed in-plan via shingle_rows set
    arithmetic), next to the analytic banding prediction
    ``1 - (1 - s_mean^r)^B`` at each band's measured mean Jaccard.

    The measured recall also carries the signature ESTIMATOR's noise (the
    verdict requires est_jaccard >= threshold over 32 slots), so bands
    near the threshold can sit slightly below the pure banding curve —
    that gap is the honest operator-level number."""
    from gmall_flink_yb_spark.functions.dedup import (
        _resolve_minhash_bands,
        incremental_lsh_dedup,
        shingle_rows,
    )

    if num_hashes is None:
        num_hashes = _MH_HASHES
    max_id = corpus.agg(F.max("doc_id")).first()[0]
    planted = _plant_docs(corpus, plant_mod, int(max_id)).persist()
    n_planted = planted.count()
    originals = corpus.filter(F.col("doc_id") % plant_mod == 0)

    # exact shingle Jaccard per planted pair: |∩| / (|P| + |O| - |∩|)
    sh_p = shingle_rows(planted, "doc_id", "text", _MH_SHINGLE_N)
    sh_o = shingle_rows(originals, "doc_id", "text", _MH_SHINGLE_N).select(
        F.col("doc_id").alias("orig_id"), "token"
    )
    pm = planted.select("doc_id", "orig_id")
    n_p = sh_p.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_p"))
    n_o = sh_o.groupBy("orig_id").agg(F.count(F.lit(1)).alias("n_o"))
    n_int = (
        sh_p.join(pm, "doc_id")
        .join(sh_o, ["orig_id", "token"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    jac = (
        pm.join(n_p, "doc_id")
        .join(n_o, "orig_id")
        .join(n_int, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("n_int"), F.lit(0)).cast("double")
                / (F.col("n_p") + F.col("n_o") - F.coalesce("n_int", F.lit(0)))
            ).alias("jac"),
        )
    )
    truth = {r["doc_id"]: r["jac"] for r in jac.collect()}

    verdicts = incremental_lsh_dedup(
        corpus, planted, "doc_id", "text",
        num_hashes=num_hashes, bands=bands, shingle_n=_MH_SHINGLE_N,
        threshold=_MH_THRESHOLD,
    )
    flagged = {
        r["doc_id"] for r in verdicts.filter(F.col("keep") == 0).collect()
    }
    release_cache(verdicts)
    planted.unpersist()

    b_used = _resolve_minhash_bands(
        bands, num_hashes, _MH_THRESHOLD, 0.9
    )
    r_used = num_hashes // b_used
    out = {
        f"{prefix}planted": n_planted,
        f"{prefix}num_hashes": num_hashes,
        f"{prefix}bands": b_used,
        f"{prefix}rows_per_band": r_used,
        f"{prefix}threshold": _MH_THRESHOLD,
    }
    for lo, hi in _JAC_BANDS:
        ids = [
            i for i, j in truth.items()
            if lo <= j < hi and j >= _MH_THRESHOLD
        ]
        hit = sum(1 for i in ids if i in flagged)
        key = f"{lo}_{round(min(hi, 1.0), 2)}"
        out[f"{prefix}recall_jac_{key}"] = (
            round(hit / len(ids), 4) if ids else None
        )
        out[f"{prefix}n_jac_{key}"] = len(ids)
        if ids:
            s = sum(truth[i] for i in ids) / len(ids)
            out[f"{prefix}pred_jac_{key}"] = round(
                1.0 - (1.0 - s ** r_used) ** b_used, 4
            )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--out", default="/tmp/ann_recall_corpora")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--plant-frac", type=float, default=0.02)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--minhash", action="store_true",
        help="measure the MinHash/Jaccard twin over the documents table "
        "instead of the SRP/cosine arms (VERDICT r9 #5)",
    )
    ap.add_argument(
        "--num-hashes", type=int, default=None,
        help="minhash only: signature width arm (VERDICT r10 #5 — the "
        "r10 study attributed the residual J 0.5-0.65 recall gap to "
        "32-slot ESTIMATOR variance, remediable by more hashes, not "
        "more bands; this arm measures the remedy). Runs ONLY the "
        "bands='auto' arm at the given width.",
    )
    args = ap.parse_args()

    import tools.bench_scale as bs

    bs.REPLICAS = args.replicas
    spark = get_spark("bench-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    if args.minhash:
        one_dir, ten_dir = bs.build_corpora(spark, args.sf_dir, args.out)
        plant_mod = max(1, int(1 / args.plant_frac))
        for tier, d in (("1x", one_dir), (f"{args.replicas}x", ten_dir)):
            corpus = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            )
            if args.num_hashes is not None:
                row = {
                    "tier": tier,
                    "corpus_rows": corpus.count(),
                    **minhash_planted_recall(
                        spark, corpus, plant_mod, bands="auto",
                        prefix=f"h{args.num_hashes}_autoB_",
                        num_hashes=args.num_hashes,
                    ),
                }
            else:
                row = {
                    "tier": tier,
                    "corpus_rows": corpus.count(),
                    # the default banding, where recall at J~threshold sags
                    **minhash_planted_recall(
                        spark, corpus, plant_mod, bands=8, prefix="b8_"
                    ),
                    # the remedy: bands="auto" derives the smallest divisor
                    # holding 0.9 recall at the threshold (B=16 at 32
                    # hashes)
                    **minhash_planted_recall(
                        spark, corpus, plant_mod, bands="auto",
                        prefix="autoB_",
                    ),
                }
            print(json.dumps(row))
        spark.stop()
        if not args.keep:
            shutil.rmtree(args.out, ignore_errors=True)
        return
    one_dir, ten_dir = bs.build_embedding_corpora(
        spark, args.sf_dir, args.out
    )
    for tier, d in (("1x", one_dir), (f"{args.replicas}x", ten_dir)):
        corpus = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = corpus.count()
        q_mod = max(1, n // args.queries)
        plant_mod = max(1, int(1 / args.plant_frac))
        queries = corpus.filter(F.col("vec_id") % q_mod == 0)
        row = {
            "tier": tier,
            "corpus_rows": n,
            "derived_p": auto_n_planes(n),
            **topk_recall(spark, corpus, queries, args.k),
            **planted_recall(spark, corpus, plant_mod, n),
            # the REMEDY arm (round-9 operator wiring): n_bands="auto"
            # derives B = recommended_n_bands(P, threshold, 0.9) inside
            # the operator; measured at threshold 0.95 where the fixed
            # B=4 recall sags under the derived P — the analytic curve
            # says auto-B restores >= 0.9 in the >= 0.95 cosine bands
            **planted_recall(
                spark, corpus, plant_mod, n,
                threshold=0.95, n_bands="auto", prefix="autoB_",
            ),
        }
        print(json.dumps(row))
    spark.stop()
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
