"""Correctness property for the xxhash64 MinHash pipeline (VERDICT r2 #2).

``dedup_minhash_fast`` is the one registered query with only a rows-only
driver check (DuckDB has no xxhash64, so no SQL oracle can exist). These
tests give it a real correctness property instead of just "runs":

- planted EXACT duplicates must surface as candidate pairs with recall
  1.0 — identical texts have identical shingle sets, hence identical
  signatures under ANY hash family, hence every band collides;
- planted near-duplicates (one token edited) surface with high recall —
  deterministic for a fixed corpus because the hash family is a fixed
  function, so this is a pinned value, not a flaky probability;
- the xxhash64 candidate set is compared against the oracle-checked md5
  twin: both families must find all exact pairs, and their candidate
  sets must substantially overlap (they estimate the same Jaccard).

The corpus is the sf0.001 documents fixture plus planted duplicates, so
the property runs against realistic text, not toy strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_band_df,
    shingles,
)

SF = "/root/testdata/sf0.001"

N_BASE = 60          # base docs from the fixture
N_EXACT = 12         # planted verbatim copies of base docs 0..11
N_NEAR = 12          # planted one-token-edited copies of base docs 20..31
EXACT_OFFSET = 100_000
NEAR_OFFSET = 200_000


def _planted_corpus(spark):
    """Fixture docs + planted exact copies (doc_id + EXACT_OFFSET) and
    near-dup copies with the 2nd token replaced (doc_id + NEAR_OFFSET)."""
    base = (
        load_table(spark, SF, "documents")
        .where(F.size(F.split("text", " ")) >= 20)
        .orderBy("doc_id")
        .limit(N_BASE)
        .select("doc_id", "text")
        .cache()
    )
    rows = base.collect()
    planted = [
        (r.doc_id + EXACT_OFFSET, r.text) for r in rows[:N_EXACT]
    ]
    for r in rows[20 : 20 + N_NEAR]:
        w = r.text.split(" ")
        w[1] = "zqxjk"  # token guaranteed absent from the corpus
        planted.append((r.doc_id + NEAR_OFFSET, " ".join(w)))
    extra = spark.createDataFrame(planted, "doc_id bigint, text string")
    expected_exact = {
        (r.doc_id, r.doc_id + EXACT_OFFSET) for r in rows[:N_EXACT]
    }
    expected_near = {
        (r.doc_id, r.doc_id + NEAR_OFFSET) for r in rows[20 : 20 + N_NEAR]
    }
    return base.union(extra), expected_exact, expected_near


def _candidates(docs, hash_fn):
    toks = F.split("text", " ")
    shingled = (
        docs.select("doc_id", toks.alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id", shingles(F.col("w"), 3, guard_short=False).alias("shingles")
        )
    )
    with_bands = minhash_band_df(
        shingled, "doc_id", "shingles", 8, 4, 2, hash_fn=hash_fn
    )
    pairs = lsh_candidate_pairs(with_bands, "doc_id", "bands", max_bucket=1000)
    return {(r.key_a, r.key_b) for r in pairs.collect()}


def test_exact_dupe_recall_is_one_under_xxhash64(spark):
    docs, exact, _ = _planted_corpus(spark)
    cand = _candidates(docs, "xxhash64")
    missed = exact - cand
    assert missed == set(), f"exact duplicates missed by xxhash64 LSH: {missed}"


def test_near_dupe_recall_high_and_deterministic(spark):
    """One-token edits at ~0.9 shingle-Jaccard: with 4 bands × 2 rows the
    analytic candidate probability is ≈0.999 per pair. The hash family is
    a fixed function of the fixed corpus, so measured recall is a pinned
    constant — assert a floor that the analytic expectation clears easily."""
    docs, _, near = _planted_corpus(spark)
    cand = _candidates(docs, "xxhash64")
    recall = len(near & cand) / len(near)
    assert recall >= 0.9, f"near-dup recall {recall} (found {near & cand})"


def test_md5_and_xxhash64_candidate_sets_agree(spark):
    """Both hash families must recover every exact pair, and their full
    candidate sets must overlap substantially: they are two estimators of
    the same shingle-Jaccard, differing only in the (deterministic)
    random draws of the hash family."""
    docs, exact, _ = _planted_corpus(spark)
    cand_md5 = _candidates(docs, "md5")
    cand_xx = _candidates(docs, "xxhash64")
    assert exact <= cand_md5 and exact <= cand_xx
    inter = len(cand_md5 & cand_xx)
    union = len(cand_md5 | cand_xx)
    overlap = inter / union if union else 1.0
    assert overlap >= 0.6, (
        f"candidate-set Jaccard between hash families = {overlap} "
        f"(md5={len(cand_md5)}, xxhash64={len(cand_xx)}, common={inter})"
    )


def test_retired_bands_twin_still_matches_its_oracle(spark):
    """r14 twin consolidation (registry capacity policy): the md5 twin
    `dedup_minhash_bands` is no longer a registered query, but its
    full-result oracle survives verbatim as MINHASH_BANDS_ORACLE and must
    keep hash-matching the function through the SAME gate the external
    driver applies (tests/oracle_harness.compare: rows + schema + sorted
    value hash at the oracle SF). One drifted hash constant or band
    grouping fails here exactly as it would have failed the driver."""
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        MINHASH_BANDS_ORACLE,
        dedup_minhash_bands,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle_harness import compare

    res = compare(
        "dedup_minhash_bands(retired twin)",
        spark,
        dedup_minhash_bands,
        MINHASH_BANDS_ORACLE,
        SF_ORACLE,
    )
    assert res.ok, res
