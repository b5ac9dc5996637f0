#!/usr/bin/env python
"""END-TO-END planted-pair recall of the embedding corpus-build
composition (r11 verdict task #5): the measured multiprobe recall table
(AUTOGEN:MULTIPROBE_RECALL, 0.93 at depth 4) covers the standalone pair
operator; ``pipeline_corpus_build_embdup`` runs that operator at cap 16 /
cos >= 0.3 and then CC + keep-longest survivor resolution — this tool
measures what fraction of PLANTED semantic near-dup pairs actually make
it all the way to the survivor decision, so the composition's recall is
a number, not an inference from the operator table.

Construction reuses tools/multiprobe_recall.py verbatim (hash-decorrelated
sf0.1 embeddings + every-8th perturbed twin spanning exact cos 0.85-0.99,
partner doc text HALF the base length so keep-longest must drop it), then
runs the composition's OWN stage chain — ``embedding_multiprobe_pairs``
(tau 0.3, cap 16) → ``connected_components`` → ``resolve_near_duplicates``
(keep longest) — and reports, per exact-cos band:

  - clustered:  both pair members got the same component label
    (recall through pair build + CC; transitive closure can recover
    pairs the probe union missed directly),
  - removed:    the planted partner is gone from the survivor set
    (the end-to-end outcome a training corpus actually sees).

It also writes the planted corpus as a parquet sf-dir and executes the
REGISTERED query fn on it (the load_table path), so the measurement and
the driver-facing entry run the same code.

Usage: python tools/embdup_pipeline_recall.py [--update-md]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiprobe_recall import MIX, _hash_noise  # noqa: E402  (tools sibling)
from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.similarity import (
    as_double,
    cosine,
)
from tbench_agentic_data_pipeline_spark.session import get_session

from tbench_agentic_data_pipeline_spark.operators.corpus import (
    EMBDUP_MAX_CELL as CAP,  # the composition's bounded-split cap
    EMBDUP_TAU as TAU_EDGE,  # the composition's edge threshold
)

SF_DIR = "/root/testdata/sf0.1"
TAU_TRUTH = 0.85  # the near-dup band planted pairs are judged in
PARTNER_OFFSET = 1_000_000
START = "<!-- AUTOGEN:EMBDUP_E2E_RECALL -->"
END = "<!-- /AUTOGEN:EMBDUP_E2E_RECALL -->"

LANGS = ("en", "de", "es", "fr", "zh")


def build_planted(spark: SparkSession, sf_dir: str, every: int = 8):
    """(corpus_embeddings, documents, planted_pairs) — the
    multiprobe_recall construction plus matching documents whose partner
    text is HALF the base token count (keep-longest must remove the
    partner whenever the pair clusters together). planted_pairs carries
    the EXACT cosine recomputed from the final vectors."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    rms = (
        emb.select(F.explode("emb").alias("x"))
        .agg(F.sqrt(F.avg(F.col("x") * F.col("x"))))
        .collect()[0][0]
    )
    amp = 0.5 * float(rms)
    base = emb.select(
        "vec_id",
        "label",
        F.transform("emb", _hash_noise(F.col("vec_id"), 0, amp)).alias("emb"),
    )
    mix = F.element_at(
        F.array(*[F.lit(c) for c in MIX]),
        (F.col("vec_id") / every % len(MIX)).cast("int") + 1,
    )
    partners = (
        base.where(F.col("vec_id") % every == 0)
        .select(
            (F.col("vec_id") + PARTNER_OFFSET).alias("vec_id"),
            "label",
            F.transform(
                "emb",
                lambda x, i: x
                + mix
                * F.lit(2.0 * amp)
                * (
                    (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), i, F.lit(7)),
                            F.lit(2001),
                        )
                        - 1000
                    )
                    / 1000.0
                ),
            ).alias("emb"),
        )
    )
    corpus = base.unionByName(partners).localCheckpoint()

    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.col("vec_id") % len(LANGS)).cast("int") + 1,
    )
    n_tok = F.when(F.col("vec_id") >= PARTNER_OFFSET, 20).otherwise(40)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.concat(
                F.lit("w"), ((F.col("vec_id") * 131 + i) % 9973).cast("string")
            ),
        ),
        " ",
    )
    docs = corpus.select(
        F.col("vec_id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.lit("planted").alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )

    a = corpus.select(F.col("vec_id").alias("va"), F.col("emb").alias("ea"))
    b = corpus.select(F.col("vec_id").alias("vb"), F.col("emb").alias("eb"))
    planted = (
        a.where(F.col("va") % every == 0)
        .where(F.col("va") < PARTNER_OFFSET)
        .join(b, F.col("vb") == F.col("va") + PARTNER_OFFSET)
        .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .select("va", "vb", "cos")
    )
    return corpus, docs, planted


def stage_chain_metrics(corpus: DataFrame, docs: DataFrame, planted: DataFrame):
    """Run the composition's own stage chain on the planted corpus and
    return per-band rows + the total row of planted-pair outcomes."""
    from tbench_agentic_data_pipeline_spark.operators.corpus import (
        _BROADCAST_LABELS_BELOW,
    )
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        connected_components,
        resolve_near_duplicates,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        embedding_multiprobe_pairs,
    )

    pairs = embedding_multiprobe_pairs(corpus, tau=TAU_EDGE, max_cell=CAP)
    clusters = connected_components(
        pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    )
    n_labels = clusters.count()
    surv = resolve_near_duplicates(
        docs,
        clusters,
        "doc_id",
        prefer=[F.length("text").desc()],
        keep_cluster_col="cluster_id",
        n_labels=n_labels,
        broadcast_labels_below=_BROADCAST_LABELS_BELOW,
    )

    lab = clusters.select("node", "label").localCheckpoint()
    la = lab.select(F.col("node").alias("va"), F.col("label").alias("lab_a"))
    lb = lab.select(F.col("node").alias("vb"), F.col("label").alias("lab_b"))
    kept = surv.select(F.col("doc_id").alias("vb"), F.lit(True).alias("kept"))
    judged = (
        planted.where(F.col("cos") >= TAU_TRUTH)
        .join(la, "va", "left")
        .join(lb, "vb", "left")
        .join(kept, "vb", "left")
        .select(
            "cos",
            (
                F.col("lab_a").isNotNull()
                & (F.col("lab_a") == F.col("lab_b"))
            ).alias("clustered"),
            F.col("kept").isNull().alias("removed"),
        )
        .localCheckpoint()
    )
    band = F.when(F.col("cos") < 0.90, "0.85-0.90").otherwise(
        F.when(F.col("cos") < 0.95, "0.90-0.95").otherwise("0.95-1.00")
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("clustered").cast("double")).alias("clustered"),
        F.avg(F.col("removed").cast("double")).alias("removed"),
    ]
    rows = judged.groupBy(band.alias("band")).agg(*aggs).orderBy("band").collect()
    total = judged.agg(*aggs).collect()[0]
    return rows, total


def main() -> None:
    update_md = "--update-md" in sys.argv
    spark = get_session("embdup-e2e-recall")

    corpus, docs, planted = build_planted(spark, SF_DIR)

    # 1) the registered query runs end-to-end on the planted corpus via
    #    the same load_table path the driver uses
    tmp = tempfile.mkdtemp(prefix="embdup_recall_sf_")
    try:
        corpus.select(
            "vec_id",
            F.col("emb").cast("array<float>").alias("embedding"),
            "label",
        ).write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
        docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        from tbench_agentic_data_pipeline_spark.operators.corpus import (
            pipeline_corpus_build_embdup,
        )

        acct = {
            r["lang"]: r.asDict()
            for r in pipeline_corpus_build_embdup(spark, tmp).collect()
        }
        assert sum(r["embdup_survivors"] for r in acct.values()) > 0, (
            "registered query found no embedding clusters on the planted corpus"
        )
        print("registered-query accounting on planted corpus:", file=sys.stderr)
        for lang in sorted(acct):
            print(f"  {acct[lang]}", file=sys.stderr)

        # 2) the pair-level chain measurement (same functions, same params)
        rows, total = stage_chain_metrics(corpus, docs, planted)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert total["n"] >= 200, (
        f"only {total['n']} planted pairs landed >= {TAU_TRUTH}"
    )

    def fmt(r, name):
        return (
            f"| {name} | {r['n']} | {r['clustered']:.3f} | {r['removed']:.3f} |"
        )

    lines = [
        "| exact-cos band | planted pairs | clustered (pair build + CC) "
        "| partner removed by survivor resolution |",
        "|---|---|---|---|",
        *[fmt(r, r["band"]) for r in rows],
        fmt(total, f"all >= {TAU_TRUTH}"),
    ]
    table = (
        f"Planted-pair recall THROUGH `pipeline_corpus_build_embdup`'s stage "
        f"chain (`embedding_multiprobe_pairs` tau {TAU_EDGE} cap {CAP} → "
        f"`connected_components` → keep-longest `resolve_near_duplicates`): "
        f"sf0.1 embeddings hash-decorrelated + {total['n']} perturbed twins "
        f"at exact cos ≥ {TAU_TRUTH} with HALF-length partner docs; "
        f"'clustered' = same component label, 'removed' = the partner is "
        f"absent from the survivor set (the end-to-end corpus outcome). The "
        f"registered query fn is also executed on the planted corpus via "
        f"the parquet/load_table path before the chain is measured.\n\n"
        + "\n".join(lines)
    )
    print(table)
    print(
        json.dumps(
            {"rows": [r.asDict() for r in rows], "total": total.asDict()}
        )
    )

    if update_md:
        md_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.md",
        )
        with open(md_path) as f:
            md = f.read()
        block = f"{START}\n{table}\n{END}"
        if START in md:
            pre = md[: md.index(START)]
            post = md[md.index(END) + len(END):]
            md = pre + block + post
        else:
            raise SystemExit("no AUTOGEN:EMBDUP_E2E_RECALL block in SCALING.md")
        with open(md_path, "w") as f:
            f.write(md)
        print("SCALING.md updated", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
