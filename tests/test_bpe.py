"""BPE trainer: the distributed merge loop must reproduce the classic
sequential algorithm (Sennrich et al. 2016, `learn_bpe` — public
reference implementation) exactly, merge for merge, on any corpus —
same pair statistics, same greedy argmax with lexicographic tie-break,
same non-overlapping left-to-right merge application."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F


def _reference_bpe(word_freqs: dict[str, int], num_merges: int,
                   min_count: int = 2) -> list[tuple[str, str]]:
    """Pure-Python Sennrich-style BPE with deterministic tie-break
    (max count, then lexicographically smallest (lhs, rhs))."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _cnt = best
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


CORPORA = [
    ["the cat sat on the mat", "the bat and the cat", "a cat a mat"],
    ["aaa aaaa aa", "aaa aaa"],  # overlap semantics: aaa -> [aa, a]
    ["low lower lowest", "new newer newest", "wide wider widest"],
    ["x", "y z"],  # single-char words: nothing to merge
]


@pytest.mark.parametrize("lines", CORPORA)
def test_bpe_train_matches_sequential_reference(spark, lines):
    from tbench_agentic_data_pipeline_spark.operators.text import bpe_train

    docs = spark.createDataFrame([(ln,) for ln in lines], "text string")
    freqs: collections.Counter = collections.Counter()
    for ln in lines:
        for w in ln.split(" "):
            if w:
                freqs[w] += 1
    expected = _reference_bpe(dict(freqs), num_merges=6)
    got = bpe_train(docs, num_merges=6, checkpoint_every=3)
    assert got == expected


def test_bpe_apply_merge_is_left_to_right_non_overlapping(spark):
    from tbench_agentic_data_pipeline_spark.operators.text import (
        bpe_apply_merge,
    )

    rows = [
        (["a", "a", "a"], ["aa", "a"]),
        (["a", "a", "a", "a"], ["aa", "aa"]),
        (["b", "a", "a", "b"], ["b", "aa", "b"]),
        (["a"], ["a"]),
        ([], []),
        (["a", "b", "a", "a"], ["a", "b", "aa"]),
    ]
    df = spark.createDataFrame(
        [(syms,) for syms, _ in rows], "syms array<string>"
    )
    got = [
        r["m"]
        for r in df.select(
            bpe_apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert got == [exp for _, exp in rows]


def test_bpe_pairs_query_counts_are_exact(spark):
    """The registered query's bigram counting must agree with a direct
    Python count over the same fixture slice."""
    from tbench_agentic_data_pipeline_spark import registry

    e = registry.collect()["text_bpe_pairs"]
    out = {
        (r["lhs"], r["rhs"]): (r["cnt"], r["rank"])
        for r in e.fn(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    docs = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    counts: collections.Counter = collections.Counter()
    for (text,) in docs:
        for w in text.split(" "):
            if len(w) >= 2:
                for a, b in zip(w, w[1:]):
                    counts[(a, b)] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(out) == 20
    for rank, ((lhs, rhs), cnt) in enumerate(top, start=1):
        assert out[(lhs, rhs)] == (cnt, rank)


def _reference_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    for w in text.split(" "):
        syms = list(w)
        for a, b in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        out.extend(syms)
    return out


def test_bpe_train_save_load_encode_lifecycle(spark, tmp_path):
    """The full tokenizer lifecycle: train -> persist (versioned
    snapshot) -> load -> apply, with the distributed encode matching a
    sequential reference token-for-token."""
    from tbench_agentic_data_pipeline_spark.operators.text import (
        bpe_encode,
        bpe_train,
        load_bpe_merges,
        save_bpe_merges,
    )

    lines = ["the cat sat on the mat", "the bat and the cat", "a cat a mat"]
    docs = spark.createDataFrame([(ln,) for ln in lines], "text string")
    merges = bpe_train(docs, num_merges=5)
    assert merges  # corpus has repeats; something must merge

    root = str(tmp_path / "bpe")
    v = save_bpe_merges(spark, merges, root)
    assert v >= 1
    assert load_bpe_merges(spark, root) == merges

    got = {
        r["text"]: list(r["tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for ln in lines:
        assert got[ln] == _reference_encode(ln, merges), ln
    # merged text must reconstruct the original (lossless tokenization)
    for ln in lines:
        assert "".join(got[ln]) == ln.replace(" ", "")


def test_bpe_encode_handles_irregular_whitespace(spark):
    """r8 self-review: Spark's sequence(1, 0) counts DOWN, so an empty
    word (double/leading/trailing spaces) used to emit two phantom
    empty-string tokens. Encoding must match the sequential reference
    (which emits nothing for empty words) and stay lossless."""
    from tbench_agentic_data_pipeline_spark.operators.text import bpe_encode

    lines = ["a  b", " x", "y ", "", "a b  c"]
    docs = spark.createDataFrame([(ln,) for ln in lines], "text string")
    got = {
        r["text"]: list(r["tokens"])
        for r in bpe_encode(docs, [("a", "b")]).collect()
    }
    for ln in lines:
        assert got[ln] == _reference_encode(ln, [("a", "b")]), repr(ln)
        assert "".join(got[ln]) == ln.replace(" ", ""), repr(ln)
