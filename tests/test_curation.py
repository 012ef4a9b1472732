"""Structural invariants of the curation-family operators that the
value-hash gate can't express directly (cross-row properties)."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_LARGE = "/root/testdata/sf0.01"  # bigger corpus: z-bucket spread

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(_REPO, "jobs") not in sys.path:
    sys.path.insert(0, os.path.join(_REPO, "jobs"))


def _norm(v):
    """Full-precision value normalization — same policy as
    tools/check_contract.py (repr floats, nan sentinel)."""
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def _duck_on(base) -> "object":
    import duckdb  # noqa: PLC0415

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{base}/documents.parquet/*.parquet')"
    )
    return con


def _assert_engines_agree(spark, con, base, queries, names):
    for name in names:
        fn, sql = queries[name]
        got = sorted(
            tuple(_norm(v) for v in r) for r in fn(spark, str(base)).collect()
        )
        want = sorted(
            tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
        )
        assert got == want, f"{name} diverged on random corpus"


def test_sequence_packing_partitions_token_stream(spark):
    from doclayout_yolo_spark.queries_curation import sequence_packing

    rows = sequence_packing(spark, SF_DIR).orderBy("doc_id").collect()
    # spans tile the concatenated stream exactly: contiguous, gapless
    assert rows[0]["tok_start"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["tok_start"] == prev["tok_end"]
    total = sum(r["n_tokens"] for r in rows)
    assert rows[-1]["tok_end"] == total
    for r in rows:
        assert r["tok_end"] - r["tok_start"] == r["n_tokens"]
        assert r["first_block"] == r["tok_start"] // 256
        assert r["n_blocks"] >= 1


def test_dedup_paragraphs_no_duplicate_kept_chunks(spark):
    from doclayout_yolo_spark.queries_curation import CHUNK_W, dedup_paragraphs

    rows = dedup_paragraphs(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    seen: set[str] = set()
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        toks = docs[r["doc_id"]].split(" ")
        chunks = [
            " ".join(toks[i : i + CHUNK_W]) for i in range(0, len(toks), CHUNK_W)
        ]
        kept = [c for c in chunks if c not in seen]
        seen.update(chunks)
        # reassembled text == first-occurrence-filtered chunks joined
        assert r["dedup_text"] == " ".join(kept)
        assert r["n_kept"] == len(kept)


def test_boilerplate_strip_planted_templates(spark):
    # a 2-token "line" shared by >= BP_MIN_DF docs of ONE host is
    # stripped from that host only; the same line on a smaller host
    # survives (doc frequency is per-source, not global)
    from doclayout_yolo_spark.queries_curation import (
        BP_MIN_DF,
        boilerplate_strip_df,
    )

    tmpl = "cookie banner"
    rows = []
    for i in range(BP_MIN_DF):          # big host: template everywhere
        rows.append((i, "hostA", f"{tmpl} unique{i} tokA{i}"))
    for i in range(BP_MIN_DF - 1):      # small host: same line, below df
        rows.append((100 + i, "hostB", f"{tmpl} unique{i} tokB{i}"))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in boilerplate_strip_df(d).collect()}
    for i in range(BP_MIN_DF):
        r = out[i]
        assert r["n_chunks"] == 2 and r["n_boiler"] == 1
        assert r["clean_text"] == f"unique{i} tokA{i}"
    for i in range(BP_MIN_DF - 1):
        r = out[100 + i]
        assert r["n_boiler"] == 0
        assert r["clean_text"] == f"{tmpl} unique{i} tokB{i}"


def test_pagerank_mass_conservation(spark):
    from doclayout_yolo_spark.queries_curation import link_graph_pagerank

    rows = link_graph_pagerank(spark, SF_DIR).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    # no dangling nodes (out_deg >= 2 by construction) -> total rank ~ 1
    assert abs(total - 1.0) < 1e-6
    assert all(r["out_deg"] >= 2 for r in rows)
    assert all(r["pagerank"] > 0 for r in rows)


def test_weighted_sample_favors_longer_docs(spark):
    from doclayout_yolo_spark.queries_curation import WS_K, weighted_sample

    rows = weighted_sample(spark, SF_DIR).collect()
    assert len(rows) == min(WS_K, 50)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_sample = sum(r["n_chars"] for r in rows) / len(rows)
    # length-weighted sampling must pull the mean up
    assert mean_sample > mean_all


def test_crawl_snapshot_diff_statuses(spark):
    from doclayout_yolo_spark.queries_curation import crawl_snapshot_diff

    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = crawl_snapshot_diff(spark, SF_DIR).collect()
    by = {}
    for r in rows:
        by.setdefault(r["status"], []).append(r["doc_id"])
    # docs at id%10==0 are new; id%13==0 phantoms vanished; id%7==0 (and
    # not %10==0) changed
    assert set(by["added"]) == {i for i in range(n) if i % 10 == 0}
    assert set(by["removed"]) == {-i - 1 for i in range(n) if i % 13 == 0}
    assert set(by["changed"]) == {
        i for i in range(n) if i % 7 == 0 and i % 10 != 0
    }


def test_curate_job_end_to_end(spark, tmp_path_factory, monkeypatch):
    # the spark-submit funnel (dedup -> gate -> pack -> partitioned
    # write), driven in-process against the shared session
    import curate_job

    out = str(tmp_path_factory.mktemp("curate") / "out")
    monkeypatch.setattr(
        sys,
        "argv",
        ["curate_job.py", "--input", SF_DIR, "--output", out],
    )
    curate_job.main(stop_session=False)
    written = spark.read.parquet(out)
    assert "block_bucket" in written.columns  # partition column survives
    rows = written.collect()
    assert len(rows) > 0
    # packing invariants hold over the DEDUPED corpus
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    for prev, cur in zip(by_id, by_id[1:]):
        assert cur["tok_start"] == prev["tok_end"]
    for r in rows:
        assert len(r["dedup_text"].split(" ")) == r["n_tokens"]
        assert r["n_tokens"] >= 8  # quality gate applied


def test_curation_queries_tolerate_empty_corpus(spark, tmp_path_factory):
    # an empty (but correctly-schema'd) corpus must yield empty results,
    # never AnalysisException / div-by-zero / NPE — the partition-level
    # reality at 100 TB (many empty splits, filtered-out shards)
    from doclayout_yolo_spark.queries_curation import CURATION_QUERIES

    base = tmp_path_factory.mktemp("empty")
    empty_docs = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    )
    empty_events = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "value": pd.Series([], dtype="float64"),
            "props": pd.Series([], dtype="object"),
        }
    )
    spark.createDataFrame(
        empty_docs,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{base}/documents.parquet")
    spark.createDataFrame(
        empty_events,
        schema="event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{base}/events.parquet")
    from doclayout_yolo_spark.contract import ALL_QUERIES

    spark.createDataFrame(
        [], schema="vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{base}/embeddings.parquet")
    text_vector_names = [
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "simhash", "tfidf_top_terms", "lang_id", "quality_score",
        "token_count", "doc_rolling_fingerprint", "repetition_ratio",
        "dedup_clusters", "stratified_sample", "ann_cosine_topk",
        "ann_lsh_bucketed", "dedup_embedding_cosine",
        "simhash64_hamming_pairs", "decontaminate_against_eval",
        "dup_sentence_fraction", "lsh_bucket_cap_audit",
        "unigram_surprisal", "exact_substring_dup_fraction",
        "domain_token_budget", "quality_logreg_score", "lang_id_v2",
        "corpus_curation_v3", "chunk_passages", "url_policy_filter",
    ]
    todo = list(CURATION_QUERIES.items()) + [
        (n, ALL_QUERIES[n]) for n in text_vector_names
    ]
    for name, (fn, _sql) in todo:
        rows = fn(spark, str(base)).collect()
        assert rows == [], f"{name} returned rows on an empty corpus"


def test_curate_job_block_flag_changes_geometry(spark, tmp_path_factory, monkeypatch):
    import curate_job

    outs = {}
    for block in (64, 512):
        out = str(tmp_path_factory.mktemp(f"blk{block}") / "o")
        monkeypatch.setattr(
            sys, "argv",
            ["curate_job.py", "--input", SF_DIR, "--output", out,
             "--block", str(block)],
        )
        curate_job.main(stop_session=False)
        outs[block] = {
            r["doc_id"]: (r["first_block"], r["n_blocks"])
            for r in spark.read.parquet(out).collect()
        }
    # same docs, different block geometry: block counts shrink as the
    # block size grows
    assert outs[64].keys() == outs[512].keys()
    assert sum(v[1] for v in outs[64].values()) > sum(
        v[1] for v in outs[512].values()
    )


def test_curate_job_neardup_flag_drops_cluster_losers(
    spark, tmp_path_factory, monkeypatch
):
    # --neardup runs the full v3-style chain as a job: near-dup cluster
    # losers (same text modulo a copied prefix) never reach the output;
    # the cluster-minimum representative survives
    import curate_job

    base = tmp_path_factory.mktemp("ndjob")
    long_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    long_b = " ".join(f"zeta{i} eta{i} theta{i}" for i in range(12))
    rows = [
        (1, long_a), (2, long_a + " tail"),      # near-dups: keep 1
        (5, long_b), (9, long_b),                 # exact dups: keep 5
        (7, "completely different standalone document body " * 3),
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["s"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{base}/documents.parquet")
    out = str(base / "out")
    monkeypatch.setattr(
        sys, "argv",
        ["curate_job.py", "--input", str(base), "--output", out,
         "--min-tokens", "4", "--neardup"],
    )
    curate_job.main(stop_session=False)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 5, 7}


def test_curate_job_boilerplate_flag_strips_templates(
    spark, tmp_path_factory, monkeypatch
):
    # --boilerplate runs the CCNet-style host-template pass FIRST: a
    # BP_W-token window shared by >= BP_MIN_DF docs of one source never
    # reaches the packed output; unique body text survives verbatim
    import curate_job

    base = tmp_path_factory.mktemp("bpjob")
    # template = one BP_W-aligned window ("nav footer") planted at the
    # head of every doc of source s; bodies are unique and long enough
    # to clear the quality gate after stripping
    tmpl = "nav footer"
    rows = []
    for i in range(6):  # 6 >= BP_MIN_DF=5 docs share the template
        body = " ".join(f"body{i}w{j} extra{i}w{j}" for j in range(8))
        rows.append((i, tmpl + " " + body))
    rows.append((99, " ".join(f"solo{j} uniq{j}" for j in range(8))))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["s"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{base}/documents.parquet")
    out = str(base / "out")
    monkeypatch.setattr(
        sys, "argv",
        ["curate_job.py", "--input", str(base), "--output", out,
         "--min-tokens", "4", "--boilerplate"],
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        curate_job.main(stop_session=False)
    import json as _json

    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    got = spark.read.parquet(out).collect()
    texts = {r["doc_id"]: r["dedup_text"] for r in got}
    # every template-carrying doc survives but the template window is gone
    for i in range(6):
        assert i in texts
        assert "nav footer" not in texts[i]
        assert f"body{i}w0" in texts[i]
    assert "solo0" in texts[99]
    # the stats ledger reports exactly the 6 dropped template chunks
    assert stats["n_boiler_chunks_dropped"] == 6
    assert stats["n_input_docs"] == 7
    assert stats["n_output_docs"] == 7


def test_zorder_layout_gives_two_dimensional_locality(spark):
    # writing range-partitioned by zvalue must confine any single
    # src_key (and any single len_key band) to a small set of the 32
    # z-buckets — the min/max-pruning property the layout exists for
    from doclayout_yolo_spark.queries_curation import zorder_layout

    rows = zorder_layout(spark, SF_DIR_LARGE).collect()
    n_buckets = len({r["zbucket"] for r in rows})
    assert n_buckets > 4  # data actually spreads over the z range
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src_key"], set()).add(r["zbucket"])
    # each source bucket touches only a fraction of the z-buckets
    worst = max(len(v) for v in by_src.values())
    assert worst <= max(2, n_buckets // 2), (worst, n_buckets)
    # z-value decodes back to its keys (interleave is invertible)
    for r in rows[:50]:
        a = sum(((r["zvalue"] >> (2 * i + 1)) & 1) << i for i in range(8))
        b = sum(((r["zvalue"] >> (2 * i)) & 1) << i for i in range(8))
        assert (a, b) == (r["src_key"], r["len_key"])


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_randomized_differential_vs_duckdb(spark, tmp_path_factory, seed):
    # parity must hold on ARBITRARY corpora, not just the driver
    # fixture: random doc tables (uneven lengths, repeated chunks,
    # punctuation, sparse non-contiguous ids) run through both engines
    from doclayout_yolo_spark.queries_curation import CURATION_QUERIES

    rng = np.random.RandomState(seed)
    n = int(rng.randint(40, 120))
    ids = np.sort(rng.choice(5000, size=n, replace=False)).astype(np.int64)
    vocab = ["alpha", "beta", "gamma.", "d-4", "ee", "Zz"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 60)))
        for _ in range(n)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": rng.choice(["en", "de", "zh"], size=n),
            "source": [f"s{int(x)}" for x in rng.randint(0, 5, n)],
            "n_chars": [len(t) for t in texts],
        }
    )
    base = tmp_path_factory.mktemp(f"rnd{seed}")
    spark.createDataFrame(pdf).write.parquet(f"{base}/documents.parquet")
    _assert_engines_agree(
        spark,
        _duck_on(base),
        base,
        CURATION_QUERIES,
        [
            "dedup_paragraphs", "sequence_packing", "url_canonicalize",
            "link_graph_pagerank", "inverted_index", "zorder_layout",
            "weighted_sample", "host_quality_report",
        ],
    )


def test_randomized_differential_text_family(spark, tmp_path_factory):
    # the dedup/fingerprint family has the most intricate parity code
    # (hash folds, shingle caps, band buckets) — verify on one random
    # corpus that none of it depends on the driver fixture's shape
    from doclayout_yolo_spark.contract import ALL_QUERIES

    rng = np.random.RandomState(42)
    n = 80
    ids = np.sort(rng.choice(3000, size=n, replace=False)).astype(np.int64)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    # min length 1: docs with fewer than 3 tokens once CRASHED the
    # shingle family under ANSI (descending sequence -> w[i+2] OOB) and
    # diverged from DuckDB's empty-range semantics — keep them forever
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 50)))
        for _ in range(n)
    ]
    # plant exact + near duplicates so the dedup paths light up
    texts[10] = texts[5]
    texts[20] = texts[7] + " zeta"
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": rng.choice(["en", "de", "fr"], size=n),
            "source": [f"s{int(x)}" for x in rng.randint(0, 4, n)],
            "n_chars": [len(t) for t in texts],
        }
    )
    base = tmp_path_factory.mktemp("rndtext")
    spark.createDataFrame(pdf).write.parquet(f"{base}/documents.parquet")
    _assert_engines_agree(
        spark,
        _duck_on(base),
        base,
        ALL_QUERIES,
        [
            "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
            "simhash", "doc_rolling_fingerprint", "tfidf_top_terms",
            "token_count", "repetition_ratio",
            # round-4 additions: LM surprisal (log2 + decimal-mean
            # parity), substring coverage, budget window, logreg gate,
            # 8-script language ID — none may depend on fixture shape
            "unigram_surprisal", "exact_substring_dup_fraction",
            "domain_token_budget", "quality_logreg_score", "lang_id_v2",
            "lsh_bucket_cap_audit", "chunk_passages", "url_policy_filter",
        ],
    )


def _ref_bpe(word_counts, k):
    # independent pure-Python BPE (no Spark, no shared code): the
    # classic trainer — overlapping pair counts, (count desc, lhs,
    # rhs) tie-break, leftmost-first non-overlapping merge pass
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, a + b, cnt))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def test_bpe_distributed_matches_reference_on_arbitrary_corpus(spark):
    # a corpus with repeated-char runs (aaa -> non-overlapping merge),
    # apostrophes (SQL quoting), and skewed counts
    from doclayout_yolo_spark.queries_curation import bpe_learn_from_words

    wc = {
        "banana": 4,
        "bandana": 2,
        "aaa": 3,
        "can't": 1,
        "nana": 5,
        "ban": 2,
    }
    words = spark.createDataFrame(list(wc.items()), "w string, cnt long")
    got = [
        (r["lhs"], r["rhs"], r["new_token"], r["pair_count"])
        for r in bpe_learn_from_words(spark, words, 6)
        .orderBy("merge_rank")
        .collect()
    ]
    want = [(a, b, ab, c) for a, b, ab, c in _ref_bpe(wc, 6)]
    assert got == want, (got, want)


def test_bpe_contract_merges_match_reference_of_planted_sentence():
    from doclayout_yolo_spark.queries_curation import BPE_MERGES, BPE_SENT

    wc = {}
    for w in BPE_SENT.split(" "):
        wc[w] = wc.get(w, 0) + 1
    ref = _ref_bpe(wc, BPE_MERGES)
    # the oracle literals in _bpe_oracle_sql must equal the reference
    from doclayout_yolo_spark.queries_curation import _bpe_oracle_sql

    sql = _bpe_oracle_sql()
    for r, (a, b, ab, c) in enumerate(ref):
        assert f"SELECT {r} AS merge_rank, '{a}' AS lhs, '{b}' AS rhs, '{ab}' AS new_token, {c} * n.c AS pair_count" in sql


def test_bpe_tokens_with_backslash_and_quote_survive_sql_quoting(spark):
    from doclayout_yolo_spark.queries_curation import bpe_learn_from_words

    wc = {"a\\b": 3, "a\\b'c": 2, "a'a": 2}
    words = spark.createDataFrame(list(wc.items()), "w string, cnt long")
    got = [
        (r["lhs"], r["rhs"], r["new_token"], r["pair_count"])
        for r in bpe_learn_from_words(spark, words, 3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == [(a, b, ab, c) for a, b, ab, c in _ref_bpe(wc, 3)], got
