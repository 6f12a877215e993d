"""Property checks (SURVEY §5.2(5)) + promised cross-query invariants.

These pin relationships BETWEEN queries that the per-query oracle can't see:
approximate paths vs their exact baselines, algebraic row-count laws, and
checkpoint-recovery exactly-once.
"""

from __future__ import annotations

import time
from collections import defaultdict

import pyspark.sql.functions as F

from stockmarket_bigdata_project_spark.catalog import load_table
from stockmarket_bigdata_project_spark.llmdata import dedup as D
from stockmarket_bigdata_project_spark.llmdata import similarity as S


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF with nprobe=4 of 8 buckets must recover most of the exact top-k
    (it's approximate by design — the floor pins quality regressions)."""
    exact = {
        (r.query_id, r.cand_id) for r in S.knn_bruteforce(spark, sf_dir).collect()
    }
    approx = {(r.query_id, r.cand_id) for r in S.knn_ivf(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"


def test_semdedup_ann_sound_and_agrees_with_flat(spark, sf_dir):
    """The ANN-assigned SemDeDup twin trades assignment exactness, never
    removal soundness: (a) every vector it removes has a GENUINE cosine ≥ τ
    neighbor with a smaller id (checked against the all-pairs truth — a
    removal is justified by an exact cosine to a real bucket-mate, so no
    approximation can fabricate one); (b) per-vector kept flags agree with
    the flat-assignment twin on ≥ 85% of vectors (boundary vectors may land
    in a neighboring cell — the knn_ivf recall trade); (c) both twins cover
    every vector exactly once with the same output schema."""
    flat = {r.vec_id: r.kept for r in S.semdedup_survivors(spark, sf_dir).collect()}
    ann_rows = S.semdedup_survivors_ann(spark, sf_dir).collect()
    ann = {r.vec_id: r.kept for r in ann_rows}
    assert set(ann) == set(flat)  # same coverage, no drops/dups
    assert len(ann) == len(ann_rows)

    # (a) soundness: ANN-removed ⊆ {b | ∃ a<b with cos(a,b) ≥ τ}
    e = {r.vec_id: r.mvec for r in S._emb(spark, sf_dir).collect()}
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    ids = sorted(e)
    has_smaller_dup = set()
    for i, vb in enumerate(ids):
        for va in ids[:i]:
            if cos(e[va], e[vb]) >= S.SEMDEDUP_TAU:
                has_smaller_dup.add(vb)
                break
    removed_ann = {v for v, kept in ann.items() if kept == 0}
    unsound = removed_ann - has_smaller_dup
    assert not unsound, f"ANN removed vectors with no true dup: {sorted(unsound)[:5]}"

    # (b) agreement floor with the flat twin
    agree = sum(1 for v in flat if flat[v] == ann[v]) / len(flat)
    assert agree >= 0.85, f"kept-flag agreement collapsed: {agree:.3f}"


def test_lsh_candidates_superset_of_high_jaccard(spark, sf_dir):
    """Every pair the brute-force path scores above threshold must also be
    caught by the LSH path when it shares a full band (the planted near-dups
    in testdata are near-identical, so band collision is certain)."""
    brute = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(spark, sf_dir).filter("jaccard >= 0.8").collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(spark, sf_dir).collect()}
    assert brute <= lsh


def test_hyperplane_lsh_recall(spark, sf_dir):
    """The banded hyperplane LSH must recover most true near-dup pairs
    (approximate by design; the floor pins recall regressions)."""
    exact = {
        (r.vec_a, r.vec_b) for r in S.embedding_near_dup_pairs(spark, sf_dir).collect()
    }
    approx = {
        (r.vec_a, r.vec_b) for r in S.embedding_lsh_near_dup(spark, sf_dir).collect()
    }
    assert approx <= exact  # verification step guarantees no false positives
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.5, f"hyperplane LSH recall collapsed: {recall:.2f}"


def test_explode_rowcount_law(spark, sf_dir):
    """|explode(tokens)| == sum(size(tokens)) — the table-generating op
    neither invents nor drops rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    total = toks.select(F.sum(F.size("t"))).collect()[0][0]
    exploded = toks.select(F.explode("t")).count()
    assert exploded == total


def test_left_join_fillna_preserves_left_count(spark, sf_dir):
    """left ⟕ right + fillna keeps exactly the left cardinality when the
    right side is unique per key (the gold-build invariant)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").count()
    joined = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").na.fill(0)
    assert joined.count() == c.count()


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """T5: stop a stream mid-corpus, add more files, restart with the SAME
    checkpoint — the sink must hold every row exactly once (no reprocessing
    of committed batches, no loss)."""
    src, sink, chk = tmp_path / "src", tmp_path / "sink", tmp_path / "chk"

    def write_slice(offset):
        spark.range(offset, offset + 100).selectExpr(
            "id", "id * 2 AS doubled"
        ).coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(1.05)

    def run_once():
        q = (
            spark.readStream.schema("id long, doubled long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_slice(0)
    write_slice(100)
    run_once()  # processes rows 0..199, commits offsets
    write_slice(200)
    run_once()  # must process ONLY rows 200..299
    got = spark.read.parquet(str(sink))
    assert got.count() == 300
    assert got.select("id").distinct().count() == 300
    assert got.agg(F.sum("doubled")).collect()[0][0] == sum(2 * i for i in range(300))


def test_dup_components_match_union_find(spark, sf_dir):
    """The iterative label-propagation components must equal a driver-side
    union-find over the same verified pair set (pins transitivity: A~B, B~C
    ⇒ same component even when A~C was never a pair)."""
    pairs = [(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(spark, sf_dir).collect()]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member, matching the engine's min-propagation
    members: dict[int, list[int]] = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    expected = {x: min(members[find(x)]) for x in parent}
    got = {
        r.doc_id: r.component
        for r in D.minhash_dup_components(spark, sf_dir).collect()
    }
    assert got == expected


def test_dedup_survivors_partition_corpus(spark, sf_dir):
    """survivors + dropped non-canonicals = whole corpus, disjointly."""
    docs = load_table(spark, sf_dir, "documents").count()
    comp = D.minhash_dup_components(spark, sf_dir)
    dropped = comp.filter(F.col("doc_id") != F.col("component")).count()
    survivors = D.minhash_dedup_survivors(spark, sf_dir).count()
    assert survivors + dropped == docs


def test_dup_components_memo_contract(spark, sf_dir):
    """The resolved component relation is memoized per (app, sf_dir) —
    identity only, conf-free (r9: the conf-in-key variant cross-filed
    results when a handle's first action ran under a different conf than
    its construction). Repeat calls return the SAME DataFrame even across
    a shuffle-partitions flip; clear_staged_memo() — the determinism
    sweep's lever — forces a genuinely fresh resolution with identical
    rows."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    D.clear_staged_memo()
    first = D.minhash_dup_components(spark, sf_dir)
    assert D.minhash_dup_components(spark, sf_dir) is first
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        assert D.minhash_dup_components(spark, sf_dir) is first
        D.clear_staged_memo()
        fresh = D.minhash_dup_components(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert fresh is not first
    rows = lambda df: sorted((r.doc_id, r.component) for r in df.collect())
    assert rows(fresh) == rows(first)


def test_staged_lsh_relations_contract(spark, sf_dir):
    """The LSH candidate/verified-pair relations are staged (persist + memo
    per (app, sf_dir) — identity only, conf-free since r9): repeat calls
    return the SAME handle even across a shuffle-partitions flip (the
    conf-in-key variant cross-filed results when construction and first
    action ran under different confs); clear_staged_memo() forces a
    genuinely fresh computation with identical rows; and after a first
    action, later consumers read the in-memory relation
    (InMemoryTableScan in the executed plan) instead of re-running the
    shingle→minhash→band pipeline."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    D.clear_staged_memo()
    first = D.minhash_lsh_pairs(spark, sf_dir)
    assert D.minhash_lsh_pairs(spark, sf_dir) is first
    first.count()  # fills the persist cache
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        first.explain("formatted")
    plan = buf.getvalue()
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        assert D.minhash_lsh_pairs(spark, sf_dir) is first
        D.clear_staged_memo()
        fresh = D.minhash_lsh_pairs(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert fresh is not first
    rows = lambda df: sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())
    assert rows(fresh) == rows(first)


def test_corpus_clean_consistent_with_parts(spark, sf_dir):
    """corpus_clean must equal the manual composition of its three parts:
    quality floor (same formula as quality_scores), exact survivors, and
    near-dedup survivors — pins the inlined quality expressions to the
    textstats originals."""
    from stockmarket_bigdata_project_spark.llmdata import corpus as C
    from stockmarket_bigdata_project_spark.llmdata import textstats as T

    quality_ok = {
        r.doc_id
        for r in T.quality_scores(spark, sf_dir)
        .filter(F.col("quality_score") >= C.QUALITY_MIN)
        .collect()
    }
    exact_keep = {r.doc_id for r in D.dedup_exact_survivors(spark, sf_dir).collect()}
    near_keep = {r.doc_id for r in D.minhash_dedup_survivors(spark, sf_dir).collect()}
    expected = quality_ok & exact_keep & near_keep
    got = {r.doc_id for r in C.corpus_clean(spark, sf_dir).collect()}
    assert got == expected


def test_lsh_hot_bucket_cap_bounds_candidate_mass(spark, tmp_path):
    """The hot-bucket cap (LSH_BUCKET_CAP) must ENFORCE what the skew
    report measures: a synthetic mega-bucket — 40 byte-identical docs, one
    (band, sig) bucket of size 40 > 32 in every band — contributes ZERO
    candidate pairs (40·39/2 = 780 per band raw, the boilerplate blow-up),
    while a genuine near-dup pair in a small bucket still surfaces and
    verifies. Cross-checked three ways: the Spark pair set, the raw skew
    report (which must still SEE the mega-bucket: audit ≠ enforcement),
    and the DuckDB oracle on the same synthetic corpus (the cap is part of
    the value contract, not a Spark-side heuristic)."""
    import duckdb

    from tests.oracle_compare import compare

    mega_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_a = "red oak pine elm birch maple cedar willow aspen spruce fir"
    near_b = near_a + " larch"  # shares almost every 3-gram with near_a
    rows = [(i, mega_text, "en", "boiler", len(mega_text)) for i in range(40)]
    rows += [
        (100, near_a, "en", "web", len(near_a)),
        (101, near_b, "en", "web", len(near_b)),
    ]
    d = str(tmp_path / "megabucket")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(spark, d).collect()}
    assert (100, 101) in pairs, pairs
    assert all(a >= 100 for a, _ in pairs), (
        f"mega-bucket pairs leaked through the cap: {sorted(pairs)[:5]}"
    )

    skew = D.minhash_band_skew_report(spark, d).collect()
    assert max(r.max_bucket for r in skew) == 40  # audit still sees it raw
    assert max(r.candidate_pairs for r in skew) >= 780

    # the enforcement report must show exactly what the cap removed:
    # one 40-doc bucket per band, 40·39/2 = 780 pairs each
    capped = D.lsh_capped_buckets_report(spark, d).collect()
    assert {(r.band, r.n_capped_buckets, r.n_docs_capped, r.pairs_removed)
            for r in capped} == {(b, 1, 40, 780) for b in range(4)}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    compare(
        D.minhash_lsh_pairs(spark, d),
        con,
        D.ORACLE["minhash_lsh_pairs"],
        name="minhash_lsh_pairs[megabucket]",
    )
    con.close()


def test_fuzzy_decontam_catches_leakage_past_bucket_cap(spark, tmp_path):
    """The r8 blind spot, closed: benchmark content replicated MORE than
    LSH_BUCKET_CAP times in training collides in every band, so the
    shared dedup cap drops the bucket and minhash_lsh_pairs reports
    nothing — the heaviest leakage was exactly the case the old
    ride-the-staged-pairs decontam missed. The leak-safe form must
    quarantine ALL 40 replicas (train side uncapped: bench×train is
    bilinear), value-matched against the DuckDB oracle on the same
    synthetic corpus."""
    import duckdb

    from stockmarket_bigdata_project_spark.llmdata.decontam import (
        BENCH_MOD,
        ORACLE,
        decontam_fuzzy_pairs,
    )
    from tests.oracle_compare import compare

    leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean = "red oak pine elm birch maple cedar willow aspen spruce fir"
    # doc 0: the benchmark doc (0 % BENCH_MOD == 0); 40 training replicas
    # of it (ids chosen non-divisible by BENCH_MOD); two clean train docs
    train_ids = [i for i in range(1, 60) if i % BENCH_MOD != 0][:40]
    rows = [(0, leaked, "en", "bench", len(leaked))]
    rows += [(i, leaked, "en", "crawl", len(leaked)) for i in train_ids]
    rows += [(j, clean, "en", "web", len(clean)) for j in (101, 102)]
    d = str(tmp_path / "leak")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    D.clear_staged_memo()
    try:
        # the dedup path caps the 41-doc bucket away (by design): the only
        # surviving pair is the small-bucket control (101, 102)
        dedup_pairs = {
            (r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(spark, d).collect()
        }
        assert dedup_pairs == {(101, 102)}, sorted(dedup_pairs)[:5]
        # ... but decontamination must still see every replica
        got = {
            (r.bench_doc_id, r.train_doc_id)
            for r in decontam_fuzzy_pairs(spark, d).collect()
        }
        assert got == {(0, i) for i in train_ids}, sorted(got)[:5]

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')"
        )
        compare(
            decontam_fuzzy_pairs(spark, d),
            con,
            ORACLE["decontam_fuzzy_pairs"],
            name="decontam_fuzzy_pairs[leak]",
        )
        con.close()
    finally:
        D.clear_staged_memo()  # drop the synthetic-corpus staged relations


def test_word_ngrams_short_docs(spark):
    """Docs shorter than n yield zero grams (no underflow/negative slice);
    docs of exactly n yield one."""
    from stockmarket_bigdata_project_spark.llmdata.decontam import _word_ngrams

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b c d e"), (4, "")],
        "doc_id long, text string",
    )
    rows = _word_ngrams(df, 4).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add(r.gram)
    assert 1 not in per_doc and 4 not in per_doc
    assert per_doc[2] == {"a b c d"}
    assert per_doc[3] == {"a b c d", "b c d e"}


def test_decontam_never_flags_benchmark_docs(spark, sf_dir):
    """The contamination report is over TRAINING docs only — benchmark
    (holdout) docs must never appear, and every flagged doc must really
    share >=1 gram with the benchmark side."""
    from stockmarket_bigdata_project_spark.llmdata.decontam import (
        BENCH_MOD,
        decontam_overlap,
    )

    flagged = decontam_overlap(spark, sf_dir).collect()
    assert flagged, "tuned gram length should flag at least one doc"
    for r in flagged:
        assert r.doc_id % BENCH_MOD != 0
        assert r.n_shared_grams >= 1


def test_context_chunks_tile_every_document(spark, sf_dir):
    """Chunk windows must cover position 1..n_tokens with stride-sized
    starts, the last window must touch the document end, and every chunk
    except a short final one must be exactly CHUNK_LEN tokens."""
    from stockmarket_bigdata_project_spark.llmdata.sampling import (
        CHUNK_LEN,
        CHUNK_STRIDE,
        context_chunks,
    )

    rows = context_chunks(spark, sf_dir).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert per_doc
    for chunks in per_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)
        for i, r in enumerate(chunks):
            assert r.chunk_id == i
            assert r.start_tok == i * CHUNK_STRIDE + 1
            assert 1 <= r.n_chunk_tokens <= CHUNK_LEN
            if i < len(chunks) - 1:
                # every non-final window is full and the next start lies
                # inside it (stride < len ⇒ contiguous coverage w/ overlap)
                assert r.n_chunk_tokens == CHUNK_LEN
                nxt = chunks[i + 1]
                assert nxt.start_tok <= r.start_tok + r.n_chunk_tokens
        doc_end = chunks[-1].start_tok + chunks[-1].n_chunk_tokens - 1
        # no window may end past the document end the final window defines
        assert all(
            c.start_tok + c.n_chunk_tokens - 1 <= doc_end for c in chunks
        )


def test_boilerplate_strip_word_accounting(spark, sf_dir):
    """cleaned_text must contain exactly n_words - n_removed tokens, and
    removal counts must stay within the document."""
    from stockmarket_bigdata_project_spark.llmdata.decontam import (
        boilerplate_strip,
    )

    rows = boilerplate_strip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_removed <= r.n_words
        kept = len(r.cleaned_text.split(" ")) if r.cleaned_text else 0
        assert kept == r.n_words - r.n_removed


def test_pagerank_mass_and_floor_invariants(spark, sf_dir):
    """Fixed-point PageRank invariants that the oracle can't see failing
    gradually: (1) every node's rank ≥ its damping base (contributions are
    non-negative integers); (2) total mass never exceeds the initial
    PR_SCALE (floor divisions only ever LOSE mass, both in the per-node
    share split and the damping) — a sign flip or a double-count would
    break one of these immediately."""
    from stockmarket_bigdata_project_spark.llmdata.graph import (
        PR_SCALE,
        pagerank_near_dup,
    )

    rows = pagerank_near_dup(spark, sf_dir).collect()
    assert rows, "near-dup graph must be non-empty at every SF"
    total = sum(r.rank_fp for r in rows)
    assert total <= PR_SCALE, f"mass created: {total} > {PR_SCALE}"
    n = len(rows)
    base = (15 * (PR_SCALE // n)) // 100
    for r in rows:
        assert r.rank_fp >= base, (r.doc_id, r.rank_fp, base)
        assert abs(r.pagerank - r.rank_fp / 1.0e12) == 0.0


def test_bigram_lm_consistent_with_token_counts(spark, sf_dir):
    """Cross-operator accounting: every doc with ≥2 tokens has exactly
    n_tokens − 1 bigrams in the bigram LM output, and no doc has a
    negative bit cost (context counts dominate pair counts by
    construction)."""
    from stockmarket_bigdata_project_spark.llmdata.lm import bigram_lm_bits
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        lm_perplexity_bits,
    )

    bg = {r.doc_id: r for r in bigram_lm_bits(spark, sf_dir).collect()}
    for t in lm_perplexity_bits(spark, sf_dir).collect():
        if t.n_tokens >= 2:
            assert bg[t.doc_id].n_bigrams == t.n_tokens - 1, t
        else:
            assert t.doc_id not in bg
    assert all(r.sum_bits >= 0 for r in bg.values())


def test_bpe_trainer_rounds_monotone_and_complete(spark, sf_dir):
    """BPE trainer invariants: exactly BPE_ROUNDS merge rows; winning
    weights never increase across rounds (a merge can only keep or shrink
    any pair's count — unaffected pairs keep theirs, new pairs involving
    the merged symbol are bounded by its occurrence count); and round 1's
    winner equals bpe_merge_candidates' rank-1 row (same statistic)."""
    from stockmarket_bigdata_project_spark.llmdata.lm import (
        BPE_ROUNDS,
        bpe_merge_candidates,
        bpe_train_merges,
    )

    rows = sorted(
        bpe_train_merges(spark, sf_dir).collect(),
        key=lambda r: r.merge_round,
    )
    assert [r.merge_round for r in rows] == list(range(1, BPE_ROUNDS + 1))
    weights = [r.weight for r in rows]
    assert all(a >= b for a, b in zip(weights, weights[1:])), weights
    top1 = [
        r
        for r in bpe_merge_candidates(spark, sf_dir).collect()
        if r.merge_rank == 1
    ][0]
    assert rows[0].l + rows[0].r == top1.pair
    assert rows[0].weight == top1.weight


def test_deflate_ratio_orders_redundancy(spark):
    """The compression quality signal must rank template spam below
    diverse prose: repeated-token text compresses to a smaller ratio."""
    from stockmarket_bigdata_project_spark.llmdata import textstats as ts

    df = spark.createDataFrame(
        [
            (1, "src", "spam " * 200),
            (2, "src", " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))),
        ],
        "doc_id long, source string, text string",
    )
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def deflate_len(s):
        import zlib

        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), ts.DEFLATE_LEVEL))
        )

    out = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id",
            (
                deflate_len("text") / F.octet_length("text")
            ).alias("ratio"),
        ).collect()
    }
    assert 0 < out[1] < out[2] < 1.0, out


def test_sequence_packing_spans_tile_every_document(spark, sf_dir):
    """Packing must conserve tokens exactly: per doc, spans are disjoint,
    contiguous from 0, and sum to the doc's token count; per (source,
    sequence), spans sum to at most SEQ_LEN."""
    import pyspark.sql.functions as F

    from stockmarket_bigdata_project_spark.llmdata.sampling import (
        SEQ_LEN,
        sequence_packing_spans,
    )

    spans = sequence_packing_spans(spark, sf_dir).cache()
    try:
        docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.size(F.split("text", " ")).alias("n_toks")
        )
        per_doc = spans.groupBy("doc_id").agg(
            F.sum("span_toks").alias("covered"),
            F.min("tok_start").alias("first_start"),
            F.count("*").alias("n_spans"),
        )
        bad = (
            per_doc.join(docs_tbl, "doc_id")
            .filter(
                (F.col("covered") != F.col("n_toks"))
                | (F.col("first_start") != 0)
            )
            .count()
        )
        assert bad == 0
        overfull = (
            spans.groupBy("source", "seq_id")
            .agg(F.sum("span_toks").alias("fill"))
            .filter(F.col("fill") > SEQ_LEN)
            .count()
        )
        assert overfull == 0
    finally:
        spans.unpersist()


def test_rrf_ranks_are_proper_permutations(spark, sf_dir):
    """Per query: fused ranks must be exactly 1..HY_TOP_K with no ties,
    and every fused score must be positive and ≤ 2/(K_RRF+1)."""
    import pyspark.sql.functions as F

    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        HY_TOP_K,
        K_RRF,
        hybrid_retrieval_rrf,
    )

    out = hybrid_retrieval_rrf(spark, sf_dir).cache()
    try:
        per_q = out.groupBy("q_id").agg(
            F.count("*").alias("n"),
            F.countDistinct("fused_rank").alias("nd"),
            F.min("fused_rank").alias("lo"),
            F.max("fused_rank").alias("hi"),
        )
        bad = per_q.filter(
            (F.col("n") != HY_TOP_K)
            | (F.col("nd") != HY_TOP_K)
            | (F.col("lo") != 1)
            | (F.col("hi") != HY_TOP_K)
        ).count()
        assert bad == 0
        assert out.filter(
            (F.col("rrf") <= 0) | (F.col("rrf") > 2.0 / (K_RRF + 1))
        ).count() == 0
    finally:
        out.unpersist()


def test_cms_never_undercounts(spark, sf_dir):
    """The count-min estimator property: est ≥ exact for EVERY candidate
    (not just the reported heavy hitters) — rebuild the estimate without
    the threshold filter and assert the invariant corpus-wide."""
    import pyspark.sql.functions as F

    from stockmarket_bigdata_project_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    out = cms_heavy_hitters(spark, sf_dir)
    assert out.filter(F.col("overcount") < 0).count() == 0


def test_entity_resolution_blocking_complete_for_dist1(spark, sf_dir):
    """Recall proof by exhaustion at test scale: brute-force all
    distinct-name pairs within levenshtein ≤ ER_MAX_DIST and assert the
    blocked plan found every one (two-word names ⇒ one edit leaves one
    word intact ⇒ some blocking pass catches it)."""
    import pyspark.sql.functions as F

    from stockmarket_bigdata_project_spark.operators.linkage import (
        ER_MAX_DIST,
        entity_resolution_matches,
    )

    got = {
        (r["name_a"], r["name_b"])
        for r in entity_resolution_matches(spark, sf_dir).collect()
    }
    names = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_name")
        .distinct()
    )
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    brute = {
        (r["name_a"], r["name_b"])
        for r in a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= ER_MAX_DIST)
        .collect()
    }
    assert got == brute


def test_pq_codes_invariants(spark, sf_dir):
    """Every vector yields exactly PQ_SUB subspace rows with codes in
    [0, PQ_K); the codebook seed vectors (vec_id < PQ_K) encode themselves
    with zero quantization error in every subspace."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        PQ_K,
        PQ_SUB,
        pq_codes,
    )

    rows = pq_codes(spark, sf_dir).collect()
    per_vec = defaultdict(list)
    for r in rows:
        assert 0 <= r.code < PQ_K
        assert r.dist_sq >= 0
        per_vec[r.vec_id].append(r)
    assert all(len(v) == PQ_SUB for v in per_vec.values())
    for vid in range(PQ_K):
        assert all(r.dist_sq == 0 and r.code == vid for r in per_vec[vid])


def test_pq_adc_equals_lut_sum(spark, sf_dir):
    """A candidate's ADC distance must equal the sum over subspaces of the
    exact query↔codebook-entry distances its codes select — recomputed
    here from pq_codes + raw embeddings in Python ints."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        PQ_K,
        PQ_SUB,
        PQ_SUBDIM,
        pq_adc_topk,
        pq_codes,
    )
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq_

    from stockmarket_bigdata_project_spark.catalog import table_path

    t = pq_.read_table(table_path(sf_dir, "embeddings"),
                       columns=["vec_id", "embedding"])
    mvec = {
        vid: [int(Decimal(repr(x * 1_000_000)).quantize(
            Decimal(1), ROUND_HALF_UP)) for x in emb]
        for vid, emb in zip(t.column("vec_id").to_pylist(),
                            t.column("embedding").to_pylist())
    }
    codes = {
        (r.vec_id, r.sub_id): r.code
        for r in pq_codes(spark, sf_dir).collect()
    }

    def sub(v, s):
        return mvec[v][s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for r in pq_adc_topk(spark, sf_dir).collect():
        expect = sum(
            l2(sub(r.query_id, s), sub(codes[(r.cand_id, s)], s))
            for s in range(PQ_SUB)
        )
        assert r.adc_dist_sq == expect


def test_pq_rerank_recall_floor(spark, sf_dir):
    """The two-stage PQ path (ADC shortlist → exact re-rank) must keep a
    recall floor against exact L2 — approximate by design; the floor pins
    regressions in the shortlist cut or codebook resolution."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        pq_eval_recall,
    )

    rows = pq_eval_recall(spark, sf_dir).collect()
    recall = sum(r.n_hit for r in rows) / sum(r.n_exact for r in rows)
    assert recall >= 0.5, f"PQ re-rank recall collapsed: {recall:.2f}"


def test_pq_rerank_hits_rank_like_bruteforce(spark, sf_dir):
    """Re-rank exactness: any candidate in BOTH the re-ranked top-k and
    the exact top-k must carry the same exact L2 distance the brute-force
    scan computes (the re-rank stage may lose candidates the shortlist
    missed, but must never mis-rank one it has)."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_QUERIES,
        _emb,
        _pq_l2,
        pq_rerank_topk,
    )
    import pyspark.sql.functions as FF

    e = _emb(spark, sf_dir)
    q = e.filter(FF.col("vec_id") < N_QUERIES).select(
        FF.col("vec_id").alias("query_id"), FF.col("mvec").alias("qvec")
    )
    exact = {
        (r.query_id, r.vec_id): r.d
        for r in e.crossJoin(FF.broadcast(q))
        .filter(FF.col("vec_id") != FF.col("query_id"))
        .select(
            "query_id", "vec_id",
            _pq_l2("mvec", "qvec").cast("long").alias("d"),
        )
        .collect()
    }
    for r in pq_rerank_topk(spark, sf_dir).collect():
        assert exact[(r.query_id, r.cand_id)] == r.dist_sq


def test_ivf_pq_retention_floor(spark, sf_dir):
    """IVF pruning (NPROBE of N_CENTROIDS coarse buckets) must retain most
    of the un-pruned ADC top-k — approximate by design; the floor pins
    regressions in the coarse assignment / probe selection (measured
    0.88 at sf0.001, 0.76 at sf0.01)."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
    )

    iv = {
        (r.query_id, r.cand_id)
        for r in ivf_pq_topk(spark, sf_dir).collect()
    }
    ad = {
        (r.query_id, r.cand_id)
        for r in pq_adc_topk(spark, sf_dir).collect()
    }
    retention = len(iv & ad) / len(ad)
    assert retention >= 0.5, f"IVF-PQ retention collapsed: {retention:.2f}"


def test_containment_dominates_jaccard(spark, sf_dir):
    """Set algebra pins the three candidate verifiers together: for every
    verified LSH pair, each directional containment |A∩B|/|A| must be ≥ the
    Jaccard |A∩B|/|A∪B| of the same pair (union ⊇ either set), verified
    pairs must be a subset of the containment-report pairs (same candidate
    relation), and n_inter ≤ min(na, nb)."""
    cont = {
        (r.doc_a, r.doc_b): r
        for r in D.minhash_containment_pairs(spark, sf_dir).collect()
    }
    for r in cont.values():
        assert r.n_inter <= min(r.na, r.nb)
        assert r.containment_a >= r.n_inter / (r.na + r.nb - r.n_inter) - 1e-12
        assert r.containment_b >= r.n_inter / (r.na + r.nb - r.n_inter) - 1e-12
    verified = D.minhash_lsh_pairs(spark, sf_dir).collect()
    assert verified, "no verified pairs — testdata should plant near-dups"
    for v in verified:
        c = cont.get((v.doc_a, v.doc_b))
        assert c is not None, f"verified pair {v} missing from containment"
        jac = c.n_inter / (c.na + c.nb - c.n_inter)
        assert abs(jac - v.jaccard) < 1e-12


def test_incremental_minhash_matches_batch_boundary(spark, sf_dir):
    """The incremental near-dedup path must agree EXACTLY with the batch
    self-join restricted to batch↔corpus pairs: same band table, same
    hot-bucket cap, same verification ⇒ the (new, existing, jaccard) sets
    are equal — the invariant that lets a pipeline switch between full
    rebuilds and incremental runs without the corpus drifting."""
    inc = {
        (r.doc_id, r.dup_of_doc_id, r.jaccard)
        for r in D.incremental_minhash_new_docs(spark, sf_dir).collect()
    }
    is_new = lambda x: x % D.INCR_MOD == D.INCR_REM
    batch = set()
    for r in D.minhash_lsh_pairs(spark, sf_dir).collect():
        if is_new(r.doc_a) != is_new(r.doc_b):
            new, old = (
                (r.doc_a, r.doc_b) if is_new(r.doc_a) else (r.doc_b, r.doc_a)
            )
            batch.add((new, old, r.jaccard))
    assert inc == batch
    assert inc, "no batch-boundary near-dups in testdata — vacuous check"


def test_incremental_minhash_indexed_contains_rebuild_pairs(spark, sf_dir):
    """The stored-index twin must find EVERY pair the rebuild form finds:
    its hot-bucket set is computed from CORPUS occupancy alone, which is
    a subset of the full-table occupancy the rebuild form caps on
    (corpus ⊆ corpus+batch per bucket) — so the indexed candidate set,
    and hence the verified pair set, is a superset. A missing pair would
    mean the index drops candidates the nightly rebuild would catch —
    the one regression an incremental deployment must never have. Any
    extra indexed pairs must themselves verify at the same τ (they ride
    buckets the batch pushed over the cap), which the shared exact
    verification guarantees and the oracle already value-checks."""
    rebuild = {
        (r.doc_id, r.dup_of_doc_id)
        for r in D.incremental_minhash_new_docs(spark, sf_dir).collect()
    }
    indexed = {
        (r.doc_id, r.dup_of_doc_id)
        for r in D.incremental_minhash_indexed(spark, sf_dir).collect()
    }
    missing = rebuild - indexed
    assert not missing, f"stored index drops rebuild-form pairs: {missing}"
    assert rebuild, "no batch-boundary near-dups in testdata — vacuous check"
