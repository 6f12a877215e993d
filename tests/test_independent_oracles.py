"""Third-opinion oracles (r3 verdict task 2, second layer): for the
tokenization/regex-heavy queries that went red at the r3 gate — extended in
r5 to the never-gate-checked window tier (regex ticker extraction, the
sentiment lexicon, ml direction counts, finance vwap) — recompute the
expected result in PURE PYTHON from the parquet bytes — no Spark, no
DuckDB — and require the Spark result to match it exactly. The DuckDB
oracle and the Spark plan could drift together on a shared idiom
(regexp_extract_all semantics, string_split edge cases) and the pairwise
compare would stay green; a third independent implementation (including a
THIRD regex engine: Python re vs Java vs RE2) breaks the tie. (The r3
reds' actual root cause — HUGEINT dtype leakage — is caught by
test_oracle_portability; this guards the residual value-level class.)"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from stockmarket_bigdata_project_spark.catalog import table_path
from stockmarket_bigdata_project_spark.llmdata.textstats import (
    N_RARE_TOKENS,
    rare_token_ratio,
    token_counts,
    vocab_frequency_spectrum,
)

_BPE_RE = re.compile(r"[a-z]{1,4}|[0-9]+|[^a-z0-9 ]")


def _docs(sf_dir):
    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "source", "text"])
    return list(zip(*[t.column(c).to_pylist()
                      for c in ("doc_id", "source", "text")]))


def _round_half_up_micro(num: int, den: int) -> int:
    return (2 * 1_000_000 * num + den) // (2 * den)


def test_token_counts_pure_python(spark, sf_dir):
    per_source = defaultdict(lambda: [0, 0, 0])  # n_docs, ws, bpe
    for _, source, text in _docs(sf_dir):
        s = per_source[source]
        s[0] += 1
        s[1] += len(text.split(" "))
        s[2] += len(_BPE_RE.findall(text))
    expect = {
        src: (n, ws, bpe, _round_half_up_micro(bpe, n))
        for src, (n, ws, bpe) in per_source.items()
    }
    got = {
        r.source: (r.n_docs, r.total_ws_tokens, r.total_bpe_tokens,
                   r.avg_bpe_micro)
        for r in token_counts(spark, sf_dir).collect()
    }
    assert got == expect


def test_vocab_frequency_spectrum_pure_python(spark, sf_dir):
    vocab = Counter()
    for _, _, text in _docs(sf_dir):
        vocab.update(text.split(" "))
    spectrum = defaultdict(lambda: [0, 0])
    for freq in vocab.values():
        spectrum[freq][0] += 1
        spectrum[freq][1] += freq
    expect = {f: tuple(v) for f, v in spectrum.items()}
    got = {
        r.tok_freq: (r.n_types, r.token_mass)
        for r in vocab_frequency_spectrum(spark, sf_dir).collect()
    }
    assert got == expect


def test_rare_token_ratio_pure_python(spark, sf_dir):
    rows = _docs(sf_dir)
    vocab = Counter()
    for _, _, text in rows:
        vocab.update(text.split(" "))
    rare = {
        tok for tok, _ in sorted(vocab.items(), key=lambda kv: (kv[1], kv[0]))
        [:N_RARE_TOKENS]
    }
    expect = {}
    for doc_id, _, text in rows:
        toks = text.split(" ")
        n_rare = sum(1 for t in toks if t in rare)
        expect[doc_id] = (
            len(toks), n_rare, _round_half_up_micro(n_rare, len(toks))
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_rare, r.rare_ratio_micro)
        for r in rare_token_ratio(spark, sf_dir).collect()
    }
    assert got == expect


# --- r5-window tier: regex / lexicon / ml / finance third opinions ----------
def test_extract_tickers_v1_pure_python(spark, sf_dir):
    """Third regex engine (Python re vs Spark's Java regex vs DuckDB's RE2)
    over the v1 bare-token rule."""
    from stockmarket_bigdata_project_spark.functions.text import (
        KNOWN_TICKERS,
        extract_tickers_v1,
    )

    pat = re.compile(r"\b([a-z]{1,5})\b")
    known = set(KNOWN_TICKERS)
    expect = set()
    for doc_id, _, text in _docs(sf_dir):
        for tok in dict.fromkeys(pat.findall(text)):  # distinct, order-free
            if tok in known:
                expect.add((doc_id, tok))
    got_rows = extract_tickers_v1(spark, sf_dir).collect()
    got = {(r.doc_id, r.ticker) for r in got_rows}
    assert len(got_rows) == len(got)  # array_distinct ⇒ no dup pairs
    assert got == expect


def test_extract_tickers_v2_pure_python(spark, sf_dir):
    """v2: $-prefixed 1-5 char uppercase + bare 3-5 char lowercase, on the
    synthesized cashtag text '$<LANG> <text>'."""
    from stockmarket_bigdata_project_spark.functions.text import (
        KNOWN_TICKERS,
        extract_tickers_v2,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "lang", "text"])
    rows = list(zip(*[t.column(c).to_pylist()
                      for c in ("doc_id", "lang", "text")]))
    dollar = re.compile(r"\$([A-Z]{1,5})")
    bare = re.compile(r"\b([a-z]{3,5})\b")
    known = set(KNOWN_TICKERS) | {"DE", "EN", "FR", "ES", "ZH"}
    expect = set()
    for doc_id, lang, text in rows:
        post = f"${lang.upper()} {text}"
        for tok in dict.fromkeys(dollar.findall(post) + bare.findall(post)):
            if tok in known:
                expect.add((doc_id, tok))
    got_rows = extract_tickers_v2(spark, sf_dir).collect()
    got = {(r.doc_id, r.ticker) for r in got_rows}
    assert len(got_rows) == len(got)
    assert got == expect


def test_sentiment_score_pure_python(spark, sf_dir):
    """Integer-rational lexicon polarity, recomputed with Python ints; the
    final /1e6 is the same binary64 division both engines run."""
    from stockmarket_bigdata_project_spark.functions.text import (
        NEG_WORDS,
        POS_WORDS,
        sentiment_score,
    )

    pos, neg = set(POS_WORDS), set(NEG_WORDS)
    expect = {}
    for doc_id, _, text in _docs(sf_dir):
        toks = text.split(" ")
        d = sum(t in pos for t in toks) - sum(t in neg for t in toks)
        nt = len(toks)
        num = abs(d) * 2_000_000 + nt
        q = num // (2 * nt)
        sign = (d > 0) - (d < 0)
        expect[doc_id] = float(sign * q) / 1e6
    got = {r.doc_id: r.sentiment
           for r in sentiment_score(spark, sf_dir).collect()}
    assert got == expect


def _ohlcv_py(sf_dir):
    """Pure-Python supplier_daily_ohlcv twin (min_by/max_by on the packed
    total-order key, matching operators/gold.py:_ord_key)."""
    import datetime as dt

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_quantity",
                 "l_orderkey", "l_linenumber"],
    )
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    groups = {}
    for sk, sd, px, qty, ok, ln in zip(
        cols["l_suppkey"], cols["l_shipdate"], cols["l_extendedprice"],
        cols["l_quantity"], cols["l_orderkey"], cols["l_linenumber"]
    ):
        day = sd.date() if isinstance(sd, dt.datetime) else sd
        key = (ok * 16 + ln) * 100_000_000 + int(px * 100 + 0.5)
        g = groups.setdefault((sk, day), [])
        g.append((key, px, qty))
    out = {}
    for k, rows in groups.items():
        open_px = min(rows)[1]
        close_px = max(rows)[1]
        out[k] = {
            "open": open_px, "close": close_px,
            "high": max(r[1] for r in rows), "low": min(r[1] for r in rows),
            "volume": sum(r[2] for r in rows),
        }
    return out


def test_confusion_matrix_pure_python(spark, sf_dir):
    """Direction confusion counts from the pure-Python OHLCV twin — pins
    min_by/max_by tie semantics AND the lead/lag comparison logic with
    exact integer outputs."""
    from stockmarket_bigdata_project_spark.ml import confusion_matrix

    daily = _ohlcv_py(sf_dir)
    series = defaultdict(list)
    for (sk, day), v in daily.items():
        series[sk].append((day, v["close"]))
    counts = Counter()
    for sk, rows in series.items():
        rows.sort()
        closes = [c for _, c in rows]
        for i in range(1, len(closes) - 1):
            counts[
                (int(closes[i + 1] > closes[i]), int(closes[i] > closes[i - 1]))
            ] += 1
    got = {(r.dir_actual, r.dir_pred): r.n
           for r in confusion_matrix(spark, sf_dir).collect()}
    assert got == {k: v for k, v in counts.items()}


def test_vwap_daily_pure_python(spark, sf_dir):
    """VWAP with exact Decimal(2dp) sums in Python, final division in
    binary64 — the same op order as the Spark plan and the DuckDB oracle."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    from stockmarket_bigdata_project_spark.operators.finance import vwap_daily

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_quantity"],
    )
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    acc = {}
    cent = Decimal("0.01")
    for sk, sd, px, qty in zip(cols["l_suppkey"], cols["l_shipdate"],
                               cols["l_extendedprice"], cols["l_quantity"]):
        day = sd.date() if isinstance(sd, dt.datetime) else sd
        # repr(double) is the shortest decimal — the same value Spark's
        # double→DECIMAL(27,2) cast rounds HALF_UP at 2dp
        notional = Decimal(repr(px * qty)).quantize(cent, ROUND_HALF_UP)
        s = acc.setdefault((sk, day), [Decimal(0), 0])
        s[0] += notional
        s[1] += qty
    expect = {k: (float(s[0]) / s[1], s[1]) for k, (s) in
              ((k, v) for k, v in acc.items())}
    got = {(r.l_suppkey, r.trade_date): (r.vwap, r.total_qty)
           for r in vwap_daily(spark, sf_dir).collect()}
    assert got == expect


def test_eval_metrics_pure_python(spark, sf_dir):
    """Pure-Python recompute of the naive-forecast error metrics — the most
    determinism-engineered float surface in the r5 window (decimal MAE sum,
    BIGINT square-cents RMSE, integer-rational MAPE)."""
    from decimal import ROUND_HALF_UP, Decimal

    from stockmarket_bigdata_project_spark.ml import eval_metrics

    daily = _ohlcv_py(sf_dir)
    series = defaultdict(list)
    for (sk, day), v in daily.items():
        series[sk].append((day, v["close"]))

    def half_up(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    micro6 = Decimal("0.000001")
    expect = {}
    for sk, rows in series.items():
        rows.sort()
        closes = [c for _, c in rows]
        if len(closes) < 2:
            continue
        mae_sum = Decimal(0)
        sq_sum = 0
        mape_sum = 0
        dir_hits = []
        n = 0
        for i in range(1, len(closes)):
            close, pred = closes[i], closes[i - 1]
            err = close - pred
            n += 1
            mae_sum += Decimal(repr(abs(err))).quantize(micro6, ROUND_HALF_UP)
            ec, cc = half_up(err * 100), half_up(close * 100)
            sq_sum += ec * ec
            mape_sum += (abs(ec) * 2_000_000_000 + cc) // (2 * cc)
            if i >= 2:  # dir_pred needs prev2; row 2's NULL is avg-skipped
                prev2 = closes[i - 2]
                da = (err > 0) - (err < 0)
                dp = (pred > prev2) - (pred < prev2)
                dir_hits.append(int(da == dp))
        import math as _m

        expect[sk] = (
            float(mae_sum) / n,
            _m.sqrt(float(sq_sum) / 10000.0 / n),
            float(mape_sum) / 1e9 / n,
            sum(dir_hits) / len(dir_hits) if dir_hits else None,
            n,
        )
    got = {
        r.l_suppkey: (r.mae, r.rmse, r.mape, r.direction_accuracy, r.n)
        for r in eval_metrics(spark, sf_dir).collect()
    }
    assert got == expect


def test_twap_hourly_pure_python(spark, sf_dir):
    """TWAP per (user, hour): exact Decimal(2dp) value sums / observation
    count, recomputed from the parquet bytes."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    from stockmarket_bigdata_project_spark.operators.finance import twap_hourly

    t = pq.read_table(table_path(sf_dir, "events"),
                      columns=["ts", "user_id", "value"])
    cent = Decimal("0.01")
    acc = {}
    for ts, uid, val in zip(*[t.column(c).to_pylist()
                              for c in ("ts", "user_id", "value")]):
        hour = ts.replace(minute=0, second=0, microsecond=0)
        s = acc.setdefault((uid, hour), [Decimal(0), 0, 0])
        if val is not None:
            s[0] += Decimal(repr(val)).quantize(cent, ROUND_HALF_UP)
            s[1] += 1
        s[2] += 1
    expect = {
        k: (float(v[0]) / v[1] if v[1] else None, v[2])
        for k, v in acc.items()
    }
    got = {
        (r.user_id, r.hour): (r.twap, r.n_obs)
        for r in twap_hourly(spark, sf_dir).collect()
    }
    assert got == expect


# --- round-6 window pre-screen: the iterative unrolled-CTE oracles ----------
# (r4 verdict task 2 names these as the riskiest idiom class: the Spark loop
# and the unrolled DuckDB CTEs could drift TOGETHER on a shared assumption;
# a third implementation of the iteration itself breaks the tie.)
def test_bpe_train_merges_pure_python(spark, sf_dir):
    """Full BPE trainer recompute: word freq → symbol strings → weighted
    pair counts → (weight DESC, l, r ASC) winner → non-overlapping
    string-replace re-tokenize, for BPE_ROUNDS rounds. Ties compare on
    UTF-8 bytes, matching Spark/DuckDB binary string order."""
    from stockmarket_bigdata_project_spark.llmdata.lm import (
        BPE_ROUNDS,
        bpe_train_merges,
    )

    wf = Counter()
    for _, _, text in _docs(sf_dir):
        wf.update(text.split(" "))
    sym = {w: " " + " ".join(w) + " " for w in wf}
    expect = set()
    for rnd in range(1, BPE_ROUNDS + 1):
        weights = Counter()
        for w, s in sym.items():
            toks = s.strip().split(" ")
            for l, r in zip(toks, toks[1:]):
                weights[(l, r)] += wf[w]
        (l, r), wt = min(
            weights.items(),
            key=lambda kv: (-kv[1], kv[0][0].encode(), kv[0][1].encode()),
        )
        expect.add((rnd, l, r, l + r, wt))
        sym = {
            w: s.replace(f" {l} {r} ", f" {l}{r} ") for w, s in sym.items()
        }
    got = {
        (r_.merge_round, r_.l, r_.r, r_.merged, r_.weight)
        for r_ in bpe_train_merges(spark, sf_dir).collect()
    }
    assert got == expect


def test_pagerank_iteration_pure_python(spark, sf_dir):
    """Fixed-point PageRank iteration recomputed with Python ints, seeded
    from the (gate-proven) verified LSH pair set: deg, PR_SCALE//n init,
    rank' = base + (85·Σ rank//deg)//100 for PR_ITER rounds. Floor
    division throughout — all quantities nonnegative on both engines."""
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        minhash_lsh_pairs,
    )
    from stockmarket_bigdata_project_spark.llmdata.graph import (
        PR_ITER,
        PR_SCALE,
        pagerank_near_dup,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    ]
    edges = defaultdict(list)
    for a, b in pairs:
        edges[a].append(b)
        edges[b].append(a)
    deg = {v: len(ns) for v, ns in edges.items()}
    n = len(deg)
    init = PR_SCALE // n
    base = (15 * init) // 100
    rank = {v: init for v in deg}
    for _ in range(PR_ITER):
        insum = defaultdict(int)
        for v, ns in edges.items():
            share = rank[v] // deg[v]
            for u in ns:
                insum[u] += share
        rank = {v: base + (85 * insum[v]) // 100 for v in deg}
    expect = {v: (deg[v], rank[v], rank[v] / 1.0e12) for v in deg}
    got = {
        r.doc_id: (r.degree, r.rank_fp, r.pagerank)
        for r in pagerank_near_dup(spark, sf_dir).collect()
    }
    assert got == expect


def test_kmeans_exact_assignments_pure_python(spark, sf_dir):
    """Integer Lloyd recompute: micro-unit vectors (shortest-repr half-up
    rounding, Spark's BigDecimal semantics), exact integer L2, argmin with
    (dist, cid) tie order, sign-aware round-half-away centroid means."""
    from decimal import ROUND_HALF_UP, Decimal

    from stockmarket_bigdata_project_spark.llmdata.clustering import (
        EXACT_ITERS,
        K_EXACT,
        kmeans_exact_assignments,
    )

    t = pq.read_table(table_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    vecs = {}
    for vid, emb in zip(t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist()):
        vecs[vid] = [
            int(Decimal(repr(x * 1_000_000)).quantize(
                Decimal(1), ROUND_HALF_UP))
            for x in emb
        ]

    def assign(cent):
        out = {}
        for vid, mv in vecs.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(mv, cv)), cid)
                for cid, cv in cent.items()
            )
            out[vid] = best  # (dist, cid)
        return out

    cent = {vid: list(vecs[vid]) for vid in vecs if vid < K_EXACT}
    for _ in range(EXACT_ITERS):
        assigned = assign(cent)
        sums = defaultdict(lambda: [0, 0])  # (cid, dim) -> [s, n]
        for vid, (_, cid) in assigned.items():
            for dim, v in enumerate(vecs[vid]):
                s = sums[(cid, dim)]
                s[0] += v
                s[1] += 1
        cent = defaultdict(dict)
        for (cid, dim), (s, cnt) in sums.items():
            m = (2 * s + cnt) // (2 * cnt) if s >= 0 \
                else -((2 * -s + cnt) // (2 * cnt))
            cent[cid][dim] = m
        cent = {cid: [d[i] for i in range(len(d))] for cid, d in cent.items()}
    final = assign(cent)
    expect = {vid: (cid, dist) for vid, (dist, cid) in final.items()}
    got = {
        r.vec_id: (r.cluster_id, r.dist_sq)
        for r in kmeans_exact_assignments(spark, sf_dir).collect()
    }
    assert got == expect


def test_line_dedup_stats_pure_python(spark, sf_dir):
    """Line-level dedup accounting recomputed in pure Python: fixed
    LINE_LEN-token lines, corpus-wide occurrence counts, first-occurrence
    keep rule on (doc_id, line_idx)."""
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        LINE_LEN,
        line_dedup_stats,
    )

    occurrences = defaultdict(list)  # line -> [(doc_id, li, ntok)]
    for doc_id, _, text in _docs(sf_dir):
        ws = text.split(" ")
        for li in range((len(ws) + LINE_LEN - 1) // LINE_LEN):
            toks = ws[li * LINE_LEN:(li + 1) * LINE_LEN]
            occurrences[" ".join(toks)].append((doc_id, li, len(toks)))
    stats = defaultdict(lambda: [0, 0, 0, 0])  # doc -> [n, dup, rm, kept]
    for occs in occurrences.values():
        occs.sort()
        dup = len(occs) > 1
        for rank, (doc_id, _, ntok) in enumerate(occs):
            s = stats[doc_id]
            s[0] += 1
            s[1] += int(dup)
            s[2] += int(rank > 0)
            s[3] += ntok if rank == 0 else 0
    expect = {d: tuple(v) for d, v in stats.items()}
    got = {
        r.doc_id: (r.n_lines, r.n_dup_lines, r.n_removed, r.n_tokens_kept)
        for r in line_dedup_stats(spark, sf_dir).collect()
    }
    assert got == expect


def test_trend_mann_kendall_pure_python(spark, sf_dir):
    """Pure-Python recompute of the Mann-Kendall / Theil-Sen trend pair —
    the float-bearing finance query that entered the r5 window after the
    pre-screen sweeps. Rebuilds the OHLCV close (arg-max on the composite
    ord_key), quantizes to exact integer cents via the shortest-repr
    HALF_UP rule (the same value Spark's round(double) produces), forms
    the trailing-window pairs, and takes the lower-median slope — each
    slope ONE binary64 division of exact ints, bit-identical everywhere."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    from stockmarket_bigdata_project_spark.operators.finance import (
        TREND_WINDOW,
        trend_mann_kendall,
    )

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_orderkey", "l_linenumber"],
    )
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    close = {}  # (suppkey, day) -> (ord_key, px)
    for sk, sd, px, ok, ln in zip(cols["l_suppkey"], cols["l_shipdate"],
                                  cols["l_extendedprice"],
                                  cols["l_orderkey"], cols["l_linenumber"]):
        day = sd.date() if isinstance(sd, dt.datetime) else sd
        cents_px = int(Decimal(repr(px * 100)).to_integral_value(
            ROUND_HALF_UP))
        key = (ok * 16 + ln) * 100_000_000 + cents_px
        cur = close.get((sk, day))
        if cur is None or key > cur[0]:
            close[(sk, day)] = (key, px)
    per_supp = defaultdict(list)
    for (sk, day), (_, px) in close.items():
        per_supp[sk].append((day, int(Decimal(repr(px * 100))
                                      .to_integral_value(ROUND_HALF_UP))))
    expect = {}
    for sk, rows in per_supp.items():
        recent = sorted(rows, key=lambda r: r[0], reverse=True)[:TREND_WINDOW]
        recent.sort(key=lambda r: r[0])
        slopes, s = [], 0
        for i in range(len(recent)):
            for j in range(i + 1, len(recent)):
                (da, ca), (db, cb) = recent[i], recent[j]
                dy = cb - ca
                s += (dy > 0) - (dy < 0)
                slopes.append(float(dy) / (db - da).days)
        if not slopes:
            continue
        slopes.sort()
        sen = slopes[(len(slopes) + 1) // 2 - 1]
        expect[sk] = (len(recent), len(slopes), s, sen)
    got = {r.l_suppkey: (r.n_days, r.n_pairs, r.mk_s, r.sen_slope)
           for r in trend_mann_kendall(spark, sf_dir).collect()}
    assert got == expect


def test_drawdown_durations_pure_python(spark, sf_dir):
    """Pure-Python recompute of the drawdown-episode table (the second
    finance query to enter the r5 window post-pre-screen): rebuild the
    per-supplier close series, the running peak, the round-half-up
    micro depth q, and the below-peak islands."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    from stockmarket_bigdata_project_spark.operators.finance import (
        drawdown_durations,
    )

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_orderkey", "l_linenumber"],
    )
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    close = {}
    for sk, sd, px, ok, ln in zip(cols["l_suppkey"], cols["l_shipdate"],
                                  cols["l_extendedprice"],
                                  cols["l_orderkey"], cols["l_linenumber"]):
        day = sd.date() if isinstance(sd, dt.datetime) else sd
        cents_px = int(Decimal(repr(px * 100)).to_integral_value(
            ROUND_HALF_UP))
        key = (ok * 16 + ln) * 100_000_000 + cents_px
        cur = close.get((sk, day))
        if cur is None or key > cur[0]:
            close[(sk, day)] = (key, cents_px)
    per_supp = defaultdict(list)
    for (sk, day), (_, c) in close.items():
        per_supp[sk].append((day, c))
    expect = set()
    for sk, rows in per_supp.items():
        rows.sort()
        peak, run = 0, []
        for day, c in rows:
            peak = max(peak, c)
            q = ((peak - c) * 2_000_000 + peak) // (2 * peak)
            if q > 0:
                run.append((day, q))
            else:
                if run:
                    expect.add((sk, run[0][0], run[-1][0], len(run),
                                max(x for _, x in run)))
                run = []
        if run:
            expect.add((sk, run[0][0], run[-1][0], len(run),
                        max(x for _, x in run)))
    got = {(r.l_suppkey, r.start_date, r.end_date, r.n_days, r.trough_micro)
           for r in drawdown_durations(spark, sf_dir).collect()}
    assert got == expect


def test_skyline_two_phase_pure_python(spark, sf_dir):
    """Skyline semantics, third opinion: brute-force O(n²) domination scan
    over the parquet bytes vs the two-phase level-trick plan. Validates the
    ALGORITHM (running-max over price levels + local-prune soundness), not
    just engine agreement on it."""
    from stockmarket_bigdata_project_spark.operators.analytics import (
        skyline_two_phase_orders,
    )

    t = pq.read_table(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    rows = list(
        zip(
            t.column("o_orderkey").to_pylist(),
            t.column("o_totalprice").to_pylist(),
            t.column("o_orderdate").to_pylist(),
        )
    )
    pts = [
        (k, round(p * 100), d.date() if hasattr(d, "date") else d)
        for k, p, d in rows
    ]
    expected = set()
    for k, c, d in pts:
        dominated = any(
            (c2 >= c and d2 >= d and (c2 > c or d2 > d))
            for _, c2, d2 in pts
        )
        if not dominated:
            expected.add((k, c, d))
    got = {
        (r["o_orderkey"], r["cents"], r["order_date"])
        for r in skyline_two_phase_orders(spark, sf_dir).collect()
    }
    assert got == expected


def _daily_bars(sf_dir):
    """(suppkey, date) -> (open, high, low, close) cents, rebuilt from the
    lineitem parquet bytes with the same packed total-order key as
    gold._ord_key — no Spark, no DuckDB."""
    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_quantity",
        ],
    )
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    bars = {}
    for ok, ln, sk, sd, px, _q in zip(
        cols["l_orderkey"],
        cols["l_linenumber"],
        cols["l_suppkey"],
        cols["l_shipdate"],
        cols["l_extendedprice"],
        cols["l_quantity"],
    ):
        day = sd.date() if hasattr(sd, "date") else sd
        cents = round(px * 100)
        key = (ok * 16 + ln) * 100_000_000 + cents
        b = bars.setdefault((sk, day), [None, cents, cents, None, None, None])
        b[1] = max(b[1], cents)
        b[2] = min(b[2], cents)
        if b[4] is None or key < b[4]:
            b[4], b[0] = key, cents  # open = price at min key
        if b[5] is None or key > b[5]:
            b[5], b[3] = key, cents  # close = price at max key
    return {k: (v[0], v[1], v[2], v[3]) for k, v in bars.items()}


def test_leadlag_xcorr_pure_python(spark, sf_dir):
    """Third opinion for the lead-lag correlation: daily bars, quantized
    returns, market mean, lagged alignment and the closing binary64
    algebra all recomputed in pure Python (IEEE doubles, same expression
    order) — must match Spark bit-for-bit."""
    import math

    from stockmarket_bigdata_project_spark.operators.finance import (
        XCORR_LAGS,
        leadlag_xcorr,
    )

    bars = _daily_bars(sf_dir)
    by_supp = defaultdict(list)
    for (sk, day), (o, h, l, c) in bars.items():
        by_supp[sk].append((day, c))
    x_units = {}  # (sk, day) -> units
    for sk, rows in by_supp.items():
        rows.sort()
        for (d0, c0), (d1, c1) in zip(rows, rows[1:]):
            num = abs(c1 - c0) * 200_000 + c0
            den = 2 * c0
            s = 1 if c1 > c0 else (-1 if c1 < c0 else 0)
            x_units[(sk, d1)] = s * ((num - num % den) // den)
    per_date = defaultdict(list)
    for (sk, d), x in x_units.items():
        per_date[d].append(x)
    m_units, dates = {}, sorted(per_date)
    for d in dates:
        ms, n = sum(per_date[d]), len(per_date[d])
        mnum, mden = 2 * abs(ms) + n, 2 * n
        s = 1 if ms > 0 else (-1 if ms < 0 else 0)
        m_units[d] = s * ((mnum - mnum % mden) // mden)
    idx = {d: i + 1 for i, d in enumerate(dates)}
    expected = {}
    for lag in XCORR_LAGS:
        stats = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
        for (sk, d), x in x_units.items():
            j = idx[d] + lag  # market at trading-day index + lag
            if not (1 <= j <= len(dates)):
                continue
            m = m_units[dates[j - 1]]
            st = stats[sk]
            st[0] += 1
            st[1] += x
            st[2] += m
            st[3] += x * x
            st[4] += m * m
            st[5] += x * m
        for sk, (n, sx, sm, sxx, smm, sxm) in stats.items():
            nd = float(n)
            den = math.sqrt(nd * float(sxx) - float(sx) * float(sx)) * math.sqrt(
                nd * float(smm) - float(sm) * float(sm)
            )
            expected[(sk, lag)] = (
                n,
                None
                if den == 0.0
                else (nd * float(sxm) - float(sx) * float(sm)) / den,
            )
    got = {
        (r["l_suppkey"], r["lag"]): (r["n_days"], r["xcorr"])
        for r in leadlag_xcorr(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], k
        a, b = got[k][1], expected[k][1]
        assert (a is None and b is None) or a == b, (k, a, b)


def test_candlestick_patterns_pure_python(spark, sf_dir):
    """Third opinion for the candlestick screen: the integer pattern rules
    recomputed from hand-built OHLC bars."""
    from stockmarket_bigdata_project_spark.operators.finance import (
        candlestick_patterns,
    )

    bars = _daily_bars(sf_dir)
    by_supp = defaultdict(list)
    for (sk, day), b in bars.items():
        by_supp[sk].append((day, b))
    expected = {}
    for sk, rows in by_supp.items():
        rows.sort()
        nd = nh = nbull = nbear = 0
        prev = None
        for _, (o, h, l, c) in rows:
            body, rng = abs(c - o), h - l
            ush, lsh = h - max(o, c), min(o, c) - l
            nd += 20 * body <= rng and rng > 0
            nh += lsh >= 2 * body and ush <= body and rng > 0
            if prev is not None:
                po, pc = prev
                nbull += pc < po and c > o and o <= pc and c >= po
                nbear += pc > po and c < o and o >= pc and c <= po
            prev = (o, c)
        expected[sk] = (len(rows), nd, nh, nbull, nbear)
    got = {
        r["l_suppkey"]: (
            r["n_days"],
            r["n_doji"],
            r["n_hammer"],
            r["n_bull_engulf"],
            r["n_bear_engulf"],
        )
        for r in candlestick_patterns(spark, sf_dir).collect()
    }
    assert got == expected


def _py_shingle_sets(sf_dir):
    """doc_id -> set of word-3-gram shingles (docs with no shingle rows
    are absent, exactly like the explode)."""
    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    out = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        ws = text.split(" ")
        grams = [" ".join(ws[i: i + 3]) for i in range(len(ws) - 2)]
        if grams:
            out[doc_id] = set(grams)
    return out


def _py_lsh_candidates(sf_dir, shingle_sets):
    """Pure-Python recompute of the capped LSH candidate pair set —
    16 minhashes as 8-hex-char windows of four seeded md5s, band
    signatures, the LSH_BUCKET_CAP hot-bucket exclusion. Returns the
    set of (doc_a, doc_b) with doc_a < doc_b."""
    import hashlib
    from itertools import combinations

    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        BAND_SIZE,
        LSH_BUCKET_CAP,
        N_HASHES,
        _MINHASH_SEEDS,
    )

    sigs: dict[int, list[str]] = {}
    for doc_id, grams in shingle_sets.items():
        # minhash over the MULTISET (r10: MIN is multiset-insensitive, so
        # the set gives the same mins — used for speed)
        h = [None] * N_HASHES
        for g in grams:
            for a, seed in enumerate(_MINHASH_SEEDS):
                hx = hashlib.md5(f"{seed}|{g}".encode()).hexdigest()
                for j in range(4):
                    w = hx[8 * j: 8 * j + 8]
                    k = 4 * a + j
                    if h[k] is None or w < h[k]:
                        h[k] = w
        sigs[doc_id] = h
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for doc_id, h in sigs.items():
        for band in range(N_HASHES // BAND_SIZE):
            sig = "".join(h[band * BAND_SIZE + j] for j in range(BAND_SIZE))
            buckets[(band, sig)].append(doc_id)
    cands: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) > LSH_BUCKET_CAP:
            continue  # hot bucket: never enters the self-join
        for a, b in combinations(sorted(members), 2):
            cands.add((a, b))
    return cands


def _py_candidate_overlap(sf_dir):
    """{(doc_a, doc_b): (n_inter, na, nb)} over the capped LSH candidates
    with ≥1 shared distinct shingle (the inner shingle join emits no row
    for disjoint pairs)."""
    shingle_sets = _py_shingle_sets(sf_dir)
    out = {}
    for a, b in _py_lsh_candidates(sf_dir, shingle_sets):
        sa, sb = shingle_sets[a], shingle_sets[b]
        n_inter = len(sa & sb)
        if n_inter:
            out[(a, b)] = (n_inter, len(sa), len(sb))
    return out


def _py_verified_pairs(sf_dir):
    """Pure-Python recompute of the minhash-LSH verified pair set —
    word-3-gram shingles, 16 minhashes as 8-hex-char windows of four
    seeded md5s, band signatures, the LSH_BUCKET_CAP hot-bucket
    exclusion, candidate pairs, exact distinct-shingle Jaccard ≥ τ.
    Shared by the pair-level and the end-to-end corpus-curation third
    opinions. Returns {(doc_a, doc_b): jaccard}. (r12: the shingle/
    minhash/band/cap stages moved to _py_shingle_sets/_py_lsh_candidates/
    _py_candidate_overlap so the containment/edit-distance/ngram pair
    verifiers share one recompute. Note on shingles: F.split(text, " ")
    is regex-split on a single space — identical to Python's
    str.split(" ") including empty tokens from consecutive spaces.)"""
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        JACCARD_THRESHOLD,
    )

    expected = {}
    for (a, b), (n_inter, na, nb) in _py_candidate_overlap(sf_dir).items():
        jac = n_inter / (na + nb - n_inter)
        if jac >= JACCARD_THRESHOLD:
            expected[(a, b)] = jac
    return expected


def test_minhash_lsh_pairs_pure_python(spark, sf_dir):
    """The flagship near-dedup operator, third opinion: the DuckDB oracle
    mirrors the Spark pipeline stage-for-stage (same md5-window minhash,
    same banding, same cap), so a bug in the ALGORITHM would drift both
    engines together and the pairwise compare would stay green. The full
    path is recomputed from the parquet bytes in pure Python (hashlib's
    md5 vs Spark's JVM md5 is the independent third implementation), and
    the Spark result must match exactly, floats included (both sides
    compute the same int/int binary64 division)."""
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        clear_staged_memo,
        minhash_lsh_pairs,
    )

    expected = _py_verified_pairs(sf_dir)

    clear_staged_memo()  # a memo from an earlier test must not mask a diff
    try:
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(spark, sf_dir).collect()
        }
    finally:
        clear_staged_memo()
    assert got == expected, (
        f"pairs: spark {len(got)} vs python {len(expected)}; "
        f"spark-only {set(got) - set(expected)}, "
        f"python-only {set(expected) - set(got)}"
    )


def test_winnowing_pure_python(spark, sf_dir):
    """Winnowing (MOSS) fingerprint selection + the candidate match step,
    third opinion: the DuckDB oracle mirrors the packed-min selection rule
    stage-for-stage, so this recomputes the whole scheme from the parquet
    bytes — polynomial rolling hash over WIN_K-token grams, WIN_W sliding
    window, min with ties→rightmost via the h·RADIX+(RADIX−pos) packing,
    full-window rule, distinct prints, the WIN_DF_CAP stop-print rule and
    the ≥ WIN_MIN_SHARED pair cut — in pure Python and requires both Spark
    results to match exactly."""
    from itertools import combinations

    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        FP_BASE,
        FP_MOD,
        WIN_DF_CAP,
        WIN_K,
        WIN_MIN_SHARED,
        WIN_W,
        _WIN_PACK,
        winnowing_dup_candidates,
        winnowing_fingerprints,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))

    def tok_val(tok: str) -> int:
        # F.ascii = codepoint of the first character (0 for empty string)
        return (ord(tok[0]) if tok else 0) + len(tok) * 7

    prints: dict[int, set[tuple[int, int]]] = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        n = len(ws)
        if n < WIN_K:
            continue
        hs = []
        for i in range(n - WIN_K + 1):  # pos = i + 1 (1-based)
            acc = 0
            for tok in ws[i : i + WIN_K]:
                acc = (acc * FP_BASE + tok_val(tok)) % FP_MOD
            hs.append((i + 1, acc))
        sel = set()
        for w0 in range(len(hs) - WIN_W + 1):  # full windows only
            packed = min(
                h * _WIN_PACK + (_WIN_PACK - pos)
                for pos, h in hs[w0 : w0 + WIN_W]
            )
            sel.add((_WIN_PACK - packed % _WIN_PACK, packed // _WIN_PACK))
        if sel:
            prints[doc_id] = sel

    got_fp = {
        (r.doc_id, r.sel_pos, r.fp_hash)
        for r in winnowing_fingerprints(spark, sf_dir).collect()
    }
    exp_fp = {(d, p, h) for d, sel in prints.items() for p, h in sel}
    assert got_fp == exp_fp, (
        f"prints: spark {len(got_fp)} vs python {len(exp_fp)}"
    )

    # match step: distinct (doc, hash) postings, stop-print cap, pair cut
    df_count = Counter(
        h for sel in prints.values() for h in {h for _, h in sel}
    )
    postings = defaultdict(set)
    for d, sel in prints.items():
        for h in {h for _, h in sel}:
            if df_count[h] <= WIN_DF_CAP:
                postings[h].add(d)
    shared = Counter()
    for h, ds in postings.items():
        for a, b in combinations(sorted(ds), 2):
            shared[(a, b)] += 1
    exp_pairs = {
        pair: c for pair, c in shared.items() if c >= WIN_MIN_SHARED
    }
    got_pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnowing_dup_candidates(spark, sf_dir).collect()
    }
    assert got_pairs == exp_pairs, (
        f"pairs: spark {len(got_pairs)} vs python {len(exp_pairs)}"
    )


def test_simhash_pure_python(spark, sf_dir):
    """16-bit SimHash signatures + Hamming-0 groups, third opinion: md5
    prefix → 16-bit int per DISTINCT shingle, strict-majority vote per bit
    — recomputed with hashlib from the parquet bytes; both Spark queries
    must match exactly."""
    import hashlib

    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        simhash_dup_groups,
        simhash_signatures,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    expected = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        ws = text.split(" ")
        grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        if not grams:
            continue
        bits = [0] * 16
        for g in grams:
            h = int(hashlib.md5(g.encode()).hexdigest()[:4], 16)
            for b in range(16):
                bits[b] += (h >> b) & 1
        n = len(grams)
        expected[doc_id] = sum(
            (1 << b) for b in range(16) if bits[b] * 2 > n
        )

    got = {
        r.doc_id: r.simhash
        for r in simhash_signatures(spark, sf_dir).collect()
    }
    assert got == expected

    groups = defaultdict(list)
    for d, s in expected.items():
        groups[s].append(d)
    exp_groups = {
        s: (len(ds), min(ds)) for s, ds in groups.items() if len(ds) > 1
    }
    got_groups = {
        r.simhash: (r.n_docs, r.canonical_doc_id)
        for r in simhash_dup_groups(spark, sf_dir).collect()
    }
    assert got_groups == exp_groups


def test_lang_id_and_doc_fingerprints_pure_python(spark, sf_dir):
    """Language-ID marker scores (argmax with the de≥en≥es precedence) and
    the order-sensitive polynomial rolling fingerprint, third opinion from
    the parquet bytes."""
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        FP_BASE,
        FP_MOD,
        LANG_MARKERS,
        doc_fingerprints,
        lang_id_scores,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "lang", "text"])
    rows = list(zip(t.column("doc_id").to_pylist(),
                    t.column("lang").to_pylist(),
                    t.column("text").to_pylist()))

    exp_lang = {}
    exp_fp = {}
    for doc_id, lang, text in rows:
        ws = text.split(" ")
        s = {
            lng: sum(1 for w in ws if w in set(markers))
            for lng, markers in LANG_MARKERS.items()
        }
        if s["de"] >= s["en"] and s["de"] >= s["es"]:
            det = "de"
        elif s["en"] >= s["es"]:
            det = "en"
        else:
            det = "es"
        exp_lang[doc_id] = (lang, s["en"], s["es"], s["de"], det)
        acc = 0
        for tok in ws:
            acc = (acc * FP_BASE + (ord(tok[0]) if tok else 0)
                   + len(tok) * 7) % FP_MOD
        exp_fp[doc_id] = acc

    got_lang = {
        r.doc_id: (r.lang, r.score_en, r.score_es, r.score_de,
                   r.detected_lang)
        for r in lang_id_scores(spark, sf_dir).collect()
    }
    assert got_lang == exp_lang
    got_fp = {
        r.doc_id: r.fingerprint
        for r in doc_fingerprints(spark, sf_dir).collect()
    }
    assert got_fp == exp_fp


def test_dsir_importance_bits_pure_python(spark, sf_dir):
    """DSIR (hashed-unigram importance resampling in exact Shannon-code
    bits), third opinion: hashing-trick buckets (md5 16-bit prefix mod B),
    Laplace-smoothed integer code lengths ilog2((total+B) div (cnt+1)),
    per-occurrence bit gain summed per doc — recomputed with hashlib from
    the parquet bytes."""
    import hashlib

    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        DSIR_TARGET_LANG,
        N_FEATURE_BUCKETS,
        dsir_importance_bits,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "lang", "text"])
    rows = list(zip(t.column("doc_id").to_pylist(),
                    t.column("lang").to_pylist(),
                    t.column("text").to_pylist()))

    B = N_FEATURE_BUCKETS
    doc_buckets: dict[int, list[int]] = {}
    cnt_r = Counter()
    cnt_t = Counter()
    for doc_id, lang, text in rows:
        bks = [
            int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % B
            for tok in text.split(" ")
        ]
        doc_buckets[doc_id] = bks
        cnt_r.update(bks)
        if lang == DSIR_TARGET_LANG:
            cnt_t.update(bks)
    total_r, total_t = sum(cnt_r.values()), sum(cnt_t.values())

    def bits(total: int, cnt: int) -> int:
        return ((total + B) // (cnt + 1)).bit_length() - 1

    gain = {
        b: bits(total_r, cnt_r[b]) - bits(total_t, cnt_t.get(b, 0))
        for b in cnt_r  # buckets never seen in raw have no stats row
    }
    expected = {}
    for doc_id, bks in doc_buckets.items():
        if not bks:
            continue
        g = sum(gain[b] for b in bks)
        expected[doc_id] = (len(bks), g, int(g >= 0))

    got = {
        r.doc_id: (r.n_tokens, r.dsir_bits, r.target_like)
        for r in dsir_importance_bits(spark, sf_dir).collect()
    }
    assert got == expected


def test_quality_scores_pure_python(spark, sf_dir):
    """The curation tier's quality formula (feeds corpus_clean /
    training_manifest / quality_weighted_sample), third opinion: the exact
    integer micro-unit rational — t1+t2+t3 over common denominator 8n,
    round-half-up, the n<10 zero rule, and the 6dp-quantized ratio columns
    — recomputed in pure Python integers."""
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        STOPWORDS,
        quality_scores,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])

    def rdm(num: int, den: int) -> int:  # round-half-up(num/den)
        return (2 * num + den) // (2 * den)

    stops = set(STOPWORDS)
    expected = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        ws = text.split(" ")
        n = len(ws)
        n_chars = len(text)
        c = n_chars - (n - 1)
        stop = sum(1 for w in ws if w in stops)
        t1 = min(500000, 2500 * n) * (8 * n)
        t2 = 2400000 * (n - stop)
        t3 = min(1600000 * n, 200000 * c)
        micro = rdm(t1 + t2 + t3, 8 * n)
        score = 0.0 if n < 10 else micro / 1000000.0
        expected[doc_id] = (
            n,
            n_chars,
            rdm(1000000 * c, n) / 1000000.0,
            rdm(1000000 * stop, n) / 1000000.0,
            score,
        )

    got = {
        r.doc_id: (r.n_tokens, r.n_chars_actual, r.avg_token_len,
                   r.stopword_ratio, r.quality_score)
        for r in quality_scores(spark, sf_dir).collect()
    }
    assert got == expected


def test_lm_perplexity_and_oov_pure_python(spark, sf_dir):
    """The CCNet-style unigram Shannon-bit perplexity filter and the
    vocab-coverage OOV audit, third opinion: corpus term frequencies,
    bits(tok) = ilog2(total div freq), per-doc micro-quantized mean, and
    the top-VOCAB_SIZE (freq desc, tok asc) OOV counts — recomputed in
    pure Python integers."""
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        VOCAB_SIZE,
        lm_perplexity_bits,
        vocab_oov_rate,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))
    freq = Counter()
    for _, text in docs:
        freq.update(text.split(" "))
    total = sum(freq.values())

    bits = {tok: (total // f).bit_length() - 1 for tok, f in freq.items()}
    exp_ppl = {}
    exp_oov = {}
    vocab = {
        tok
        for tok, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_SIZE
        ]
    }
    for doc_id, text in docs:
        ws = text.split(" ")
        n = len(ws)
        sb = sum(bits[w] for w in ws)
        mean_bits = ((2 * sb * 1_000_000 + n) // (2 * n)) / 1_000_000.0
        exp_ppl[doc_id] = (n, sb, mean_bits)
        n_oov = sum(1 for w in ws if w not in vocab)
        exp_oov[doc_id] = (n, n_oov, n_oov / n)

    got_ppl = {
        r.doc_id: (r.n_tokens, r.sum_bits, r.mean_bits)
        for r in lm_perplexity_bits(spark, sf_dir).collect()
    }
    assert got_ppl == exp_ppl
    got_oov = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in vocab_oov_rate(spark, sf_dir).collect()
    }
    assert got_oov == exp_oov


def test_gopher_flags_and_dedup_exact_pure_python(spark, sf_dir):
    """Gopher rule flags (integer cross-multiplications, third regex
    engine: Python re vs Java) and exact-dedup groups (md5 of the
    whitespace-normalized lowercased text), both recomputed from the
    parquet bytes."""
    import hashlib

    from stockmarket_bigdata_project_spark.llmdata.dedup import dedup_exact
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        GOPHER_MAX_MEAN_TOK,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_TOK,
        GOPHER_MIN_TOKENS,
        STOPWORDS,
        gopher_quality_flags,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))
    stops = set(STOPWORDS)

    exp_flags = {}
    groups = defaultdict(list)
    for doc_id, text in docs:
        ws = text.split(" ")
        n = len(ws)
        n_chars = len(text)
        c = n_chars - (n - 1)
        n_sym = len(re.sub(r"[a-z0-9 ]", "", text))
        n_digit = n_chars - len(re.sub(r"[0-9]", "", text))
        n_stop = sum(1 for w in ws if w in stops)
        too_short = int(n < GOPHER_MIN_TOKENS)
        too_long = int(n > GOPHER_MAX_TOKENS)
        bad_mean = int(
            c < GOPHER_MIN_MEAN_TOK * n or c > GOPHER_MAX_MEAN_TOK * n
        )
        sym = int(10 * n_sym > n_chars)
        dig = int(5 * n_digit > n_chars)
        nostop = int(n_stop == 0)
        keep = int(
            too_short + too_long + bad_mean + sym + dig + nostop == 0
        )
        exp_flags[doc_id] = (n, too_short, too_long, bad_mean, sym, dig,
                             nostop, keep)
        norm = re.sub(r"\s+", " ", text.lower().strip())
        groups[hashlib.md5(norm.encode()).hexdigest()].append(doc_id)

    got_flags = {
        r.doc_id: (r.n_tokens, r.too_short, r.too_long, r.bad_mean_tok_len,
                   r.symbol_heavy, r.digit_heavy, r.no_stopword, r.keep)
        for r in gopher_quality_flags(spark, sf_dir).collect()
    }
    assert got_flags == exp_flags

    exp_groups = {h: (min(ds), len(ds)) for h, ds in groups.items()}
    got_groups = {
        r.text_hash: (r.canonical_doc_id, r.n_copies)
        for r in dedup_exact(spark, sf_dir).collect()
    }
    assert got_groups == exp_groups


def test_hash_split_and_token_shards_pure_python(spark, sf_dir):
    """The sampling family's two deterministic assignments, third opinion:
    train/val/test from the md5 hex bucket of the doc id, and the
    fixed-token-budget shard id from the per-source cumulative token sum
    in doc_id order — recomputed from the parquet bytes with hashlib."""
    import hashlib

    from stockmarket_bigdata_project_spark.llmdata.sampling import (
        SHARD_TOKEN_BUDGET,
        TEST_CUT,
        VAL_CUT,
        hash_split_docs,
        token_budget_shards,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "lang", "source", "text"])
    rows = list(zip(*[t.column(c).to_pylist()
                      for c in ("doc_id", "lang", "source", "text")]))

    exp_split = {}
    per_source = defaultdict(list)
    for doc_id, lang, source, text in rows:
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        split = "val" if b < VAL_CUT else ("test" if b < TEST_CUT else "train")
        exp_split[doc_id] = (lang, split)
        per_source[source].append((doc_id, len(text.split(" "))))

    got_split = {
        r.doc_id: (r.lang, r.split)
        for r in hash_split_docs(spark, sf_dir).collect()
    }
    assert got_split == exp_split

    exp_shards = {}
    for source, ds in per_source.items():
        cum = 0
        for doc_id, n in sorted(ds):
            cum += n
            exp_shards[doc_id] = (source, n, (cum - 1) // SHARD_TOKEN_BUDGET)
    got_shards = {
        r.doc_id: (r.source, r.n_tokens, r.shard)
        for r in token_budget_shards(spark, sf_dir).collect()
    }
    assert got_shards == exp_shards


def test_corpus_curation_end_to_end_pure_python(spark, sf_dir):
    """The flagship curation COMPOSITION (corpus_clean → corpus_clean_stats
    → training_manifest), third opinion end-to-end: quality floor (exact
    micro-unit formula), exact-dedup survivorship (min doc_id per
    normalized-text md5 group), near-dedup survivorship (union-find
    connected components over the pure-Python verified LSH pairs — an
    independent CC algorithm vs Spark's iterative min-label propagation
    and DuckDB's recursive CTE), then the per-source stats and the
    salted-md5 epoch-shard manifest. Every terminal artifact the pipeline
    ships is recomputed from the parquet bytes with no Spark and no
    DuckDB."""
    import hashlib

    from stockmarket_bigdata_project_spark.llmdata.corpus import (
        QUALITY_MIN,
        corpus_clean,
        corpus_clean_stats,
        training_manifest,
    )
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        clear_staged_memo,
    )
    from stockmarket_bigdata_project_spark.llmdata.sampling import (
        EPOCH_SEED,
        N_EPOCH_SHARDS,
    )
    from stockmarket_bigdata_project_spark.llmdata.textstats import STOPWORDS

    t = pq.read_table(
        table_path(sf_dir, "documents"),
        columns=["doc_id", "lang", "source", "text"],
    )
    rows = list(zip(*[t.column(c).to_pylist()
                      for c in ("doc_id", "lang", "source", "text")]))

    # near-dedup losers: union-find over the Python-verified pair graph
    pairs = _py_verified_pairs(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, int] = {}
    for d in {x for p in pairs for x in p}:
        comp[d] = find(d)
    near_losers = {d for d, c in comp.items() if d != c}

    stops = set(STOPWORDS)

    def rdm(num: int, den: int) -> int:
        return (2 * num + den) // (2 * den)

    exact_min: dict[str, int] = {}
    quality: dict[int, tuple] = {}
    for doc_id, lang, source, text in rows:
        ws = text.split(" ")
        n = len(ws)
        c = len(text) - (n - 1)
        stop = sum(1 for w in ws if w in stops)
        t1 = min(500000, 2500 * n) * (8 * n)
        t2 = 2400000 * (n - stop)
        t3 = min(1600000 * n, 200000 * c)
        micro = rdm(t1 + t2 + t3, 8 * n)
        score = 0.0 if n < 10 else micro / 1000000.0
        micro_l = 0 if n < 10 else micro
        quality[doc_id] = (lang, source, n, score, micro_l)
        norm_h = hashlib.md5(
            re.sub(r"\s+", " ", text.lower().strip()).encode()
        ).hexdigest()
        if norm_h not in exact_min or doc_id < exact_min[norm_h]:
            exact_min[norm_h] = doc_id
    exact_keep = set(exact_min.values())

    exp_clean = {
        doc_id: (lang, source, n, score)
        for doc_id, (lang, source, n, score, _) in quality.items()
        if score >= QUALITY_MIN
        and doc_id in exact_keep
        and doc_id not in near_losers
    }

    clear_staged_memo()
    try:
        got_clean = {
            r.doc_id: (r.lang, r.source, r.n_tokens, r.quality_score)
            for r in corpus_clean(spark, sf_dir).collect()
        }
        got_stats = {
            r.source: (r.n_docs, r.total_tokens, r.sum_quality_micro)
            for r in corpus_clean_stats(spark, sf_dir).collect()
        }
        got_manifest = {
            (r.shard, r.source): (r.n_docs, r.total_tokens,
                                  r.sum_quality_micro)
            for r in training_manifest(spark, sf_dir).collect()
        }
    finally:
        clear_staged_memo()

    assert got_clean == exp_clean, (
        f"clean: spark {len(got_clean)} vs python {len(exp_clean)}"
    )

    exp_stats = defaultdict(lambda: [0, 0, 0])
    exp_manifest = defaultdict(lambda: [0, 0, 0])
    for doc_id in exp_clean:
        _, source, n, _ = exp_clean[doc_id]
        micro_l = quality[doc_id][4]
        for agg, key in (
            (exp_stats, source),
            (
                exp_manifest,
                (
                    int(
                        hashlib.md5(
                            f"{EPOCH_SEED}:{doc_id}".encode()
                        ).hexdigest()[:4],
                        16,
                    )
                    % N_EPOCH_SHARDS,
                    source,
                ),
            ),
        ):
            agg[key][0] += 1
            agg[key][1] += n
            agg[key][2] += micro_l
    assert got_stats == {k: tuple(v) for k, v in exp_stats.items()}
    assert got_manifest == {k: tuple(v) for k, v in exp_manifest.items()}


def test_gold_daily_features_pure_python(spark, sf_dir):
    """The flagship medallion gold build (the driver's entry() smoke
    query), third opinion: deterministic OHLCV via the packed total-order
    key (reusing _ohlcv_py), the exact-decimal daily activity rollup, the
    date-fanout left join and the null→0 fill — recomputed from the
    parquet bytes. avg_order_price is float(Decimal(sum_cents)/100)/count:
    the same correctly-rounded decimal→binary64 conversion and division
    both engines perform."""
    import datetime as dt
    from decimal import Decimal

    from stockmarket_bigdata_project_spark.operators.gold import (
        gold_daily_features,
    )

    bars = _ohlcv_py(sf_dir)

    t = pq.read_table(table_path(sf_dir, "orders"),
                      columns=["o_orderdate", "o_totalprice"])
    act = defaultdict(lambda: [0, 0, 0.0])  # count, sum_cents, max_px
    for od, px in zip(t.column("o_orderdate").to_pylist(),
                      t.column("o_totalprice").to_pylist()):
        day = od.date() if isinstance(od, dt.datetime) else od
        a = act[day]
        a[0] += 1
        a[1] += int(round(Decimal(str(px)), 2).scaleb(2))
        a[2] = max(a[2], px)

    expected = {}
    for (sk, day), b in bars.items():
        if day in act:
            n, cents, mx = act[day]
            total = float(Decimal(cents).scaleb(-2))
            row = (b["open"], b["high"], b["low"], b["close"], b["volume"],
                   n, total / n, total, mx)
        else:
            row = (b["open"], b["high"], b["low"], b["close"], b["volume"],
                   0, 0.0, 0.0, 0.0)
        expected[(sk, day)] = row

    got = {
        (r.l_suppkey, r.trade_date): (
            r.open_px, r.high_px, r.low_px, r.close_px, r.volume,
            r.order_count, r.avg_order_price, r.total_order_price,
            r.max_order_price,
        )
        for r in gold_daily_features(spark, sf_dir).collect()
    }
    assert got == expected


def test_sequence_assembly_pure_python(spark, sf_dir):
    """The headline W6 sequence builder (5-preceding close window over the
    OHLCV bars), third opinion: per-supplier date-ordered sliding window
    over _ohlcv_py's bars, integer-cents rendering and the folded cents
    sum — recomputed with no Spark and no DuckDB."""
    from stockmarket_bigdata_project_spark.operators.timeseries import (
        sequence_assembly,
    )

    bars = _ohlcv_py(sf_dir)
    by_supp = defaultdict(list)
    for (sk, day), b in bars.items():
        by_supp[sk].append((day, int(b["close"] * 100 + 0.5)))

    expected = {}
    for sk, rows in by_supp.items():
        rows.sort()
        for i in range(5, len(rows)):
            day = rows[i][0]
            prev5 = [c for _, c in rows[i - 5 : i]]
            expected[(sk, day)] = (
                "|".join(str(c) for c in prev5),
                5,
                sum(prev5) / 100.0,
            )

    got = {
        (r.l_suppkey, r.trade_date): (r.seq_cents, r.seq_len, r.seq_sum)
        for r in sequence_assembly(spark, sf_dir).collect()
    }
    assert got == expected


def test_sessionize_events_pure_python(spark, sf_dir):
    """Gap-based sessionization (lag + boolean cumsum), third opinion:
    per-user (ts, event_id)-ordered scan with the microsecond-exact
    30-minute gap rule, session aggregates with the exact 2-decimal value
    sum rendered to binary64 via Fraction — recomputed from the parquet
    bytes."""
    from decimal import Decimal
    from fractions import Fraction

    from stockmarket_bigdata_project_spark.operators.timeseries import (
        sessionize_events,
    )

    t = pq.read_table(table_path(sf_dir, "events"),
                      columns=["event_id", "user_id", "ts", "value"])
    by_user = defaultdict(list)
    for eid, uid, ts, val in zip(*[t.column(c).to_pylist()
                                   for c in ("event_id", "user_id", "ts",
                                             "value")]):
        by_user[uid].append((ts, eid, val))

    expected = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        sess = 0
        prev_ts = None
        cur = None  # [n, start, end, cents]
        for ts, _eid, val in evs:
            gap_us = (
                None if prev_ts is None
                else int((ts - prev_ts).total_seconds() * 1_000_000)
                if not isinstance(ts, int) else ts - prev_ts
            )
            if gap_us is None or gap_us > 1800 * 1_000_000:
                if cur is not None:
                    expected[(uid, sess)] = (
                        cur[0], cur[1], cur[2],
                        float(Fraction(cur[3], 100)),
                    )
                sess += 1
                cur = [0, ts, ts, 0]
            cur[0] += 1
            cur[2] = ts
            cur[3] += int(round(Decimal(str(val)), 2).scaleb(2))
            prev_ts = ts
        if cur is not None:
            expected[(uid, sess)] = (
                cur[0], cur[1], cur[2], float(Fraction(cur[3], 100))
            )

    got = {
        (r.user_id, r.session_id): (
            r.n_events, r.session_start, r.session_end, r.session_value
        )
        for r in sessionize_events(spark, sf_dir).collect()
    }
    assert got == expected


# --- r12: float-heavy similarity / finance families (r11 verdict task 4) --
# The integer-micros / integer-units designs claim BIT-exact binary64
# results; these third opinions recompute the full pipelines — quantization,
# exact integer statistics, and the closing IEEE-754 algebra in the same
# expression order — in pure Python, so a shared Spark↔DuckDB idiom (HOF
# fold semantics, window-sum association, long→double cast rounding) can't
# hide a drift.


def _mvecs(sf_dir):
    """vec_id -> list[int] integer-micros components, quantized exactly as
    similarity._emb: double(x) · 1e6 (one binary64 product), then scale-0
    HALF_UP on the shortest decimal representation — Spark's round(double)
    is BigDecimal.valueOf(d).setScale(0, HALF_UP), and Python's repr() is
    the same shortest-roundtrip string."""
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(table_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    out = {}
    for vid, emb in zip(t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist()):
        out[vid] = [
            int(Decimal(repr(float(x) * 1000000.0)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP))
            for x in emb
        ]
    return out


def _cos_py(a, b):
    """similarity._cosine in pure Python: exact integer dot/norm folds
    (≤ 64·10¹² « 2^53, so the double fold is the integer), IEEE sqrt, one
    product, one division — the same three binary64 ops in the same
    order."""
    import math

    dab = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(float(sum(x * x for x in a)))
    nb = math.sqrt(float(sum(y * y for y in b)))
    return float(dab) / (na * nb)


def test_knn_bruteforce_pure_python(spark, sf_dir):
    """Third opinion for exact top-k cosine retrieval: micros quantization,
    cosine, and the (cos DESC, cand_id ASC) ranking recomputed from the
    parquet bytes — ranks AND raw cosines must match Spark bit-for-bit."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_QUERIES,
        TOP_K,
        knn_bruteforce,
    )

    vecs = _mvecs(sf_dir)
    expected = {}
    for qid, qv in vecs.items():
        if qid >= N_QUERIES:
            continue
        scored = sorted(
            ((-_cos_py(qv, cv), cid) for cid, cv in vecs.items() if cid != qid)
        )
        for rank, (neg, cid) in enumerate(scored[:TOP_K], start=1):
            expected[(qid, cid)] = (-neg, rank)
    got = {
        (r.query_id, r.cand_id): (r.cosine, r.rank)
        for r in knn_bruteforce(spark, sf_dir).collect()
    }
    assert got == expected


def test_semdedup_survivors_pure_python(spark, sf_dir):
    """Third opinion for SemDeDup: k ∝ n centroid count, argmax-cosine
    assignment with (ccos DESC, centroid_id ASC) tie-break, and the
    within-bucket τ-prune with the engine's exact fold order
    (dot / (norm_a · norm_b)) — kept/removed and bucket ids recomputed in
    pure Python."""
    import math

    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_CENTROIDS,
        SEMDEDUP_TAU,
        SEMDEDUP_VECS_PER_CLUSTER,
        semdedup_survivors,
    )

    vecs = _mvecs(sf_dir)
    k = max(N_CENTROIDS, len(vecs) // SEMDEDUP_VECS_PER_CLUSTER)
    cents = {cid: cv for cid, cv in vecs.items() if cid < k}
    bucket = {}
    for vid, v in vecs.items():
        best = min(
            ((-_cos_py(v, cv), cid) for cid, cv in cents.items())
        )
        bucket[vid] = best[1]
    norms = {
        vid: math.sqrt(float(sum(x * x for x in v))) for vid, v in vecs.items()
    }
    by_bucket = defaultdict(list)
    for vid in sorted(vecs):
        by_bucket[bucket[vid]].append(vid)
    removed = set()
    for _b, members in by_bucket.items():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
                if float(dot) / (norms[a] * norms[b]) >= SEMDEDUP_TAU:
                    removed.add(b)
    expected = {
        vid: (bucket[vid], 0 if vid in removed else 1) for vid in vecs
    }
    got = {
        r.vec_id: (r.bucket, r.kept)
        for r in semdedup_survivors(spark, sf_dir).collect()
    }
    assert got == expected


def test_rolling_beta_pure_python(spark, sf_dir):
    """Third opinion for the trailing 10-day beta: OHLCV close bars,
    1e-5-unit integer return quantization (stock AND re-quantized market
    mean), exact integer window sums, and the closing
    (avg(xm) − avg(x)avg(m)) / (avg(m²) − avg(m)²) binary64 algebra in
    the engine's expression order — betas must match bit-for-bit,
    including the NULL var(m)=0 rows."""
    from stockmarket_bigdata_project_spark.operators.finance import (
        rolling_beta,
    )

    bars = _daily_bars(sf_dir)
    by_supp = defaultdict(list)
    for (sk, day), (_o, _h, _l, c) in bars.items():
        by_supp[sk].append((day, c))
    x_units = {}
    for sk, rows in by_supp.items():
        rows.sort()
        for (_d0, c0), (d1, c1) in zip(rows, rows[1:]):
            num = abs(c1 - c0) * 200_000 + c0
            den = 2 * c0
            s = 1 if c1 > c0 else (-1 if c1 < c0 else 0)
            x_units[(sk, d1)] = s * ((num - num % den) // den)
    per_date = defaultdict(list)
    for (_sk, d), x in x_units.items():
        per_date[d].append(x)
    m_units = {}
    for d, xs in per_date.items():
        ms, n = sum(xs), len(xs)
        mnum, mden = 2 * abs(ms) + n, 2 * n
        s = 1 if ms > 0 else (-1 if ms < 0 else 0)
        m_units[d] = s * ((mnum - mnum % mden) // mden)
    expected = {}
    series = defaultdict(list)
    for (sk, d), x in sorted(x_units.items()):
        series[sk].append((d, x, m_units[d]))
    for sk, rows in series.items():
        for i, (d, _x, _m) in enumerate(rows):
            frame = rows[max(0, i - 9): i + 1]
            n = len(frame)
            sx = sum(x for _, x, _m2 in frame)
            sm = sum(m for _, _x2, m in frame)
            sxm = sum(x * m for _, x, m in frame)
            smm = sum(m * m for _, _x2, m in frame)
            ax, am = float(sx) / n, float(sm) / n
            cov = float(sxm) / n - ax * am
            var = float(smm) / n - am * am
            expected[(sk, d)] = None if var == 0.0 else cov / var
    got = {
        (r.l_suppkey, r.trade_date): r.beta_10d
        for r in rolling_beta(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for key, b in expected.items():
        a = got[key]
        assert (a is None and b is None) or a == b, (key, a, b)


def test_embedding_pairs_and_range_query_pure_python(spark, sf_dir):
    """Third opinion for the two threshold-set similarity queries: the
    all-pairs near-dup baseline (cos ≥ 0.40, vec_a < vec_b) and the
    query-anchored range query (cos ≥ RANGE_TAU) — result SETS and raw
    cosines recomputed from the parquet bytes."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_QUERIES,
        RANGE_TAU,
        embedding_near_dup_pairs,
        embedding_range_query,
    )

    vecs = _mvecs(sf_dir)
    ids = sorted(vecs)
    exp_pairs = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = _cos_py(vecs[a], vecs[b])
            if c >= 0.40:
                exp_pairs[(a, b)] = c
    got_pairs = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_near_dup_pairs(spark, sf_dir).collect()
    }
    assert got_pairs == exp_pairs

    exp_range = {}
    for q in ids:
        if q >= N_QUERIES:
            continue
        for cand in ids:
            if cand == q:
                continue
            c = _cos_py(vecs[q], vecs[cand])
            if c >= RANGE_TAU:
                exp_range[(q, cand)] = c
    got_range = {
        (r.query_id, r.cand_id): r.cosine
        for r in embedding_range_query(spark, sf_dir).collect()
    }
    assert got_range == exp_range


def test_knn_ivf_pure_python(spark, sf_dir):
    """Third opinion for the IVF ANN path: fixed-centroid bucket
    assignment (argmax cosine, id tie-break), NPROBE bucket probing per
    query, candidate scan restricted to probed buckets, and the final
    (cos DESC, cand_id ASC) top-k — ranks and cosines bit-exact."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_CENTROIDS,
        N_QUERIES,
        NPROBE,
        TOP_K,
        knn_ivf,
    )

    vecs = _mvecs(sf_dir)
    cents = {cid: v for cid, v in vecs.items() if cid < N_CENTROIDS}
    bucket = {
        vid: min(((-_cos_py(v, cv), cid) for cid, cv in cents.items()))[1]
        for vid, v in vecs.items()
    }
    by_bucket = defaultdict(set)
    for vid, b in bucket.items():
        by_bucket[b].add(vid)
    expected = {}
    for qid, qv in vecs.items():
        if qid >= N_QUERIES:
            continue
        probed = [
            cid
            for _neg, cid in sorted(
                (-_cos_py(qv, cv), cid) for cid, cv in cents.items()
            )[:NPROBE]
        ]
        cand_ids = set().union(*(by_bucket[b] for b in probed)) - {qid}
        scored = sorted((-_cos_py(qv, vecs[c]), c) for c in cand_ids)
        for rank, (neg, cid) in enumerate(scored[:TOP_K], start=1):
            expected[(qid, cid)] = (-neg, rank)
    got = {
        (r.query_id, r.cand_id): (r.cosine, r.rank)
        for r in knn_ivf(spark, sf_dir).collect()
    }
    assert got == expected


def test_rolling_volatility_pure_python(spark, sf_dir):
    """Third opinion for the trailing 5-day stddev: 7dp integer-rational
    return quantization, exact BIGINT frame sums S1/S2 (including the
    null-skipping count over frames that straddle a supplier's first
    row), and the closing sqrt((S2 − S1²/n)/(n−1))/10⁷ binary64 algebra
    in the engine's expression order."""
    import math

    from stockmarket_bigdata_project_spark.operators.finance import (
        rolling_volatility,
    )

    bars = _daily_bars(sf_dir)
    by_supp = defaultdict(list)
    for (sk, day), (_o, _h, _l, c) in bars.items():
        by_supp[sk].append((day, c))
    expected = {}
    for sk, rows in by_supp.items():
        rows.sort()
        q7 = [None]
        for (_d0, c0), (_d1, c1) in zip(rows, rows[1:]):
            num = abs(c1 - c0) * 20_000_000 + c0
            den = 2 * c0
            s = 1 if c1 > c0 else (-1 if c1 < c0 else 0)
            q7.append(s * ((num - num % den) // den))
        for i, (d, _c) in enumerate(rows):
            frame = [q for q in q7[max(0, i - 4): i + 1] if q is not None]
            n = len(frame)
            if n <= 1:
                expected[(sk, d)] = None
                continue
            s1 = float(sum(frame))
            s2 = float(sum(q * q for q in frame))
            nf = float(n)
            arg = (s2 - s1 * s1 / nf) / (nf - 1.0)
            expected[(sk, d)] = (
                float("nan") if arg < 0.0 else math.sqrt(arg) / 1.0e7
            )
    got = {
        (r.l_suppkey, r.trade_date): r.vol_5d
        for r in rolling_volatility(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, b in expected.items():
        a = got[k]
        if b is None or a is None:
            assert a is None and b is None, (k, a, b)
        elif isinstance(b, float) and b != b:
            assert a != a, (k, a, b)
        else:
            assert a == b, (k, a, b)


def test_ewma_dyadic_close_pure_python(spark, sf_dir):
    """Third opinion for the α=1/2 truncated EWMA: every weight is a
    power of two, so the weighted fold is an exact dyadic rational in
    binary64 under any order — recompute the frame fold, the truncated
    mass renormalization, and the /100 descale with plain Python floats."""
    from stockmarket_bigdata_project_spark.operators.timeseries import (
        EWMA_SPAN,
        ewma_dyadic_close,
    )

    bars = _daily_bars(sf_dir)
    by_supp = defaultdict(list)
    for (sk, day), (_o, _h, _l, c) in bars.items():
        by_supp[sk].append((day, c))
    expected = {}
    for sk, rows in by_supp.items():
        rows.sort()
        for i, (d, _c) in enumerate(rows):
            cs = [c for _d, c in rows[max(0, i - (EWMA_SPAN - 1)): i + 1]]
            n = len(cs)
            weighted = 0.0
            for j, c in enumerate(cs, start=1):
                weighted += float(c) * 2.0 ** (j - n - 1)
            mass = 1.0 - 2.0 ** (-n)
            expected[(sk, d)] = (n, weighted / mass / 100.0)
    got = {
        (r.l_suppkey, r.trade_date): (r.n_obs, r.ewma_close)
        for r in ewma_dyadic_close(spark, sf_dir).collect()
    }
    assert got == expected


def test_correlation_matrix_pure_python(spark, sf_dir):
    """Third opinion for the exact-power-sum correlation: integer
    cents/quantities summed exactly, float(int) conversion (the digit-
    string route both engines share), and the closing
    (n·Sxy − Sx·Sy)/√((n·Sxx − Sx²)(n·Syy − Sy²)) binary64 algebra."""
    import math

    from stockmarket_bigdata_project_spark.operators.aggregates import (
        correlation_matrix,
    )

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )
    q = [int(v) for v in t.column("l_quantity").to_pylist()]
    p = [round(v * 100) for v in t.column("l_extendedprice").to_pylist()]
    d = [round(v * 100) for v in t.column("l_discount").to_pylist()]

    def corr(xs, ys):
        n = float(len(xs))
        sx, sy = float(sum(xs)), float(sum(ys))
        sxy = float(sum(a * b for a, b in zip(xs, ys)))
        sxx = float(sum(a * a for a in xs))
        syy = float(sum(b * b for b in ys))
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    row = correlation_matrix(spark, sf_dir).collect()[0]
    assert row.corr_qty_price == corr(q, p)
    assert row.corr_qty_disc == corr(q, d)
    assert row.corr_price_disc == corr(p, d)


def test_retrieval_eval_recall_pure_python(spark, sf_dir):
    """Third opinion for the ANN recall evaluation: exact and IVF top-k
    sets both recomputed in pure Python (the two rankings have their own
    third opinions above), intersected per query, and the recall emitted
    with the integer half-up micro-units idiom — no doubles anywhere."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_CENTROIDS,
        N_QUERIES,
        NPROBE,
        TOP_K,
        retrieval_eval_recall,
    )

    vecs = _mvecs(sf_dir)
    cents = {cid: v for cid, v in vecs.items() if cid < N_CENTROIDS}
    bucket = {
        vid: min(((-_cos_py(v, cv), cid) for cid, cv in cents.items()))[1]
        for vid, v in vecs.items()
    }
    by_bucket = defaultdict(set)
    for vid, b in bucket.items():
        by_bucket[b].add(vid)
    expected = {}
    for qid, qv in vecs.items():
        if qid >= N_QUERIES:
            continue
        exact = {
            cid
            for _neg, cid in sorted(
                (-_cos_py(qv, cv), cid)
                for cid, cv in vecs.items()
                if cid != qid
            )[:TOP_K]
        }
        probed = [
            cid
            for _neg, cid in sorted(
                (-_cos_py(qv, cv), cid) for cid, cv in cents.items()
            )[:NPROBE]
        ]
        cand_ids = set().union(*(by_bucket[b] for b in probed)) - {qid}
        approx = {
            cid
            for _neg, cid in sorted(
                (-_cos_py(qv, vecs[c]), c) for c in cand_ids
            )[:TOP_K]
        }
        n_exact, n_hit = len(exact), len(exact & approx)
        expected[qid] = (
            n_exact,
            n_hit,
            (2 * n_hit * 1_000_000 + n_exact) // (2 * n_exact),
        )
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall_micro)
        for r in retrieval_eval_recall(spark, sf_dir).collect()
    }
    assert got == expected


def test_label_centroid_similarity_pure_python(spark, sf_dir):
    """Third opinion for the cluster-cohesion diagnostic: per-label exact
    integer component sums, the rational round-half-away re-quantization
    to an integer-micros centroid, and each vector's bit-exact cosine to
    its own label centroid."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        label_centroid_similarity,
    )

    t = pq.read_table(table_path(sf_dir, "embeddings"),
                      columns=["vec_id", "label"])
    labels = dict(zip(t.column("vec_id").to_pylist(),
                      t.column("label").to_pylist()))
    vecs = _mvecs(sf_dir)
    sums = defaultdict(lambda: None)
    counts = Counter()
    for vid, v in vecs.items():
        lab = labels[vid]
        counts[lab] += 1
        if sums[lab] is None:
            sums[lab] = list(v)
        else:
            sums[lab] = [a + b for a, b in zip(sums[lab], v)]
    centroids = {}
    for lab, s in sums.items():
        n = counts[lab]
        cm = []
        for comp in s:
            num = abs(comp) * 2 + n
            den = 2 * n
            sign = -1 if comp < 0 else 1
            cm.append(sign * ((num - num % den) // den))
        centroids[lab] = cm
    expected = {
        vid: (labels[vid], _cos_py(v, centroids[labels[vid]]))
        for vid, v in vecs.items()
    }
    got = {
        r.vec_id: (r.label, r.cos_to_centroid)
        for r in label_centroid_similarity(spark, sf_dir).collect()
    }
    assert got == expected


def test_minhash_containment_pairs_pure_python(spark, sf_dir):
    """Third opinion for Broder containment verification: the shared
    capped-LSH candidate overlap recompute plus the two integer÷integer
    binary64 containment divisions — both directions bit-exact."""
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        minhash_containment_pairs,
    )

    expected = {
        (a, b): (ni, na, nb, ni / na, ni / nb)
        for (a, b), (ni, na, nb) in _py_candidate_overlap(sf_dir).items()
    }
    got = {
        (r.doc_a, r.doc_b): (
            r.n_inter, r.na, r.nb, r.containment_a, r.containment_b
        )
        for r in minhash_containment_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_ngram_jaccard_pairs_pure_python(spark, sf_dir):
    """Third opinion for the inverted-index all-pairs Jaccard baseline
    (no LSH, no cap): shingle→docs posting lists, pair intersection
    counts, distinct-shingle Jaccard ≥ τ — sets and raw quotients."""
    from itertools import combinations

    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        JACCARD_THRESHOLD,
        ngram_jaccard_pairs,
    )

    shingle_sets = _py_shingle_sets(sf_dir)
    postings = defaultdict(list)
    for doc_id, grams in shingle_sets.items():
        for g in grams:
            postings[g].append(doc_id)
    inter = Counter()
    for docs in postings.values():
        for a, b in combinations(sorted(docs), 2):
            inter[(a, b)] += 1
    expected = {}
    for (a, b), ni in inter.items():
        jac = ni / (len(shingle_sets[a]) + len(shingle_sets[b]) - ni)
        if jac >= JACCARD_THRESHOLD:
            expected[(a, b)] = jac
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def _lev(a: str, b: str) -> int:
    """Plain two-row Wagner–Fischer Levenshtein — a third implementation
    against Spark's Java levenshtein and DuckDB's."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[-1]


def test_edit_distance_verified_pairs_pure_python(spark, sf_dir):
    """Third opinion for the edit-distance verifier: the shared capped-LSH
    candidate set, a from-scratch Wagner–Fischer Levenshtein over the raw
    texts, the integer ed·40 ≤ max_len keep rule, and the one binary64
    ratio division."""
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        ED_RATIO_DEN,
        edit_distance_verified_pairs,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    shingle_sets = _py_shingle_sets(sf_dir)
    expected = {}
    for a, b in _py_lsh_candidates(sf_dir, shingle_sets):
        ta, tb = texts[a], texts[b]
        ml = max(len(ta), len(tb))
        ed = _lev(ta, tb)
        if ed * ED_RATIO_DEN <= ml:
            expected[(a, b)] = (ed, ml, ed / ml)
    got = {
        (r.doc_a, r.doc_b): (r.edit_distance, r.max_len, r.ed_ratio)
        for r in edit_distance_verified_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_matryoshka_recall_pure_python(spark, sf_dir):
    """Third opinion for the truncation evaluation: exact integer-L2
    top-k on the full 64 dims vs the first MRL_DIM dims, (dist ASC,
    id ASC) tie order, integer half-up recall micros — no doubles."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        MRL_DIM,
        N_QUERIES,
        TOP_K,
        matryoshka_recall,
    )

    vecs = _mvecs(sf_dir)

    def topk(prefix):
        out = {}
        for qid, qv in vecs.items():
            if qid >= N_QUERIES:
                continue
            scored = sorted(
                (
                    sum((x - y) * (x - y)
                        for x, y in zip(cv[:prefix], qv[:prefix])),
                    cid,
                )
                for cid, cv in vecs.items()
                if cid != qid
            )
            out[qid] = {cid for _d, cid in scored[:TOP_K]}
        return out

    full, trunc = topk(len(next(iter(vecs.values())))), topk(MRL_DIM)
    expected = {}
    for qid, exact in full.items():
        n_exact, n_hit = len(exact), len(exact & trunc[qid])
        expected[qid] = (
            n_exact,
            n_hit,
            (2 * n_hit * 1_000_000 + n_exact) // (2 * n_exact),
        )
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall_micro)
        for r in matryoshka_recall(spark, sf_dir).collect()
    }
    assert got == expected


def test_embedding_lsh_near_dup_pure_python(spark, sf_dir):
    """Third opinion for hyperplane LSH near-dup: the ±1 plane matrix
    re-derived from md5 parity (not imported), sign-bit band signatures,
    band-collision candidates, exact cosine ≥ τ verification."""
    import hashlib
    from itertools import combinations

    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        BITS_PER_BAND,
        EMB_DIMS,
        LSH_BANDS,
        N_PLANES,
        embedding_lsh_near_dup,
    )

    planes = [
        [
            1 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for d in range(EMB_DIMS)
        ]
        for p in range(N_PLANES)
    ]
    vecs = _mvecs(sf_dir)
    buckets = defaultdict(list)
    for vid, v in vecs.items():
        bits = [
            1 if sum(x * s for x, s in zip(v, planes[p])) >= 0 else 0
            for p in range(N_PLANES)
        ]
        for band in range(LSH_BANDS):
            sig = "".join(
                str(bits[band * BITS_PER_BAND + j])
                for j in range(BITS_PER_BAND)
            )
            buckets[(band, sig)].append(vid)
    cands = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            cands.add((a, b))
    expected = {}
    for a, b in cands:
        c = _cos_py(vecs[a], vecs[b])
        if c >= 0.40:
            expected[(a, b)] = c
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_lsh_near_dup(spark, sf_dir).collect()
    }
    assert got == expected


def _py_pq(vecs):
    """Pure-Python product quantization: per-subspace codebooks from the
    first PQ_K vectors, nearest-code assignment with the packed
    dist·K+code integer argmin (lower-code tie rule), per-query ADC
    lookup tables. Returns (sub, l2, codebooks, codes)."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        PQ_K,
        PQ_SUB,
        PQ_SUBDIM,
    )

    def sub(v, s):
        return v[s * PQ_SUBDIM: (s + 1) * PQ_SUBDIM]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cb = {
        s: {int(code): sub(vecs[code], s) for code in vecs if code < PQ_K}
        for s in range(PQ_SUB)
    }
    codes = {}
    for vid, v in vecs.items():
        codes[vid] = [
            min(
                int(l2(sub(v, s), cv)) * PQ_K + code
                for code, cv in cb[s].items()
            )
            % PQ_K
            for s in range(PQ_SUB)
        ]
    return sub, l2, cb, codes


def test_pq_eval_recall_pure_python(spark, sf_dir):
    """Third opinion for the PQ search path end-to-end: codebook encode,
    ADC shortlist, exact-L2 re-rank, and the recall of the re-ranked
    top-k against brute-force integer L2 — all integer arithmetic."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_QUERIES,
        PQ_SHORTLIST,
        PQ_SUB,
        TOP_K,
        pq_eval_recall,
    )

    vecs = _mvecs(sf_dir)
    sub, l2, cb, codes = _py_pq(vecs)
    expected = {}
    for qid, qv in vecs.items():
        if qid >= N_QUERIES:
            continue
        lut = {
            s: {code: int(l2(sub(qv, s), cv)) for code, cv in cb[s].items()}
            for s in range(PQ_SUB)
        }
        adc = sorted(
            (sum(lut[s][codes[vid][s]] for s in range(PQ_SUB)), vid)
            for vid in vecs
            if vid != qid
        )
        short = [vid for _d, vid in adc[:PQ_SHORTLIST]]
        rerank = sorted((int(l2(vecs[c], qv)), c) for c in short)
        approx = {c for _d, c in rerank[:TOP_K]}
        exact = {
            c
            for _d, c in sorted(
                (int(l2(cv, qv)), cid)
                for cid, cv in vecs.items()
                if cid != qid
            )[:TOP_K]
        }
        n_exact, n_hit = len(exact), len(exact & approx)
        expected[qid] = (
            n_exact,
            n_hit,
            (2 * n_hit * 1_000_000 + n_exact) // (2 * n_exact),
        )
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall_micro)
        for r in pq_eval_recall(spark, sf_dir).collect()
    }
    assert got == expected


def test_ivf_pq_eval_recall_pure_python(spark, sf_dir):
    """Third opinion for the composed IVF-PQ path: L2 bucket assignment
    and probing over the fixed centroid set, ADC ranking restricted to
    probed buckets, recall vs brute-force L2 — integer micros only."""
    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        N_CENTROIDS,
        N_QUERIES,
        NPROBE,
        PQ_SUB,
        TOP_K,
        ivf_pq_eval_recall,
    )

    vecs = _mvecs(sf_dir)
    sub, l2, cb, codes = _py_pq(vecs)
    cents = {cid: v for cid, v in vecs.items() if cid < N_CENTROIDS}
    bucket = {
        vid: min((int(l2(v, cv)), cid) for cid, cv in cents.items())[1]
        for vid, v in vecs.items()
    }
    expected = {}
    for qid, qv in vecs.items():
        if qid >= N_QUERIES:
            continue
        probed = {
            cid
            for _d, cid in sorted(
                (int(l2(qv, cv)), cid) for cid, cv in cents.items()
            )[:NPROBE]
        }
        lut = {
            s: {code: int(l2(sub(qv, s), cv)) for code, cv in cb[s].items()}
            for s in range(PQ_SUB)
        }
        adc = sorted(
            (sum(lut[s][codes[vid][s]] for s in range(PQ_SUB)), vid)
            for vid in vecs
            if vid != qid and bucket[vid] in probed
        )
        approx = {vid for _d, vid in adc[:TOP_K]}
        exact = {
            c
            for _d, c in sorted(
                (int(l2(cv, qv)), cid)
                for cid, cv in vecs.items()
                if cid != qid
            )[:TOP_K]
        }
        n_exact, n_hit = len(exact), len(exact & approx)
        expected[qid] = (
            n_exact,
            n_hit,
            (2 * n_hit * 1_000_000 + n_exact) // (2 * n_exact),
        )
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall_micro)
        for r in ivf_pq_eval_recall(spark, sf_dir).collect()
    }
    assert got == expected


def test_lsh_eval_precision_recall_pure_python(spark, sf_dir):
    """Third opinion for the LSH candidate-quality eval: truth = the
    recomputed all-pairs Jaccard ≥ τ set, candidates = the recomputed
    capped band collisions, and the two count÷count binary64 divisions."""
    from itertools import combinations

    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        JACCARD_THRESHOLD,
        lsh_eval_precision_recall,
    )

    shingle_sets = _py_shingle_sets(sf_dir)
    postings = defaultdict(list)
    for doc_id, grams in shingle_sets.items():
        for g in grams:
            postings[g].append(doc_id)
    inter = Counter()
    for docs in postings.values():
        for a, b in combinations(sorted(docs), 2):
            inter[(a, b)] += 1
    truth = {
        (a, b)
        for (a, b), ni in inter.items()
        if ni / (len(shingle_sets[a]) + len(shingle_sets[b]) - ni)
        >= JACCARD_THRESHOLD
    }
    cands = _py_lsh_candidates(sf_dir, shingle_sets)
    n_truth, n_cand = len(truth), len(cands)
    n_hits = len(truth & cands)
    row = lsh_eval_precision_recall(spark, sf_dir).collect()[0]
    assert (row.n_truth, row.n_candidates, row.n_hits) == (
        n_truth, n_cand, n_hits,
    )
    assert row.lsh_recall == n_hits / n_truth
    assert row.candidate_precision == n_hits / n_cand


def test_sparse_cosine_pairs_pure_python(spark, sf_dir):
    """Third opinion for the sparse tf-cosine operator: multiset 3-gram
    term frequencies, the df ≤ cap pruning, exact integer dots/norms,
    and the dot/(√ssa·√ssb) binary64 division."""
    import math

    from stockmarket_bigdata_project_spark.llmdata.similarity import (
        SC_DF_CAP,
        SC_DOT_MIN,
        sparse_cosine_pairs,
    )

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    tf = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        ws = text.split(" ")
        grams = [" ".join(ws[i: i + 3]) for i in range(len(ws) - 2)]
        if grams:
            tf[doc_id] = Counter(grams)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    post = {
        d: {g: n for g, n in c.items() if df[g] <= SC_DF_CAP}
        for d, c in tf.items()
    }
    ssq = {d: sum(n * n for n in c.values()) for d, c in post.items()}
    postings = defaultdict(list)
    for d, c in post.items():
        for g, n in c.items():
            postings[g].append((d, n))
    dots = Counter()
    for plist in postings.values():
        plist.sort()
        for i, (da, na) in enumerate(plist):
            for db, nb in plist[i + 1:]:
                dots[(da, db)] += na * nb
    expected = {}
    for (da, db), dot in dots.items():
        if dot >= SC_DOT_MIN:
            expected[(da, db)] = (
                dot,
                float(dot) / (math.sqrt(float(ssq[da]))
                              * math.sqrt(float(ssq[db]))),
            )
    got = {
        (r.doc_a, r.doc_b): (r.dot, r.cosine)
        for r in sparse_cosine_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_predict_returns_pure_python(spark, sf_dir):
    """Third opinion for the Arrow-batched linear inference path: OHLCV
    close doubles rebuilt from the parquet bytes (max-ord-key close),
    prev-return and rolling-3 momentum in the engine's frame order, the
    fixed linear model's coefficient algebra, and the floor(x·10^s+0.5)
    fixed-point quantizer — bit-exact against the pandas_udf output."""
    import math

    from stockmarket_bigdata_project_spark.ml import (
        _COEF_MOMENTUM,
        _COEF_PREV_RET,
        _INTERCEPT,
        predict_returns,
    )

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
                 "l_extendedprice"],
    )
    closes = {}
    for ok, ln, sk, sd, px in zip(*[t.column(c).to_pylist() for c in (
            "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
            "l_extendedprice")]):
        day = sd.date() if hasattr(sd, "date") else sd
        key = (ok * 16 + ln) * 100_000_000 + round(px * 100)
        cur = closes.get((sk, day))
        if cur is None or key > cur[0]:
            closes[(sk, day)] = (key, px)
    by_supp = defaultdict(list)
    for (sk, day), (_k, px) in closes.items():
        by_supp[sk].append((day, px))

    def q(x, scale):
        return math.floor(x * scale + 0.5) / scale

    expected = {}
    for sk, rows in by_supp.items():
        rows.sort()
        px = [p for _d, p in rows]
        for i, (d, c) in enumerate(rows):
            if i == 0:
                continue  # prev_ret null → dropped
            prev_ret = c / px[i - 1] - 1
            acc = 0.0
            frame = px[max(0, i - 2): i + 1]
            for v in frame:
                acc += v
            momentum = c / (acc / len(frame)) - 1
            pred = (
                _COEF_PREV_RET * prev_ret + _COEF_MOMENTUM * momentum
            ) + _INTERCEPT
            expected[(sk, d)] = (c, q(pred, 1e6), q(c * (1 + pred), 1e4))
    got = {
        (r.l_suppkey, r.trade_date): (
            r.close_px, r.pred_return, r.predicted_price
        )
        for r in predict_returns(spark, sf_dir).collect()
    }
    assert got == expected


def test_direction_auc_pure_python_pairwise(spark, sf_dir):
    """Third opinion for the r13 AUC query via a DIFFERENT ALGORITHM:
    the engine computes Mann-Whitney from per-score-group counts and a
    strictly-below cumulative; this recompute walks every (positive,
    negative) PAIR naively — 2 per win, 1 per tie — from the parquet
    bytes (features/score rebuilt exactly as the proven predict_returns
    third opinion), and the integer micro quantization must agree
    bit-for-bit."""
    import math

    from stockmarket_bigdata_project_spark.ml import (
        _COEF_MOMENTUM,
        _COEF_PREV_RET,
        _INTERCEPT,
        direction_auc,
    )

    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
                 "l_extendedprice"],
    )
    closes = {}
    for ok, ln, sk, sd, px in zip(*[t.column(c).to_pylist() for c in (
            "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
            "l_extendedprice")]):
        day = sd.date() if hasattr(sd, "date") else sd
        key = (ok * 16 + ln) * 100_000_000 + round(px * 100)
        cur = closes.get((sk, day))
        if cur is None or key > cur[0]:
            closes[(sk, day)] = (key, px)
    by_supp = defaultdict(list)
    for (sk, day), (_k, px) in closes.items():
        by_supp[sk].append((day, px))

    expected = {}
    for sk, rows in by_supp.items():
        rows.sort()
        px = [p for _d, p in rows]
        series = []  # (score, label) over the feature-filtered rows
        for i, (d, c) in enumerate(rows):
            if i == 0:
                continue  # prev_ret null → dropped by _features
            prev_ret = c / px[i - 1] - 1
            acc = 0.0
            frame = px[max(0, i - 2): i + 1]
            for v in frame:
                acc += v
            momentum = c / (acc / len(frame)) - 1
            pred = (
                _COEF_PREV_RET * prev_ret + _COEF_MOMENTUM * momentum
            ) + _INTERCEPT
            score = math.floor(pred * 1e6 + 0.5) / 1e6
            series.append((score, c))
        # label = next row's close > this row's close (lead over the
        # SAME filtered series); last row has no lead → dropped
        labeled = [
            (s, 1 if series[i + 1][1] > c else 0)
            for i, (s, c) in enumerate(series[:-1])
        ]
        pos = [s for s, y in labeled if y == 1]
        neg = [s for s, y in labeled if y == 0]
        if not pos or not neg:
            continue
        u2 = 0  # 2·U: 2 per strict win, 1 per tie — the naive O(n²) walk
        for sp in pos:
            for sn in neg:
                if sp > sn:
                    u2 += 2
                elif sp == sn:
                    u2 += 1
        np_, nn = len(pos), len(neg)
        micro = (2 * 1_000_000 * u2 + 2 * np_ * nn) // (4 * np_ * nn)
        expected[sk] = (np_, nn, micro)

    got = {
        r.l_suppkey: (r.n_pos, r.n_neg, r.auc_micro)
        for r in direction_auc(spark, sf_dir).collect()
    }
    assert got == expected


def test_quality_calibration_buckets_pure_python(spark, sf_dir):
    """Third opinion for the r13 calibration query: quality micro score,
    Gopher keep decision, decile bucketing and the per-bucket integer
    rationals all recomputed from the parquet bytes with Python's re/str
    — a third regex/split engine against Spark's and DuckDB's."""
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        CALIB_BUCKETS,
        GOPHER_MAX_MEAN_TOK,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_TOK,
        GOPHER_MIN_TOKENS,
        STOPWORDS,
        quality_calibration_buckets,
    )

    stop_set = set(STOPWORDS)
    agg = defaultdict(lambda: [0, 0, 0])  # bucket -> [n, sum_micro, n_keep]
    for _doc_id, _source, text in _docs(sf_dir):
        toks = text.split(" ")
        n = len(toks)
        chars = len(text)
        c = chars - (n - 1)
        stop = sum(1 for tk in toks if tk in stop_set)
        if n < 10:
            micro = 0
        else:
            t1 = min(500000, 2500 * n) * (8 * n)
            t2 = 2400000 * (n - stop)
            t3 = min(1600000 * n, 200000 * c)
            micro = (2 * (t1 + t2 + t3) + 8 * n) // (16 * n)
        n_sym = len(re.sub(r"[a-z0-9 ]", "", text))
        n_digit = chars - len(re.sub(r"[0-9]", "", text))
        keep = not (
            n < GOPHER_MIN_TOKENS
            or n > GOPHER_MAX_TOKENS
            or c < GOPHER_MIN_MEAN_TOK * n
            or c > GOPHER_MAX_MEAN_TOK * n
            or 10 * n_sym > chars
            or 5 * n_digit > chars
            or stop == 0
        )
        b = min(CALIB_BUCKETS - 1, micro // (1_000_000 // CALIB_BUCKETS))
        agg[b][0] += 1
        agg[b][1] += micro
        agg[b][2] += 1 if keep else 0

    expected = {}
    for b, (n_docs, sum_micro, n_keep) in agg.items():
        avg_pred = (2 * sum_micro + n_docs) // (2 * n_docs)
        keep_rate = (2 * 1_000_000 * n_keep + n_docs) // (2 * n_docs)
        expected[b] = (n_docs, avg_pred, keep_rate, abs(avg_pred - keep_rate))

    got = {
        r.bucket: (r.n_docs, r.avg_pred_micro, r.keep_rate_micro, r.gap_micro)
        for r in quality_calibration_buckets(spark, sf_dir).collect()
    }
    assert got == expected


def test_hot_key_rollup_pure_python(spark, sf_dir):
    """Third opinion for the r14 constructed-skew twins: the hot-key
    mapping (even user_id → custkey 1), the customer join and the
    per-event-type integer rollup recomputed from the parquet bytes with
    plain dicts — and BOTH twins (plain/AQE and 16-way salted) must equal
    it, so the salt and any runtime skew split are invisible in values."""
    from stockmarket_bigdata_project_spark.operators.skew import (
        hot_key_rollup,
        hot_key_rollup_salted,
    )

    ev = pq.read_table(
        table_path(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    cust = pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    nation = dict(
        zip(cust.column("c_custkey").to_pylist(),
            cust.column("c_nationkey").to_pylist())
    )
    agg = defaultdict(lambda: [0, 0])  # event_type -> [n_events, weight]
    for uid, et in zip(
        ev.column("user_id").to_pylist(), ev.column("event_type").to_pylist()
    ):
        k = 1 if uid % 2 == 0 else uid
        nk = nation.get(k)
        if nk is None:
            continue  # inner join: unmatched keys drop
        agg[et][0] += 1
        agg[et][1] += nk
    expected = {et: tuple(v) for et, v in agg.items()}

    for fn in (hot_key_rollup, hot_key_rollup_salted):
        got = {
            r.event_type: (r.n_events, r.nation_weight)
            for r in fn(spark, sf_dir).collect()
        }
        assert got == expected, fn.__name__
