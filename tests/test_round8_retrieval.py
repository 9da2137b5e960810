"""Independent (non-twin) references for the round-8 retrieval /
quality-calibration queries (plans/retrieval_quality.py).

Each test recomputes the query from its PUBLISHED definition in plain
Python over the raw fixture rows — no Spark/DuckDB expression
machinery shared with the plan or its oracle — and requires exact
agreement (the anti-twin-blindness pattern of
tests/test_independent_references.py).
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

from fsc_etl_spark.plans.retrieval_quality import (
    BM25_QUERY_TERMS,
    GOPHER_STOPS,
    QUERIES,
)
from fsc_etl_spark.sources.readers import read_parquet_table


def _toks(text: str) -> list[str]:
    return [x for x in re.split(r"\s+", text.strip()) if x]


def _r6(v: float) -> Decimal:
    """6dp half-away-from-zero — Spark/DuckDB ROUND semantics (Python
    round() is half-even and would fork on exact halves)."""
    return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _bm25_reference(docs: list) -> dict[int, tuple[Decimal, int]]:
    """Okapi BM25 (k1=1.2, b=0.75, idf=(N-df+0.5)/(df+0.5)) in plain
    Python floats — the same IEEE double chain the engines run — with
    per-term 6dp rounding and exact Decimal accumulation."""
    toks = {d.doc_id: [t.lower() for t in _toks(d.text)] for d in docs}
    n = len(toks)
    dl = {i: len(tk) for i, tk in toks.items()}
    avgdl = sum(dl.values()) / n
    tf = {
        i: {w: tk.count(w) for w in BM25_QUERY_TERMS if w in tk}
        for i, tk in toks.items()
    }
    df = {w: sum(1 for i in tf if w in tf[i]) for w in BM25_QUERY_TERMS}
    out: dict[int, tuple[Decimal, int]] = {}
    for i, hits in tf.items():
        if not hits:
            continue
        s = Decimal(0)
        for w, f_ in hits.items():
            idf = (n - df[w] + 0.5) / (df[w] + 0.5)
            tfc = f_ * 2.2 / (f_ + 1.2 * (0.25 + 0.75 * (dl[i] / avgdl)))
            s += _r6(idf * tfc)
        out[i] = (s, len(hits))
    return out


def test_bm25_topk_docs_against_reference(spark, sf_smoke):
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    scores = _bm25_reference(docs)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    expect = [
        (r + 1, i, hits, float(s)) for r, (i, (s, hits)) in enumerate(ranked)
    ]
    got = [
        (x.rank, x.doc_id, x.n_terms, x.bm25)
        for x in QUERIES["bm25_topk_docs"](spark, sf_smoke)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left-fold double accumulation — the order F.aggregate and
    list_dot_product use (numpy dot blocks differently)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_rrf_fused_topk_against_reference(spark, sf_smoke):
    import math

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    lex_scores = _bm25_reference(docs)
    lex_sorted = sorted(lex_scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    lex_rank = {i: r + 1 for r, (i, _) in enumerate(lex_sorted[:50])}

    emb = read_parquet_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    q = vecs[0]
    qn = math.sqrt(_fold_dot(q, q))
    cos = {
        i: _r6(_fold_dot(q, v) / (qn * math.sqrt(_fold_dot(v, v))))
        for i, v in vecs.items()
        if i != 0
    }
    sem_sorted = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
    sem_rank = {i: r + 1 for r, (i, _) in enumerate(sem_sorted[:50])}

    fused = {
        i: (1_000_000_000 // (60 + lex_rank[i]) if i in lex_rank else 0)
        + (1_000_000_000 // (60 + sem_rank[i]) if i in sem_rank else 0)
        for i in set(lex_rank) | set(sem_rank)
    }
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [
        (r + 1, i, lex_rank.get(i), sem_rank.get(i), f)
        for r, (i, f) in enumerate(top)
    ]
    got = [
        (x.rank, x.id, x.lex_rank, x.sem_rank, x.fused_ppb)
        for x in QUERIES["rrf_fused_topk"](spark, sf_smoke)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_gopher_quality_flags_against_reference(spark, sf_smoke):
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    expect = {}
    for d in docs:
        tk = [t.lower() for t in _toks(d.text)]
        w = len(tk)
        chars = sum(len(t) for t in tk)
        n_sym = sum(1 for t in tk if "#" in t or "..." in t)
        n_alpha = sum(1 for t in tk if re.search("[a-z]", t))
        n_stop = len(set(tk) & set(GOPHER_STOPS))
        flags = (
            50 <= w <= 100_000,
            3 * w <= chars <= 10 * w,
            10 * n_sym <= w,
            5 * n_alpha >= 4 * w,
            n_stop >= 2,
        )
        expect[d.doc_id] = (w, *flags, all(flags))
    got = {
        x.doc_id: (
            x.n_tokens,
            x.flag_word_count,
            x.flag_mean_word_len,
            x.flag_symbol_ratio,
            x.flag_alpha_words,
            x.flag_stopwords,
            x.pass_gopher,
        )
        for x in QUERIES["gopher_quality_flags"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_quality_calibration_bins_against_reference(spark, sf_smoke):
    from fsc_etl_spark.functions.text import LANG_STOPWORDS

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "lang"
    ).collect()
    stops = set(LANG_STOPWORDS["en"])
    rows = []
    for d in docs:
        tk = _toks(d.text)  # raw case, matching stopword_count's input
        n_stop = sum(1 for t in tk if t in stops)
        rows.append(
            (
                (1_000_000 * n_stop) // max(len(tk), 1),
                d.doc_id,
                1 if d.lang == "en" else 0,
            )
        )
    rows.sort()
    n = len(rows)
    q, r = divmod(n, 10)
    expect = {}
    pos = 0
    for b in range(1, 11):
        size = q + 1 if b <= r else q
        chunk = rows[pos : pos + size]
        pos += size
        if not chunk:
            continue
        n_pos = sum(c[2] for c in chunk)
        ssum = sum(c[0] for c in chunk)
        expect[b] = (
            len(chunk),
            n_pos,
            ssum // len(chunk),
            (1_000_000 * n_pos) // len(chunk),
        )
    got = {
        x.bin: (x.n, x.n_pos, x.mean_score_ppm, x.pos_rate_ppm)
        for x in QUERIES["quality_calibration_bins"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_embed_covariance_topk_numpy_reference(spark, sf_smoke):
    import numpy as np

    emb = read_parquet_table(spark, sf_smoke, "embeddings").select(
        "embedding"
    ).collect()
    M = np.array([[float(x) for x in r.embedding] for r in emb], dtype=np.float64)
    A = M * 262144.0
    Q = (np.sign(A) * np.floor(np.abs(A) + 0.5)).astype(object)  # exact ints
    n = Q.shape[0]
    s1 = Q.sum(axis=0)
    cand = []
    for i in range(Q.shape[1]):
        for j in range(i + 1, Q.shape[1]):
            s2 = int((Q[:, i] * Q[:, j]).sum())
            cov = n * s2 - int(s1[i]) * int(s1[j])
            cand.append((i + 1, j + 1, cov))
    cand.sort(key=lambda t: (-abs(t[2]), t[0], t[1]))
    expect = [(r + 1, di, dj, cov) for r, (di, dj, cov) in enumerate(cand[:10])]
    got = [
        (x.rank, x.di, x.dj, x.cov_q)
        for x in QUERIES["embed_covariance_topk"](spark, sf_smoke)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_exact_quantiles_scalable_against_reference(spark, sf_smoke):
    """Nearest-rank quantiles recomputed by literally sorting the
    values and indexing k = (q‰·(n−1)) div 1000 + 1 — no histogram,
    no window."""
    from fsc_etl_spark.plans.analytics_more import QUERIES as MQ

    vals = sorted(
        r.o_totalprice
        for r in read_parquet_table(spark, sf_smoke, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    expect = {}
    for q in (500, 900, 990, 999):
        k = (q * (n - 1)) // 1000 + 1
        expect[q] = (n, k, vals[k - 1])
    got = {
        x.q_permille: (x.n, x.k, x.value)
        for x in MQ["exact_quantiles_scalable"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_heaps_law_vocab_growth_against_reference(spark, sf_smoke):
    """Vocabulary growth recomputed with a first-seen set sweep in
    doc_id order — no min-doc shuffle decomposition."""
    docs = sorted(
        read_parquet_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect(),
        key=lambda d: d.doc_id,
    )
    n = len(docs)
    seen: set[str] = set()
    new_at = {c: 0 for c in range(1, 11)}
    for d in docs:
        c = (10 * d.doc_id) // n + 1
        for tk in _toks(d.text):
            tk = tk.lower()
            if tk not in seen:
                seen.add(tk)
                new_at[c] += 1
    expect, cum = {}, 0
    for c in range(1, 11):
        cum += new_at[c]
        expect[c] = ((n * c + 9) // 10, new_at[c], cum)
    got = {
        x.checkpoint: (x.n_docs_prefix, x.new_tokens, x.cum_vocab)
        for x in QUERIES["heaps_law_vocab_growth"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_embed_matryoshka_recall_against_reference(spark, sf_smoke):
    emb = read_parquet_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    import math

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}

    def topk(d: int) -> dict[int, set[int]]:
        out = {}
        for q in (i for i in vecs if i < 5):
            qv = vecs[q][:d]
            qn = math.sqrt(_fold_dot(qv, qv))
            scoredv = sorted(
                (
                    (
                        -_r6(
                            _fold_dot(qv, v[:d])
                            / (qn * math.sqrt(_fold_dot(v[:d], v[:d])))
                        ),
                        i,
                    )
                    for i, v in vecs.items()
                    if i != q
                ),
            )[:10]
            out[q] = {i for _, i in scoredv}
        return out

    full, trunc = topk(64), topk(16)
    expect = {q: len(full[q] & trunc[q]) for q in full}
    got = {
        x.query_id: x.n_common
        for x in QUERIES["embed_matryoshka_recall"](spark, sf_smoke).collect()
    }
    assert got == expect
    got_pct = {
        x.query_id: x.recall_pct
        for x in QUERIES["embed_matryoshka_recall"](spark, sf_smoke).collect()
    }
    assert got_pct == {q: 10 * v for q, v in expect.items()}


def test_bm25_prf_expansion_against_reference(spark, sf_smoke):
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    scores = _bm25_reference(docs)
    top10 = {
        i
        for i, _ in sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[
            :10
        ]
    }
    toks = {d.doc_id: [t.lower() for t in _toks(d.text)] for d in docs}
    n = len(toks)
    tf_fb: dict[str, int] = {}
    for i in top10:
        for tk in toks[i]:
            if tk not in BM25_QUERY_TERMS:
                tf_fb[tk] = tf_fb.get(tk, 0) + 1
    df: dict[str, int] = {}
    for tk_list in toks.values():
        for tk in set(tk_list):
            df[tk] = df.get(tk, 0) + 1
    ranked = sorted(
        (
            (tk, f, df[tk], _r6(f * float(n + 1) / (df[tk] + 1)))
            for tk, f in tf_fb.items()
        ),
        key=lambda r: (-r[3], r[0]),
    )[:15]
    expect = [
        (r + 1, tk, f, d, float(s)) for r, (tk, f, d, s) in enumerate(ranked)
    ]
    got = [
        (x.rank, x.tok, x.tf_fb, x.df, x.score)
        for x in QUERIES["bm25_prf_expansion"](spark, sf_smoke)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_embed_power_iteration_numpy_semantic_reference(spark, sf_smoke):
    """Semantic (not bit) reference: the integer power iteration's
    Rayleigh quotient must reach >=98% of the TRUE top eigenvalue of
    the same rescaled integer covariance matrix, computed by numpy's
    independent eigensolver — pinning that the exact integer
    arithmetic still computes PCA, not just something deterministic.
    (Direction alignment is deliberately not asserted: the fixture
    spectra are near-isotropic — measured lambda2/lambda1 up to 0.99 —
    so the direction is ill-conditioned while the value converges at
    the squared rate.)"""
    import numpy as np

    emb = read_parquet_table(spark, sf_smoke, "embeddings").select(
        "embedding"
    ).collect()
    M = np.array([[float(x) for x in r.embedding] for r in emb])
    n = M.shape[0]
    A = M * 262144.0
    Q = np.sign(A) * np.floor(np.abs(A) + 0.5)
    covq = n * (Q.T @ Q) - np.outer(Q.sum(0), Q.sum(0))
    m = np.abs(covq).max()
    d = max(1, -(-int(m) // (1 << 30)))  # ceil
    cr = np.trunc(covq / d)
    lam_true = float(np.linalg.eigvalsh(cr)[-1])

    got = (
        QUERIES["embed_power_iteration"](spark, sf_smoke)
        .orderBy("dim")
        .collect()
    )
    v = np.array([r.v_q for r in got], dtype=np.float64)
    u = np.array([r.u_q for r in got], dtype=np.float64)
    rayleigh = float((v @ u) / (v @ v))
    assert rayleigh >= 0.98 * lam_true, (rayleigh, lam_true)
