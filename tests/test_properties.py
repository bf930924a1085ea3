"""Property-based differential tests (hypothesis): engine operators vs
independent pure-Python reimplementations on generated inputs. Few
examples per property (each example is a Spark round-trip); the
generators aim at the edge structure, not volume."""

from __future__ import annotations

import hashlib

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from basic_data_fusion_spark.functions.scalars import hash_split, stratified_keep
from basic_data_fusion_spark.operators import dedup, text

FAST = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _md5_hex(key: int) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()


@FAST
@given(rate=st.integers(min_value=0, max_value=256),
       keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True))
def test_stratified_keep_matches_python_md5(spark, rate, keys):
    df = spark.createDataFrame([(k, "s") for k in keys], "id long, g string")
    kept = {r["id"] for r in
            df.filter(stratified_keep(F.col("g"), F.col("id"), {"s": rate / 256}))
            .collect()}
    expect = ({k for k in keys if _md5_hex(k)[:2] < format(rate, "02x")}
              if 0 < rate < 256 else (set(keys) if rate == 256 else set()))
    assert kept == expect


@FAST
@given(keys=st.lists(st.integers(0, 100_000), min_size=1, max_size=50, unique=True),
       train=st.integers(1, 14))
def test_hash_split_matches_python_md5(spark, keys, train):
    val = (16 - train) // 2 or 1
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {r["id"]: r["s"] for r in
           df.select("id", hash_split(F.col("id"), train, val).alias("s")).collect()}

    def expect(k: int) -> str:
        nib = int(_md5_hex(k)[0], 16)
        return "train" if nib < train else ("val" if nib < train + val else "test")

    assert got == {k: expect(k) for k in keys}


@FAST
@given(words=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30))
def test_max_run_matches_python(spark, words):
    doc = " ".join(words)
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    got = text.repetition_features(df).first()["max_run"]
    best = run = 1
    for prev, cur in zip(words, words[1:]):
        run = run + 1 if cur == prev else 1
        best = max(best, run)
    assert got == best


@FAST
@given(edges=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # local_edge_cap=0 keeps this property net on the DISTRIBUTED
    # rounds (the fast path has its own parity pin in
    # test_connected_components_fast_path_matches_distributed)
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(
               df, local_edge_cap=0).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert got == expect


@FAST
@given(docs=st.lists(st.lists(st.sampled_from(["a", "b", "", "x y"]),
                              min_size=0, max_size=8),
                     min_size=1, max_size=5))
def test_collapse_repeated_lines_matches_python(spark, docs):
    """Spark collapse_repeated_lines vs the direct Python rule (keep
    line i iff i==0 or line != previous), plus idempotence: a second
    pass collapses nothing."""
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.collapse_repeated_lines(df).collect()}
    for i, lines in enumerate(docs):
        # split('\n') of the joined text: [''] for the empty doc
        ls = "\n".join(lines).split("\n")
        kept = [ln for j, ln in enumerate(ls) if j == 0 or ln != ls[j - 1]]
        assert got[i]["clean_text"] == "\n".join(kept)
        assert got[i]["n_lines"] == len(ls)
        assert got[i]["n_collapsed"] == len(ls) - len(kept)
    again = dedup.collapse_repeated_lines(
        df.sparkSession.createDataFrame(
            [(i, got[i]["clean_text"]) for i in range(len(docs))],
            "doc_id long, text string"))
    assert all(r["n_collapsed"] == 0 for r in again.collect())


def test_s_curve_capture_matches_closed_form():
    """The sweep's chained-multiplication S-curve equals the closed
    form within float tolerance, stays in [0,1], and is monotone in
    bands at fixed num_hashes (more, narrower bands capture more)."""
    from basic_data_fusion_spark.operators.dedup import _s_curve_capture

    for t in (0.1, 0.5, 0.8, 0.99):
        vals = []
        for b in (1, 2, 4, 8, 16, 32, 64):
            r = 64 // b
            v = _s_curve_capture(t, r, b)
            assert abs(v - (1.0 - (1.0 - t ** r) ** b)) < 1e-9
            assert 0.0 <= v <= 1.0
            vals.append(v)
        assert vals == sorted(vals)


@FAST
@given(docs=st.lists(
    st.lists(st.sampled_from(["nav bar", "footer", "x", "y", "z", ""]),
             min_size=1, max_size=6),
    min_size=1, max_size=8))
def test_line_dedup_matches_python(spark, docs):
    """Spark line_dedup vs a direct Python reimplementation of the C4
    rule: lines (trimmed, non-blank) present in ≥2 distinct docs vanish
    from every doc; order and blank lines survive."""
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dedup.line_dedup(df).collect()}

    from collections import defaultdict
    seen = defaultdict(set)
    for i, lines in enumerate(docs):
        for ln in lines:
            if ln.strip():
                seen[ln.strip()].add(i)
    banned = {ln for ln, d in seen.items() if len(d) >= 2}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if ln.strip() not in banned]
        assert got[i] == ("\n".join(kept), len(lines) - len(kept))


@FAST
@given(texts=st.lists(st.sampled_from(
    ["the cat", "the dog runs", "un gato", "el perro", "the the the", ""]),
    min_size=2, max_size=8))
def test_dsir_weights_match_python(spark, texts):
    """Spark dsir_log_weights vs a pure-Python replay (same md5 bucket
    hash, add-one smoothing, 1e8 fixed-point log ratios). Target = the
    docs containing 'the'."""
    import math

    from basic_data_fusion_spark.operators.selection import dsir_log_weights

    B = 64
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = df.filter(F.col("text").contains("the"))
    got = {r["doc_id"]: (r["n_features"], r["log_weight"])
           for r in dsir_log_weights(df, tgt, buckets=B).collect()}

    def grams(t: str) -> list[str]:
        toks = [w for w in t.strip().lower().split() if w]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    raw_inst = [(i, bucket(g)) for i, t in rows for g in grams(t)]
    tgt_inst = [b for i, b in raw_inst if "the" in texts[i]]
    from collections import Counter
    cr, ct = Counter(b for _, b in raw_inst), Counter(tgt_inst)
    tr, tt = len(raw_inst), len(tgt_inst)
    lr = {b: round((math.log((ct[b] + 1) / (tt + B))
                    - math.log((cr[b] + 1) / (tr + B))) * 1e8)
          for _, b in raw_inst}
    for i, t in rows:
        bs = [bucket(g) for g in grams(t)]
        if not bs:
            assert got[i] == (0, None)
            continue
        assert got[i][0] == len(bs)
        assert got[i][1] == pytest.approx(sum(lr[b] for b in bs) / 1e8, abs=1e-9)


@FAST
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
    min_size=1, max_size=10))
def test_stupid_backoff_matches_python(spark, docs):
    """Bigram Stupid Backoff vs a pure-Python model on generated corpora
    (ids 0..n-1, the md5-nibble split decided identically)."""
    import math

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.stupid_backoff_lm(df).collect()}

    train = [i for i, _ in rows if int(_md5_hex(i)[0], 16) < 8]
    uni, big, n = {}, {}, 0
    for i in train:
        t = docs[i]
        for w in t:
            uni[w] = uni.get(w, 0) + 1
            n += 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1

    def score(a, b):
        if (a, b) in big:
            return big[(a, b)] / uni[a]
        if b in uni and n > 0:
            return 0.4 * uni[b] / n
        if n > 0:
            return 0.4 * 0.4 / n
        return None

    for i, toks in enumerate(docs):
        pairs = list(zip(toks, toks[1:]))
        assert out[i]["n_bigrams"] == len(pairs)
        if not pairs:
            assert out[i]["mean_neg_log_score"] is None
            continue
        scores = [score(a, b) for a, b in pairs]
        if any(s is None for s in scores):
            assert out[i]["mean_neg_log_score"] is None
            continue
        ss = sum(int(round(-math.log(s) * 1e8)) for s in scores)
        assert out[i]["mean_neg_log_score"] == pytest.approx(
            (ss / 1e8) / len(pairs), abs=1e-9)


@FAST
@given(docs=st.lists(
    st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=10),
    min_size=2, max_size=8),
    terms=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3,
                   unique=True))
def test_bm25_matches_python_property(spark, docs, terms):
    import math

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["bm25_score"])
           for r in text.bm25_topk(df, list(terms), k=100).collect()]

    k1, b = 1.2, 0.75
    parsed = {i: t for i, t in enumerate(docs)}
    n_docs = len(parsed)
    total = sum(len(t) for t in parsed.values())
    avgdl = total / n_docs
    dfreq = {t: sum(1 for d in parsed.values() if t in d) for t in terms}
    expect = {}
    for i, toks in parsed.items():
        s, m = 0, 0
        for t in sorted(set(terms)):
            tf = toks.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log(1.0 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += int(round(idf * tf * (k1 + 1.0)
                           / (tf + k1 * (1 - b + b * len(toks) / avgdl)) * 1e8))
        if m:
            expect[i] = s / 1e8
    assert dict(got) == pytest.approx(expect)


@FAST
@given(keys=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                     min_size=1, max_size=30, unique=True))
def test_bloom_never_false_negative_property(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["s"])
    bm = dedup.bloom_build(df, "s", m_bits=1 << 12, k_hashes=4)
    res = df.withColumn(
        "hit", dedup.bloom_might_contain(F.col("s"), bm, 1 << 12, 4)).collect()
    assert all(r["hit"] for r in res)


@FAST
@given(vals=st.lists(st.floats(allow_nan=False, allow_infinity=False,
                               width=64),
                     min_size=1, max_size=8))
def test_nested_double_lit_roundtrip_exact(spark, vals):
    """The SQL-parsed array literal must reproduce every double
    BIT-EXACTLY (repr is the shortest exact round-trip; 'D' pins DOUBLE)
    — including subnormals, huge magnitudes, and negative zero."""
    import struct

    from basic_data_fusion_spark.operators.similarity import nested_double_lit

    row = spark.range(1).select(nested_double_lit([vals]).alias("m")).first()
    got = list(row["m"][0])
    assert len(got) == len(vals)
    for g, v in zip(got, vals):
        assert struct.pack("<d", g) == struct.pack("<d", float(v)), (g, v)


@FAST
@given(vals=st.lists(st.floats(min_value=-100.0, max_value=100.0,
                               allow_nan=False, width=64),
                     min_size=1, max_size=16))
def test_fp_self_dot_py_matches_column(spark, vals):
    """The driver-side centroid self-dot twin (_fp_self_dot_py) must be
    BIT-IDENTICAL to the fixed_point_self_dot column tree on the same
    literal vector — it is what lets _cell_scores fold per-centroid
    self-dots at plan-build time. Magnitudes are bounded like real
    centroid coordinates; ties (x*x*1e12 landing exactly on .5) and
    negative zero are fair game for the generator."""
    import struct

    from basic_data_fusion_spark.operators.similarity import (
        _fp_self_dot_py,
        fixed_point_self_dot,
        nested_double_lit,
    )

    got = spark.range(1).select(
        fixed_point_self_dot(nested_double_lit(vals)).alias("bb")).first()["bb"]
    exp = _fp_self_dot_py(vals)
    assert struct.pack("<d", got) == struct.pack("<d", exp), (got, exp)


@FAST
@given(a=st.lists(st.integers(-50, 50), min_size=4, max_size=40),
       b=st.lists(st.integers(-50, 50), min_size=4, max_size=40))
def test_mann_whitney_matches_python(spark, a, b):
    """U statistics vs a pure-python midrank computation on integer
    (tie-heavy) samples; U_a + U_b == n_a·n_b identically."""
    from basic_data_fusion_spark.operators.stats import mann_whitney_u

    rows = ([("a", float(x)) for x in a] + [("b", float(x)) for x in b])
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]

    allv = sorted(a + b)
    import bisect
    r_a = sum((bisect.bisect_left(allv, x) + 1
               + bisect.bisect_right(allv, x)) / 2.0 for x in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    assert got["u_a"] == u_a
    assert got["u_a"] + got["u_b"] == len(a) * len(b)


@FAST
@given(cells=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(1, 9)),
    min_size=2, max_size=12))
def test_chi2_matches_python(spark, cells):
    """Chi-squared vs a pure-python contingency computation with the
    same per-cell 1e-6 fixed-point quantization; symmetric in the two
    columns."""
    from collections import Counter

    from basic_data_fusion_spark.operators.stats import chi2_independence

    counts = Counter()
    for va, vb, n in cells:
        counts[(f"a{va}", f"b{vb}")] += n
    rows = [(a, b) for (a, b), n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "x string, y string")
    got = chi2_independence(df, "x", "y").collect()[0]

    n_tot = sum(counts.values())
    rs = Counter(); cs = Counter()
    for (a, b), n in counts.items():
        rs[a] += n
        cs[b] += n
    stat = sum(round(((o - rs[a] * cs[b] / n_tot) ** 2
                      / (rs[a] * cs[b] / n_tot)) * 1e6)
               for (a, b), o in counts.items()) / 1e6
    assert got["chi2"] == pytest.approx(stat, abs=2e-6)
    assert got["dof"] == (len(rs) - 1) * (len(cs) - 1)
    sym = chi2_independence(df, "y", "x").collect()[0]
    assert sym["chi2"] == got["chi2"] and sym["dof"] == got["dof"]


def test_quantile_rollup_error_bound_property(spark):
    """Hypothesis-style sweep without hypothesis overhead on a Spark
    fixture: across several synthetic distributions (uniform, skewed,
    boundary-heavy — values sitting EXACTLY on bin edges, and the
    degenerate hi==lo domain), every rollup estimate stays within one
    bin width of the exact percentile and n_total is exact."""
    from basic_data_fusion_spark.operators.aggregations import (
        quantile_hist_sketch,
        quantile_rollup,
    )
    from pyspark.sql import functions as F

    cases = {
        "uniform": [float(i) for i in range(1000)],
        "skewed": [float(i) ** 3 for i in range(500)],
        # every value on a bin edge for bins=10 over [0, 100]
        "edges": [float(x) for x in range(0, 101, 10)] * 7,
        "degenerate": [42.0] * 50,
    }
    for name, vals in cases.items():
        df = spark.createDataFrame([(i % 3, v) for i, v in enumerate(vals)],
                                   "p int, x double")
        lo, hi = min(vals), max(vals)
        bins = 10 if name == "edges" else 64
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        sk = quantile_hist_sketch(df, "p", "x", lo, hi, bins)
        got = {r["quantile"]: r for r in
               quantile_rollup(sk, lo, hi, bins, qs).collect()}
        exact = df.agg(*[F.expr(f"percentile(x, {q})").alias(str(q))
                         for q in qs]).first()
        width = (hi - lo) / bins if hi > lo else 0.0
        for q in qs:
            assert got[q]["n_total"] == len(vals), (name, q)
            assert abs(got[q]["estimate"] - exact[str(q)]) <= width + 1e-9, \
                (name, q, got[q]["estimate"], exact[str(q)])


def test_hll_band_report_null_handling(spark):
    """countDistinct and hll_sketch_agg must agree on NULL semantics
    (both ignore nulls) — a null-heavy column's band verdict reflects
    only the non-null key space, and an all-null column reports 0
    exact distinct without erroring."""
    from basic_data_fusion_spark.operators.aggregations import (
        hll_band_report,
    )

    rows = [(i, f"v{i % 5}" if i % 2 == 0 else None, None)
            for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b string, c string")
    got = {r["column_name"]: r for r in
           hll_band_report(df, ["a", "b", "c"]).collect()}
    assert got["a"]["n_exact"] == 200 and got["a"]["within_band"]
    assert got["b"]["n_exact"] == 5 and got["b"]["within_band"]
    assert got["c"]["n_exact"] == 0  # all-null: defined, no crash


def test_binary_auc_single_class_is_null_not_crash(spark):
    """With zero negatives (or positives) AUC is undefined — the
    operator returns NULL rather than raising or fabricating a value,
    and the counts still report exactly."""
    from basic_data_fusion_spark.operators.selection import binary_auc
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0.9, True), (0.1, True)],
                               "quality_prob double, y boolean")
    r = binary_auc(df, F.col("y")).collect()[0]
    assert r["n_pos"] == 2 and r["n_neg"] == 0
    assert r["auc"] is None


def test_dedup_recall_empty_truth_is_null_not_crash(spark):
    """Empty truth set: recall is NULL (undefined), precision still
    exact — not an ANSI divide-by-zero crash."""
    from basic_data_fusion_spark.operators.dedup import dedup_recall_report

    truth = spark.createDataFrame([], "id_a long, id_b long")
    arm = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = dedup_recall_report(truth, {"a": arm}).collect()[0]
    assert r["n_truth"] == 0 and r["recall"] is None
    assert r["n_found"] == 1 and r["n_hits"] == 0 and r["precision"] == 0.0


def _py_windows(toks: list[str], w: int) -> list[str]:
    return [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]


@FAST
@given(
    corpus=st.lists(
        st.lists(st.sampled_from("a b c d".split()), min_size=0, max_size=12),
        min_size=1, max_size=6),
    heldout=st.lists(
        st.lists(st.sampled_from("a b c d".split()), min_size=0, max_size=12),
        min_size=1, max_size=3),
    w=st.integers(2, 4))
def test_decontaminate_spans_matches_python(spark, corpus, heldout, w):
    """Differential: decontaminate_spans vs a pure-Python mirror of the
    covered-window semantics (tiny 4-symbol alphabet forces frequent
    collisions, short docs, empty docs)."""
    train_rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    held_rows = [(100 + i, " ".join(toks)) for i, toks in enumerate(heldout)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    held = spark.createDataFrame(held_rows, "doc_id long, text string")

    ev = {win for _, t in held_rows for win in _py_windows(t.split(), w)}
    expect = {}
    for i, t in train_rows:
        toks = t.split()
        covered = set()
        for p, win in enumerate(_py_windows(toks, w)):
            if win in ev:
                covered.update(range(p, p + w))
        kept = [tok for j, tok in enumerate(toks) if j not in covered]
        expect[i] = (" ".join(kept), len(toks), len(covered))

    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in dedup.decontaminate_spans(train, held, window=w).collect()}
    assert got == expect


@FAST
@given(
    corpus=st.lists(
        st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=10),
        min_size=1, max_size=6),
    w=st.integers(2, 3))
def test_memorization_report_matches_python(spark, corpus, w):
    """Differential: memorization_risk_report counts vs a Python mirror
    (span -> (distinct docs, occurrences), n_docs >= 2, k large enough
    to keep everything — ordering checked on the sort keys)."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    stats: dict[str, list] = {}
    for i, t in rows:
        for win in _py_windows(t.split(), w):
            stats.setdefault(win, [set(), 0])
            stats[win][0].add(i)
            stats[win][1] += 1
    expect = {s: (len(d), n) for s, (d, n) in stats.items() if len(d) >= 2}

    out = dedup.memorization_risk_report(df, window=w, k=1000).collect()
    got = {r["span"]: (r["n_docs"], r["n_occurrences"]) for r in out}
    assert got == expect
    keys = [(-r["n_docs"], -r["n_occurrences"], r["span"]) for r in out]
    assert keys == sorted(keys)


@FAST
@given(pairs=st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20),
              st.sampled_from([0.5, 0.7, 0.8, 0.95, 1.0])),
    min_size=0, max_size=30),
    thresholds=st.lists(st.sampled_from([0.6, 0.7, 0.8, 0.9, 0.99]),
                        min_size=1, max_size=4, unique=True))
def test_dedup_impact_sweep_matches_python(spark, pairs, thresholds):
    """Sweep vs a pure-Python mirror of the greedy keep-smallest-id
    rule on arbitrary pair relations (including empty ones and
    thresholds above every pair)."""
    from basic_data_fusion_spark.operators.dedup import dedup_impact_sweep

    edges = [(min(a, b), max(a, b), j) for a, b, j in pairs if a != b]
    docs_ids = sorted({i for e in edges for i in e[:2]} | {0, 1})
    docs = spark.createDataFrame([(i, 10 * (i + 1)) for i in docs_ids],
                                 "doc_id long, n_chars long")
    pdf = spark.createDataFrame(
        edges or [(0, 1, -1.0)],  # createDataFrame needs >=1 row; j=-1 never fires
        "id_a long, id_b long, jaccard double")
    got = {r["threshold"]: r for r in
           dedup_impact_sweep(docs, pdf, thresholds).collect()}
    chars = {i: 10 * (i + 1) for i in docs_ids}
    for t in thresholds:
        live = [e for e in edges if e[2] >= t]
        removed = {b for _, b, _ in live}
        assert got[t]["n_pairs"] == len(live)
        assert got[t]["docs_removed"] == len(removed)
        assert got[t]["chars_removed"] == sum(chars[b] for b in removed)
        assert got[t]["pct_docs_removed"] == len(removed) / len(docs_ids)


@FAST
@given(counts=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                                 st.integers(1, 12)),
                       min_size=1, max_size=24),
       wa=st.sampled_from([1.0, 2.0, 3.0]))
def test_interleave_order_matches_python(spark, counts, wa):
    """Serve order vs a pure-Python stride scheduler using the same
    md5 within-source shuffle and (stride, source, rank) sort key."""
    from basic_data_fusion_spark.operators.selection import interleave_order

    rows = [(i, src) for i, (src, _) in enumerate(counts)]
    weights = {"a": wa, "b": 1.0}
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = [(r["doc_id"], r["source"], r["rank_in_source"], r["serve_pos"])
           for r in interleave_order(df, weights).collect()]

    by_src: dict[str, list[int]] = {}
    for i, src in rows:
        by_src.setdefault(src, []).append(i)
    expect = []
    for src, ids in by_src.items():
        w = weights.get(src, 1.0)
        for rank, i in enumerate(sorted(ids, key=lambda x: (_md5_hex(x), x)),
                                 start=1):
            expect.append((rank / w, src, rank, i))
    expect.sort()
    expect = [(i, src, rank, pos + 1)
              for pos, (_, src, rank, i) in enumerate(expect)]
    assert sorted(got, key=lambda r: r[3]) == expect


@FAST
@given(texts=st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30),
    min_size=1, max_size=25))
def test_shard_manifest_matches_python(spark, texts):
    """Manifest vs a pure-Python mirror of the md5-nibble routing, the
    whitespace token count, and the 60-bit content-checksum arithmetic
    on arbitrary (including blank) texts."""
    import re as _re

    from basic_data_fusion_spark.sources.partitioning import shard_manifest

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["shard"]: (r["n_docs"], r["n_tokens"], r["content_checksum"])
           for r in shard_manifest(df).collect()}

    expect: dict[int, list[int]] = {}
    for i, t in rows:
        shard = int(_md5_hex(i)[0], 16)
        toks = 0 if t.strip() == "" else len(_re.split(r"\s+", t.strip()))
        norm = _re.sub(r"\s+", " ", t).strip().lower()
        term = int(hashlib.md5(norm.encode()).hexdigest()[:15], 16)
        e = expect.setdefault(shard, [0, 0, 0])
        e[0] += 1; e[1] += toks; e[2] += term
    assert got == {s: (n, tok, chk % 2**60)
                   for s, (n, tok, chk) in expect.items()}


@FAST
@given(counts=st.lists(st.integers(0, 300), min_size=1, max_size=20),
       ctxs=st.lists(st.sampled_from([8, 32, 64, 128, 512]),
                     min_size=1, max_size=3, unique=True))
def test_packing_efficiency_matches_python(spark, counts, ctxs):
    """Sweep vs a pure-Python mirror of the naive / perfect-concat
    sequence counts on arbitrary token-count profiles (including
    all-blank corpora, which must yield no rows)."""
    import math

    from basic_data_fusion_spark.operators.packing import (
        packing_efficiency_sweep,
    )

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["ctx"]: r for r in packing_efficiency_sweep(df, ctxs).collect()}
    live = [n for n in counts if n > 0]
    if not live:
        assert got == {}
        return
    total = sum(live)
    for c in ctxs:
        naive = sum(math.ceil(n / c) for n in live)
        packed = math.ceil(total / c)
        assert got[c]["n_docs"] == len(live)
        assert got[c]["total_tokens"] == total
        assert got[c]["n_seq_naive"] == naive
        assert got[c]["n_seq_packed_lb"] == packed
        assert got[c]["pad_frac_naive"] == (naive * c - total) / (naive * c)


@FAST
@given(docs=st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=30),
    min_size=1, max_size=10),
    w=st.sampled_from([3, 5]))
def test_attribute_spans_matches_python(spark, docs, w):
    """Attribution vs a pure-Python mirror: distinct shared w-token
    windows per (query, doc), coverage fractions, (shared desc, id asc)
    top-k rank — queries are the odd-indexed docs, corpus the even."""
    texts = [" ".join(d) for d in docs]
    corpus = [(i, t) for i, t in enumerate(texts) if i % 2 == 0]
    queries = [(i, t) for i, t in enumerate(texts) if i % 2 == 1]
    if not queries:
        return
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = {(r["query_id"], r["source_doc_id"]):
           (r["n_shared_windows"], r["n_query_windows"], r["rank"])
           for r in dedup.attribute_spans(
               cdf, qdf, window=w, k=2, query_id_col="query_id",
               max_window_doc_freq=1000).collect()}

    def wins(t: str) -> set:
        toks = t.strip().lower().split()
        return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}

    expect = {}
    for qid, qt in queries:
        qw = wins(qt)
        if not qw:
            continue
        scored = sorted(
            ((len(qw & wins(ct)), cid) for cid, ct in corpus
             if qw & wins(ct)),
            key=lambda x: (-x[0], x[1]))
        for rank, (shared, cid) in enumerate(scored[:2], start=1):
            expect[(qid, cid)] = (shared, len(qw), rank)
    assert got == expect


@FAST
@given(vals=st.lists(st.tuples(st.integers(0, 10_000),
                               st.integers(-50, 50)),
                     min_size=1, max_size=60,
                     unique_by=lambda t: t[0]),
       n_parts=st.integers(1, 7))
def test_total_order_pos_matches_sorted_enumerate(spark, vals, n_parts):
    """ordering.total_order_pos == enumerate(sorted(keys)) and
    global_running_sum == itertools.accumulate over the sorted order,
    for any partition count — the rank/prefix-sum must be invariant to
    where the range boundaries fall."""
    from basic_data_fusion_spark.operators.ordering import (
        global_running_sum,
        total_order_pos,
    )

    df = spark.createDataFrame(vals, "k long, v long").repartition(3)
    got = {r["k"]: r["pos"]
           for r in total_order_pos(df, ["k"], "pos", n_parts).collect()}
    assert got == {k: i + 1
                   for i, (k, _) in enumerate(sorted(vals))}
    runs = {r["k"]: r["rs"]
            for r in global_running_sum(df, ["k"], "v", "rs",
                                        n_parts).collect()}
    acc, expect = 0, {}
    for k, v in sorted(vals):
        acc += v
        expect[k] = acc
    assert runs == expect


@FAST
@given(vals=st.lists(st.tuples(st.integers(-20, 20),
                               st.one_of(st.none(),
                                         st.integers(-5, 5))),
                     min_size=1, max_size=50),
       n_parts=st.integers(1, 5))
def test_avg_ranks_multi_bitwise_equals_per_column(spark, vals, n_parts):
    """ordering.avg_ranks_multi over two columns (duplicates and nulls
    included) is BITWISE the per-column avg_ranks tables — the shared
    prefix machine with the broadcast earlier-column offset must not
    change a single midrank.  Columns are INT: the r9 precondition
    guard rejects long/decimal inputs (distinct values past 2^53 merge
    under the stacked double cast — covered by its own test below)."""
    from basic_data_fusion_spark.operators.ordering import (
        avg_ranks,
        avg_ranks_multi,
    )

    df = spark.createDataFrame(vals, "a int, b int").repartition(3)
    multi = avg_ranks_multi(df, ["a", "b"], n_partitions=n_parts)
    got = {(r["__cid"], r["__v"]): (r["__cnt"], r["avg_rank"])
           for r in multi.collect()}
    for i, c in enumerate(["a", "b"]):
        single = {(i, r["__v"]): (r["__cnt"], r["avg_rank"])
                  for r in avg_ranks(df, c, n_partitions=n_parts)
                  .collect()}
        assert {k: v for k, v in got.items() if k[0] == i} == single


def test_avg_ranks_multi_rejects_double_unsafe_types(spark):
    """r8 advisory: the stacked explode casts every column to double,
    so long/decimal columns whose distinct values collide past 2^53
    would silently MERGE rank groups.  The precondition is now guarded
    (TypeError), and correlation_matrix routes such columns through
    per-column avg_ranks — spearman over post-2^53 longs must come out
    exact, not collapsed."""
    import pytest as _pytest

    from basic_data_fusion_spark.operators.ordering import avg_ranks_multi
    from basic_data_fusion_spark.operators.stats import correlation_matrix

    big = 2 ** 53
    # big and big+1 collide as doubles; +2 is representable; +3 rounds
    # up — under the old cast two rank groups merged and spearman < 1
    rows = [(big, 1.0), (big + 1, 2.0), (big + 2, 3.0), (big + 3, 4.0)]
    df = spark.createDataFrame(rows, "a long, b double")
    with _pytest.raises(TypeError, match="avg_ranks_multi.*long"):
        avg_ranks_multi(df, ["a", "b"])
    got = correlation_matrix(df, ["a", "b"], method="spearman").collect()
    # collapsed ranks (the old bug) give ~0.97; exact ranks give 1
    # up to IEEE epsilon in the Pearson-on-ranks fold
    assert len(got) == 1 and abs(got[0]["corr"] - 1.0) < 1e-9
    # per-column route keeps exact DISTINCT ranks: anti-monotone pair
    df2 = spark.createDataFrame(
        [(big, 4.0), (big + 1, 3.0), (big + 2, 2.0), (big + 3, 1.0)],
        "a long, b double")
    got2 = correlation_matrix(df2, ["a", "b"], method="spearman").collect()
    assert abs(got2[0]["corr"] + 1.0) < 1e-9


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_compact_cluster_labels_fold_invariant(spark, tmp_path_factory, data):
    """Compacting a RANDOM cluster-label delta log (random run count,
    batches per run, doc/label assignments; monotone epochs per run)
    leaves the latest-wins fold bitwise unchanged and the store with
    only the snapshot directory."""
    import os

    from basic_data_fusion_spark.streaming.sinks import (
        compact_cluster_labels,
        read_cluster_labels,
    )

    store = str(tmp_path_factory.mktemp("labels"))
    n_runs = data.draw(st.integers(1, 3), label="n_runs")
    doc_ids = list(range(1, 9))
    wrote = False
    for run in range(n_runs):
        n_batches = data.draw(st.integers(1, 3), label=f"batches_{run}")
        for b in range(n_batches):
            rows = data.draw(
                st.lists(st.tuples(st.sampled_from(doc_ids),
                                   st.sampled_from(doc_ids)),
                         min_size=0, max_size=5,
                         unique_by=lambda t: t[0]),
                label=f"rows_{run}_{b}")
            if not rows:
                continue
            wrote = True
            (spark.createDataFrame(
                [(d, c, run + 1) for d, c in rows],
                "doc_id long, cluster_id long, epoch long")
             .write.mode("overwrite")
             .parquet(f"{store}/run_id=r{run}/batch_id={b}"))
    if not wrote:
        return
    before = {r["doc_id"]: r["cluster_id"]
              for r in read_cluster_labels(spark, store).collect()}
    compact_cluster_labels(spark, store)
    after = {r["doc_id"]: r["cluster_id"]
             for r in read_cluster_labels(spark, store).collect()}
    assert after == before
    assert os.listdir(store) == ["run_id=__compact__"]


@FAST
@given(toks=st.lists(st.integers(0, 40), min_size=1, max_size=60),
       bs=st.integers(1, 7))
def test_length_bucketed_batches_matches_python(spark, toks, bs):
    """packing.length_bucketed_batches vs a direct Python replay:
    sort docs by (n_tokens, id), chunk into fixed-size batches, pad
    each to its own max."""
    from basic_data_fusion_spark.operators.packing import (
        length_bucketed_batches,
    )

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["batch_id"]: (r["n_docs"], r["batch_tokens"],
                           r["batch_max"], r["padding"])
           for r in length_bucketed_batches(df, batch_size=bs).collect()}
    order = sorted(range(len(toks)), key=lambda i: (toks[i], i))
    expect = {}
    for b in range(0, len(order), bs):
        chunk = [toks[i] for i in order[b:b + bs]]
        mx = max(chunk)
        expect[b // bs] = (len(chunk), sum(chunk), mx,
                           len(chunk) * mx - sum(chunk))
    assert got == expect


@FAST
@given(rows=st.lists(
    st.tuples(st.sampled_from(["g1", "g2", "g3"]),
              st.integers(-3, 3), st.integers(-4, 4)),
    min_size=2, max_size=60))
def test_kendall_lowcard_bitwise_equals_pair_tier(spark, rows):
    """stats.kendall_tau_grouped_lowcard (O(m·n) grid/prefix) vs the
    O(n²) pair tier on generated tie-heavy frames: every output column
    including the double tau must match BITWISE — both paths accumulate
    identical BIGINT counts and exit the same final IEEE tree."""
    import struct

    from basic_data_fusion_spark.operators.stats import (
        kendall_tau_grouped,
        kendall_tau_grouped_lowcard,
    )

    data = [(i, g, float(a), float(b)) for i, (g, a, b) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "id long, g string, a double, b double").repartition(4)

    def canon(rs):
        return sorted(
            (r["g"], r["n_pairs"], r["concordant"], r["discordant"],
             None if r["tau_b"] is None else struct.pack("d", r["tau_b"]))
            for r in rs)

    pair = canon(kendall_tau_grouped(df, "g", "a", "b", "id").collect())
    low = canon(kendall_tau_grouped_lowcard(df, "g", "a", "b").collect())
    assert pair == low


@FAST
@given(items=st.lists(
    st.tuples(st.sampled_from(["png", "gif", "jpeg"]),
              st.integers(1, 65535), st.integers(1, 65535),
              st.integers(0, 200)),
    min_size=1, max_size=24))
def test_image_header_meta_roundtrips_generated_containers(spark, items):
    """Property: image_header_meta recovers the exact dimensions from
    containers built INDEPENDENTLY in Python (struct.pack per the
    public specs) for arbitrary dims and arbitrary APP1 filler lengths
    — the parser and the generator share no code, so agreement pins
    the byte-layout math from both sides."""
    import struct

    from basic_data_fusion_spark.operators.multimodal import (
        image_header_meta,
    )

    def build(fmt, w, h, k):
        if fmt == "png":
            return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13)
                    + b"IHDR" + struct.pack(">II", w, h)
                    + b"\x08\x06\x00\x00\x00" + b"\x00" * 4)
        if fmt == "gif":
            return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 3
        return (b"\xff\xd8"
                + b"\xff\xe1" + struct.pack(">H", 2 + k) + b"\x45" * k
                + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">H", h) + struct.pack(">H", w)
                + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")

    rows = [(i, fmt, w, h, build(fmt, w, h, k))
            for i, (fmt, w, h, k) in enumerate(items)]
    df = spark.createDataFrame(
        [(i, d) for i, _, _, _, d in rows], "media_id long, data binary")
    out = {r["media_id"]: r for r in image_header_meta(df).collect()}
    for i, fmt, w, h, _ in rows:
        r = out[i]
        assert (r["format"], r["width"], r["height"], r["header_ok"]) \
            == (fmt, w, h, True), (i, fmt, w, h, dict(r.asDict()))


@FAST
@given(items=st.lists(
    st.tuples(st.integers(8000, 192000),     # sample rate
              st.integers(1, 8),             # channels
              st.sampled_from([8, 16, 24, 32]),
              st.integers(0, 10_000_000),    # data bytes
              st.integers(0, 31)),           # pre-chunk filler len
    min_size=1, max_size=16))
def test_audio_header_meta_roundtrips_generated_wavs(spark, items):
    """Property: audio_header_meta recovers exact RIFF fmt values and
    the data-derived duration from WAVs built independently with
    struct.pack, including an arbitrary-length (possibly odd → padded)
    LIST chunk before fmt."""
    import struct

    from basic_data_fusion_spark.operators.multimodal import (
        audio_header_meta,
    )

    def wav(sr, ch, bits, data_bytes, pre_len):
        pre = (b"LIST" + struct.pack("<I", pre_len) + b"x" * pre_len
               + (b"\x00" if pre_len % 2 else b""))
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                    sr * ch * bits // 8,
                                    ch * bits // 8, bits)
        data = b"data" + struct.pack("<I", data_bytes)
        body = b"WAVE" + pre + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rows = [(i, sr, ch, bits, db, wav(sr, ch, bits, db, pl))
            for i, (sr, ch, bits, db, pl) in enumerate(items)]
    df = spark.createDataFrame([(i, d) for i, *_, d in rows],
                               "media_id long, data binary")
    out = {r["media_id"]: r for r in audio_header_meta(df).collect()}
    for i, sr, ch, bits, db, _ in rows:
        r = out[i]
        br = sr * ch * bits // 8
        assert (r["format"], r["sample_rate"], r["channels"],
                r["bits_per_sample"], r["header_ok"]) == \
            ("wav", sr, ch, bits, True), dict(r.asDict())
        assert r["duration_s"] == db / br
