"""Hypothesis property tests for the format codecs: arbitrary content
must survive the wire, not just fixture content. Spark jobs per
example are too slow, so the Spark-facing properties run one batched
round-trip per test over many generated rows; the pure-Python BSON
codec gets full per-example treatment."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbitool_spark import testrow
from dbitool_spark.io import bson_io, csv_io
from dbitool_spark.ops.column import project

# scalars the BSON subset supports
bson_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=60),
)
bson_value = st.recursive(
    bson_scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(min_size=1, max_size=10).filter(lambda s: "\x00" not in s), children, max_size=5),
    ),
    max_leaves=20,
)


@given(st.dictionaries(st.text(min_size=1, max_size=12).filter(lambda s: "\x00" not in s), bson_value, max_size=8))
@settings(max_examples=200, deadline=None)
def test_bson_codec_roundtrip_property(doc):
    out, _ = bson_io._dec_doc(bson_io._enc_doc(doc))
    assert out == doc


# printable-ish text including CSV-hostile characters
csv_cell = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\r\n\x00", exclude_categories=("Cs",)
    ),
    max_size=40,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbitool_prop_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@given(rows=st.lists(st.tuples(csv_cell, csv_cell, csv_cell), min_size=1, max_size=60))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_csv_quoted_roundtrip_arbitrary_text(spark, tmpdir, rows):
    """Quoted CSV must survive separators, quotes, escapes, and
    unicode inside values. Empty-string vs NULL is the documented
    CSV-format ambiguity, so generated empties compare as None."""
    path = os.path.join(tmpdir, "prop.csv")
    df = spark.createDataFrame(rows, "a string, b string, c string")
    csv_io.write_csv(df, path)
    back = csv_io.read_csv(spark, path, schema="a string, b string, c string")
    canon = lambda v: None if v == "" or v is None else v  # noqa: E731
    got = sorted((tuple(canon(x) for x in r) for r in back.collect()), key=repr)
    want = sorted((tuple(canon(x) for x in r) for r in rows), key=repr)
    assert got == want


def test_testrow_check_is_total_oracle():
    """check() accepts every generated row and rejects every
    single-column corruption (spot sample)."""
    for n in (0, 1, 255, 256, 999):
        r = testrow.row(n)
        testrow.check(r)
        for col in range(1, 12):
            bad = list(r)
            bad[col] = "CORRUPTED"
            with pytest.raises(AssertionError):
                testrow.check(tuple(bad))


# --- as-of join vs brute-force reference ------------------------------

_asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
    min_size=0,
    max_size=25,
)


@given(left=_asof_left, right=_asof_right)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_bruteforce(spark, left, right):
    """Random keyed timelines: the union+window as-of join must match
    the quadratic reference (latest right_ts <= left_ts per key,
    greatest value on right_ts ties) on every generated case."""
    from dbitool_spark.ops.temporal import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k bigint, t bigint, rowid bigint"
    )
    rdf = spark.createDataFrame(right, "k bigint, rt bigint, v bigint")

    def expect(k, t):
        cand = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        return max(cand)[1] if cand else None

    got = {
        r.rowid: r.asof_v
        for r in asof_join(ldf, rdf, "k", "t", "rt", ["v"]).collect()
    }
    want = {i: expect(k, t) for i, (k, t) in enumerate(left)}
    assert got == want


# --- near-dup exactness properties ------------------------------------

_word = st.sampled_from([f"w{i}" for i in range(12)])  # tiny vocab forces overlap
_doc = st.lists(_word, min_size=3, max_size=12).map(" ".join)


def _shingle_set(text: str, k: int = 3) -> frozenset:
    ws = text.lower().split()
    if len(ws) < k:
        return frozenset([" ".join(ws)])
    return frozenset(" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1))


@given(docs=st.lists(_doc, min_size=2, max_size=10, unique=True))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ngram_containment_matches_bruteforce(spark, docs):
    """The asymmetric prefix-filter construction must lose NOTHING:
    for arbitrary small-vocab corpora the (id_a, id_b, containment)
    set equals brute force over python shingle sets. This pins the
    one-sided prefix lemma implementation (rarest-first ordering,
    epsilon handling, |B| >= t|A| prune), not just the fixture corpus."""
    from dbitool_spark.ops.dedup import ngram_containment_pairs

    t = 0.5
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b): round(r.containment, 9)
        for r in ngram_containment_pairs(df, "doc_id", "text", threshold=t).collect()
    }
    sets = {i: _shingle_set(d) for i, d in enumerate(docs)}
    expected = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                expected[(a, b)] = round(c, 9)
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=60
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_cc_matches_union_find_property(spark, edges):
    """algorithm='star' labels equal union-find labels on arbitrary
    graphs, including self-loops, multi-edges, and disconnected
    pieces (the fixed-seed tests can't cover this space)."""
    from dbitool_spark.ops.dedup import connected_components

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    star = sorted(map(tuple, connected_components(
        df, local_edge_threshold=None, algorithm="star").collect()))
    uf = sorted(map(tuple, connected_components(df).collect()))
    assert star == uf


# --- spreadsheet codecs: arbitrary grids survive byte-exact ----------
#
# Both codecs promise the same contract: scalars in, strings out,
# values byte-exact after the documented stringification (numbers
# format Excel-"General"-style: integral doubles drop the .0). The
# strategies stress the encoders' branch points: latin-1 vs UTF-16
# strings (xls), XML metacharacters (xlsx), shared-string dedup, and
# numeric formatting.

_sheet_text = st.text(max_size=30).filter(
    # xml 1.0 can't carry control chars; BIFF strings can't carry
    # lone surrogates (handled by the filter in st.text already)
    lambda s: all(ord(c) >= 0x20 or c in "\t\n" for c in s)
)
_sheet_cell = st.one_of(
    _sheet_text,
    st.integers(min_value=-(2**50), max_value=2**50),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
_grid = st.lists(
    st.tuples(_sheet_cell, _sheet_cell, _sheet_cell), min_size=1, max_size=25
)


def _expected_cell(v) -> str:
    if isinstance(v, str):
        return v
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


@given(rows=_grid)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_xls_codec_roundtrip_property(tmpdir, rows):
    from dbitool_spark.io import xls_codec

    path = os.path.join(tmpdir, "p.xls")
    xls_codec.write_xls(path, rows)
    got = xls_codec.read_xls(path)
    want = [[_expected_cell(v) for v in r] for r in rows]
    # trailing all-empty rows/cols are indistinguishable from absent
    # cells in a sparse grid — compare against the dense expectation
    # padded the same way the reader pads
    n_cols = max(len(r) for r in want)
    assert len(got) <= len(want)
    for gi, g in enumerate(got):
        assert g == (want[gi] + [""] * n_cols)[: len(g)]
    # every non-empty expected cell must be present
    for ri, r in enumerate(want):
        for ci, v in enumerate(r):
            if v != "":
                assert got[ri][ci] == v


@given(rows=_grid)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_xlsx_codec_roundtrip_property(tmpdir, rows):
    from dbitool_spark.io import xlsx_codec

    path = os.path.join(tmpdir, "p.xlsx")
    xlsx_codec.write_xlsx(path, [tuple(map(str, r)) for r in rows])
    got = xlsx_codec.read_xlsx(path)
    want = [[str(v) for v in r] for r in rows]
    n_cols = max(len(r) for r in want)
    for ri, r in enumerate(want):
        for ci, v in enumerate(r):
            if v != "":
                assert got[ri][ci] == v


# --- stream-stream interval join batch semantics ----------------------

_ij_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=20
)
_ij_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=20
)


@given(left=_ij_left, right=_ij_right)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_join_matches_bruteforce(spark, left, right):
    """Random keyed timelines through streaming.interval_join run as a
    BATCH plan (the condition is plain SQL — same code path the
    streaming state manager evaluates): must equal the quadratic
    reference lower <= rt - lt <= upper on matching keys, boundaries
    inclusive. Seconds-scale timestamps; lower=10s upper=30s."""
    from dbitool_spark import streaming

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k bigint, lt_s bigint, lid bigint",
    ).withColumn("lt", F.timestamp_seconds(F.col("lt_s"))).drop("lt_s")
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)],
        "k bigint, rt_s bigint, rid bigint",
    ).withColumn("rt", F.timestamp_seconds(F.col("rt_s"))).drop("rt_s")

    got = {
        (r.lid, r.rid)
        for r in streaming.interval_join(
            ldf, rdf, on=["k"], left_time_col="lt", right_time_col="rt",
            lower="10 seconds", upper="30 seconds",
        ).collect()
    }
    want = {
        (li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and 10 <= rt - lt <= 30
    }
    assert got == want


# --- chart + email document codecs (pure Python, per-example) ----------

_label = st.text(min_size=1, max_size=20).filter(
    lambda s: s.strip() == s and s  # chart labels are trimmed keys
    and "\n" not in s and "\r" not in s
)
_value = st.one_of(
    st.integers(min_value=0, max_value=10**12),
    st.floats(min_value=0.0, max_value=1e12, allow_nan=False,
              allow_infinity=False),
)
_chart_rows = st.lists(
    st.tuples(_label, _value), min_size=1, max_size=12,
    unique_by=lambda kv: kv[0],
)


@given(rows=_chart_rows)
@settings(max_examples=80, deadline=None)
def test_chart_svg_and_gnuplot_roundtrip_property(rows):
    """Arbitrary labels (unicode, XML/quote metacharacters) and
    magnitudes must round-trip through BOTH chart emitters with exact
    values, and every rendered bar must satisfy the layout contract."""
    from dbitool_spark.io import chart_io

    rows = [(k, float(v)) for k, v in rows]
    svg = chart_io.bar_chart_svg(rows, title="prop")
    bars = chart_io.parse_svg_bars(svg)
    # labels recover modulo the documented sanitation (XML-invalid and
    # line-break chars -> U+FFFD); values recover exactly
    want = [(chart_io._label_safe(k), v) for k, v in rows]
    assert [(k, v) for k, v, _ in bars] == want
    max_v = max(v for _, v in rows)
    plot_h = 400 - 80
    for _, v, h in bars:
        want_h = 0.0 if max_v <= 0 else round(v / max_v * plot_h, 2)
        assert abs(h - want_h) <= 0.011
    gp = chart_io.gnuplot_script(rows, title="prop")
    assert chart_io.parse_gnuplot_datablock(gp) == want


_int_cell = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1))
_txt_cell = st.one_of(
    st.none(),
    st.text(max_size=40).filter(lambda s: "\r" not in s),
)
_email_table = st.lists(
    st.tuples(_int_cell, _txt_cell, _txt_cell), min_size=1, max_size=15
)


@given(table=_email_table)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_email_attachment_roundtrip_property(spark, table):
    """Arbitrary cell content (None, negative ints, unicode text with
    embedded quotes/commas/newlines) survives DataFrame -> CSV
    attachment -> MIME encode -> parse."""
    from dbitool_spark.io import email_io

    df = spark.createDataFrame(table, "a int, b string, c string")
    msg = email_io.compose_email(
        sender="p@localhost", to="q@localhost", subject="prop",
        body="b", attachments=[("t.csv", email_io.df_to_csv_text(df))],
    )
    raw = msg.as_bytes()
    import email as _email
    from email import policy as _policy

    back = _email.message_from_bytes(raw, policy=_policy.default)
    got = email_io.attachment_rows(back, "t.csv")
    want = [
        {
            "a": "" if a is None else str(a),
            "b": "" if b is None else b,
            "c": "" if c is None else c,
        }
        for a, b, c in table
    ]
    assert got == want


_lsh_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=30
)


@given(docs=st.lists(_lsh_words, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lsh_flags_property(spark, docs):
    """Random corpora through the streaming-shaped LSH rule: (a) the
    band projection is deterministic and emits exactly `bands` structs
    per doc; (b) an identical-text pair collides in EVERY band, so the
    larger id is always flagged; (c) flags agree with the quadratic
    reference 'shares any bucket with a smaller id'."""
    from dbitool_spark.ops import dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    # plant an exact duplicate of doc 0 with the highest id
    dup_id = len(rows)
    rows.append((dup_id, rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    b1 = dedup.lsh_bucket_rows(df, "doc_id", "text").collect()
    b2 = dedup.lsh_bucket_rows(df, "doc_id", "text").collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))  # deterministic
    per_doc: dict[int, set] = {}
    for r in b1:
        per_doc.setdefault(r.id, set()).add(r.bucket)
    assert all(len(v) == 8 for v in per_doc.values())  # bands structs
    assert per_doc[0] == per_doc[dup_id]  # identical text: ALL bands

    flags = {
        r.doc_id: r.is_dup
        for r in dedup.lsh_near_dup_flags(df, "doc_id", "text").collect()
    }
    assert flags[dup_id] is True
    # quadratic reference over the bucket rows themselves
    for i, buckets in per_doc.items():
        expect = any(
            buckets & per_doc[j] for j in per_doc if j < i
        )
        assert flags[i] == expect, (i, flags[i], expect)


@given(
    keys=st.lists(
        st.integers(min_value=-(2**31), max_value=2**31), min_size=1, max_size=40,
        unique=True,
    ),
    n_parts=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_with_position_dense_and_ordered_property(spark, keys, n_parts):
    """ops/scale.with_position: for ANY unique key set and ANY input
    partitioning, positions are exactly the dense range 1..N and
    follow the key order — the distributed zipWithIndex contract the
    concat module's zip correctness rests on."""
    from dbitool_spark.ops import scale

    df = spark.createDataFrame(
        [(k,) for k in keys], "k long"
    ).repartition(n_parts)
    got = scale.with_position(df, ["k"]).orderBy("pos").collect()
    assert [r.pos for r in got] == list(range(1, len(keys) + 1))
    assert [r.k for r in got] == sorted(keys)


_BM25_VOCAB = ["join", "merge", "spark", "window", "filler", "data", "row"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_BM25_VOCAB), min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bm25_matches_python_reference(spark, docs):
    """BM25 (r10) against a from-scratch pure-Python reference on
    arbitrary small-vocab corpora: per-doc scores agree to 1e-6, the
    result is exactly the positive-score docs capped at k, and nothing
    outside the returned set outscores the returned minimum. Pins the
    tf/df/idf arithmetic, the pivot's zero-score drop, and the
    TakeOrdered cutoff — not just the fixture corpus."""
    import math

    from dbitool_spark.plans import llm_ops

    texts = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    d = tempfile.mkdtemp(prefix="dbitool_bm25_prop_")
    try:
        spark.createDataFrame(texts, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "documents.parquet"))

        toks = {i: t.split() for i, t in texts}
        n = float(len(toks))
        avgdl = sum(len(w) for w in toks.values()) / n
        q = llm_ops.BM25_QUERY_TERMS
        dfreq = {t: float(sum(1 for ws in toks.values() if t in ws)) for t in q}
        ref = {}
        for i, ws in toks.items():
            s = 0.0
            for t in q:
                tf = float(ws.count(t))
                if not tf:
                    continue
                idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
                s += idf * (tf * 2.2) / (
                    tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl)
                )
            if s > 0:
                ref[i] = s

        got = llm_ops.bm25_topk_documents(spark, d).collect()
        assert len(got) == min(llm_ops.BM25_TOPK, len(ref))
        # the operator emits round(score, 4); allow half-step + ulp
        for r in got:
            assert r.doc_id in ref
            assert abs(r.bm25 - ref[r.doc_id]) < 5.1e-5, (r, ref[r.doc_id])
        returned = {r.doc_id for r in got}
        if got:
            floor = min(r.bm25 for r in got)
            for i, s in ref.items():
                if i not in returned:
                    assert s <= floor + 1.1e-4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_strip_markup_matches_python_mirror(spark):
    """Cross-engine pin for the HTML stripper: Spark's Java-regex
    cascade must agree string-for-string with a from-scratch Python-re
    mirror over an adversarial fragment-product corpus — partial tags,
    nested/unterminated script blocks, entity traps (incl. the
    '&amp;lt;' single-decode), CRLF whitespace. ASCII-only corpus:
    Java \\s is ASCII while Python's is unicode, a documented
    non-goal. (The DuckDB parity row covers the RE2 side.)"""
    import itertools
    import re as _re

    from dbitool_spark.ops import text as _t

    def mirror(s: str) -> str:
        s = _re.sub(_t._SCRIPT_RE, " ", s)
        s = _re.sub(_t._STYLE_RE, " ", s)
        s = _re.sub(_t._COMMENT_RE, " ", s)
        s = _re.sub(_t._TAG_RE, " ", s)
        for ent, rep in _t.HTML_ENTITIES:
            s = s.replace(ent, rep)
        return _re.sub(r"\s+", " ", s).strip()

    frags = [
        "plain words", "<p>", "</p>", "<P CLASS='x'>", "<",
        "a<b", "<script>var x=1;</script>", "<script>unterminated",
        "<style>p{}</style>", "<!-- note -->", "<!-- open",
        "&amp;", "&amp;lt;", "&lt;tag&gt;", "&nbsp;", "&#39;", "&bogus;",
        " \t ", "\r\n", "x>y", "<>",
    ]
    corpus = ["".join(c) for c in itertools.product(frags, repeat=2)]
    corpus += ["".join(c) for c in zip(frags, frags[::-1], frags[1:] + frags[:1])]
    df = spark.createDataFrame([(s,) for s in corpus], "raw string")
    got = df.select("raw", _t.strip_markup(F.col("raw")).alias("c")).collect()
    for r in got:
        assert r.c == mirror(r.raw), (r.raw, r.c, mirror(r.raw))


# --- branch-consistency properties for the milli-bit scorers ----------
# The DSIR and bigram-LM cluster-scale branches compute the SAME real
# quantity as the exact-rational branch through a different float
# route; the only divergence budget is the independent quantization of
# each route (<= 1 milli-bit per round() plus double-rounding dust).
# Pure Python (the reference formulas) — no Spark session needed.

import math
from decimal import ROUND_HALF_UP, Decimal


def _q(x: float) -> int:
    return int(Decimal(x * 1000).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


@given(
    ct=st.integers(min_value=0, max_value=2**40),
    cr=st.integers(min_value=0, max_value=2**40),
    ntv=st.integers(min_value=2, max_value=2**45),
    nrv=st.integers(min_value=2, max_value=2**45),
)
@settings(max_examples=500, deadline=None)
def test_dsir_branches_agree_within_quantization(ct, cr, ntv, nrv):
    exact = _q(math.log2(((ct + 1) * nrv) / ((cr + 1) * ntv)))
    split = _q(math.log2((ct + 1) / ntv)) - _q(math.log2((cr + 1) / nrv))
    assert abs(exact - split) <= 2, (ct, cr, ntv, nrv, exact, split)


@given(
    cb_frac=st.floats(min_value=0.0, max_value=1.0),
    c1=st.integers(min_value=1, max_value=2**40),
    cw=st.integers(min_value=0, max_value=2**40),
    nv=st.integers(min_value=2, max_value=2**45),
)
@settings(max_examples=500, deadline=None)
def test_bigram_branches_agree_within_quantization(cb_frac, c1, cw, nv):
    cb = min(int(cb_frac * c1), c1)  # cb <= c1 by construction
    num = cb * nv + c1 * (cw + 1)
    den = 2 * c1 * nv
    exact = _q(math.log2(den / num))
    cluster = _q(-math.log2((cb / c1 + (cw + 1) / nv) / 2))
    assert abs(exact - cluster) <= 2, (cb, c1, cw, nv, exact, cluster)
