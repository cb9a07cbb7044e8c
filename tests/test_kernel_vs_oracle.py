"""Vectorized kernels must agree byte-for-byte with the loop-based
oracle — on the deterministic fixtures AND on randomized layouts
(SURVEY.md §5.2)."""

import numpy as np
import pandas as pd
import pytest

from fixtures.generate import gen_transcripts, golden_frame
from pdfextraction_spark.kernels import extract_batch
from pdfextraction_spark.kernels.htmlstrip import strip_html_doc
from pdfextraction_spark.kernels.layout import reflow_batch
from pdfextraction_spark.oracle import spatial
from pdfextraction_spark.oracle.htmlstrip import strip_html


def _assert_frames_equal(golden: pd.DataFrame, got: pd.DataFrame):
    assert len(golden) == len(got)
    for i in range(len(golden)):
        g, k = golden.iloc[i], got.iloc[i]
        gspans = [(d["label"], d["start"], d["end"]) for d in g["spans"]]
        assert g["payload_kind"] == k["payload_kind"], i
        assert g["extracted_text"] == k["extracted_text"], i
        assert gspans == k["spans"], i
        assert g["blocks_kept"] == k["blocks_kept"], i
        assert g["blocks_dropped"] == k["blocks_dropped"], i
        assert bool(g["parse_failed"]) == bool(k["parse_failed"]), i


def test_xs_fixtures_full_dispatch():
    df = gen_transcripts("xs")
    _assert_frames_equal(golden_frame(df), extract_batch(df["text"]))


@pytest.mark.slow
def test_s_fixtures_full_dispatch():
    df = gen_transcripts("s")
    _assert_frames_equal(golden_frame(df), extract_batch(df["text"]))


_TOKENS = [
    "Emp", "Id", "Hire", "Date", "Status", "Pay", "Group", "Notes",
    "Marital", "Work", "#", "FITW", "MED", "W2", "A", "M", "S",
    "12345", "19.00", "0.00", "$5.00", "42%", "12/26/2001",
    "509-121-3247", "088-39-6286", "0.00/14.11/0.00/0.00",
    "alpha", "bravo", "Charlie", "delta", "ACTIVE1", "x", "name:",
    "weekly", "basis", "Alpha Beta", "  ", "", "ünïcode", "Ünïcode",
]


def _rand_doc(rng: np.random.Generator):
    n = int(rng.integers(0, 60))
    words = []
    for _ in range(n):
        t = _TOKENS[rng.integers(0, len(_TOKENS))]
        x0 = float(rng.integers(0, 2200)) / 4.0
        y0 = float(rng.integers(280, 3200)) / 4.0
        w = max(len(t), 1) * 5.0
        h = 10.0
        # occasionally overlapping/negative-gap or zero-width words
        if rng.random() < 0.1:
            w = float(rng.integers(0, 40)) / 4.0
        words.append((t, x0, y0, x0 + w, y0 + h))
    return words


def test_layout_fuzz_500_docs():
    """Random word clouds incl. tolerance-boundary y deltas, empty
    docs, overlaps, unicode — kernel must equal oracle exactly."""
    rng = np.random.default_rng(1234)
    docs = [_rand_doc(rng) for _ in range(500)]
    # plant exact-boundary cases
    docs.append([("a", 36.0, 72.0, 41.0, 82.0), ("b", 60.0, 77.0, 65.0, 87.0),
                 ("c", 36.0, 77.25, 41.0, 87.25)])
    docs.append([])
    docs.append(None)
    got = reflow_batch(docs)
    for i, d in enumerate(docs):
        expected = None if d is None else spatial.reflow(d)
        assert got[i] == expected, f"doc {i}"


def test_html_fuzz_structures():
    rng = np.random.default_rng(99)
    frags = [
        "<p>{}</p>", "<h2>{}</h2>", "<li><a href='/x'>{}</a></li>",
        "<div>{}</div>", "<nav><a>{}</a></nav>", "<pre>{}</pre>",
        "<blockquote>{}</blockquote>", "<span>{}</span>", "{}",
        "<script>var x = '<p>not a block</p>';</script>",
        "<!-- {} --><td>{}</td>", "<br/><b>{}</b>", "<p>{}&amp;{}</p>",
    ]
    texts = ["lorem ipsum dolor sit amet consectetur adipiscing elit sed",
             "short", "x", ""]
    for _ in range(300):
        n = int(rng.integers(1, 8))
        doc = "".join(
            frags[rng.integers(0, len(frags))].replace(
                "{}", texts[rng.integers(0, len(texts))]
            )
            for _ in range(n)
        )
        doc = "<html><body>" + doc + "</body></html>"
        assert strip_html_doc(doc) == strip_html(doc), doc


def test_hypothesis_layout_if_available():
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    coord = st.integers(0, 3000).map(lambda v: v / 4.0)
    word = st.tuples(
        st.sampled_from(_TOKENS), coord, coord,
        st.integers(0, 200).map(lambda v: v / 4.0), st.just(10.0),
    ).map(lambda w: (w[0], w[1], w[2], w[1] + w[3], w[2] + w[4]))
    doc = st.lists(word, max_size=40)

    @settings(max_examples=150, deadline=None, derandomize=True)
    @given(st.lists(doc, max_size=6))
    def run(docs):
        got = reflow_batch(docs)
        for i, d in enumerate(docs):
            assert got[i] == spatial.reflow(d)

    run()


def test_content_dedup_expansion_identical():
    """extract_batch_flat(dedup=True) must be byte-identical to the
    non-deduped path on inputs with heavy payload repetition."""
    from pdfextraction_spark.kernels.extract import extract_batch_flat

    rng = np.random.default_rng(424242)
    base = gen_transcripts("xs")["text"].astype(object).tolist()
    texts = pd.Series(
        [base[int(rng.integers(0, len(base)))] for _ in range(2000)],
        dtype="object",
    )
    a = extract_batch_flat(texts, dedup=True)
    b = extract_batch_flat(texts, dedup=False)
    assert list(a.text) == list(b.text)
    assert list(a.kinds) == list(b.kinds)
    assert a.span_labels == b.span_labels
    assert a.span_starts == b.span_starts
    assert a.span_ends == b.span_ends
    assert (a.span_counts == b.span_counts).all()
    assert (a.kept == b.kept).all()
    assert (a.dropped == b.dropped).all()
    assert (a.failed == b.failed).all()


def test_envelope_escape_handling():
    """JSON escape decoding parity (kernel vs oracle) on every decode
    path: fast-path valid escapes, strict-path backslash-bearing
    tokens (must NOT be double-decoded), and invalid escapes (must
    degrade to parse_failed, not crash the batch)."""
    from pdfextraction_spark.payload import encode_pdf_envelope

    # 1. canonical envelopes (fast path) with escaped text
    fast = encode_pdf_envelope(
        [("C:\\path", 36.0, 72.0, 80.0, 82.0),
         ("a\bc", 100.0, 72.0, 120.0, 82.0),
         ('say "hi"', 140.0, 72.0, 180.0, 82.0)]
    )
    # 2. non-canonical spacing -> strict json.loads path; tokens carry
    #    a literal backslash AFTER decoding (old bug: re-decoded ->
    #    crash on C:\path, corruption of a\bc)
    strict = (
        '{"kind": "pdf_layout", "words": ['
        '{"t":"C:\\\\path","x0":36.0,"y0":72.0,"x1":80.0,"y1":82.0}, '
        '{"t":"a\\\\bc","x0":100.0,"y0":72.0,"x1":130.0,"y1":82.0}]}'
    )
    # 3. canonical-shaped envelope with an INVALID JSON escape -> the
    #    fast regex matches but decoding must fail the doc (strict
    #    parse of the whole envelope fails identically)
    bad = (
        '{"kind": "pdf_layout", "words": ['
        '{"t": "C:\\qath", "x0": 36.0, "y0": 72.0, "x1": 80.0, "y1": 82.0}]}'
    )
    df = pd.DataFrame({"text": [fast, strict, bad]})
    _assert_frames_equal(
        golden_frame(df.assign(conv_id="c", turn_idx=[0, 1, 2])),
        extract_batch(df["text"]),
    )
    got = extract_batch(df["text"])
    assert "C:\\path" in got["extracted_text"].iloc[0]
    assert "a\bc" in got["extracted_text"].iloc[0]
    # strict-path literal backslashes preserved byte-for-byte
    assert "C:\\path" in got["extracted_text"].iloc[1]
    assert "a\\bc" in got["extracted_text"].iloc[1]
    assert bool(got["parse_failed"].iloc[2])


def test_last_word_field_rule_whitespace_words():
    """Word texts with INTERNAL whitespace: the reference re-splits the
    joined cluster text with str.split() (spatial_preprocessor.py:341),
    so 'Employee ID' as one word still ends with the field token 'id'.
    Kernel and oracle must agree with that semantics (ADVICE r1)."""
    from pdfextraction_spark.payload import encode_pdf_envelope

    cases = [
        [("Employee ID", 36.0, 72.0, 96.0, 82.0),   # internal space
         ("77001", 260.0, 72.0, 290.0, 82.0)],
        [("Tax\tCode", 36.0, 72.0, 80.0, 82.0),      # internal tab
         ("FITW", 260.0, 72.0, 285.0, 82.0)],
        [("Position  Title ", 36.0, 72.0, 110.0, 82.0),  # runs + trailing
         ("Manager", 260.0, 72.0, 300.0, 82.0)],
    ]
    df = pd.DataFrame(
        {"conv_id": "c", "turn_idx": range(len(cases)),
         "text": [encode_pdf_envelope(w) for w in cases]}
    )
    golden = golden_frame(df)
    got = extract_batch(df["text"])
    _assert_frames_equal(golden, got)
    # all three must classify as field lines (the 'fields' span label)
    for i in range(len(cases)):
        labels = [s[0] for s in got["spans"].iloc[i]]
        assert "fields" in labels, (i, got["extracted_text"].iloc[i])
