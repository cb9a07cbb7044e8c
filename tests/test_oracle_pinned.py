"""Hand-computed golden strings pinning the oracle's semantics to the
reference's constants (SURVEY.md §5.2 unit tests; citations in
pdfextraction_spark/config.py)."""

import pytest

from pdfextraction_spark.oracle import spatial
from pdfextraction_spark.oracle.extract import extract_turn
from pdfextraction_spark.oracle.htmlstrip import strip_html
from pdfextraction_spark.payload import encode_pdf_envelope


def W(t, x0, y, x1, h=10.0):
    return (t, x0, y, x1, y + h)


class TestFieldClassifier:
    """is_field_pattern / is_obvious_value_pattern truth tables
    (spatial_preprocessor.py:298-390)."""

    @pytest.mark.parametrize("text,expected", [
        ("A", True), ("M", True), ("S", True),            # single letters
        ("12345", True), ("19.00", True),                  # pure numbers
        ("0.00/14.11/0.00/0.00", True),                    # compound decimal
        ("$1,250.00", True), ("42%", True),                # currency/percent
        ("12/26/2001", True), ("04/19/2024 to x", True),   # date (prefix match)
        ("509-121-3247", True),                            # phone
        ("088-39-6286", True),                             # ssn
        ("FITW", True), ("MED", True), ("W2", True),       # short all-caps
        ("ACTIVE1", False),                                # 7 chars > 6
        ("STATUS", False),                                 # keyword vetoes caps rule
        ("hello", False), ("Employee", False),
    ])
    def test_obvious_value(self, text, expected):
        assert spatial.is_obvious_value(text) is expected

    @pytest.mark.parametrize("words,expected", [
        (["Emp", "Id"], True),          # keyword
        (["Hire", "Date"], True),       # keyword
        (["Work", "#"], True),          # ending '#'
        (["Status"], True),             # keyword + ending
        (["Marital", "Status"], True),  # common field + title case
        (["Pay", "Group"], True),       # ending 'group'
        (["Notes"], True),              # 'no' keyword substring quirk
        (["Alpha", "Beta"], True),      # >=70% title-case, 2 words
        (["alpha", "Beta"], False),     # 50% < 70%
        (["12345"], False),             # obvious value
        (["FITW"], False),              # all-caps code
        (["weekly", "basis"], False),
    ])
    def test_field_cluster(self, words, expected):
        cluster = [W(t, 36.0 + 60 * i, 72.0, 36.0 + 60 * i + 5 * len(t))
                   for i, t in enumerate(words)]
        assert spatial.is_field_cluster(cluster) is expected


class TestLineGrouping:
    def test_y_tolerance_boundary(self):
        """Δy == 5.0 stays on the line; > 5.0 starts a new one
        (spatial_preprocessor.py:207, anchored to the line's first word)."""
        words = [W("a", 36, 72.0, 41), W("b", 60, 77.0, 65), W("c", 36, 77.25, 41)]
        lines = spatial.group_lines(words)
        assert [[w[0] for w in ln] for ln in lines] == [["a", "b"], ["c"]]

    def test_anchor_is_first_word_not_rolling(self):
        """y=72, 76, 81: 81 is within 5 of 76 but NOT of the anchor 72."""
        words = [W("a", 36, 72.0, 41), W("b", 60, 76.0, 65), W("c", 80, 81.0, 85)]
        lines = spatial.group_lines(words)
        assert [[w[0] for w in ln] for ln in lines] == [["a", "b"], ["c"]]

    def test_whitespace_words_dropped(self):
        out = spatial.reflow([W("  ", 36, 72, 46), W("x y", 60, 72, 70)])
        assert out == [("text", "x y")]


class TestClustering:
    def test_two_and_three_word_lines_never_split(self):
        """With <=2 gaps, no gap can exceed 2x the mean — reference
        geometry (spatial_preprocessor.py:279-289)."""
        line = [W("a", 36, 72, 41), W("b", 200, 72, 205), W("c", 500, 72, 505)]
        assert len(spatial.cluster_line(line)) == 1

    def test_gap_boundary_exact(self):
        """gap == 2x mean stays merged (<=); slightly more splits."""
        def mk(g2):
            return [W("a", 0, 72, 10), W("b", 15, 72, 25),       # gap 5
                    W("c", 25 + g2, 72, 35 + g2),                # gap g2
                    W("d", 45 + g2, 72, 55 + g2)]                # gap 10... recompute
        # gaps: 5, g2, 10 -> mean (15+g2)/3, threshold 2(15+g2)/3
        # g2 == 30 -> threshold 30 -> merged; g2 == 30.75 -> thr 30.5 -> split
        assert len(spatial.cluster_line(mk(30.0))) == 1
        assert len(spatial.cluster_line(mk(30.75))) == 2


class TestFormatting:
    def test_single_field_line_no_values(self):
        words = [W("Name", 36, 72, 56), W("Alice", 200, 72, 225)]
        assert spatial.reflow(words) == [("fields", "Name Alice:\t[EMPTY]")]

    def test_field_line_with_cross_line_value(self):
        """J2 pairing: field center within 50px of value cluster center,
        consume gate 30px on word centers."""
        line1 = [W("Pay", 36, 72, 51), W("Group", 55, 72, 80),
                 W("weekly", 200, 72, 230), W("basis", 234, 72, 259)]
        line2 = [W("hello", 40, 86, 65)]
        out = spatial.reflow(line1 + line2)
        assert out == [("fields", "Pay Group:\thello    weekly basis")]

    def test_unconsumed_next_line_still_donates_value(self):
        """Reference quirk (spatial_preprocessor.py:69-77): the next
        line's clusters are searched for values even when the 30px gate
        later refuses to consume the line, so it is ALSO emitted."""
        line1 = [W("Pay", 36, 72, 51), W("Group", 55, 72, 80),
                 W("weekly", 200, 72, 230), W("basis", 234, 72, 259)]
        # cluster center within 50 of 55.5 but no word center within 30
        # of ANY line-1 word center (line-1 centers: 43.5, 67.5, 215, 246.5)
        line2 = [W("zzz", 95, 86, 110)]  # center 102.5; dist to field 47
        out = spatial.reflow(line1 + line2)
        assert out == [
            ("fields", "Pay Group:\tzzz    weekly basis"),
            ("text", "zzz"),
        ]

    def test_empty_sentinel_when_next_cluster_is_field(self):
        """J1: same-line next cluster that is itself a field -> [EMPTY],
        and the 'value' cluster is also emitted standalone."""
        line = [W("Emp", 36, 72, 51), W("Id", 55, 72, 65),
                W("Hire", 300, 72, 320), W("Date", 324, 72, 344)]
        out = spatial.reflow(line)
        assert out == [("fields", "Emp Id:\t[EMPTY]    Hire Date:\t[EMPTY]")]

    def test_consume_parity_chain(self):
        """field/value/field/value stacks consume alternately (W5)."""
        rows = []
        for i, (t, v) in enumerate([("Status", "A"), ("Phone", "B2B")]):
            rows.append(W(t, 36, 72.0 + 28 * i, 36 + 5 * len(t)))
            rows.append(W(v, 38, 86.0 + 28 * i, 38 + 5 * len(v)))
        out = spatial.reflow(rows)
        assert out == [("fields", "Status:\tA"), ("fields", "Phone:\tB2B")]


class TestHtml:
    def test_boilerplate_dropped_content_kept(self):
        html = ("<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
                "<article><h2>Big Title</h2>"
                "<p>This paragraph has plenty of meaningful prose content in it.</p>"
                "</article><footer><a href='/t'>Terms</a></footer></body></html>")
        text, spans, kept, dropped, failed = strip_html(html)
        body = "This paragraph has plenty of meaningful prose content in it."
        assert text == "Big Title\n" + body
        assert spans == [("h2", 0, 9), ("p", 10, 10 + len(body))]
        assert (kept, dropped, failed) == (2, 0, False)

    def test_link_dense_block_dropped(self):
        html = ("<div><p>A sufficiently long and informative paragraph body here.</p>"
                "<ul><li><a href='/1'>one link</a></li><li><a href='/2'>two link</a></li></ul></div>")
        text, spans, kept, dropped, failed = strip_html(html)
        assert kept == 1 and dropped >= 1 and not failed
        assert "one link" not in text

    def test_empty_body_parse_failed(self):
        text, spans, kept, dropped, failed = strip_html(
            "<html><body><nav><a href='/x'>x</a></nav></body></html>")
        assert text == "" and kept == 0 and failed


class TestDispatch:
    def test_plain_passthrough(self):
        t = "# Title\n\nhello world"
        kind, out, spans, kept, dropped, failed = extract_turn(t)
        assert (kind, out, spans, kept, dropped, failed) == (
            "plain", t, [("text", 0, len(t))], 1, 0, False)

    def test_malformed_envelope_passthrough_flagged(self):
        t = '{"kind": "pdf_layout", "words": [{"t": "x", "x0": }'
        kind, out, spans, kept, dropped, failed = extract_turn(t)
        assert kind == "pdf_layout" and out == t and failed

    def test_envelope_roundtrip(self):
        words = [W("Status", 36, 72, 66), W("A", 38, 86, 43)]
        t = encode_pdf_envelope(words)
        kind, out, spans, kept, dropped, failed = extract_turn(t)
        assert kind == "pdf_layout"
        assert out == "Status:\tA"
        assert spans == [("fields", 0, 9)]
        assert not failed
