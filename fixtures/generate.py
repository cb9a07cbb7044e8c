"""Deterministic synthetic transcripts generator (FIXTURES.md §1-§2).

Produces the engine's input table with exactly the BASELINE.json
``input_hint`` shape::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Seeded (seed=42 convention); no external data. Payload kinds per turn:
~40% plain/markdown/tool-output, ~30% HTML, ~30% pdf_layout envelopes
covering every FIXTURES.md §2c sub-case (forms, stacked label/value,
empty fields, value patterns, tables with multi-word headers, mixed
pages, tolerance-boundary layouts). All coordinates are multiples of
0.25 so float comparisons at the exact tolerance boundaries (Δy=5.0,
gap=2.0x avg) are bit-stable in both the oracle and the kernels.

Skew profile: turn counts Zipf-like, plus 2 planted mega-conversations
holding ~20% of turns in the 's'/'bench' tiers (exercises salted
repartitioning, SURVEY.md §4.2).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from pdfextraction_spark.payload import encode_pdf_envelope

SEED = 42
# bump when generator output changes: cached fixture files are keyed
# by this so stale /tmp caches can never serve old payloads
FIXTURE_VERSION = 1
_BASE_TS = datetime(2024, 1, 1)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu data spark batch arrow vector column"
).split()

_TOOLS = ["fetch_html", "pdf_reader", "bash", None]
_ROLES = ["user", "assistant", "tool"]


# --------------------------------------------------------------------------
# plain / markdown / tool-output payloads (golden: passthrough)

def _gen_plain(rng: np.random.Generator) -> str:
    style = rng.integers(0, 4)
    n = int(rng.integers(5, 40))
    words = rng.choice(_WORDS, size=n)
    prose = " ".join(words)
    if style == 0:
        return prose + "."
    if style == 1:  # markdown
        return f"# {words[0].title()} report\n\n- {words[1]}\n- {words[2]}\n\n{prose}"
    if style == 2:  # tool output with fenced JSON (openai_service.py:115-157 shape)
        return (
            f"Tool result:\n```json\n{{\"status\": \"ok\", \"items\": "
            f"[\"{words[0]}\", \"{words[1]}\"], \"count\": {n}}}\n```\n{prose}"
        )
    return f"{prose}\n\n    indented code {words[0]}\n\nmore {words[1]} text"


# --------------------------------------------------------------------------
# HTML payloads (golden: boilerplate-stripped main content)

def _para(rng: np.random.Generator, lo=8, hi=30) -> str:
    return " ".join(rng.choice(_WORDS, size=int(rng.integers(lo, hi)))) + "."


def _gen_html(rng: np.random.Generator) -> str:
    case = rng.integers(0, 6)
    nav = (
        "<nav><a href='/a'>Home</a> <a href='/b'>About</a> "
        "<a href='/c'>Contact</a></nav>"
    )
    header = "<header><h1>Site {0}</h1><a href='/l'>login</a></header>".format(
        rng.integers(0, 100)
    )
    footer = "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a> (c) 2024</footer>"
    aside = "<aside><ul><li><a href='/x'>related one</a></li><li><a href='/y'>related two</a></li></ul></aside>"
    paras = "".join(f"<p>{_para(rng)}</p>" for _ in range(int(rng.integers(2, 6))))
    heading = f"<h2>{' '.join(rng.choice(_WORDS, size=3)).title()}</h2>"
    if case == 0:  # easy page: one obvious article
        return f"<html><body>{nav}<article>{heading}{paras}</article>{footer}</body></html>"
    if case == 1:  # full boilerplate sandwich
        return (
            f"<!DOCTYPE html><html><head><title>t</title><style>p{{x}}</style></head>"
            f"<body>{header}{nav}<main><div>{heading}{paras}</div></main>{aside}{footer}"
            f"<script>var x=1;</script></body></html>"
        )
    if case == 2:  # hard: link list INSIDE the article (must be dropped)
        links = "<ul>" + "".join(
            f"<li><a href='/i{i}'>item {i}</a></li>" for i in range(5)
        ) + "</ul>"
        return f"<html><body><article>{heading}{paras}{links}<p>{_para(rng)}</p></article></body></html>"
    if case == 3:  # empty body -> parse-failure metric
        return f"<html><body>{nav}{footer}</body></html>"
    if case == 4:  # short fragments mixed with one long paragraph
        return (
            f"<div><p>ok</p><p>{_para(rng, 20, 40)}</p>"
            f"<blockquote>{_para(rng)}</blockquote></div>"
        )
    # tables + lists content page
    rows = "".join(
        f"<tr><td>{_para(rng, 4, 8)}</td><td>{_para(rng, 4, 8)}</td></tr>"
        for _ in range(2)
    )
    return f"<html><body>{nav}<section>{heading}<table>{rows}</table>{paras}</section></body></html>"


# --------------------------------------------------------------------------
# pdf_layout payloads (golden: reference-style spatial reflow)

def _q(v: float) -> float:
    """Quantize to multiples of 0.25 (exact float representation)."""
    return round(v * 4) / 4.0


def _word_row(texts, x_starts, y, h=10.0, char_w=5.0):
    """Lay words at given x starts on one baseline y; width ~ len*char_w."""
    return [
        (t, _q(x), _q(y), _q(x + max(len(t), 1) * char_w), _q(y + h))
        for t, x in zip(texts, x_starts)
    ]


_LABEL_BANK = [
    ("Emp", "Id"), ("Hire", "Date"), ("Work", "#"), ("Status",),
    ("Marital", "Status"), ("Pay", "Group"), ("Department",),
    ("Employee", "Name"), ("Tax", "Code"), ("Phone",), ("Address",),
    ("Position", "Title"), ("Supervisor",), ("Base", "Salary"),
]
_VALUE_BANK = [
    "12345", "12/26/2001", "509-121-3247", "088-39-6286", "FITW", "MED",
    "W2", "A", "M", "S", "$1,250.00", "19.00", "0.00",
    "0.00/14.11/0.00/0.00", "42%", "ACTIVE1", "Redmond",
]


def _gen_pdf_words(rng: np.random.Generator):
    case = rng.integers(0, 9)
    words = []
    y = 72.0
    if case == 0:  # form: Label  Value pairs on single lines (big gap)
        for _ in range(int(rng.integers(3, 8))):
            label = _LABEL_BANK[rng.integers(0, len(_LABEL_BANK))]
            value = _VALUE_BANK[rng.integers(0, len(_VALUE_BANK))]
            xs = [36.0 + 40 * i for i in range(len(label))]
            words += _word_row(label, xs, y)
            words += _word_row([value], [xs[-1] + 120.0], y)
            y += 18.0
    elif case == 1:  # stacked label line over value line (aligned <=30px)
        for _ in range(int(rng.integers(2, 5))):
            labels = [_LABEL_BANK[rng.integers(0, len(_LABEL_BANK))] for _ in range(3)]
            vals = [_VALUE_BANK[rng.integers(0, len(_VALUE_BANK))] for _ in range(3)]
            lx = [36.0, 220.0, 420.0]
            row = []
            for lab, x in zip(labels, lx):
                row += _word_row(lab, [x + 42 * i for i in range(len(lab))], y)
            words += row
            words += _word_row(vals, [x + rng.integers(-4, 5) * 4 for x in lx], y + 14.0)
            y += 40.0
    elif case == 2:  # empty fields / consecutive labels
        labs = ["Status", "Department", "Phone"]
        words += _word_row(labs, [36.0, 200.0, 400.0], y)
        y += 18.0
        words += _word_row(["Notes"], [36.0], y)
        y += 18.0
    elif case == 3:  # value-pattern soup (must not classify as fields)
        vals = list(rng.choice(_VALUE_BANK, size=6))
        words += _word_row(vals[:3], [36.0, 200.0, 380.0], y)
        words += _word_row(vals[3:], [36.0, 200.0, 380.0], y + 16.0)
        y += 40.0
    elif case == 4:  # table: header row + >=2 aligned data rows
        headers = ["Code", "Description", "Amount", "Effective", "Dates"]
        hx = [36.0, 136.0, 286.0, 396.0, 456.0]
        words += _word_row(headers, hx, y)
        y += 16.0
        for _ in range(int(rng.integers(2, 6))):
            row_vals = [
                _VALUE_BANK[rng.integers(4, 7)],
                " ".join(rng.choice(_WORDS, size=2)),
                _VALUE_BANK[rng.integers(11, 14)],
                "04/19/2024", "12/31/2100",
            ]
            cells = []
            for v, x in zip(row_vals, hx):
                parts = v.split(" ")
                cells += _word_row(parts, [x + 42 * i for i in range(len(parts))], y)
            # occasional empty cell (null, distinguished from "0.00")
            if rng.random() < 0.3:
                cells = [c for c in cells if c[1] < 380.0 or c[1] >= 450.0]
            words += cells
            y += 16.0
    elif case == 5:  # mixed page: form block above table block
        words += _word_row(["Employee", "Name"], [36.0, 90.0], y)
        words += _word_row(["Jane Q Public".split()[0]], [260.0], y)
        y += 30.0
        headers = ["Code", "Rate", "Total"]
        hx = [36.0, 156.0, 276.0]
        words += _word_row(headers, hx, y)
        y += 16.0
        for _ in range(3):
            words += _word_row(["MED", "19.00", "57.00"], hx, y)
            y += 16.0
    elif case == 6:  # boundary: Δy exactly 5.0, whitespace words, overlaps
        words += _word_row(["Emp", "Id"], [36.0, 78.0], y)
        words += _word_row(["77001"], [200.0], y + 5.0)     # same line (== tol)
        words += _word_row(["Next"], [36.0], y + 10.25)     # new line (> tol)
        words.append(("   ", 300.0, y, 310.0, y + 10.0))    # whitespace-only
        words += _word_row(["over", "lap"], [400.0, 398.0], y)  # negative gap
        y += 30.0
    elif case == 7:  # single word page
        words += _word_row([str(rng.integers(0, 10**6))], [306.0], 396.0)
    else:  # multi-cluster lines: gap > 4x small gaps so clusters split
        for _ in range(int(rng.integers(2, 5))):
            label = _LABEL_BANK[rng.integers(0, len(_LABEL_BANK))]
            if len(label) == 1:
                label = (label[0], "Ref")
            val_words = [w.lower() for w in rng.choice(_WORDS, size=2)]
            lx = [36.0, 36.0 + len(label[0]) * 5.0 + 4.0]
            words += _word_row(label, lx, y)
            vx0 = lx[1] + len(label[1]) * 5.0 + 150.0
            words += _word_row(val_words, [vx0, vx0 + len(val_words[0]) * 5.0 + 4.0], y)
            y += 18.0
    return words


def _gen_pdf(rng: np.random.Generator) -> str:
    if rng.random() < 0.02:  # malformed envelope -> parse_failed passthrough
        return '{"kind": "pdf_layout", "words": [{"t": "x", "x0": }'
    return encode_pdf_envelope(_gen_pdf_words(rng))


# --------------------------------------------------------------------------
# conversation assembly

def _turn_counts(n_convs: int, total_turns: int, rng: np.random.Generator,
                 mega: int = 0) -> np.ndarray:
    """Zipf-ish turn counts summing ~total_turns, with `mega` planted
    mega-conversations holding ~20% of all turns."""
    raw = rng.zipf(1.6, size=n_convs).astype(np.float64)
    raw = np.minimum(raw, 50)
    mega_turns = int(total_turns * 0.2) if mega else 0
    rest = max(total_turns - mega_turns, n_convs)
    counts = np.maximum((raw / raw.sum() * rest).astype(np.int64), 1)
    if mega:
        per = mega_turns // mega
        for i in range(mega):
            counts[i] = per
    return counts


def gen_transcripts(tier: str = "xs", total_turns: int | None = None) -> pd.DataFrame:
    """Generate the transcripts table for a tier ('xs'|'s'|'bench')."""
    profiles = {"xs": (20, 200, 0), "s": (500, 10_000, 2), "bench": (5_000, 1_000_000, 2)}
    n_convs, default_turns, mega = profiles[tier]
    total = total_turns or default_turns
    rng = np.random.default_rng(SEED)
    counts = _turn_counts(n_convs, total, rng, mega)

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci, cnt in enumerate(counts):
        conv = f"conv-{ci:06d}"
        crng = np.random.default_rng(SEED * 1_000_003 + ci)
        t0 = _BASE_TS + timedelta(minutes=int(ci) * 7)
        for ti in range(int(cnt)):
            mix = crng.random()
            if mix < 0.4:
                text = _gen_plain(crng)
            elif mix < 0.7:
                text = _gen_html(crng)
            else:
                text = _gen_pdf(crng)
            role = _ROLES[ti % 3]
            conv_ids.append(conv)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(_TOOLS[int(crng.integers(0, 3))] if role == "tool" else None)
            tss.append(t0 + timedelta(seconds=ti * 13))
    df = pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string"),
            "turn_idx": np.asarray(turn_idxs, dtype=np.int32),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            # microsecond precision: Spark cannot read TIMESTAMP(NANOS)
            "ts": pd.to_datetime(tss).astype("datetime64[us]"),
        }
    )
    return df


def gen_transcripts_fast(total_turns: int, pool_size: int = 4096,
                         n_convs: int = 2000) -> pd.DataFrame:
    """Bench-tier generator: builds a pool of distinct payloads then
    tiles it across turns (payload construction is the slow part; the
    extraction cost profile is preserved). Deterministic, seed 42,
    keeps the zipf + 2-mega-conversation skew profile."""
    rng = np.random.default_rng(SEED)
    pool = []
    for i in range(pool_size):
        prng = np.random.default_rng(SEED * 7 + i)
        mix = prng.random()
        if mix < 0.4:
            pool.append(_gen_plain(prng))
        elif mix < 0.7:
            pool.append(_gen_html(prng))
        else:
            pool.append(_gen_pdf(prng))
    pool_arr = np.asarray(pool, dtype=object)

    counts = _turn_counts(n_convs, total_turns, rng, mega=2)
    total = int(counts.sum())
    conv_ord = np.repeat(np.arange(n_convs), counts)
    turn_idx = (np.arange(total) - np.r_[0, np.cumsum(counts)[:-1]][conv_ord]).astype(np.int32)
    payload_idx = (conv_ord * 2654435761 + turn_idx * 40503) % pool_size
    roles = np.asarray(_ROLES, dtype=object)[turn_idx % 3]
    ts = (
        np.datetime64(_BASE_TS, "us")
        + (conv_ord.astype("int64") * 420 + turn_idx.astype("int64") * 13)
        * np.timedelta64(1, "s")
    )
    return pd.DataFrame(
        {
            "conv_id": pd.array(
                np.char.add("conv-", np.char.zfill(conv_ord.astype(str), 6)),
                dtype="string",
            ),
            "turn_idx": turn_idx,
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(pool_arr[payload_idx], dtype="string"),
            "tool": pd.array([None] * total, dtype="string"),
            "ts": pd.Series(ts).astype("datetime64[us]"),
        }
    )


def write_transcripts_parquet(path: str, tier: str = "xs",
                              total_turns: int | None = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    gen_transcripts(tier, total_turns).to_parquet(path, index=False)
    return path


def golden_frame(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Run the loop-based oracle over a transcripts frame -> golden_turns
    (FIXTURES.md §3)."""
    from pdfextraction_spark.oracle import extract_turn

    rows = []
    for conv_id, turn_idx, text in zip(
        transcripts["conv_id"], transcripts["turn_idx"], transcripts["text"]
    ):
        kind, out, spans, kept, dropped, failed = extract_turn(text)
        rows.append(
            (conv_id, turn_idx, kind, out,
             [{"label": l, "start": s, "end": e} for (l, s, e) in spans],
             kept, dropped, failed)
        )
    return pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "payload_kind", "extracted_text",
                 "spans", "blocks_kept", "blocks_dropped", "parse_failed"],
    )


if __name__ == "__main__":
    import sys

    tier = sys.argv[1] if len(sys.argv) > 1 else "xs"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/transcripts_{tier}.parquet"
    total = int(sys.argv[3]) if len(sys.argv) > 3 else None
    print(write_transcripts_parquet(out, tier, total))
