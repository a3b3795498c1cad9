"""Deterministic synthetic page corpus (FIXTURES.md F1-F3).

Everything is seeded ``random.Random`` — same seed, same bytes, no wall-clock,
no external data. Two payload kinds land in the ``html: binary`` column:

- HTML documents: nav/header/footer/aside boilerplate with high link density
  around a ``<main>``/``<article>`` body of seeded paragraphs, optional
  ``<table>``, controlled inline-link density (F2).
- word-coordinate pages: form regions (label/value same-line and beneath,
  ``[EMPTY]`` fields, dates, SSN/phone, compound values, short codes) plus
  table regions with regular column spacing (F3) — the reference fixture's
  shape (reference uploads/20250914_*.pdf / results/result_43acb597-*.json:
  ~47 fields, 7 tables, 18 rows).

Hosts are Zipf-skewed over ~50 hosts to exercise the salted-domain shuffle.
"""

from __future__ import annotations

import random
from typing import Any

import numpy as np
import pyarrow as pa

from . import geometry as G
from .payload import encode_html, encode_words

BASE_TS_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
          "tempor incididunt ut labore et dolore magna aliqua enim minim veniam "
          "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
          "consequat duis aute irure reprehenderit voluptate velit esse cillum "
          "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
          "sunt culpa qui officia deserunt mollit anim laborum").split()

FIELD_LABELS = [
    ("Employee", "Name"), ("Hire", "Date"), ("Term", "Date"), ("Emp", "Status"),
    ("Department",), ("Division",), ("Location",), ("Supervisor",), ("Position",),
    ("Job", "Title"), ("Pay", "Group"), ("Emp", "ID"), ("Tax", "Code"),
    ("Marital", "Status"), ("Gender",), ("Phone", "Number"), ("Home", "Address"),
    ("Email", "Address"), ("SSN",), ("Salary", "Rate"), ("Account", "Number"),
    ("Reference", "No"), ("Badge", "No"), ("Shift", "Group"), ("Union", "Code"),
]
VALUE_POOL = ["Caroline", "Jones", "Alex", "Rivera", "Velorynt", "Labs",
              "Standard", "Hourly", "Weekly", "Corporate", "Remote"]
TABLE_HEADER_SETS = [
    ["RateCode", "Description", "Rate", "Salary"],
    ["Deduction", "Amount", "Frequency"],
    ["Earning", "Hours", "Rate", "Total"],
    ["Benefit", "Plan", "Coverage", "Premium"],
    ["Accrual", "Balance", "Used", "Available"],
    ["TaxCode", "Jurisdiction", "Rate"],
    ["Dependent", "Relationship", "Birthdate"],
]
HOST_COUNT = 50


def _rand_value(rng: random.Random) -> str:
    kind = rng.randrange(8)
    if kind == 0:
        return f"{rng.randrange(1, 13):02d}/{rng.randrange(1, 29):02d}/{rng.randrange(1990, 2026)}"
    if kind == 1:
        return f"{rng.randrange(100, 999)}-{rng.randrange(10, 99)}-{rng.randrange(1000, 9999)}"
    if kind == 2:
        return f"{rng.randrange(100, 999)}-{rng.randrange(100, 999)}-{rng.randrange(1000, 9999)}"
    if kind == 3:
        return f"{rng.randrange(0, 200)}.{rng.randrange(0, 100):02d}"
    if kind == 4:
        return f"{rng.choice('SHWX')}-{rng.randrange(10)}"
    if kind == 5:
        return "/".join(f"{rng.randrange(0, 20)}.{rng.randrange(0, 100):02d}" for _ in range(4))
    if kind == 6:
        return rng.choice(VALUE_POOL)
    return f"{rng.choice(VALUE_POOL)} {rng.choice(VALUE_POOL)}"


def _word(text: str, x: float, y: float, h: float = 10.0) -> dict[str, Any]:
    return G.derive_word(text, x, y, x + max(6.0, 5.5 * len(text)), y + h)


def gen_word_page(rng: random.Random, n_field_lines: int = 8,
                  n_tables: int = 2) -> list[dict[str, Any]]:
    """A synthetic form+table page with deterministic layout."""
    words: list[dict[str, Any]] = []
    y = 40.0
    labels = rng.sample(FIELD_LABELS, min(n_field_lines * 2, len(FIELD_LABELS)))
    li = 0
    for _ in range(n_field_lines):
        layout = rng.randrange(3)
        if layout == 0 and li < len(labels):
            # label: value on the same line, two field/value pairs
            x = 30.0
            for _ in range(2):
                if li >= len(labels):
                    break
                for part in labels[li]:
                    w = _word(part, x, y)
                    words.append(w)
                    x = w["x1"] + 5.0
                li += 1
                if rng.random() < 0.85:  # 15% -> [EMPTY]
                    v = _word(_rand_value(rng), x + 30.0, y)
                    words.append(v)
                    x = v["x1"] + 80.0
                else:
                    x += 170.0
            y += 18.0
        elif layout == 1 and li < len(labels):
            # label line with values on the line beneath
            xs = []
            x = 30.0
            for _ in range(min(3, len(labels) - li)):
                start_x = x
                for part in labels[li]:
                    w = _word(part, x, y)
                    words.append(w)
                    x = w["x1"] + 5.0
                xs.append(start_x)
                li += 1
                x += 110.0
            yv = y + 13.0
            for start_x in xs:
                if rng.random() < 0.8:
                    words.append(_word(_rand_value(rng), start_x + 2.0, yv))
            y += 34.0
        else:
            # plain prose line
            x = 30.0
            for _ in range(rng.randrange(4, 9)):
                w = _word(rng.choice(_LOREM), x, y)
                words.append(w)
                x = w["x1"] + 6.0
            y += 16.0
    for _ in range(n_tables):
        y += 34.0  # leaves a >20pt line gap so consecutive tables stay distinct T7 regions
        headers = rng.choice(TABLE_HEADER_SETS)
        col_step = 110.0
        xs = [40.0 + i * col_step for i in range(len(headers))]
        for h, x in zip(headers, xs):
            words.append(_word(h, x, y))
        for _ in range(rng.randrange(1, 5)):
            y += 15.0
            for x in xs:
                if rng.random() < 0.9:
                    words.append(_word(_rand_value(rng), x, y))
        y += 6.0
    return words


def flagship_word_page(seed: int = 43) -> list[dict[str, Any]]:
    """The big conformance page — the F3 analogue of the reference golden
    (47-field / 7-table / 18-row scale): 12 same-line label+value lines (these
    merge into one cluster under the reference's 2x-avg-gap rule and render
    ``[EMPTY]`` — faithful), 12 labels in rows of 3 with values beneath (the
    M9/M12 pairing path, real values), then all 7 table sets separated by
    >20pt so T7 keeps them distinct regions."""
    rng = random.Random(seed)
    words: list[dict[str, Any]] = []
    y = 36.0
    for label in FIELD_LABELS[:12]:
        x = 30.0
        for part in label:
            w = _word(part, x, y)
            words.append(w)
            x = w["x1"] + 5.0
        if rng.random() < 0.85:
            words.append(_word(_rand_value(rng), x + 25.0, y))
        y += 15.0
    for group_start in range(12, 24, 3):
        y += 8.0
        xs = []
        x = 30.0
        for label in FIELD_LABELS[group_start:group_start + 3]:
            xs.append(x)
            for part in label:
                w = _word(part, x, y)
                words.append(w)
                x = w["x1"] + 5.0
            x += 120.0
        yv = y + 13.0
        for sx in xs:
            if rng.random() < 0.8:
                words.append(_word(_rand_value(rng), sx + 2.0, yv))
        y += 34.0
    for headers in TABLE_HEADER_SETS:
        y += 34.0
        xs = [40.0 + i * 110.0 for i in range(len(headers))]
        for h, x in zip(headers, xs):
            words.append(_word(h, x, y))
        for _ in range(rng.randrange(2, 4)):
            y += 15.0
            for x in xs:
                if rng.random() < 0.9:
                    words.append(_word(_rand_value(rng), x, y))
    return words


def _paragraph(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_LOREM) for _ in range(n_words)).capitalize() + "."


def gen_html_page(rng: random.Random, n_paragraphs: int = 6,
                  with_table: bool = False) -> str:
    """Boilerplate-wrapped article page (F2)."""
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_LOREM, 6))
    aside = "".join(f'<a href="/r/{w}">{rng.choice(_LOREM)} {w}</a> '
                    for w in rng.sample(_LOREM, 5))
    paras = []
    for _ in range(n_paragraphs):
        body = _paragraph(rng, rng.randrange(30, 90))
        if rng.random() < 0.3:  # low-density inline link
            link = rng.choice(_LOREM)
            body += f' See <a href="/{link}">{link}</a> for details.'
        paras.append(f"<p>{body}</p>")
    table_html = ""
    if with_table:
        headers = rng.choice(TABLE_HEADER_SETS)
        rows = "".join(
            "<tr>" + "".join(f"<td>{_rand_value(rng)}</td>" for _ in headers) + "</tr>"
            for _ in range(rng.randrange(2, 5)))
        table_html = ("<table><tr>" + "".join(f"<th>{h}</th>" for h in headers)
                      + "</tr>" + rows + "</table>")
    title = _paragraph(rng, 5).rstrip(".")
    return f"""<!DOCTYPE html><html><head><title>{title}</title>
<script>var x = 1;</script><style>.a{{color:red}}</style></head>
<body><nav><ul>{nav}</ul></nav>
<header><div class="menu">{aside}</div></header>
<div class="sidebar">{aside}</div>
<main><article><h1>{title}</h1>
{''.join(paras)}
{table_html}
</article></main>
<div class="comments"><p>short spam comment with <a href="/x">links links links</a></p></div>
<footer><p>copyright {rng.randrange(2000, 2026)} example corp — <a href="/tos">terms</a>
<a href="/priv">privacy</a> <a href="/about">about</a></p></footer>
</body></html>"""


def zipf_host(rng: random.Random) -> int:
    """Zipf-skewed host index in [0, HOST_COUNT) — a few hosts dominate."""
    return min(int(rng.paretovariate(1.1)) - 1, HOST_COUNT - 1)


def make_page_row(i: int, seed: int = 42) -> dict[str, Any]:
    """One deterministic corpus row; ~1 in 4 pages is a word-payload page."""
    rng = random.Random((seed << 32) ^ i)
    host = zipf_host(rng)
    url = f"https://host{host:02d}.example/p/{i}"
    ts = BASE_TS_US + i * 1_000_000 + rng.randrange(0, 999_983)
    lang = "en" if rng.random() < 0.9 else rng.choice(["de", "fr"])
    if i % 4 == 0:
        words = gen_word_page(rng, n_field_lines=rng.randrange(4, 12),
                              n_tables=rng.randrange(0, 4))
        payload = encode_words(words)
        raw_text = " ".join(w["text"] for w in G.reading_order(words))
    else:
        html = gen_html_page(rng, n_paragraphs=rng.randrange(3, 10),
                             with_table=rng.random() < 0.3)
        payload = encode_html(html)
        raw_text = html
    return {"url": url, "warc_ts": ts, "html": payload, "text": raw_text, "lang": lang}


def build_multipage_corpus_table(n_docs: int, pages_per_doc: int = 3,
                                 seed: int = 77) -> pa.Table:
    """F5-style multi-record corpus: ``pages_per_doc`` word-payload records
    per url. Page 0 carries the form fields (some repeated on page 1 with a
    LONGER value — exercises the longest-wins conflict path), and one table
    header set recurs on every page with fresh rows (row accumulation).
    The page index is encoded in the microsecond digits of warc_ts
    (``warc_ts % 1000``) so downstream code can recover page order without an
    extra column."""
    urls, tss, payloads, texts, langs = [], [], [], [], []
    for d in range(n_docs):
        rng = random.Random((seed << 20) ^ d)
        headers = rng.choice(TABLE_HEADER_SETS)
        for p in range(pages_per_doc):
            words: list[dict[str, Any]] = []
            y = 40.0
            if p == 0:
                for label in FIELD_LABELS[:6]:
                    x = 30.0
                    for part in label:
                        w = _word(part, x, y)
                        words.append(w)
                        x = w["x1"] + 5.0
                    words.append(_word(_rand_value(rng), x + 40.0, y + 13.0))
                    y += 30.0
            elif p == 1:
                # repeat the first two labels with longer values beneath
                for label in FIELD_LABELS[:2]:
                    x = 30.0
                    for part in label:
                        w = _word(part, x, y)
                        words.append(w)
                        x = w["x1"] + 5.0
                    words.append(_word(f"{_rand_value(rng)} {_rand_value(rng)}",
                                       32.0, y + 13.0))
                    y += 30.0
            y += 20.0
            xs = [40.0 + i * 110.0 for i in range(len(headers))]
            for h, x in zip(headers, xs):
                words.append(_word(h, x, y))
            for _ in range(1 + rng.randrange(2)):
                y += 15.0
                for x in xs:
                    words.append(_word(_rand_value(rng), x, y))
            urls.append(f"https://multi.example/doc/{d}")
            tss.append(BASE_TS_US + d * 1_000_000 + p)
            payloads.append(encode_words(words))
            texts.append(" ".join(w["text"] for w in G.reading_order(words)))
            langs.append("en")
    return pa.Table.from_pydict(
        {"url": urls, "warc_ts": np.array(tss, dtype="datetime64[us]"),
         "html": payloads, "text": texts, "lang": langs}, schema=CORPUS_SCHEMA)


CORPUS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def build_corpus_table(n_rows: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [make_page_row(start + i, seed) for i in range(n_rows)]
    return pa.Table.from_pydict(
        {"url": [r["url"] for r in rows],
         "warc_ts": np.array([r["warc_ts"] for r in rows], dtype="datetime64[us]"),
         "html": [r["html"] for r in rows],
         "text": [r["text"] for r in rows],
         "lang": [r["lang"] for r in rows]},
        schema=CORPUS_SCHEMA)


def write_corpus(out_dir: str, n_rows: int, seed: int = 42, n_shards: int = 8) -> list[str]:
    """Write the corpus as ``n_shards`` parquet files (resumable-input layout)."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_rows + n_shards - 1) // n_shards
    for s in range(n_shards):
        start = s * per
        count = min(per, n_rows - start)
        if count <= 0:
            break
        path = os.path.join(out_dir, f"pages_{s:04d}.parquet")
        pq.write_table(build_corpus_table(count, seed, start=start), path)
        paths.append(path)
    return paths


def build_media_table(n_rows: int, seed: int = 42) -> "pa.Table":
    """Deterministic multimodal corpus: one image (PNG, or baseline JPEG for
    every third row — 4:2:0 subsampled for every sixth) and one WAV clip per
    row (REAL encoded bytes via functions/codecs.py and functions/jpeg.py —
    the media analogue of build_corpus_table; no external data, reproducible
    bit-for-bit)."""
    from .functions.codecs import png_encode, wav_encode
    from .functions.jpeg import jpeg_encode

    ids, images, audios = [], [], []
    for i in range(n_rows):
        rng = np.random.RandomState(((seed << 16) ^ i) % (1 << 32))
        h = 8 + int(rng.randint(0, 40))
        w = 8 + int(rng.randint(0, 40))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        freq = 110.0 * (1 + int(rng.randint(0, 8)))
        n = 2000 + int(rng.randint(0, 2000))
        t = np.arange(n) / 8000.0
        pcm = 0.4 * np.sin(2 * np.pi * freq * t)
        ids.append(i)
        if i % 3 == 2:
            sub = "420" if i % 6 == 2 else "444"
            images.append(jpeg_encode(img, quality=90, subsampling=sub))
        else:
            images.append(png_encode(img))
        audios.append(wav_encode(pcm, 8000))
    return pa.Table.from_pydict({
        "media_id": pa.array(ids, pa.int64()),
        "image": pa.array(images, pa.binary()),
        "audio": pa.array(audios, pa.binary())})


def build_video_table(n_rows: int, seed: int = 42) -> "pa.Table":
    """Deterministic video corpus: one small MJPEG AVI per row (3-6 frames
    of 16x16 RGB, REAL container + JPEG bytes via functions/avi.py).
    Reproducible bit-for-bit; the video analogue of build_media_table."""
    from .functions.avi import avi_encode

    ids, videos = [], []
    for i in range(n_rows):
        rng = np.random.RandomState(((seed << 16) ^ 0x51DE0 ^ i) % (1 << 32))
        n_frames = 3 + int(rng.randint(0, 4))
        frames = [rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
                  for _ in range(n_frames)]
        ids.append(i)
        videos.append(avi_encode(frames, fps=4, quality=90))
    return pa.Table.from_pydict({
        "media_id": pa.array(ids, pa.int64()),
        "video": pa.array(videos, pa.binary())})
