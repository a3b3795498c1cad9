"""Per-document resource guards: oversized payloads and word counts are
captured as parse_ok=False rows (the reference's 16 MB upload cap,
config.py:13, as a streaming-safe row guard), never batch-fatal."""

import numpy as np
import pyarrow as pa

from pdfextraction_ray import geometry as G
from pdfextraction_ray.fixtures import CORPUS_SCHEMA
from pdfextraction_ray.payload import encode_html, encode_words
from pdfextraction_ray.stages.parse import DocumentParser


def _batch(payloads):
    n = len(payloads)
    return pa.Table.from_pydict({
        "url": [f"https://x.example/{i}" for i in range(n)],
        "warc_ts": np.zeros(n, dtype="datetime64[us]"),
        "html": payloads, "text": [""] * n, "lang": ["en"] * n},
        schema=CORPUS_SCHEMA)


def test_oversize_payload_captured():
    big = encode_html("<p>" + "x" * (17 * 1024 * 1024) + "</p>")
    ok = encode_html("<main><p>" + "body text " * 10 + "</p></main>")
    out = DocumentParser()(_batch([big, ok]))
    assert out.column("parse_ok").to_pylist() == [False, True]
    assert "16" in out.column("parse_error").to_pylist()[0]


def test_word_cap_captured():
    words = [G.derive_word("w", float(i % 500), float(i // 500), float(i % 500) + 5, float(i // 500) + 8)
             for i in range(1000)]
    parser = DocumentParser(max_words=500)
    out = parser(_batch([encode_words(words)]))
    assert out.column("parse_ok").to_pylist() == [False]
    assert "cap" in out.column("parse_error").to_pylist()[0]


def test_large_page_within_caps_parses():
    """A 1 MB HTML page and a 20k-word page parse within default caps."""
    import time
    html = ("<main>" + "".join(
        f"<p>{'paragraph body text with enough characters here ' * 5}{i}</p>"
        for i in range(2000)) + "</main>")
    t0 = time.time()
    out = DocumentParser()(_batch([encode_html(html)]))
    assert out.column("parse_ok").to_pylist() == [True]
    assert out.column("n_words").to_pylist()[0] > 10000
    assert time.time() - t0 < 5.0
    words = [G.derive_word(f"w{i}", float((i * 37) % 550), 10.0 + (i // 8) * 14.0,
                           float((i * 37) % 550) + 20, 18.0 + (i // 8) * 14.0)
             for i in range(20000)]
    t0 = time.time()
    out = DocumentParser()(_batch([encode_words(words)]))
    assert out.column("parse_ok").to_pylist() == [True]
    assert time.time() - t0 < 30.0
