"""WARC datasource: round-trip, header stripping, multi-file parallel read,
block bounding, and HTML-pipeline composition."""

import glob
import os

import pytest

SCRATCH = "/tmp/pdfextraction_ray_test_warc"


def _mk(path, n, start=0):
    from pdfextraction_ray.sources import write_warc_file
    recs = [(f"https://ex{start + i}.org/p", f"2021-03-0{i % 9 + 1}T00:00:00Z",
             f"<html><body>doc {start + i} &amp; text</body></html>".encode())
            for i in range(n)]
    write_warc_file(path, recs)
    return recs


@pytest.fixture(scope="module", autouse=True)
def scratch():
    os.makedirs(SCRATCH, exist_ok=True)
    yield
    for p in glob.glob(f"{SCRATCH}/*.warc"):
        os.remove(p)


def test_warc_roundtrip_strips_http(ray_session):
    from pdfextraction_ray.sources import read_warc

    path = f"{SCRATCH}/a.warc"
    recs = _mk(path, 7)
    t = read_warc(path).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(t) == 7  # warcinfo record excluded
    want = sorted(recs)
    assert list(t.url) == [r[0] for r in want]
    assert list(t.warc_ts) == [r[1] for r in want]
    assert [bytes(p) for p in t.payload] == [r[2] for r in want]


def test_warc_keep_http_headers(ray_session):
    from pdfextraction_ray.sources import read_warc

    path = f"{SCRATCH}/b.warc"
    _mk(path, 3)
    t = read_warc(path, strip_http_headers=False).to_pandas()
    assert all(bytes(p).startswith(b"HTTP/1.1 200 OK") for p in t.payload)


def test_warc_multi_file_and_block_bound(ray_session):
    from pdfextraction_ray.sources import read_warc

    paths = []
    for j in range(3):
        p = f"{SCRATCH}/m{j}.warc"
        _mk(p, 10, start=j * 10)
        paths.append(p)
    ds = read_warc(paths, rows_per_block=4)
    assert ds.count() == 30
    # rows_per_block bounds every block the reader EMITS (Ray may re-split
    # further downstream, so assert the upper bound and total coverage)
    sizes = [len(b["url"]) for b in ds.iter_batches(batch_size=None)]
    assert max(sizes) <= 4 and sum(sizes) == 30


def test_warc_feeds_html_pipeline(ray_session):
    """read_warc over realistic fixture pages -> the repo's HTML extractor
    yields byte-identical output to extracting the original HTML directly
    (i.e. WARC framing is lossless for the real pipeline input)."""
    from pdfextraction_ray.fixtures import make_page_row
    from pdfextraction_ray.html_extract import extract_main_content
    from pdfextraction_ray.sources import read_warc

    # i % 4 == 0 rows are word-payload pages, not HTML — skip those
    rows = [make_page_row(i) for i in range(1, 9) if i % 4]
    path = f"{SCRATCH}/pipe.warc"
    from pdfextraction_ray.sources import write_warc_file
    write_warc_file(path, [(r["url"], "2021-01-01T00:00:00Z", r["html"])
                           for r in rows])
    t = read_warc(path).to_pandas()
    by_url = {r["url"]: r["html"] for r in rows}
    assert set(t.url) == set(by_url)
    for url, payload in zip(t.url, t.payload):
        got = extract_main_content(bytes(payload).decode())
        want = extract_main_content(by_url[url].decode())
        assert got == want
        assert want["extracted_text"]  # fixture pages extract non-empty


def test_warc_rejects_garbage(ray_session):
    from pdfextraction_ray.sources import read_warc

    path = f"{SCRATCH}/bad.warc"
    with open(path, "wb") as f:
        f.write(b"not a warc at all\r\n")
    with pytest.raises(Exception):
        read_warc(path).materialize()


def test_warc_truncated_record_raises(tmp_path, ray_session):
    """A file cut mid-record fails loudly instead of emitting a silently
    truncated payload row."""
    import pytest

    from pdfextraction_ray.sources.warc import read_warc, write_warc_file

    p = tmp_path / "t.warc"
    write_warc_file(str(p), [("http://e.x/1", "2024-01-01T00:00:00Z",
                              b"<html>hello world</html>")])
    data = p.read_bytes()
    p.write_bytes(data[:len(data) - 12])  # cut inside the payload
    with pytest.raises(Exception) as ei:
        read_warc(str(p)).take_all()
    assert "truncated WARC record" in str(ei.value)
