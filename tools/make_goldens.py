"""Generate the committed golden files.

- Word-payload goldens: expected ``extracted_text`` (and table rows) produced
  by RUNNING the reference implementation (/root/reference, read-only) over
  our deterministic synthetic fixtures — this pins the byte-identity contract
  to the reference itself, per the north rule. The goldens are data, not code.
- HTML goldens: frozen snapshots of our own extractor's contract (the
  reference has no HTML path; FIXTURES.md F2 defines golden-file comparison).

Run: ``python tools/make_goldens.py`` (idempotent; rewrites tests/goldens/).
"""

import json
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

from pdfextraction_ray import geometry as G  # noqa: E402
from pdfextraction_ray.fixtures import (  # noqa: E402
    flagship_word_page, gen_html_page, gen_word_page)
from pdfextraction_ray.html_extract import extract_main_content  # noqa: E402

from services.spatial_preprocessor import SpatialPreprocessor  # noqa: E402
from services.coordinate_table_extractor import CoordinateTableExtractor  # noqa: E402

OUT = os.path.join(REPO, "tests", "goldens")


def word_page_cases():
    cases = {}
    # flagship conformance page
    cases["flagship_43"] = flagship_word_page(43)
    for seed in range(20):
        rng = random.Random(9000 + seed)
        cases[f"page_{seed}"] = gen_word_page(
            rng, n_field_lines=rng.randrange(2, 12), n_tables=rng.randrange(0, 4))
    # edge cases (FIXTURES.md F3)
    cases["empty"] = []
    cases["single_word"] = [G.derive_word("Name", 10, 10, 40, 20)]
    cases["identical_coords"] = [G.derive_word("A", 10, 10, 16, 20),
                                 G.derive_word("B", 10, 10, 16, 20)]
    return cases


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    ref = SpatialPreprocessor()

    words_golden = {}
    for key, words in word_page_cases().items():
        expected_text = ref.preprocess_document(words)
        regions = ref.identify_table_regions(words)
        ordered = sorted(words, key=lambda w: (w["y0"], w["x0"]))
        tables = []
        for r in regions:
            extractor = CoordinateTableExtractor(ordered)
            rows = extractor.extract_table_data(
                list(r["headers"]), {"y_min": r["bbox"][1], "y_max": r["bbox"][3]})
            tables.append({"headers": list(r["headers"]), "rows": rows})
        words_golden[key] = {
            "words": [{k: w[k] for k in ("text", "x0", "y0", "x1", "y1")}
                      for w in words],
            "extracted_text": expected_text,
            "tables": tables,
        }
    with open(os.path.join(OUT, "words_golden.json"), "w") as f:
        json.dump(words_golden, f, indent=1, sort_keys=True)

    html_golden = {}
    for seed in range(12):
        rng = random.Random(5000 + seed)
        html = gen_html_page(rng, n_paragraphs=rng.randrange(2, 8),
                             with_table=seed % 3 == 0)
        res = extract_main_content(html)
        html_golden[f"html_{seed}"] = {
            "html": html,
            "extracted_text": res["extracted_text"],
            "spans": res["spans"],
            "tables": res["tables"],
        }
    # hand-written edge cases
    edge = {
        "edge_empty": "",
        "edge_no_body": "<html><head><title>t</title></head></html>",
        "edge_all_boilerplate": "<nav><a href='/'>home</a></nav><footer>foot</footer>",
        "edge_linkfarm": "<main><p>" + " ".join(
            f"<a href='/{i}'>link number {i} with text</a>" for i in range(20)) + "</p></main>",
        "edge_nested_table": ("<article><p>A real paragraph with more than twenty five "
                              "characters of body text.</p><table><caption>Rates</caption>"
                              "<tr><th>A</th><th>B</th></tr><tr><td>1</td></tr>"
                              "<tr><td>2</td><td>3</td><td>4</td></tr></table></article>"),
        "edge_malformed": "<p>unclosed paragraph with plenty of characters to keep <div>and a stray div",
    }
    for key, html in edge.items():
        res = extract_main_content(html)
        html_golden[key] = {"html": html, "extracted_text": res["extracted_text"],
                            "spans": res["spans"], "tables": res["tables"]}
    with open(os.path.join(OUT, "html_golden.json"), "w") as f:
        json.dump(html_golden, f, indent=1, sort_keys=True)

    print(f"wrote {len(words_golden)} word goldens, {len(html_golden)} html goldens -> {OUT}")


if __name__ == "__main__":
    main()
