"""Deep differential fuzz: N random word pages through our engine vs the
reference implementation, byte-compare extracted_text and table rows.

Run: ``python tools/fuzz_parity.py [N]`` (default 2000). Exit 0 = full parity.
Heavier than the pytest parity suite; used ad-hoc for confidence sweeps.
"""

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

from pdfextraction_ray import extract as X  # noqa: E402
from pdfextraction_ray import geometry as G  # noqa: E402
from pdfextraction_ray import table_extract as T  # noqa: E402
from pdfextraction_ray.fixtures import gen_word_page  # noqa: E402

from services.spatial_preprocessor import SpatialPreprocessor  # noqa: E402
from services.coordinate_table_extractor import CoordinateTableExtractor  # noqa: E402

FIELDY = ["Employee", "Name", "Status", "Hire", "Date", "Dept", "Code", "Rate",
          "Salary", "Phone", "Address", "Supervisor", "Title", "Group", "No"]
VALUEY = ["A", "M", "42", "19.00", "12/31/2024", "555-123-4567", "123-45-6789",
          "$100", "15%", "S-0", "0.00/14.11/0.00/0.00", "alpha", "CAROLINE",
          "", " ", "x"*30, "Ab", "aB", "#", ":", "1/2/2024extra"]


def chaotic_page(rng: random.Random) -> list:
    """Adversarial layout: random coords, duplicate positions, overlaps,
    negative gaps, extreme y values."""
    words = []
    for _ in range(rng.randrange(0, 60)):
        text = rng.choice(FIELDY + VALUEY)
        if not text.strip():
            continue
        x = rng.choice([rng.uniform(0, 600), rng.choice([10.0, 100.0, 100.0])])
        y = rng.choice([rng.uniform(0, 790), rng.choice([50.0, 50.0, 52.0, 55.1])])
        w = rng.choice([2.0, 20.0, 80.0])
        words.append(G.derive_word(text, x, y, x + w, y + rng.choice([8.0, 10.0, 12.0])))
    return words


def main(n: int) -> int:
    ref = SpatialPreprocessor()
    t0 = time.time()
    for i in range(n):
        rng = random.Random(1_000_000 + i)
        words = (gen_word_page(rng, rng.randrange(0, 14), rng.randrange(0, 5))
                 if i % 2 == 0 else chaotic_page(rng))
        ours_text = G.preprocess_document(words)
        ref_text = ref.preprocess_document(words)
        if ours_text != ref_text:
            print(f"TEXT MISMATCH at case {i}")
            return 1
        page = X.parse_word_page(words)
        if page["extracted_text"] != ref_text:
            print(f"ONE-PASS TEXT MISMATCH at case {i}")
            return 1
        regions = ref.identify_table_regions(words)
        ordered = sorted(words, key=lambda w: (w["y0"], w["x0"]))
        for r in regions:
            region = {"y_min": r["bbox"][1], "y_max": r["bbox"][3]}
            ours_rows = T.extract_table_data(ordered, list(r["headers"]), region)
            ref_rows = CoordinateTableExtractor(ordered).extract_table_data(
                list(r["headers"]), region)
            if ours_rows != ref_rows:
                print(f"TABLE MISMATCH at case {i}")
                return 1
    print(f"PARITY OK: {n} pages in {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000))
