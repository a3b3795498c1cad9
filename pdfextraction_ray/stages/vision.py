"""Deterministic vision-analogue page rendering + pixel-level layout
recovery (SURVEY §2.1 S7 / §2.3 A7; reference
services/vision_extractor.py:22-61 rasterizes pages at DPI 300 for a
second, image-based extraction opinion).

The reference's vision mode exists to cross-check the text-coordinate
pipeline against what the page LOOKS like. The deterministic engine keeps
that capability as a real pixel pipeline with no OCR stand-in:

  1. RENDER — each word paints a filled ink rectangle at its bbox into a
     grayscale raster (``scale`` px/pt; glyphs need fonts, but layout
     analysis only needs ink extents, which is also all the geometry
     pipeline consumes).
  2. ENCODE/DECODE — the raster round-trips through the REAL PNG codec
     (functions/codecs.py), so the stage exercises the byte path a stored
     page image would take.
  3. RECOVER — connected ink components (run-linking union over rows, the
     classic two-pass CC shape specialized to row runs) become word boxes
     in page coordinates again.
  4. SECOND OPINION — the SAME geometry pipeline (reading order, line
     grouping, proximity clustering, table-region detection) runs over the
     pixel-derived boxes; agreement with the word-coordinate path is the
     deterministic analogue of the reference's vision A/B. Strings don't
     survive rasterization (no OCR), so STRUCTURE — word/line/region
     counts and box geometry — is the comparable surface, stated rather
     than faked.

Ray-Data shape: an actor-pool ``map_batches`` stage (render state and the
geometry config warm in ``__init__``); images are per-row bounded (page
extent × scale²), so ``batch_size`` controls peak memory exactly like the
other media stages.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .. import geometry as G
from ..functions.codecs import png_decode, png_encode
from ..payload import KIND_WORDS, decode_words, payload_kind

RENDER_SCALE = 2.0   # px per pt
RENDER_MARGIN = 4    # px of white border
INK_THRESHOLD = 128  # < threshold = ink
MAX_RENDER_PX = 4096  # per axis; larger pages raise (bounded work per doc)


def render_words(words: list[dict[str, Any]], *, scale: float = RENDER_SCALE,
                 margin: int = RENDER_MARGIN) -> np.ndarray:
    """(H, W) uint8 grayscale page image: white background, one filled
    black rectangle per word bbox."""
    if not words:
        return np.full((margin * 2 + 1, margin * 2 + 1), 255, np.uint8)
    x0 = min(w["x0"] for w in words)
    y0 = min(w["y0"] for w in words)
    if x0 < 0 or y0 < 0:
        # numpy negative slice indices WRAP to the opposite edge — a
        # negative-coordinate word would silently paint the wrong corner
        raise ValueError(f"word bbox extends to ({x0}, {y0}): negative page "
                         "coordinates cannot be rendered")
    x1 = max(w["x1"] for w in words)
    y1 = max(w["y1"] for w in words)
    W = int(np.ceil(x1 * scale)) + 2 * margin
    H = int(np.ceil(y1 * scale)) + 2 * margin
    if W > MAX_RENDER_PX or H > MAX_RENDER_PX:
        raise ValueError(f"page renders to {W}x{H}px, over the "
                         f"{MAX_RENDER_PX}px per-axis cap")
    img = np.full((H, W), 255, np.uint8)
    for w in words:
        r0 = margin + int(np.floor(w["y0"] * scale))
        r1 = margin + int(np.ceil(w["y1"] * scale))
        c0 = margin + int(np.floor(w["x0"] * scale))
        c1 = margin + int(np.ceil(w["x1"] * scale))
        img[r0:r1, c0:c1] = 0
    return img


def recover_boxes(img: np.ndarray, *, scale: float = RENDER_SCALE,
                  margin: int = RENDER_MARGIN,
                  ink_threshold: int = INK_THRESHOLD) -> list[dict[str, Any]]:
    """Connected ink components -> word boxes in page (pt) coordinates.

    Row-run linking: each image row decomposes into dark runs (vectorized
    diff); each open component extends with the FIRST unmatched run it
    horizontally overlaps, otherwise a run opens a new component. For word
    ink — disjoint rectangles on line-gapped pages, one run per row per
    component — this equals 4-connected labeling. It is NOT general CC:
    vertically-touching horizontally-overlapping shapes (absent here)
    would need the full union-find merge step.
    """
    dark = img < ink_threshold
    open_boxes: list[list[int]] = []  # [c0, c1, r0, r_last] per component
    done: list[list[int]] = []
    # only rows containing ink do per-row work — pages are mostly blank
    # (the per-box `last row < r - 1` close check below is gap-size
    # agnostic, so skipping blank rows changes nothing semantically)
    ink_rows = np.flatnonzero(dark.any(axis=1))
    for r in ink_rows:
        r = int(r)
        row = dark[r]
        edges = np.flatnonzero(np.diff(np.concatenate(
            ([0], row.view(np.int8), [0]))))
        runs = edges.reshape(-1, 2)  # [start, end) column spans
        still_open: list[list[int]] = []
        matched = [False] * len(runs)
        for box in open_boxes:
            if box[3] < r - 1:  # a blank row closed it
                done.append(box)
                continue
            # word ink is a rectangle: one run per row per component, so
            # first-unmatched-overlap matching IS the CC union step here
            # (vertically-touching horizontally-overlapping rectangles —
            # absent from line-gapped pages — would need full union-find)
            for i in range(len(runs)):
                if matched[i]:
                    continue
                s, e = int(runs[i][0]), int(runs[i][1])
                if s < box[1] and e > box[0]:  # overlap
                    box[0] = min(box[0], s)
                    box[1] = max(box[1], e)
                    box[3] = r
                    matched[i] = True
                    break
            still_open.append(box)
        for i in range(len(runs)):
            if not matched[i]:
                still_open.append([int(runs[i][0]), int(runs[i][1]), r, r])
        open_boxes = still_open
    done.extend(open_boxes)
    boxes = []
    for c0, c1, r0, r1 in done:
        x0 = (c0 - margin) / scale
        x1 = (c1 - margin) / scale
        y0 = (r0 - margin) / scale
        y1 = (r1 + 1 - margin) / scale
        boxes.append(G.derive_word("w", x0, y0, x1, y1))
    boxes.sort(key=lambda w: (w["y0"], w["x0"]))
    return boxes


def region_grid_shapes(regions: list[dict[str, Any]]) -> str:
    """Table GRID shapes per detected region, serialized "RxC;RxC;..." in
    region order: R = the region's own grouped lines (identify_table_regions
    stores them on the descriptor), C = the widest line's word count.
    Comparing the word-path and pixel-path strings checks that
    rasterization preserved not just how many table regions exist but
    their row/column structure — a much stronger A/B than region counts
    alone. Reads the region's stored ``lines`` rather than re-filtering
    page words (re-derivation both duplicated the detector's work and,
    in the first version, silently measured the whole page per region)."""
    shapes = []
    for reg in regions:
        lines = reg["lines"]
        ncols = max((len(ln) for ln in lines), default=0)
        shapes.append(f"{len(lines)}x{ncols}")
    return ";".join(shapes)


OUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("page_png_bytes", pa.int64()),
    ("n_words", pa.int64()),
    ("vision_n_words", pa.int64()),
    ("n_lines", pa.int64()),
    ("vision_n_lines", pa.int64()),
    ("n_regions", pa.int64()),
    ("vision_n_regions", pa.int64()),
    ("grid_shapes", pa.string()),
    ("vision_grid_shapes", pa.string()),
    ("layout_agree", pa.bool_()),
    ("grid_agree", pa.bool_()),
])


class VisionLayoutStage:
    """Actor-pool stage: word-payload rows gain a pixel-derived second
    opinion on layout; non-word payloads pass through with null metrics
    dropped (the stage filters to KIND_WORDS rows)."""

    def __init__(self, scale: float = RENDER_SCALE,
                 margin: int = RENDER_MARGIN):
        self.scale = scale
        self.margin = margin

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {n: [] for n in OUT_SCHEMA.names}
        urls = batch.column("url")
        payloads = batch.column("html")
        for i in range(batch.num_rows):
            payload = payloads[i].as_py()
            if not payload or payload_kind(payload) != KIND_WORDS:
                continue
            words = decode_words(payload)
            img = render_words(words, scale=self.scale, margin=self.margin)
            png = png_encode(img)  # grayscale: a page render has one channel
            decoded = png_decode(png)
            gray = decoded[:, :, 0] if decoded.ndim == 3 else decoded
            vwords = recover_boxes(gray, scale=self.scale,
                                   margin=self.margin)
            lines = G.group_words_into_lines(words)
            vlines = G.group_words_into_lines(vwords)
            regions = G.identify_table_regions(words, lines)
            vregions = G.identify_table_regions(vwords, vlines)
            grid = region_grid_shapes(regions)
            vgrid = region_grid_shapes(vregions)
            out["url"].append(urls[i].as_py())
            out["page_png_bytes"].append(len(png))
            out["n_words"].append(len(words))
            out["vision_n_words"].append(len(vwords))
            out["n_lines"].append(len(lines))
            out["vision_n_lines"].append(len(vlines))
            out["n_regions"].append(len(regions))
            out["vision_n_regions"].append(len(vregions))
            out["grid_shapes"].append(grid)
            out["vision_grid_shapes"].append(vgrid)
            out["layout_agree"].append(
                len(words) == len(vwords) and len(lines) == len(vlines)
                and len(regions) == len(vregions))
            out["grid_agree"].append(grid == vgrid)
        arrays = [pa.array(out[n], OUT_SCHEMA.field(n).type)
                  for n in OUT_SCHEMA.names]
        return pa.Table.from_arrays(arrays, schema=OUT_SCHEMA)
