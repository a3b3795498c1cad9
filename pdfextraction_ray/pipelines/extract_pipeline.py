"""The flagship extraction pipeline: read -> parse (actor pool) -> envelope.

Streaming end-to-end: the ``html`` binary column exists only between the read
and the parse stage; everything downstream is the narrow envelope. Callers
consume with ``write_parquet`` / ``iter_batches`` / aggregates — never
``take_all`` on the full corpus.

``ray.init`` is owned by the caller (driver contract).
"""

from __future__ import annotations

from typing import Optional, Union

import ray.data

from ..stages.parse import DocumentParser, parse_batch_task

DEFAULT_BATCH_SIZE = 512


def parse_pages(ds: "ray.data.Dataset", *,
                batch_size: int = DEFAULT_BATCH_SIZE,
                concurrency: Optional[Union[int, tuple[int, int]]] = None,
                min_text_chars: int = 25,
                config_overrides=None,
                preprocessing_mode: str = "spatial") -> "ray.data.Dataset":
    """Apply the document parser to a pages Dataset.

    Two physical forms (same semantics):
    - default (``concurrency=None`` and default config): stateless TASKS with
      a per-worker cached parser — elastic, no pool spin-up, best measured
      throughput; parser state here is cheap (compiled regexes)
    - explicit ``concurrency`` or non-default config: a DocumentParser ACTOR
      POOL — the form for heavyweight warmed state (models, big tries) or
      per-stage resource isolation

    ``config_overrides``: per-domain parser parameters (A8 feedback loop) —
    a ``stages.overrides.ParserConfigOverrides`` or a plain
    ``{domain: {param: value}}`` dict, resolved per row inside the actors.

    ``batch_size`` bounds batch x payload in the worker heap; 512 is sized
    for ~KB-scale payloads — drop it for corpora with MB-scale pages.
    """
    if (concurrency is None and min_text_chars == 25
            and config_overrides is None and preprocessing_mode == "spatial"):
        return ds.map_batches(parse_batch_task, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    if concurrency is None:
        try:
            import ray
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            ncpu = 8
        concurrency = (1, max(2, ncpu - 2))
    return ds.map_batches(
        DocumentParser,
        fn_constructor_kwargs={"min_text_chars": min_text_chars,
                               "config_overrides": config_overrides,
                               "preprocessing_mode": preprocessing_mode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def read_pages(paths: Union[str, list[str]], *, columns: Optional[list[str]] = None,
               lang: Optional[str] = None,
               override_num_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """Read a pages corpus. All five envelope input columns are needed by the
    parse stage, so no column pruning by default; pass ``columns`` for partial
    runs. ``lang`` pushes a row filter into the parquet read (row-group
    pruning — filtered rows never leave storage)."""
    import pyarrow.compute as pc

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if lang is not None:
        kwargs["filter"] = pc.field("lang") == lang
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def extract_pipeline(paths: Union[str, list[str]], *,
                     batch_size: int = DEFAULT_BATCH_SIZE,
                     concurrency: Optional[Union[int, tuple[int, int]]] = None,
                     lang: Optional[str] = None,
                     ) -> "ray.data.Dataset":
    """read_parquet (optional pushed-down lang filter) -> parse. Lazy."""
    return parse_pages(read_pages(paths, lang=lang), batch_size=batch_size,
                       concurrency=concurrency)
