"""Skew handling for host/domain-heavy web corpora (SURVEY §4, north_rule
"groupby-on-domain salted shuffle").

A Zipf-skewed corpus puts a large fraction of rows on a few hosts; a bare
``groupby(domain)`` sends every hot-domain row to one reducer. The salted
two-stage aggregate bounds any single reducer's load:

  1. ``domain_salt = md5(domain) ^ (md5(url) % n_salts)`` — hot domains split
     into ``n_salts`` sub-keys (stable hashes, never Python ``hash()``)
  2. partial aggregate per (domain, salt)   <- the big shuffle, skew-free
  3. final aggregate per domain over <= n_salts tiny partials
"""

from __future__ import annotations

import hashlib
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def domain_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def _stable_hash(s: str) -> int:
    """Scalar stable hash (md5 prefix) — kept for callers hashing single
    keys; the batch salting path below uses the vectorized siphash."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _vec_hash(arr: pa.ChunkedArray) -> "Any":
    """Vectorized stable string hash — delegates to the ONE shared key hash
    (functions/joins.key_hash_u64: pandas siphash with categorize=False).
    This copy previously omitted categorize=False, silently keeping the
    NUL-byte mis-hash the other two hash sites were patched for; one
    helper, no drift. The salted aggregate itself is invariant to the
    exact salt values — only determinism matters."""
    from ..functions.joins import key_hash_u64
    return key_hash_u64(arr)


def add_domain_and_salt(batch: pa.Table, n_salts: int = 16,
                        url_col: str = "url") -> pa.Table:
    """Fully vectorized (VERDICT r2 #3 — this map runs over EVERY row of the
    biggest corpora): Arrow regex kernels for the domain (same semantics as
    ``domain_of``: text after the first '://', up to the first '/'), numpy
    siphash for the salt. No per-row Python."""
    import numpy as np
    urls = batch.column(url_col)
    dom = pc.replace_substring_regex(urls, r"^.*?://", "", max_replacements=1)
    dom = pc.replace_substring_regex(dom, r"(?s)/.*$", "", max_replacements=1)
    d_h = _vec_hash(dom)
    u_h = _vec_hash(urls)
    salts = ((d_h ^ (u_h % np.uint64(max(1, n_salts))))
             & np.uint64(0x7FFFFFFF)).astype(np.int64)
    batch = batch.append_column("domain", dom)
    return batch.append_column("domain_salt", pa.array(salts, pa.int64()))


def domain_histogram(ds: "Any", *, n_salts: int = 16,
                     bytes_col: str = "bytes_out") -> "Any":
    """Per-domain doc counts and byte totals via the salted two-stage
    aggregate. Returns a small Dataset (one row per domain)."""
    narrow = ds.map_batches(
        lambda t: add_domain_and_salt(t, n_salts).select(
            ["domain", "domain_salt", bytes_col]),
        batch_format="pyarrow")
    from ..functions.joins import hash_groupby_multi, hash_groupby_table
    partial = hash_groupby_table(
        narrow, ["domain", "domain_salt"], [(bytes_col, "sum")],
        count_col="n_docs") \
        .map_batches(lambda t: t.rename_columns(
            ["domain", "domain_salt", "total_bytes", "n_docs"]),
            batch_format="pyarrow")
    return hash_groupby_multi(partial, "domain",
                              [("n_docs", "sum"), ("total_bytes", "sum")])
