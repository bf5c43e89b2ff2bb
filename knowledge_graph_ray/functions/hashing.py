"""Stable, vectorized 64-bit hashing used for every shuffle key.

All dedup / canonicalization shuffles key on a deterministic 64-bit
hash of a normalized string (SURVEY.md §2.7 D1/D4; north rule
``groupby(surface_hash)``). Requirements: stable across processes and
runs (no PYTHONHASHSEED dependence), vectorized over Arrow string
arrays, cheap.

We use ``pandas.util.hash_array`` (SipHash-1-3 with a fixed key),
which is deterministic, C-implemented, and operates on whole arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Fixed SipHash key — pandas' documented default, pinned here so a
# pandas default change can never silently re-key our shuffles.
_HASH_KEY = "0123456789123456"


def hash64_array(values: pa.Array | pa.ChunkedArray | np.ndarray | list) -> np.ndarray:
    """Vectorized stable uint64 hash of a string column."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash64(value: str) -> int:
    """Scalar stable uint64 hash (same function as hash64_array)."""
    return int(hash64_array([value])[0])


# Per-process DuckDB connection for the vectorized md5 kernel.
# threads=1: workers must not spawn their own thread pools (Ray owns
# the CPUs); preserve_insertion_order pinned so a plain projection
# returns rows in input order (DuckDB's default, pinned anyway).
_MD5_CON = None
_MD5_FAST_MIN = 64  # below this the Python loop wins (setup cost)


def _md5_con():
    global _MD5_CON
    if _MD5_CON is None:
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads=1")
        con.execute("SET preserve_insertion_order=true")
        _MD5_CON = con
    return _MD5_CON


def md5_hash64_array(values: pa.Array | pa.ChunkedArray | list) -> np.ndarray:
    """uint64 md5-derived hash of each string — the SQL-TWINNABLE hash
    family: equals DuckDB's ``md5_number_lower(s)`` (last 8 digest
    bytes, little-endian; verified against DuckDB 1.0). Used for every
    content hash whose value surfaces in oracle-checked output
    (minhash shingles, simhash tokens, fingerprints). Shuffle-key-only
    hashes stay on the faster vectorized SipHash (``hash64_array``).

    Large batches route through DuckDB's own ``md5_number_lower``
    kernel (vectorized C++, measured ~5x the hashlib loop and
    bit-identical by construction — it IS the twin function); tiny
    inputs and any DuckDB failure fall back to the hashlib loop,
    which remains the semantic definition."""
    n = len(values)
    if n >= _MD5_FAST_MIN:
        try:
            if isinstance(values, (pa.Array, pa.ChunkedArray)):
                arr = pc.cast(values, pa.large_string())
            else:
                arr = pa.array(values, pa.large_string())
            tbl = pa.table({"s": arr})
            out = (
                _md5_con()
                .execute("SELECT md5_number_lower(s) AS h FROM tbl")
                .arrow()
                .column("h")
                .to_numpy()
                .astype(np.uint64)
            )
            if len(out) == n:
                return out
        except Exception:
            pass  # fall through to the reference loop
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = np.empty(n, dtype=np.uint64)
    md5 = hashlib.md5
    for i, v in enumerate(values):
        out[i] = int.from_bytes(md5(v.encode("utf-8")).digest()[8:], "little")
    return out


def md5_hex_array(values: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    """Full 128-bit md5 hex digest per string (== DuckDB ``md5(s)``,
    == ``hashlib.md5(v.encode()).hexdigest()``) — the exact-dedup
    ``text_key`` family. Same DuckDB fast path / hashlib fallback
    structure as ``md5_hash64_array``; returns an Arrow string array."""
    n = len(values)
    if n >= _MD5_FAST_MIN:
        try:
            if isinstance(values, (pa.Array, pa.ChunkedArray)):
                arr = pc.cast(values, pa.large_string())
            else:
                arr = pa.array(values, pa.large_string())
            tbl = pa.table({"s": arr})
            out = (
                _md5_con()
                .execute("SELECT md5(s) AS h FROM tbl")
                .arrow()
                .column("h")
            )
            if len(out) == n:
                return pc.cast(out.combine_chunks(), pa.string())
        except Exception:
            pass
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    md5 = hashlib.md5
    return pa.array(
        [md5(v.encode("utf-8", "replace")).hexdigest() for v in values],
        pa.string(),
    )


def stable_digest(value: bytes | str) -> int:
    """md5-based stable 64-bit digest — used where a second independent
    hash family is needed (e.g. salting, minhash seeds)."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    return int.from_bytes(hashlib.md5(value).digest()[:8], "little")


def combine_hashes(*cols: np.ndarray) -> np.ndarray:
    """Combine several uint64 hash columns into one (order-sensitive),
    e.g. hash(subj,pred,obj) for triple dedup (SURVEY.md D1)."""
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio mix
    for c in cols:
        out = (out * mult) ^ c.astype(np.uint64)
    return out
