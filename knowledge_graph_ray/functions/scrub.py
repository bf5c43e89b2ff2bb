"""PII scrubbing — regex redaction over a text column.

A training-data governance stage the reference lacks (its corpus is
parliamentary records): emails, IPv4 addresses and phone numbers are
replaced with typed placeholder tokens before text ships to training.

Engine notes: the kernels run on ``pyarrow.compute``'s
``replace_substring_regex`` / ``count_substring_regex``, which are
RE2 — the SAME regex engine DuckDB uses — so the SQL twin can apply
the literal same pattern strings with ``regexp_replace(..., 'g')``
and match byte-for-byte (Python's ``re`` is NOT used anywhere on
this path; its Unicode classes diverge from RE2, the langid-oracle
lesson). Zero-copy Arrow in/out, no Python per-row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# order matters: emails contain dots and digits, so redact them before
# the looser IP / phone patterns can bite into them
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{2} \d{2} \d{2} \d{2} \d{2}\b", "<PHONE>"),
]


def scrub_pii(
    col: pa.ChunkedArray | pa.Array,
) -> tuple[pa.ChunkedArray | pa.Array, pa.ChunkedArray | pa.Array]:
    """(scrubbed text, total match count) for one string column."""
    n_pii = None
    for pat, _ in PII_PATTERNS:
        c = pc.count_substring_regex(col, pattern=pat)
        n_pii = c if n_pii is None else pc.add(n_pii, c)
    out = col
    for pat, repl in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out, pc.cast(n_pii, pa.int64())


def scrub_pii_batch(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "text_clean"
) -> pa.Table:
    """map_batches kernel: adds ``out_col`` and ``n_pii`` columns."""
    cleaned, n = scrub_pii(batch.column(text_col))
    return batch.append_column(out_col, cleaned).append_column("n_pii", n)
