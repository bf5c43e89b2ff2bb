"""Text analysis operators for training-data pipelines (first-class
engine components alongside SURVEY.md §2): language-ID, quality
scoring, token counting, document fingerprinting.

All pure, vectorizable ``map_batches`` kernels over Arrow batches.
Reference analogs: token/length EDA (paragraphs_eda.ipynb, A4),
tiktoken budget counting (extract_qa.py:9-17, T9).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from knowledge_graph_ray.functions.hashing import md5_hash64_array

_TOKEN_RE = re.compile(r"\w+")
_WORD_SPLIT = re.compile(r"\s+")
# BPE-ish pre-tokenizer (GPT-2-style contractions + word/number/punct runs)
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?\w+| ?[^\s\w]+|\s+(?!\S)")

# Marker stopwords per language (n-gram heuristic lexicon).
LANG_MARKERS: dict[str, frozenset[str]] = {
    "da": frozenset(
        "og ikke det er en at på af som den for med til har blev om sagen".split()
    ),
    "en": frozenset(
        "the and of to a in is was that it for on with as has no so far".split()
    ),
    "de": frozenset(
        "und der die das nicht ein eine in ist wurde den von mit noch hat".split()
    ),
    "es": frozenset("el la los las de que en un una es por con para no se".split()),
}


def tokens_of(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


# ----------------------------------------------------------- language id

def detect_language(text: str, min_margin: float = 0.0) -> str:
    """Marker-word voting: the language whose stopword lexicon covers
    the most tokens wins (deterministic tie-break: language name).
    Returns 'und' (undetermined) when nothing matches."""
    toks = tokens_of(text)
    if not toks:
        return "und"
    scores = {
        lang: sum(1 for t in toks if t in markers) / len(toks)
        for lang, markers in LANG_MARKERS.items()
    }
    best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    if best[0][1] <= min_margin:
        return "und"
    return best[0][0]


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    langs = [detect_language(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("lang_pred", pa.array(langs, pa.string()))


# -------------------------------------------------------------- quality

def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics per row (all int64/float64 columns):
    n_chars_q, n_words, n_unique_words, max_word_repeat_ratio,
    mean_word_len, alpha_ratio. Vectorized where Arrow kernels exist."""
    texts = batch.column(text_col)
    n_chars = pc.utf8_length(texts).cast(pa.int64())
    py = texts.to_pylist()
    n_words, n_unique, rep_ratio, mean_len, alpha_ratio = [], [], [], [], []
    for t in py:
        words = _WORD_SPLIT.split(t.strip()) if t and t.strip() else []
        n = len(words)
        n_words.append(n)
        if n == 0:
            n_unique.append(0)
            rep_ratio.append(0.0)
            mean_len.append(0.0)
            alpha_ratio.append(0.0)
            continue
        uniq: dict[str, int] = {}
        for w in words:
            uniq[w] = uniq.get(w, 0) + 1
        n_unique.append(len(uniq))
        rep_ratio.append(max(uniq.values()) / n)
        mean_len.append(sum(len(w) for w in words) / n)
        alpha = sum(1 for c in t if c.isalpha())
        alpha_ratio.append(alpha / max(len(t), 1))
    out = batch.append_column("n_chars_q", n_chars)
    out = out.append_column("n_words", pa.array(n_words, pa.int64()))
    out = out.append_column("n_unique_words", pa.array(n_unique, pa.int64()))
    out = out.append_column("max_word_repeat_ratio", pa.array(rep_ratio, pa.float64()))
    out = out.append_column("mean_word_len", pa.array(mean_len, pa.float64()))
    out = out.append_column("alpha_ratio", pa.array(alpha_ratio, pa.float64()))
    return out


def compression_ratio_batch(
    batch: pa.Table, text_col: str = "text", level: int = 6
) -> pa.Table:
    """zlib compression ratio per document (compressed/raw bytes) —
    the classic webtext quality/repetition signal (C4/Gopher family:
    boilerplate and template spam compress far below prose; raw
    binary/noise sits near 1.0). Non-SQL by nature (DuckDB has no
    deflate), so the coverage gate is the property suite in
    tests/test_knn_textstats (repetition monotonicity, bounds,
    determinism). Empty docs get ratio 1.0 (no evidence = neutral,
    never div-by-zero)."""
    import zlib

    ratios = []
    for t in batch.column(text_col).to_pylist():
        raw = (t or "").encode("utf-8", "replace")
        if not raw:
            ratios.append(1.0)
            continue
        ratios.append(len(zlib.compress(raw, level)) / len(raw))
    return batch.append_column(
        "compression_ratio", pa.array(ratios, pa.float64())
    )


# --------------------------------------------------------- token counts

def count_ws_tokens(text: str) -> int:
    t = (text or "").strip()
    return len(_WORD_SPLIT.split(t)) if t else 0


def count_bpe_tokens(text: str) -> int:
    """Deterministic BPE-ish token count (tiktoken stand-in, T9)."""
    return len(_BPE_RE.findall(text or ""))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    ws = [count_ws_tokens(t) for t in texts]
    bpe = [count_bpe_tokens(t) for t in texts]
    out = batch.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
    return out.append_column("n_tokens_bpe", pa.array(bpe, pa.int64()))


# --------------------------------------------------------- fingerprint

def rolling_fingerprint(text: str, window: int = 8, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: rolling hash over token
    windows, keep the ``keep`` smallest hashes (order-insensitive,
    robust to local edits). md5 hash family — SQL-twinnable via
    DuckDB ``md5_number_lower`` (see functions.hashing)."""
    toks = tokens_of(text)
    if not toks:
        return []
    if len(toks) < window:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)]
    h = np.unique(md5_hash64_array(grams))
    return [int(x) for x in h[:keep]]


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8, keep: int = 4
) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    fps = [rolling_fingerprint(t, window, keep) for t in texts]
    # also a single combined 64-bit fingerprint for equality checks
    combined = [int(np.bitwise_xor.reduce(np.array(f, dtype=np.uint64))) if f else 0 for f in fps]
    out = batch.append_column(
        "fingerprint", pa.array([[x for x in f] for f in fps], pa.list_(pa.uint64()))
    )
    return out.append_column(
        "fingerprint64", pa.array(np.array(combined, dtype=np.uint64).view(np.int64))
    )


# ------------------------------------------- corpus-level token stats

def token_df_partial(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-block PARTIAL document-frequency counts: (token, df_part).

    Each document is one row, so per-block ``drop_duplicates`` of the
    exploded (doc, token) pairs yields globally-distinct pairs — the
    partials sum exactly across blocks. This is the combiner half of
    the classic inverted-index / IDF build: the all-to-all that
    follows shuffles only (token, int) partials, never document text."""
    import pandas as pd

    s = df[text_col].fillna("").str.strip()
    toks = s[s != ""].str.split(r"\s+", regex=True)
    ex = pd.DataFrame(
        {id_col: df.loc[toks.index, id_col].to_numpy(), "token": toks.to_numpy()}
    ).explode("token")
    ex = ex.drop_duplicates()
    return ex.groupby("token", as_index=False, sort=False).agg(df=(id_col, "size"))


def repetition_batch(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition signals per document (exact ints, no
    float-hash risk): ``top_token_n`` = multiplicity of the most
    frequent token, ``dup_token_n`` = n_tokens - n_distinct_tokens.
    Vectorized explode + groupby; each doc is one row so the kernel
    is exact per block."""
    import pandas as pd

    s = df[text_col].fillna("").str.strip()
    toks = s.str.split(r"\s+", regex=True)
    toks = toks.where(s != "", other=pd.Series([[] for _ in range(len(s))], index=s.index))
    ex = pd.DataFrame(
        {id_col: df[id_col].to_numpy(), "token": toks.to_numpy()}
    ).explode("token")
    ex = ex.dropna(subset=["token"])
    per = ex.groupby([id_col, "token"], sort=False).size().rename("c").reset_index()
    g = per.groupby(id_col, sort=False)["c"]
    stats = pd.DataFrame(
        {"top_token_n": g.max(), "dup_token_n": g.sum() - g.size()}
    ).reset_index()
    out = df[[id_col]].merge(stats, on=id_col, how="left")
    out["top_token_n"] = out["top_token_n"].fillna(0).astype("int64")
    out["dup_token_n"] = out["dup_token_n"].fillna(0).astype("int64")
    return out


def pack_sequences(
    docs,
    *,
    budget: int = 2048,
    num_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Sequence packing for pretraining (the GPT-style preprocessing
    step M9's QA-chunk packer doesn't cover): greedily pack documents
    into ≤``budget``-token training sequences. Packing is inherently
    order-dependent, so the distributed contract is explicit: docs are
    hash-bucketed on id (ONE int-key shuffle), each bucket packs its
    docs in ascending-id order — deterministic, re-shard-stable, and
    each bucket's packing is independent (sequence ids are a 64-bit
    hash mix of the bucket's min doc id and the sequence index — the
    bucket NUMBER itself is deliberately not encoded, see the in-body
    note). Oversized docs (> budget
    alone) are quarantined as single-doc sequences with
    ``oversize=True``, never silently truncated.

    Returns rows (seq_id, doc_ids list<int64>, n_docs, n_tokens,
    oversize). Laws (property-tested): every input doc appears in
    exactly one sequence; no non-oversize sequence exceeds budget."""
    import pandas as pd

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    def with_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, text_col]].copy()
        df["n_tok"] = df[text_col].map(count_ws_tokens)
        return df[[id_col, "n_tok"]]

    counts = docs.map_batches(with_counts, batch_format="pandas", batch_size=None)

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from knowledge_graph_ray.functions.hashing import (
            combine_hashes,
            hash64_array,
        )

        import numpy as np

        df = df.sort_values(id_col)
        # hash_bucket_agg drops its _bucket column before combine runs,
        # and uint64 % python-int silently promotes to float64 (mangled
        # modulo) — so don't reconstruct the bucket number at all:
        # seq ids are a 64-bit mix of (hash of the bucket's min id,
        # sequence index), unique across buckets because a doc lives in
        # exactly one bucket
        base = hash64_array(df[id_col].to_numpy()[:1]).astype(np.uint64)
        cur, cur_tok = [], 0
        out = {"seq_id": [], "doc_ids": [], "n_docs": [], "n_tokens": [], "oversize": []}

        def flush(ids, tok, oversize):
            idx = np.array([len(out["seq_id"])], dtype=np.uint64)
            out["seq_id"].append(
                int(combine_hashes(base, idx)[0].astype(np.int64))
            )
            out["doc_ids"].append(list(ids))
            out["n_docs"].append(len(ids))
            out["n_tokens"].append(int(tok))
            out["oversize"].append(bool(oversize))

        for did, tok in zip(df[id_col].to_numpy(), df["n_tok"].to_numpy()):
            if tok > budget:
                flush([did], tok, True)
                continue
            if cur and cur_tok + tok > budget:
                flush(cur, cur_tok, False)
                cur, cur_tok = [], 0
            cur.append(did)
            cur_tok += tok
        if cur:
            flush(cur, cur_tok, False)
        return pd.DataFrame(out)

    return hash_bucket_agg(counts, [id_col], pack_bucket, num_buckets=num_buckets)
