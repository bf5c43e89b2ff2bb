"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the canonical input table from BASELINE.json input_hint:
``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` plus the side tables the KG pipeline needs
(``entities``, ``aliases``) and the golden outputs the conformance
tests compare against (``mentions``, ``triples``).

Design properties:
- seed-stable: page i depends only on (seed, i) — scaling the corpus
  up is a strict superset (prefix property), so sf tiers agree.
- the golden ``text`` column is produced by the engine's own frozen
  extractor (functions/extract.py) at generation time — the
  byte-identical invariant is then pinned by the checked-in golden
  parquet fixture in tests/fixtures/.
- entity surfaces and SVO sentences come from fixed templates, so NER
  and OpenIE have exactly computable expected outputs.
- ~30% of pages share boilerplate header/footer blocks and some pages
  are full near-duplicates of earlier ones (reference near-dup
  semantics, remove_duplicate_paragraphs.py:104-132).
- one hot entity (ORG 0) appears in a large share of mentions —
  exercises salted groupby(surface_hash) skew handling (north rule).

No wall-clock, no unseeded RNG anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions.extract import extract_text
from knowledge_graph_ray.functions.hashing import stable_digest

EMBED_DIM = 64
N_PERSONS = 40
N_ORGS = 30
N_CITIES = 12

PERSON_ID_BASE = 1_000
ORG_ID_BASE = 2_000

CITIES = [f"City{k}" for k in range(N_CITIES)]

# (template, predicate, subj_kind, obj_kind); obj_kind 'org'/'person'/'city'
SVO_TEMPLATES = [
    ("{s} leads {o}.", "leads", "person", "org"),
    ("{s} works for {o}.", "works_for", "person", "org"),
    ("{s} advises {o}.", "advises", "person", "org"),
    ("{s} acquired {o}.", "acquired", "org", "org"),
    ("{s} partnered with {o}.", "partnered_with", "org", "org"),
    ("{s} is located in {o}.", "located_in", "org", "city"),
    ("{s} met {o}.", "met", "person", "person"),
]

FILLER = {
    "da": [
        "Det er ikke en overraskelse at rapporten blev udgivet.",
        "Udvalget behandlede sagen på mødet og det tog lang tid.",
        "Der er ikke truffet en afgørelse i sagen endnu.",
        "Ministeren svarede på spørgsmålet i folketingssalen.",
    ],
    "en": [
        "The quarterly report was published without any delay.",
        "The committee discussed the matter and the meeting was long.",
        "No decision has been made on the case so far.",
        "The minister answered the question during the session.",
    ],
    "de": [
        "Der Bericht wurde nicht ohne eine lange Diskussion veröffentlicht.",
        "Der Ausschuss hat die Sache und nicht den Bericht behandelt.",
        "Eine Entscheidung wurde in der Sache noch nicht getroffen.",
        "Der Minister hat die Frage und der Bericht beantwortet.",
    ],
}

HEADER = "Site navigation Home About Contact Login"
FOOTER = "Copyright Example Site All rights reserved Privacy Terms"


def person_name(k: int) -> str:
    return f"Pera{k} Sonsen{k}"


def org_name(k: int) -> str:
    return f"Orga {k}"


def org_aliases(k: int) -> list[str]:
    # dot-free variants: the reference-style sentence splitter cuts on
    # '.', so alias surfaces must not contain periods (SURVEY.md M2)
    return [f"Orga {k} A/S", f"Orga{k} Ltd"]


def person_aliases(k: int) -> list[str]:
    return [f"Dr Pera{k}"]


def unit_vector(key: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic hash-derived unit vector (test stand-in for a
    768-d BERT embedding, FIXTURES.md §4)."""
    rng = np.random.default_rng(stable_digest(key))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def entities_table() -> pa.Table:
    """Aktør analog (FIXTURES.md §4). Entity embeddings use the same
    token-hash space as mention text (stages/embed.py) so ANN linking
    is meaningful. Ids >= 3000 are 'dirty' rows exercising M12 name
    cleanup / M13 rule typing / D4-D5 grouping; they never appear in
    page text, so corpus goldens are unaffected."""
    from knowledge_graph_ray.stages.embed import embed_texts

    ids, names, firsts, lasts, groups, types = [], [], [], [], [], []
    for k in range(N_PERSONS):
        ids.append(PERSON_ID_BASE + k)
        names.append(person_name(k))
        firsts.append(f"Pera{k}")
        lasts.append(f"Sonsen{k}")
        groups.append(None)
        types.append("person")
    for k in range(N_ORGS):
        ids.append(ORG_ID_BASE + k)
        names.append(org_name(k))
        firsts.append(None)
        lasts.append(None)
        groups.append(f"OG{k}")
        types.append("institution")
    dirty = [
        # (id, name, first, last, group, golden_type)
        (3000, "Hans Hansen (udpeget af Folketinget)", "Hans", "Hansen", None, "person"),
        (3001, "Hans Hansen", "Hans", "Hansen", None, "person"),  # D5 same-name
        (3002, "Miljø Styrelsen", None, None, "MST", "institution"),
        (3003, "Styrelsen Miljø", None, None, "SM", "institution"),  # D4 fuzzy variant
        (3004, "Enkeltnavn", None, "Enkeltnavn", None, "institution"),  # only last name
    ]
    for eid, name, first, last, grp, typ in dirty:
        ids.append(eid)
        names.append(name)
        firsts.append(first)
        lasts.append(last)
        groups.append(grp)
        types.append(typ)
    embs = embed_texts(names, EMBED_DIM)
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "first_name": pa.array(firsts, pa.string()),
            "last_name": pa.array(lasts, pa.string()),
            "group_short": pa.array(groups, pa.string()),
            "entity_type": pa.array(types, pa.string()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(embs.ravel(), pa.float32()), EMBED_DIM
            ),
        }
    )


def aliases_table() -> pa.Table:
    """Exploded alias map (reference alias_map.pkl analog,
    entity_alias_mapping.ipynb cells 29-32); includes canonical name."""
    eids, aliases = [], []
    for k in range(N_PERSONS):
        eid = PERSON_ID_BASE + k
        for a in [person_name(k), *person_aliases(k)]:
            eids.append(eid)
            aliases.append(a)
    for k in range(N_ORGS):
        eid = ORG_ID_BASE + k
        for a in [org_name(k), *org_aliases(k)]:
            eids.append(eid)
            aliases.append(a)
    return pa.table(
        {"entity_id": pa.array(eids, pa.int64()), "alias": pa.array(aliases, pa.string())}
    )


@dataclass
class _PageBuild:
    url: str
    warc_ts: int  # epoch micros
    html: bytes
    text: str
    lang: str
    mentions: list = field(default_factory=list)  # (surface, label, entity_id)
    triples: list = field(default_factory=list)  # (subj_eid, pred, obj)


def _surface_for(kind: str, k: int, rng: np.random.Generator) -> tuple[str, str, int]:
    """Pick a surface form (canonical or alias) → (surface, label, entity_id)."""
    if kind == "person":
        forms = [person_name(k), *person_aliases(k)]
        return forms[int(rng.integers(len(forms)))], "PER", PERSON_ID_BASE + k
    forms = [org_name(k), *org_aliases(k)]
    return forms[int(rng.integers(len(forms)))], "ORG", ORG_ID_BASE + k


def _pick_idx(kind: str, rng: np.random.Generator) -> int:
    """Zipf-ish skew: index 0 is hot (~30% of draws) — the hot-entity
    surface that forces salted canonicalization (SURVEY.md §4 skew)."""
    n = N_PERSONS if kind == "person" else N_ORGS
    if rng.random() < 0.30:
        return 0
    return int(rng.integers(n))


def build_page(i: int, seed: int = 42) -> _PageBuild:
    rng = np.random.default_rng([seed, i])
    lang = ["da", "en", "de"][int(rng.choice(3, p=[0.70, 0.25, 0.05]))]
    n_paras = int(rng.integers(2, 6))
    paras: list[str] = []
    mentions: list = []
    triples: list = []
    for _ in range(n_paras):
        sents: list[str] = []
        n_sents = int(rng.integers(2, 6))
        for _ in range(n_sents):
            if rng.random() < 0.45:
                tmpl, pred, skind, okind = SVO_TEMPLATES[
                    int(rng.integers(len(SVO_TEMPLATES)))
                ]
                s_surf, s_lab, s_eid = _surface_for(skind, _pick_idx(skind, rng), rng)
                if okind == "city":
                    o_surf = CITIES[int(rng.integers(N_CITIES))]
                    mentions.append((s_surf, s_lab, s_eid))
                    mentions.append((o_surf, "LOC", -1))
                    triples.append((s_eid, pred, o_surf))
                else:
                    o_surf, o_lab, o_eid = _surface_for(
                        okind, _pick_idx(okind, rng), rng
                    )
                    if o_eid == s_eid:  # avoid self-loops in goldens
                        sents.append(FILLER[lang][int(rng.integers(len(FILLER[lang])))])
                        continue
                    mentions.append((s_surf, s_lab, s_eid))
                    mentions.append((o_surf, o_lab, o_eid))
                    triples.append((s_eid, pred, ("E", o_eid)))
                sents.append(tmpl.format(s=s_surf, o=o_surf))
            else:
                sents.append(FILLER[lang][int(rng.integers(len(FILLER[lang])))])
        paras.append(" ".join(sents))

    with_boiler = rng.random() < 0.30
    body_parts = []
    if with_boiler:
        body_parts.append(f'<div class="hdr">{HEADER}</div>')
    for p in paras:
        body_parts.append(f"<p>{p}</p>")
    if rng.random() < 0.15:
        body_parts.append("<script>var x = 1; track(x);</script>")
    if with_boiler:
        body_parts.append(f'<div class="ftr">{FOOTER}</div>')
    html = (
        f"<html><head><title>Page {i}</title>"
        "<style>body { font: serif; }</style></head>\n<body>\n"
        + "\n".join(body_parts)
        + "\n</body></html>"
    )
    html_b = html.encode("utf-8")
    text = extract_text(html_b)
    ts = 1_704_067_200_000_000 + i * 13_000_000  # 2024-01-01 + i*13s, micros
    return _PageBuild(
        url=f"https://site{i % 97}.example/d/{i}",
        warc_ts=ts,
        html=html_b,
        text=text,
        lang=lang,
        mentions=mentions,
        triples=triples,
    )


def pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    builds = [build_page(i, seed) for i in range(n_pages)]
    return pa.table(
        {
            "url": pa.array([b.url for b in builds], pa.string()),
            "warc_ts": pa.array([b.warc_ts for b in builds], pa.timestamp("us")),
            "html": pa.array([b.html for b in builds], pa.binary()),
            "text": pa.array([b.text for b in builds], pa.large_string()),
            "lang": pa.array([b.lang for b in builds], pa.string()),
        }
    )


def golden_triples(n_pages: int, seed: int = 42) -> set[tuple[str, str, str]]:
    """Expected deduplicated (subj, pred, obj) set for the flagship
    pipeline over ``pages_table(n_pages, seed)``. Subjects/linked
    objects use canonical ids ``entity:{id}``; unlinked objects
    (cities) use their literal surface."""
    out: set[tuple[str, str, str]] = set()
    for i in range(n_pages):
        for s_eid, pred, obj in build_page(i, seed).triples:
            if isinstance(obj, tuple):  # ("E", eid)
                o = f"entity:{obj[1]}"
            else:
                o = obj
            out.add((f"entity:{s_eid}", pred, o))
    return out


def pages_dataset(n_pages: int, seed: int = 42, override_num_blocks: int | None = None):
    """Distributed generation: ray.data.range → map_batches(build) so the
    synthetic corpus is produced in parallel on workers, never
    materialized on the driver (scale path for bench)."""
    import ray.data as rd

    def make(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_pylist()
        builds = [build_page(i, seed) for i in idx]
        return pa.table(
            {
                "url": pa.array([b.url for b in builds], pa.string()),
                "warc_ts": pa.array([b.warc_ts for b in builds], pa.timestamp("us")),
                "html": pa.array([b.html for b in builds], pa.binary()),
                "text": pa.array([b.text for b in builds], pa.large_string()),
                "lang": pa.array([b.lang for b in builds], pa.string()),
            }
        )

    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(make, batch_format="pyarrow")


def write_corpus(out_dir: str, n_pages: int, seed: int = 42) -> dict[str, str]:
    """Materialize pages/entities/aliases parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in (
        ("pages", pages_table(n_pages, seed)),
        ("entities", entities_table()),
        ("aliases", aliases_table()),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


# ------------------------------------------------------------- PDF pages

def _pdf_encode_filters(content: bytes, filters: list[str]) -> tuple[bytes, bytes]:
    """Apply a named encode chain; returns (body, /Filter clause).
    Decode order is the dict order, so encode runs the list REVERSED
    (the last-listed filter is the innermost encoding)."""
    import base64
    import binascii
    import zlib

    for name in reversed(filters):
        if name == "FlateDecode":
            content = zlib.compress(content)
        elif name == "ASCIIHexDecode":
            content = binascii.hexlify(content) + b">"
        elif name == "ASCII85Decode":
            content = base64.a85encode(content) + b"~>"
        else:
            raise ValueError(f"unknown test filter {name}")
    if not filters:
        return content, b""
    if len(filters) == 1:
        return content, f" /Filter /{filters[0]}".encode()
    inner = " ".join(f"/{f}" for f in filters)
    return content, f" /Filter [{inner}]".encode()


def make_pdf(
    lines: list[str],
    compress: bool = True,
    filters: list[str] | None = None,
) -> bytes:
    """Minimal valid single-page PDF with one text line per Tj op —
    the deterministic fixture for functions.pdf.extract_pdf_text
    (reference ingests real PDFs via PyPDF2, get_files.py:23-35; this
    synthesizes the equivalent input in-sandbox). Latin-1-encodable
    text only; parens/backslashes are escaped. ``filters`` overrides
    the legacy ``compress`` flag with an explicit decode chain, e.g.
    ``["ASCII85Decode", "FlateDecode"]``."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + esc(line) + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    if filters is None:
        filters = ["FlateDecode"] if compress else []
    content, filt = _pdf_encode_filters(content, filters)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    return _pdf_assemble(objs)


def _pdf_assemble(objs: list[bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def make_pdf_tounicode(lines: list[str]) -> bytes:
    """Single-page PDF whose text is shown as 2-byte hex strings
    through a /ToUnicode CMap (the simple-font cmap path of
    functions.pdf). Codes are assigned per distinct character in
    appearance order starting at 0x0100 (so a latin-1 fallback could
    never accidentally match); the CMap stream is FlateDecoded."""
    import zlib

    codes: dict[str, int] = {}
    for ch in "".join(lines):
        if ch not in codes:
            codes[ch] = 0x0100 + len(codes)
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        hx = "".join(f"{codes[ch]:04X}" for ch in line)
        ops.append(b"<" + hx.encode("ascii") + b"> Tj")
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops))
    bfchars = "\n".join(
        f"<{code:04X}> <{ord(ch):04X}>" for ch, code in codes.items()
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "begincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bfchars}\nendbfchar\n"
        "endcmap\nend\n"
    ).encode("ascii")
    cmap_z = zlib.compress(cmap)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
        b"/ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap_z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + cmap_z + b"\nendstream",
    ]
    return _pdf_assemble(objs)


def pdf_pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """Synthetic PDF corpus: same text family as build_page, rendered
    as PDF bytes in the html column (the extract stage sniffs %PDF-
    and dispatches to the PDF extractor)."""
    rows_url, rows_ts, rows_pdf = [], [], []
    for i in range(n_pages):
        b = build_page(i, seed)
        lines = [ln for ln in b.text.split("\n") if ln.strip()][:12]
        rows_url.append(b.url.replace(".html", ".pdf"))
        rows_ts.append(b.warc_ts)
        rows_pdf.append(make_pdf(lines, compress=(i % 2 == 0)))
    return pa.table(
        {
            "doc_id": pa.array(range(n_pages), pa.int64()),
            "url": pa.array(rows_url, pa.string()),
            "warc_ts": pa.array(rows_ts, pa.timestamp("us")),
            "html": pa.array(rows_pdf, pa.binary()),
            "lang": pa.array(["da"] * n_pages, pa.string()),
        }
    )
