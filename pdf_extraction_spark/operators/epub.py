"""EPUB ingestion — e-books as a crawl-corpus source, parsed from
raw bytes with the stdlib only.

Books are a first-class LLM-training corpus family; on the wire they
are EPUB: a ZIP container whose READING ORDER is doubly indirect —
``META-INF/container.xml`` points at the OPF package document, whose
``<manifest>`` maps ids to chapter files and whose ``<spine>`` lists
the reading order by idref.  This module resolves that chain for
real (a book whose spine reorders the chapter files comes out in
spine order, not zip-entry or filename order — the gate plants
exactly that), then hands each XHTML chapter to the ALREADY-GATED
html block classifier (``operators/html.py``): boilerplate strip,
block classification, ``<img>`` media spans — one implementation of
HTML semantics for crawl pages, WARC payloads and book chapters
alike.

Shape: container parse + per-chapter classification fuse into ONE
map-only scan stage; the only exchange is the per-book chapter
reassembly (collect chapters in spine order and re-offset globally),
the same bounded per-doc shuffle the PDF page layer pays — at
10^9-book scale both sides of that exchange are embarrassingly
parallel.

Reference anchor: the reference ingests PDFs only
(``/root/reference/src/pipeline.py``); the office/ebook families are
part of the web-document extension the north rule's interleaved
text+media tier implies — chapter ``<img>`` elements become
``media`` spans in reading order, the same invariant every other
source family satisfies.

Regex-scoped over machine-generated XML (the documented tokenizer
scope shared by the docx/pptx/xlsx family).  Contract limits: only
spine items whose manifest media-type is XHTML are read (images/css
in the manifest stay opaque); a missing container/OPF falls back to
zip-order ``*.xhtml``/``*.html`` members; nav/NCX tables of contents
are not parsed (the spine IS the reading order).
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROOTFILE = re.compile(r'<rootfile [^>]*full-path="([^"]+)"')
_ITEM = re.compile(r'<item (?=[^>]*id="([^"]+)")(?=[^>]*href="'
                   r'([^"]+)")(?=[^>]*media-type="([^"]+)")[^>]*/?>')
_ITEMREF = re.compile(r'<itemref [^>]*idref="([^"]+)"')
_XHTML_TYPES = ("application/xhtml+xml", "text/html")

_SEP = "\x1f"


def chapter_paths(zf: "zipfile.ZipFile") -> list[str]:
    """Chapter part names in SPINE order (container.xml -> OPF ->
    manifest/spine resolution); zip-order xhtml fallback."""
    try:
        cx = zf.read("META-INF/container.xml").decode("utf-8",
                                                      "replace")
        m = _ROOTFILE.search(cx)
        if m:
            opf_path = m.group(1)
            opf = zf.read(opf_path).decode("utf-8", "replace")
            base = opf_path.rsplit("/", 1)[0] + "/" \
                if "/" in opf_path else ""

            def resolve(href: str) -> str:
                # manifest hrefs are OPF-relative (a '../text/ch1'
                # href is routine when the OPF lives in a subdir);
                # a leading '/' means container root.  normpath
                # collapses '../' segments, which plain prefixing
                # did not.
                if href.startswith("/"):
                    return posixpath.normpath(href.lstrip("/"))
                return posixpath.normpath(base + href)

            items = {i: (resolve(href), mt)
                     for i, href, mt in _ITEM.findall(opf)}
            order = [items[idref][0]
                     for idref in _ITEMREF.findall(opf)
                     if idref in items
                     and items[idref][1].split(";")[0].strip()
                     in _XHTML_TYPES]
            if order:
                return order
    except KeyError:
        pass
    return [n for n in zf.namelist()
            if n.lower().endswith((".xhtml", ".html"))]


def parse_epub(data: bytes) -> list[dict[str, Any]]:
    """Raw .epub bytes -> spine-order chapter rows:
    ``{chapter, path, html}``.  Damaged zip yields []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        order = chapter_paths(zf)
    except (zipfile.BadZipFile, ValueError):
        return []
    rows: list[dict[str, Any]] = []
    for no, path in enumerate(order, start=1):
        try:
            html = zf.read(path).decode("utf-8", "replace")
        except KeyError:
            continue
        rows.append({"chapter": no, "path": path, "html": html})
    return rows


CHAPTERS_SCHEMA = ("doc_id string, chapter int, path string, "
                   "html string")


def epub_chapters_from_files(files: DataFrame,
                             bytes_col: str = "epub",
                             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, epub binary) -> one row per chapter in spine order.
    ONE map-only mapInArrow pass (zero shuffle, zero joins)."""
    import pyarrow as pa

    fields = [("doc_id", pa.string()), ("chapter", pa.int32()),
              ("path", pa.string()), ("html", pa.string())]
    schema = pa.schema(fields)
    types = [t for _, t in fields]

    def _parse(batches: Iterator["pa.RecordBatch"]
               ) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            blobs = batch.column(1).to_pylist()
            rows: list[tuple] = []
            for did, blob in zip(ids, blobs):
                chapters = parse_epub(blob or b"")
                if not chapters:
                    # sentinel: a damaged/empty book must surface as
                    # an empty-span document downstream, not vanish
                    # (same contract as the docx/pptx/xlsx bridges,
                    # which keep the row with an empty spans array)
                    rows.append((did, 0, None, ""))
                for r in chapters:
                    rows.append((did, r["chapter"], r["path"],
                                 r["html"]))
            cols = list(zip(*rows)) if rows else [[]] * len(fields)
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(c), type=t)
                 for c, t in zip(cols, types)], schema=schema)

    sel = files.select(F.col(id_col).cast("string").alias("doc_id"),
                       F.col(bytes_col).alias("epub"))
    return sel.mapInArrow(_parse, schema=CHAPTERS_SCHEMA)


def epub_to_spans(files: DataFrame, bytes_col: str = "epub",
                  id_col: str = "doc_id") -> DataFrame:
    """EPUB files -> BASELINE.json contract span arrays: every
    chapter through the gated html block classifier
    (``html.html_to_spans`` — content blocks as text spans,
    ``<img src>`` as media spans), chapters concatenated in spine
    order with globally gapless offsets.

    Plan: container parse + per-chapter block classification fuse
    into the scan stage (the composite doc||chapter key keeps each
    chapter one row — the same giant-doc skew story as the PDF page
    layer); ONE exchange reassembles books.  Requires doc ids free
    of the 0x1F unit separator (asserted nowhere — crawl ids are
    URIs/paths; same documented contract as pdffile's page keys)."""
    from .html import html_to_spans

    ch = epub_chapters_from_files(files, bytes_col, id_col)
    keyed = ch.select(
        F.concat_ws(_SEP, "doc_id",
                    F.col("chapter").cast("string")).alias("doc_id"),
        "html")
    sp = html_to_spans(keyed)
    # explode_outer keeps zero-span chapters (including the damaged-
    # book sentinel row) as a null-span row, so every input doc_id
    # survives the groupBy as at least an empty spans array — the
    # family-wide contract; the null entries are filtered out of the
    # collected array below.  Still join-free.
    rows = sp.select(
        F.substring_index("doc_id", _SEP, 1).alias("doc_id"),
        F.substring_index("doc_id", _SEP, -1).cast("int")
        .alias("chapter"),
        F.explode_outer("spans").alias("s"))
    # lexicographic struct sort: (chapter, in-chapter offset) first
    arr = F.filter(
        F.array_sort(F.collect_list(F.struct(
            F.col("chapter"), F.col("s.offset").alias("o"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref")))),
        lambda x: x["kind"].isNotNull())
    spans = F.transform(
        arr,
        lambda x, i: F.struct(
            x["kind"].alias("kind"), x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset")))
    return rows.groupBy("doc_id").agg(spans.alias("spans"))


# ------------------------------------------------ deterministic writer

_CONTAINER = (
    '<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis:'
    'names:tc:opendocument:xmlns:container"><rootfiles><rootfile '
    'full-path="OEBPS/content.opf" media-type="application/'
    'oebps-package+xml"/></rootfiles></container>')


def _chapter_html(doc: int, k: int, text: str) -> str:
    """Deterministic chapter: a heading, a corpus-text paragraph with
    a length-guaranteeing suffix, an inline image, a closing
    paragraph — every block comfortably over the classifier's
    MIN_TEXT_LEN so the expected spans are closed-form without
    replaying the length ladder."""
    slice_ = text[40 * (k - 1):40 * (k - 1) + 80]
    return (f"<html><body><h2>Heading {k} of {doc} spanning enough "
            "characters</h2>"
            f"<p>{slice_} chapter {k} body of doc {doc} with padding "
            "past the minimum</p>"
            f'<img src="img://{doc}/{k}"/>'
            f"<p>Closing paragraph {k} of document {doc} with "
            "sufficient length for the gate</p></body></html>")


def build_one_epub(doc: int, text: str) -> bytes:
    """Deterministic per-document .epub behind the ``epub_spans``
    gate — every branch doc_id arithmetic:

    - chapter 1 always; chapter 2 on doc%2==0; chapter 3 on doc%3==0;
    - the SPINE lists chapters ROTATED by one position on doc%4==2
      (last chapter first), with non-sequential manifest ids and an
      out-of-spine css item — output order must follow the
      container->OPF->spine resolution, not filename order;
    - chapter files live under OEBPS/ so manifest hrefs exercise the
      OPF-relative path resolution."""
    ks = [1] + ([2] if doc % 2 == 0 else []) \
        + ([3] if doc % 3 == 0 else [])
    spine_ks = ks[-1:] + ks[:-1] if doc % 4 == 2 and len(ks) > 1 \
        else ks
    ids = {1: "idA7", 2: "idB3", 3: "idC9"}
    manifest = "".join(
        f'<item id="{ids[k]}" href="ch{k}.xhtml" '
        'media-type="application/xhtml+xml"/>' for k in ks) \
        + '<item id="css1" href="style.css" media-type="text/css"/>'
    spine = "".join(f'<itemref idref="{ids[k]}"/>' for k in spine_ks)
    opf = ('<?xml version="1.0"?><package version="3.0"><manifest>'
           + manifest + "</manifest><spine>" + spine
           + "</spine></package>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        def put(name: str, data: str) -> None:
            zi = zipfile.ZipInfo(name,
                                 date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
        put("mimetype", "application/epub+zip")
        put("META-INF/container.xml", _CONTAINER)
        put("OEBPS/content.opf", opf)
        for k in ks:
            put(f"OEBPS/ch{k}.xhtml", _chapter_html(doc, k, text))
        put("OEBPS/style.css", "body{}")
    return buf.getvalue()


def build_epub_files(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text) -> (doc_id, epub binary) via the deterministic
    writer; one map-only Arrow pass."""
    import pyarrow as pa

    def _build(batches: Iterator["pa.RecordBatch"]
               ) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            blobs = [build_one_epub(
                int(re.sub(r"\D", "", i) or 0), t or "")
                for i, t in zip(ids, texts)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(blobs, type=pa.binary())],
                schema=pa.schema([("doc_id", pa.string()),
                                  ("epub", pa.binary())]))

    sel = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                      F.coalesce(F.col(text_col), F.lit(""))
                       .alias("text"))
    return sel.mapInArrow(_build, schema="doc_id string, epub binary")
