"""DOCX / XLSX / PPTX → markdown kernels on stdlib zip+XML only.

Reference behavior being reproduced (from /root/reference):

- DOCX (``lexoid/core/parse_type/static_parser.py:730-748``): open with
  python-docx, join paragraph texts with ``"\\n"``; the parsed-document
  dict gets one segment holding the whole text. Here: unzip
  ``word/document.xml``, concatenate ``w:t`` runs per ``w:p`` paragraph
  (tabs ``w:tab`` → "\\t", breaks ``w:br``/``w:cr`` → "\\n"), join
  paragraphs with "\\n".
- XLSX (``static_parser.py:105-118``): ``pd.read_excel`` then
  ``to_markdown(index=False, tablefmt="pipe")``. Here: unzip the first
  worksheet, resolve shared strings, build the cell grid, render with
  the same pipe-table writer used for CSV and PDF tables
  (``kernels.table_md``).
- PPTX (``static_parser.py:119-139``): pptx2md with images/notes
  disabled, then ``split_md_by_headings(content, "#")``. Here: unzip
  ``ppt/slides/slideN.xml`` in deck order; per slide the title
  placeholder (``p:ph type="title"|"ctrTitle"``) becomes an ``# ``
  heading and the remaining text paragraphs follow, slides joined by
  blank lines — so the reference's heading-split segmentation yields
  one segment per slide.

All three formats are OPC zip containers, so the outer sniff is just
the ``PK`` magic; docx/xlsx/pptx discrimination reads entry names.
No third-party parsing deps — "brand-new, NOT a port".
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from lexoid_spark.kernels.table_md import rows_to_pipe_table

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P_NS = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


def _as_bytes(payload) -> bytes:
    if payload is None:
        return b""
    return bytes(payload)


def sniff_office(payload) -> str | None:
    """'docx' | 'xlsx' | 'pptx' | 'epub' | None for a PK-zip payload."""
    b = _as_bytes(payload)
    if not b.startswith(b"PK\x03\x04"):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as zf:
            names = set(zf.namelist())
            if "word/document.xml" in names:
                return "docx"
            if any(n.startswith("xl/worksheets/") for n in names):
                return "xlsx"
            if any(n.startswith("ppt/slides/") for n in names):
                return "pptx"
            if "META-INF/container.xml" in names:
                return "epub"
    except zipfile.BadZipFile:
        return None
    return None


def docx_to_md(payload) -> str:
    """DOCX → text: paragraph texts joined with "\\n"
    (static_parser.py:746-748 semantics)."""
    b = _as_bytes(payload)
    with zipfile.ZipFile(io.BytesIO(b)) as zf:
        xml = zf.read("word/document.xml")
    root = ET.fromstring(xml)
    paras = []
    for p in root.iter(f"{_W_NS}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W_NS}tab":
                parts.append("\t")
            elif node.tag in (f"{_W_NS}br", f"{_W_NS}cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


def pptx_to_md(payload) -> str:
    """PPTX → markdown (S9): slide titles as ``# `` headings, body
    paragraphs below, slides joined by blank lines — one heading-split
    segment per slide (static_parser.py:119-139 semantics, images and
    speaker notes disabled exactly as the reference configures
    pptx2md)."""
    b = _as_bytes(payload)
    with zipfile.ZipFile(io.BytesIO(b)) as zf:
        slide_names = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[1]).group()),
        )
        slides = []
        for name in slide_names:
            root = ET.fromstring(zf.read(name))
            title_paras: list[str] = []
            body_paras: list[str] = []
            for sp in root.iter(f"{_P_NS}sp"):
                is_title = any(
                    ph.attrib.get("type") in ("title", "ctrTitle")
                    for ph in sp.iter(f"{_P_NS}ph")
                )
                for p in sp.iter(f"{_A_NS}p"):
                    txt = "".join(t.text or "" for t in p.iter(f"{_A_NS}t"))
                    if not txt.strip():
                        continue
                    (title_paras if is_title else body_paras).append(txt)
            parts = []
            if title_paras:
                parts.append("# " + " ".join(title_paras))
            parts.extend(body_paras)
            if parts:
                slides.append("\n\n".join(parts))
    return "\n\n".join(slides)


_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_EPUB_MAX_INFLATED = 1 << 28  # zip-bomb cap, same bound as the WARC arm


def epub_to_md(payload) -> str:
    """EPUB (2 and 3 share this core) → markdown — the books container
    a training-data pipeline actually ingests: ``META-INF/
    container.xml`` names the OPF package, the OPF manifest maps
    manifest ids to hrefs, the ``<spine>`` orders the reading
    documents, and each XHTML chapter converts through the HTML
    kernel (``kernels/html_md.py``), concatenated in spine order
    (each chapter carries its own blank-line padding).

    Hostile-input bounds: total inflated chapter bytes are capped at
    :data:`_EPUB_MAX_INFLATED` (a stored-size lie in the zip directory
    still can't overrun it — reads go through the zip streamer);
    missing container/OPF/spine entries raise typed (→ quarantine).
    Reference parity: none — Lexoid has no EPUB path; this is
    LLM-pipeline surface (book corpora)."""
    from lexoid_spark.kernels.html_md import html_to_md

    def _zread(zf, name):
        # zipfile raises a BARE RuntimeError for an entry whose
        # general-purpose flag claims encryption (one flipped bit in a
        # wild/corrupt file) — translate to the typed quarantine
        # family (found by the single-byte mutation fuzz)
        try:
            return zf.read(name)
        except RuntimeError as e:
            raise ValueError(f"epub entry unreadable: {e}") from None

    b = _as_bytes(payload)
    with zipfile.ZipFile(io.BytesIO(b)) as zf:
        try:
            container = ET.fromstring(
                _zread(zf, "META-INF/container.xml"))
        except KeyError:
            raise ValueError("epub misses META-INF/container.xml")
        rf = container.find(
            f"{_CONTAINER_NS}rootfiles/{_CONTAINER_NS}rootfile")
        if rf is None or not rf.attrib.get("full-path"):
            raise ValueError("epub container names no rootfile")
        opf_path = rf.attrib["full-path"]
        try:
            opf = ET.fromstring(_zread(zf, opf_path))
        except KeyError:
            raise ValueError(f"epub misses OPF {opf_path!r}")
        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        hrefs = {
            item.attrib.get("id"): item.attrib.get("href")
            for item in opf.iter(f"{_OPF_NS}item")
        }
        chapters = []
        total = 0
        for ref in opf.iter(f"{_OPF_NS}itemref"):
            href = hrefs.get(ref.attrib.get("idref"))
            if not href:
                raise ValueError("epub spine names an unknown item")
            name = base + href
            try:
                info = zf.getinfo(name)
            except KeyError:
                raise ValueError(f"epub spine entry {name!r} missing")
            total += info.file_size
            if total > _EPUB_MAX_INFLATED:
                raise ValueError("epub inflated size exceeds cap")
            try:
                with zf.open(info) as fh:
                    xhtml = fh.read(_EPUB_MAX_INFLATED + 1)
            except RuntimeError as e:  # encrypted-flag bit (see _zread)
                raise ValueError(
                    f"epub entry unreadable: {e}") from None
            if len(xhtml) > _EPUB_MAX_INFLATED:
                raise ValueError("epub inflated size exceeds cap")
            chapters.append(html_to_md(xhtml))
        if not chapters:
            raise ValueError("epub spine is empty")
    return "".join(chapters)


def _col_index(cell_ref: str) -> int:
    """'B7' → 1 (zero-based column)."""
    letters = re.match(r"[A-Z]+", cell_ref or "")
    if not letters:
        return 0
    idx = 0
    for ch in letters.group(0):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _fmt_number(raw: str) -> str:
    """Numeric cell text the way pandas would render it (42 not 42.0)."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f == int(f) and "e" not in raw.lower() and "." not in raw:
        return raw
    if f == int(f):
        return str(int(f))
    return raw


def xlsx_to_md(payload) -> str:
    """First worksheet → pipe markdown (S7 analogue for spreadsheets)."""
    b = _as_bytes(payload)
    with zipfile.ZipFile(io.BytesIO(b)) as zf:
        names = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not names:
            return ""
        sheet = ET.fromstring(zf.read(names[0]))
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sroot.iter(f"{_S_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_S_NS}t")))

    rows: list[list[str]] = []
    for row in sheet.iter(f"{_S_NS}row"):
        cells: dict[int, str] = {}
        for c in row.iter(f"{_S_NS}c"):
            ref = c.attrib.get("r", "")
            ctype = c.attrib.get("t", "n")
            v = c.find(f"{_S_NS}v")
            if v is None or v.text is None:
                text = ""
            elif ctype == "s":
                text = shared[int(v.text)]
            elif ctype == "str":
                text = v.text
            else:
                text = _fmt_number(v.text)
            cells[_col_index(ref)] = text
        if cells:
            width = max(cells) + 1
            rows.append([cells.get(j, "") for j in range(width)])
    if not rows:
        return ""
    ncol = max(len(r) for r in rows)
    rows = [r + [""] * (ncol - len(r)) for r in rows]
    return rows_to_pipe_table(rows[0], rows[1:])
