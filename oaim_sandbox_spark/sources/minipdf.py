"""Minimal pure-Python PDF text extraction — the in-container S1 parse path.

The reference loads PDFs with langchain's PyPDFLoader, one Document per page
(reference src/server/embedding.py:107-116). The full-fidelity path here is
pypdf when installed (loaders._parse_pdf_bytes tries it first); this module
is the dependency-free fallback so PDF bytes actually parse in environments
without pypdf, instead of gating the whole source on a missing third-party
lib.

Scope (honest limits, checked up front where possible):

- unencrypted PDFs only (``/Encrypt`` raises NotImplementedError);
- content streams stored plain or FlateDecode (zlib is stdlib); other
  filters (DCT, LZW, CCITT...) are skipped;
- text drawn via the standard ``Tj`` / ``'`` / ``"`` / ``TJ`` operators with
  literal ``(...)`` or hex ``<...>`` strings, decoded as PDFDocEncoding-ish
  latin-1 — no CMap/ToUnicode handling, so exotic font subsets come out
  garbled (pypdf handles those);
- page structure read from ``/Type /Page`` objects and their ``/Contents``
  references without an xref table (objects are located by scanning), so
  PDFs whose page tree lives inside compressed object streams fall back to
  one pseudo-page holding all extracted text.

That covers the machine-generated report/invoice/doc-export class of PDF,
which is the overwhelming share of a crawl's PDFs.
"""

from __future__ import annotations

import re
import zlib

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_CONTENTS_RE = re.compile(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_literal(raw: bytes) -> str:
    """PDF literal string body (between parens): backslash escapes + octal."""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                continue
            out.append(nxt.decode("latin-1"))
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _decode_hex(raw: bytes) -> str:
    h = re.sub(rb"\s+", b"", raw)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def _content_text(data: bytes) -> str:
    """Extract drawn text from one decoded content stream: a single linear
    scan collecting strings and emitting them on the text-showing operators,
    with newlines on the line-advancing ones (Td/TD/T*/ET and the ' / "
    next-line forms)."""
    out: list[str] = []
    pending: list[str] = []
    i, n = 0, len(data)

    def flush(sep: str = "") -> None:
        if pending:
            out.append("".join(pending))
            pending.clear()
        if sep:
            out.append(sep)

    while i < n:
        c = data[i : i + 1]
        if c == b"(":
            depth, j = 1, i + 1
            while j < n and depth:
                cj = data[j : j + 1]
                if cj == b"\\":
                    j += 2
                    continue
                if cj == b"(":
                    depth += 1
                elif cj == b")":
                    depth -= 1
                j += 1
            pending.append(_decode_literal(data[i + 1 : j - 1]))
            i = j
            continue
        if c == b"<":
            if data[i + 1 : i + 2] == b"<":  # dict open, skip
                i += 2
                continue
            j = data.find(b">", i + 1)
            if j < 0:
                break
            pending.append(_decode_hex(data[i + 1 : j]))
            i = j + 1
            continue
        if c.isalpha() or c in (b"'", b'"') or c == b"*":
            j = i
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] not in (b"(", b"<", b"[", b"]", b"/"):
                j += 1
            op = data[i:j]
            if op in (b"Tj", b"TJ"):
                flush()
            elif op in (b"'", b'"'):
                flush("\n")
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
                pending.clear()
            i = j
            continue
        i += 1
    flush()
    return "".join(out)


def _decode_stream(body: bytes, raw: bytes) -> bytes | None:
    """Decompress one stream given its object body (for the filter) and raw
    stream bytes; None when the filter is unsupported."""
    if b"/FlateDecode" in body:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"/Filter" in body:
        return None  # unsupported filter (DCT/LZW/...)
    return raw


def extract_pages(content: bytes) -> list[str]:
    """One text string per page, PyPDFLoader-shaped. Raises
    NotImplementedError for encrypted PDFs; returns a single pseudo-page
    when no page tree is scannable (e.g. compressed-xref PDFs)."""
    if not content.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", content):
        raise NotImplementedError("encrypted PDFs require pypdf")

    # Length-aware object scan. A naive `obj(.*?)endobj` regex truncates at
    # the first 'endobj'/'endstream' BYTE SEQUENCE inside compressed stream
    # data (zlib output is arbitrary bytes — hypothesis found real cases), so
    # when a stream declares /Length we slice exactly that many bytes and
    # resume scanning after them; `pos` also skips phantom object headers
    # that appear inside already-consumed stream bytes.
    objects: dict[int, bytes] = {}
    pos = 0
    for m in _OBJ_HEAD_RE.finditer(content):
        if m.start() < pos:
            continue
        num, start = int(m.group(1)), m.end()
        sm = _STREAM_START_RE.search(content, start)
        end = content.find(b"endobj", start)
        if sm is not None and (end == -1 or sm.start() < end):
            head = content[start : sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm is not None:
                dstart = sm.end()
                dend = dstart + int(lm.group(1))
                objects[num] = head + b"\nstream\n" + content[dstart:dend] + b"\nendstream"
                after = content.find(b"endobj", dend)
                pos = dend if after == -1 else after + len(b"endobj")
                continue
        if end == -1:
            end = len(content)
        objects[num] = content[start:end]
        pos = end + len(b"endobj")

    def obj_text(num: int) -> str:
        body = objects.get(num, b"")
        sm = _STREAM_START_RE.search(body)
        if not sm:
            return ""
        head = body[: sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm is not None:
            # exact /Length slice — the regex's \s* would eat trailing
            # whitespace-class BYTES of compressed data (zlib output can
            # end in 0x0a/0x20...), truncating the stream
            raw = body[sm.end() : sm.end() + int(lm.group(1))]
        else:
            m2 = _STREAM_RE.search(body)
            raw = m2.group(1) if m2 else b""
        data = _decode_stream(head, raw)
        return _content_text(data) if data is not None else ""

    pages: list[str] = []
    for num in sorted(objects):
        body = objects[num]
        if not _PAGE_RE.search(body):
            continue
        cm = _CONTENTS_RE.search(body)
        if not cm:
            pages.append("")
            continue
        refs = [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
        pages.append("".join(obj_text(r) for r in refs))

    if pages:
        return pages

    # no scannable page tree: every decodable stream becomes one blob page
    blobs: list[str] = []
    for num in sorted(objects):
        t = obj_text(num)
        if t.strip():
            blobs.append(t)
    return ["".join(blobs)]
