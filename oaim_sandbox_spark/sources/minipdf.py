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
  literal ``(...)`` or hex ``<...>`` strings. Fonts carrying a /ToUnicode
  CMap (the subset-font class — the most common real-world PDF whose bytes
  are NOT latin-1-ish) are decoded through the CMap: ``Tf`` switches the
  active font, bfchar/bfrange entries map 1- or 2-byte codes to UTF-16BE
  text. Fonts without a CMap fall back to PDFDocEncoding-ish latin-1;
  predefined CID CMaps (/Encoding /GBK-EUC-H etc.) still need pypdf;
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
# direct lengths only: '/Length 7 0 R' is an INDIRECT reference whose
# first integer is an object number, not a byte count — matching it sliced
# 7 bytes of stream and silently emptied the page
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
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


def _decode_literal_bytes(raw: bytes) -> bytes:
    """Like _decode_literal but yields the raw BYTE string — CMap-encoded
    literals are code bytes, not latin-1 text."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.extend(_ESCAPES[nxt].encode("latin-1"))
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):
                i += 2
                continue
            out.extend(nxt)
            i += 2
            continue
        out.extend(c)
        i += 1
    return bytes(out)


def _hex_bytes(raw: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", raw)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _decode_hex(raw: bytes) -> str:
    return _hex_bytes(raw).decode("latin-1")


class _CMap:
    """A parsed /ToUnicode CMap: fixed code width + code -> text mapping."""

    __slots__ = ("map", "code_len")

    def __init__(self, mapping: dict[int, str], code_len: int):
        self.map, self.code_len = mapping, code_len

    def decode(self, bs: bytes) -> str:
        w = self.code_len
        out: list[str] = []
        for i in range(0, len(bs) - w + 1, w):
            code = int.from_bytes(bs[i : i + w], "big")
            got = self.map.get(code)
            if got is None:
                # unmapped code: latin-1 fallback only makes sense for
                # byte-wide codes; wide unmapped codes stay absent
                got = chr(code) if w == 1 and code < 256 else ""
            out.append(got)
        return "".join(out)


_BF_RANGE_CAP = 1 << 16  # malformed <0000> <FFFFFF> ranges must not explode


def _parse_cmap(data: bytes) -> _CMap:
    """bfchar/bfrange entries of a ToUnicode CMap stream -> _CMap. Source
    code width comes from begincodespacerange (defaults to 2 — the width
    every common subset-font CMap uses); destinations are UTF-16BE."""
    # hex runs inside <...> may contain whitespace (PDF hex-string rule),
    # so every pattern admits \s and the parsers strip it
    def hx(h: bytes) -> int:
        return int(re.sub(rb"\s", b"", h), 16)

    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f\s]+)>", data)
    code_len = max(1, len(re.sub(rb"\s", b"", m.group(1))) // 2) if m else 2

    def utf16(h: bytes) -> str:
        return _hex_bytes(h).decode("utf-16-be", "replace")

    mapping: dict[int, str] = {}
    for block in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        for pm in re.finditer(rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>", block.group(1)):
            mapping[hx(pm.group(1))] = utf16(pm.group(2))
    for block in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        for rm in re.finditer(
            rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(<[0-9A-Fa-f\s]+>|\[[^\]]*\])",
            block.group(1),
        ):
            lo, hi = hx(rm.group(1)), hx(rm.group(2))
            hi = min(hi, lo + _BF_RANGE_CAP)
            dst = rm.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f\s]+)>", dst)
                for off, dh in enumerate(dsts):
                    if lo + off <= hi:
                        mapping[lo + off] = utf16(dh)
            else:
                base_hex = re.sub(rb"\s", b"", dst[1:-1])
                if len(base_hex) <= 4:
                    base = hx(base_hex)
                    for code in range(lo, hi + 1):
                        mapping[code] = chr(base + code - lo)
                else:  # multi-unit destination: only the range start is exact
                    mapping[lo] = utf16(base_hex)
    return _CMap(mapping, code_len)


def _content_text(data: bytes, fonts: dict[str, _CMap] | None = None) -> str:
    """Extract drawn text from one decoded content stream: a single linear
    scan collecting strings and emitting them on the text-showing operators,
    with newlines on the line-advancing ones (Td/TD/T*/ET and the ' / "
    next-line forms). ``fonts`` maps resource names (F1...) to ToUnicode
    CMaps; ``Tf`` switches the active decode, strings shown under a CMapped
    font decode through it, everything else stays latin-1."""
    fonts = fonts or {}
    out: list[str] = []
    pending: list[str] = []
    cur: _CMap | None = None
    last_name = ""
    i, n = 0, len(data)

    def flush(sep: str = "") -> None:
        if pending:
            out.append("".join(pending))
            pending.clear()
        if sep:
            out.append(sep)

    while i < n:
        c = data[i : i + 1]
        if c == b"/":
            j = i + 1
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] not in (
                b"(", b"<", b"[", b"]", b"/", b">",
            ):
                j += 1
            last_name = data[i + 1 : j].decode("latin-1", "replace")
            i = j
            continue
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
            body = data[i + 1 : j - 1]
            pending.append(cur.decode(_decode_literal_bytes(body)) if cur else _decode_literal(body))
            i = j
            continue
        if c == b"<":
            if data[i + 1 : i + 2] == b"<":  # dict open, skip
                i += 2
                continue
            j = data.find(b">", i + 1)
            if j < 0:
                break
            body = data[i + 1 : j]
            pending.append(cur.decode(_hex_bytes(body)) if cur else _decode_hex(body))
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
            elif op == b"Tf":
                cur = fonts.get(last_name)
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
            # decompressobj: tolerant of trailing bytes, which the
            # endstream-bounded fallback slice (indirect /Length) can carry
            return zlib.decompressobj().decompress(raw)
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
            dstart = sm.end()
            dend = None
            if lm is not None:
                dend = dstart + int(lm.group(1))
            elif b"/Length" in head:
                # indirect /Length (e.g. '/Length 7 0 R'): bound the stream
                # at the endstream marker, stripping at most one EOL — the
                # length object may not even be parsed yet
                es = content.find(b"endstream", dstart)
                if es != -1:
                    dend = es
                    if content[dend - 2 : dend] == b"\r\n":
                        dend -= 2
                    elif content[dend - 1 : dend] in (b"\n", b"\r"):
                        dend -= 1
            if dend is not None:
                objects[num] = head + b"\nstream\n" + content[dstart:dend] + b"\nendstream"
                after = content.find(b"endobj", dend)
                pos = dend if after == -1 else after + len(b"endobj")
                continue
        if end == -1:
            end = len(content)
        objects[num] = content[start:end]
        pos = end + len(b"endobj")

    def obj_stream(num: int) -> bytes | None:
        body = objects.get(num, b"")
        sm = _STREAM_START_RE.search(body)
        if not sm:
            return None
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
        return _decode_stream(head, raw)

    def obj_text(num: int, fonts: dict[str, _CMap] | None = None) -> str:
        data = obj_stream(num)
        return _content_text(data, fonts) if data is not None else ""

    def resolve_dict(body: bytes, key: bytes) -> bytes | None:
        """The value of /key in ``body`` — an inline <<...>> dict (balanced
        scan) or the body of the referenced object."""
        m = re.search(rb"/" + key + rb"\s*(<<|\d+\s+\d+\s+R)", body)
        if not m:
            return None
        if m.group(1) == b"<<":
            start = m.end() - 2
            depth, i = 0, start
            while i < len(body) - 1:
                two = body[i : i + 2]
                if two == b"<<":
                    depth += 1
                    i += 2
                elif two == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        return body[start:i]
                else:
                    i += 1
            return None
        return objects.get(int(m.group(1).split()[0]))

    def page_fonts(body: bytes) -> dict[str, _CMap]:
        """Resource-name -> ToUnicode CMap for fonts that carry one."""
        res = resolve_dict(body, b"Resources")
        fdict = resolve_dict(res, b"Font") if res is not None else None
        if fdict is None:
            return {}
        fonts: dict[str, _CMap] = {}
        for fm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fdict):
            fobj = objects.get(int(fm.group(2)))
            if not fobj:
                continue
            tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fobj)
            if not tm:
                continue
            data = obj_stream(int(tm.group(1)))
            if data:
                fonts[fm.group(1).decode("latin-1")] = _parse_cmap(data)
        return fonts

    def page_tree_order() -> list[int]:
        """Page object numbers in /Kids (reading) order. Object-number order
        is NOT reading order: incremental updates and linearized writers
        give replacement/later pages arbitrary numbers, and an appended
        replacement page would ALSO surface its stale predecessor — the
        tree walk yields exactly the live pages, in sequence."""
        parents = {
            n for n, b in objects.items() if re.search(rb"/Type\s*/Pages\b", b)
        }
        kids = {}
        for n in parents:
            arr = re.search(rb"/Kids\s*\[(.*?)\]", objects[n], re.DOTALL)
            kids[n] = (
                [int(m.group(1)) for m in _REF_RE.finditer(arr.group(1))] if arr else []
            )
        referenced = {k for ks in kids.values() for k in ks}
        roots = sorted(n for n in parents if n not in referenced)
        order: list[int] = []
        seen: set[int] = set()

        def walk(n: int, depth: int = 0) -> None:
            if depth > 64 or n in seen:
                return
            seen.add(n)
            if n in parents:
                for k in kids[n]:
                    walk(k, depth + 1)
            elif n in objects and _PAGE_RE.search(objects[n]):
                order.append(n)

        for r in roots:
            walk(r)
        return order

    page_nums = page_tree_order() or [
        n for n in sorted(objects) if _PAGE_RE.search(objects[n])
    ]
    pages: list[str] = []
    for num in page_nums:
        body = objects[num]
        cm = _CONTENTS_RE.search(body)
        if not cm:
            pages.append("")
            continue
        fonts = page_fonts(body)
        refs = [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
        pages.append("".join(obj_text(r, fonts) for r in refs))

    if pages:
        return pages

    # no scannable page tree: every decodable stream becomes one blob page
    blobs: list[str] = []
    for num in sorted(objects):
        t = obj_text(num)
        if t.strip():
            blobs.append(t)
    return ["".join(blobs)]
