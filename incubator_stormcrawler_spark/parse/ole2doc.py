"""Legacy Word binary (.doc) extraction — completes the Tika ParserBolt
parity (external/tika/src/main/java/org/apache/stormcrawler/tika/ParserBolt.java:74):
PDF and DOCX extract natively in parse/richdoc.py; this module covers the
OLE2 compound-file + Word 97-2003 binary format so legacy ``.doc`` pages no
longer route to the error slot.

Two layers, both stdlib-only:

* **OLE2 / CFBF container** ([MS-CFB]): header, DIFAT → FAT, directory
  chain, mini FAT + mini stream (streams under the 4096-byte cutoff live in
  64-byte mini sectors inside the root entry's stream).
* **Word binary ([MS-DOC])**: the ``WordDocument`` stream's FIB gives
  ``fcClx/lcbClx`` into the ``0Table``/``1Table`` stream (``fWhichTblStm``
  bit); the CLX's piece table (PlcPcd) maps character positions to file
  offsets, each piece either cp1252 ("compressed", fc bit 30) or UTF-16LE.
  Hyperlinks are field runs in the text itself
  (``\\x13 HYPERLINK "url" \\x14 label \\x15``) — we surface the targets as
  outlinks and keep only the field *result* text, like Tika's handler.
  Title comes from the ``\\x05SummaryInformation`` property set (PIDSI 2).

A deterministic ``build_doc`` (mini-FAT for small streams, regular FAT
chains past the cutoff) makes round-trip tests and the DuckDB oracle
possible without any binary fixtures.
"""

from __future__ import annotations

import re
import struct

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

_SUMMARY_STREAM = "\x05SummaryInformation"
_PIDSI_TITLE = 2
_VT_LPSTR = 30
_VT_LPWSTR = 31

_HYPERLINK_RE = re.compile(r"\x13\s*HYPERLINK\s+\"([^\"]*)\"[^\x14\x15]*")


# -- CFBF container reader --------------------------------------------------

def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def ole2_streams(content: bytes) -> dict[str, bytes]:
    """Parse a compound file; return {stream name: bytes}. Raises
    ValueError when the magic or geometry is wrong (caller treats that as
    not-a-doc)."""
    if content[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE2 compound file")
    sector_shift = _u16(content, 30)
    mini_shift = _u16(content, 32)
    if not 6 <= sector_shift <= 14:
        raise ValueError("bad sector shift")
    ssz = 1 << sector_shift
    msz = 1 << mini_shift
    n_fat = _u32(content, 44)
    first_dir = _u32(content, 48)
    mini_cutoff = _u32(content, 56)
    first_minifat = _u32(content, 60)
    first_difat = _u32(content, 68)

    def sector(n: int) -> bytes:
        start = ssz * (n + 1)
        return content[start : start + ssz]

    # FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    fat_sectors: list[int] = []
    for i in range(109):
        s = _u32(content, 76 + 4 * i)
        if s not in (_FREESECT, _ENDOFCHAIN):
            fat_sectors.append(s)
    seen_difat = set()
    s = first_difat
    while s not in (_ENDOFCHAIN, _FREESECT) and s not in seen_difat:
        seen_difat.add(s)
        body = sector(s)
        for i in range(ssz // 4 - 1):
            e = _u32(body, 4 * i)
            if e not in (_FREESECT, _ENDOFCHAIN):
                fat_sectors.append(e)
        s = _u32(body, ssz - 4)
    fat_sectors = fat_sectors[:n_fat] if n_fat else fat_sectors

    fat: list[int] = []
    for fs in fat_sectors:
        body = sector(fs)
        fat.extend(struct.unpack_from("<%dI" % (ssz // 4), body))

    def chain(start: int) -> bytes:
        out = bytearray()
        s, hops = start, 0
        while s not in (_ENDOFCHAIN, _FREESECT):
            if s >= len(fat) or hops > len(fat) + 1:
                raise ValueError("broken FAT chain")
            out += sector(s)
            s = fat[s]
            hops += 1
        return bytes(out)

    # directory entries (128 bytes each) across the directory chain
    dir_bytes = chain(first_dir)
    entries = []
    for off in range(0, len(dir_bytes) - 127, 128):
        name_len = _u16(dir_bytes, off + 64)
        obj_type = dir_bytes[off + 66]
        if obj_type == 0 or name_len < 2:
            continue
        name = dir_bytes[off : off + name_len - 2].decode(
            "utf-16-le", "replace"
        )
        start = _u32(dir_bytes, off + 116)
        size = struct.unpack_from("<Q", dir_bytes, off + 120)[0]
        if sector_shift == 9:  # v3 files: only the low 32 bits are valid
            size &= 0xFFFFFFFF
        entries.append((name, obj_type, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = b""
    mini_fat: list[int] = []
    if root is not None and root[3] > 0 and root[2] != _ENDOFCHAIN:
        mini_stream = chain(root[2])[: root[3]]
    s = first_minifat
    hops = 0
    while s not in (_ENDOFCHAIN, _FREESECT) and hops <= len(fat) + 1:
        body = sector(s)
        mini_fat.extend(struct.unpack_from("<%dI" % (ssz // 4), body))
        s = fat[s] if s < len(fat) else _ENDOFCHAIN
        hops += 1

    def mini_chain(start: int) -> bytes:
        out = bytearray()
        s, hops = start, 0
        while s not in (_ENDOFCHAIN, _FREESECT):
            if s >= len(mini_fat) or hops > len(mini_fat) + 1:
                raise ValueError("broken mini-FAT chain")
            out += mini_stream[msz * s : msz * (s + 1)]
            s = mini_fat[s]
            hops += 1
        return bytes(out)

    streams: dict[str, bytes] = {}
    for name, obj_type, start, size in entries:
        if obj_type != 2:  # stream objects only
            continue
        if size < mini_cutoff:
            streams[name] = mini_chain(start)[:size] if size else b""
        else:
            streams[name] = chain(start)[:size]
    return streams


# -- Word 97 binary text ----------------------------------------------------

def _pieces(word: bytes, table: bytes) -> list[tuple[int, int, bool]]:
    """Piece table → [(cp_len, file_offset, is_utf16)] in CP order."""
    fc_clx = _u32(word, 0x01A2)
    lcb_clx = _u32(word, 0x01A6)
    clx = table[fc_clx : fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 1:  # Prc blocks precede the Pcdt
        pos += 3 + _u16(clx, pos + 1)
    if pos >= len(clx) or clx[pos] != 2:
        raise ValueError("no piece table in CLX")
    lcb = _u32(clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack_from("<%dI" % (n + 1), plc, 0)
    out = []
    for i in range(n):
        fc_raw = _u32(plc, 4 * (n + 1) + 8 * i + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        out.append((cps[i + 1] - cps[i], fc // 2 if compressed else fc,
                    not compressed))
    return out


def _field_text(raw: str) -> tuple[str, list[str]]:
    """Resolve Word field runs: keep field results, drop field codes,
    collect HYPERLINK targets as outlinks."""
    outlinks = [u for u in _HYPERLINK_RE.findall(raw) if u]
    # keep text after the separator (0x14) and drop the code part
    cleaned = re.sub(r"\x13[^\x14\x15]*\x14?", "", raw).replace("\x15", "")
    cleaned = cleaned.replace("\r", "\n").replace("\x07", "\n")
    cleaned = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", cleaned)
    deduped: list[str] = []
    for u in outlinks:
        if u not in deduped:
            deduped.append(u)
    return cleaned, deduped


def _summary_title(stream: bytes) -> str | None:
    """PIDSI_TITLE out of a SummaryInformation property-set stream."""
    try:
        n_sets = _u32(stream, 24)
        if n_sets < 1:
            return None
        sec_off = _u32(stream, 28 + 16)
        n_props = _u32(stream, sec_off + 4)
        for i in range(n_props):
            pid = _u32(stream, sec_off + 8 + 8 * i)
            if pid != _PIDSI_TITLE:
                continue
            poff = sec_off + _u32(stream, sec_off + 12 + 8 * i)
            vt = _u32(stream, poff)
            ln = _u32(stream, poff + 4)
            if vt == _VT_LPSTR:
                return (
                    stream[poff + 8 : poff + 8 + ln]
                    .split(b"\x00", 1)[0]
                    .decode("cp1252", "replace")
                )
            if vt == _VT_LPWSTR:
                return (
                    stream[poff + 8 : poff + 8 + 2 * ln]
                    .decode("utf-16-le", "replace")
                    .rstrip("\x00")
                )
    except (struct.error, IndexError):
        return None
    return None


def extract_doc(content: bytes) -> dict:
    """{text, title, n_pages, outlinks} from Word 97-2003 ``.doc`` bytes."""
    streams = ole2_streams(content)
    word = streams.get("WordDocument")
    if word is None or _u16(word, 0) != 0xA5EC:
        raise ValueError("no WordDocument stream")
    which = (_u16(word, 0x000A) >> 9) & 1
    table = streams.get(f"{which}Table")
    if table is None:  # tolerate a wrong flag if the other stream exists
        table = streams.get(f"{1 - which}Table")
    if table is None:
        raise ValueError("no Table stream")
    parts: list[str] = []
    for cp_len, off, utf16 in _pieces(word, table):
        if utf16:
            parts.append(word[off : off + 2 * cp_len].decode(
                "utf-16-le", "replace"))
        else:
            parts.append(word[off : off + cp_len].decode("cp1252", "replace"))
    text, outlinks = _field_text("".join(parts))
    title = None
    if _SUMMARY_STREAM in streams:
        title = _summary_title(streams[_SUMMARY_STREAM])
    return {"text": text, "title": title, "n_pages": 1, "outlinks": outlinks}


# -- deterministic builder (fixtures + oracle) ------------------------------

def _prop_set(title: str) -> bytes:
    """Minimal SummaryInformation stream with one VT_LPWSTR title."""
    val = title.encode("utf-16-le")
    prop = struct.pack("<II", _VT_LPWSTR, len(title)) + val
    if len(prop) % 4:
        prop += b"\x00" * (4 - len(prop) % 4)
    section = struct.pack("<II", 8 + 8 + len(prop), 1)
    section += struct.pack("<II", _PIDSI_TITLE, 16)
    section += prop
    fmtid = bytes(16)
    head = struct.pack("<HHI", 0xFFFE, 0, 0) + bytes(16) + struct.pack("<I", 1)
    head += fmtid + struct.pack("<I", len(head) + 16 + 4)
    return head + section


def build_doc(
    text: str,
    title: str | None = None,
    link: str | None = None,
    encoding: str = "utf-16",
) -> bytes:
    """Deterministic Word 97 ``.doc``: FIB + single text piece (+ optional
    HYPERLINK field when ``link`` is given), piece table in ``0Table``,
    optional SummaryInformation title. ``encoding='cp1252'`` exercises the
    compressed-piece path. ``extract_doc(build_doc(t))`` round-trips ``t``
    exactly (modulo the field machinery, which is applied then resolved)."""
    body = text
    if link:
        # empty field result: the target surfaces as an outlink only, so
        # extract_doc(build_doc(t)) round-trips t exactly
        body = f'\x13 HYPERLINK "{link}" \x14\x15' + body
    if encoding == "cp1252":
        raw = body.encode("cp1252")
        fc_raw = (0x40000000 | (2 * 1536)) & 0xFFFFFFFF
        byte_len = len(raw)
    else:
        raw = body.encode("utf-16-le")
        fc_raw = 1536
        byte_len = len(raw)
    n_cp = len(body)

    word = bytearray(1536)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", word, 0x000A, 0)  # fWhichTblStm=0 → 0Table
    plc = struct.pack("<II", 0, n_cp) + struct.pack(
        "<HIH", 0, fc_raw, 0
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", word, 0x01A2, 0)  # fcClx (offset in 0Table)
    struct.pack_into("<I", word, 0x01A6, len(clx))  # lcbClx
    word_stream = bytes(word) + raw

    streams: list[tuple[str, bytes]] = [
        ("WordDocument", word_stream),
        ("0Table", clx),
    ]
    if title is not None:
        streams.append((_SUMMARY_STREAM, _prop_set(title)))
    return build_cfbf(streams)


def build_cfbf(streams: list[tuple[str, bytes]]) -> bytes:
    """Assemble a v3 compound file (512-byte sectors, 64-byte mini sectors,
    4096 cutoff): streams under the cutoff go to the mini stream via the
    mini FAT; larger ones get regular FAT chains."""
    ssz, msz, cutoff = 512, 64, 4096

    def pad(b: bytes, unit: int) -> bytes:
        r = len(b) % unit
        return b + bytes(unit - r) if r else b

    mini_parts: list[bytes] = []
    mini_starts: dict[str, int] = {}
    big: list[tuple[str, bytes]] = []
    for name, data in streams:
        if len(data) < cutoff:
            mini_starts[name] = sum(len(p) for p in mini_parts) // msz
            mini_parts.append(pad(data, msz))
        else:
            big.append((name, data))
    mini_blob = b"".join(mini_parts)
    n_mini = len(mini_blob) // msz

    # mini FAT (chains within the mini stream)
    mini_fat: list[int] = []
    for name, data in streams:
        if name in mini_starts:
            n = max(1, (len(data) + msz - 1) // msz) if data else 0
            base = len(mini_fat)
            for i in range(n):
                mini_fat.append(base + i + 1 if i < n - 1 else _ENDOFCHAIN)
    minifat_bytes = pad(
        b"".join(struct.pack("<I", e) for e in mini_fat), ssz
    ) if mini_fat else b""

    # sector layout: [0]=FAT, [1..]=directory, then miniFAT, mini stream,
    # then big streams
    dir_count = 1 + len(streams)
    dir_sectors = (dir_count * 128 + ssz - 1) // ssz
    sector_list: list[bytes] = []

    def add(data: bytes) -> tuple[int, int]:
        """append padded data; return (first sector id, n sectors) —
        ids offset by the FAT+directory prefix, fixed below."""
        data = pad(data, ssz)
        first = len(sector_list)
        n = len(data) // ssz
        for i in range(n):
            sector_list.append(data[ssz * i : ssz * (i + 1)])
        return first, n

    minifat_first, minifat_n = (
        add(minifat_bytes) if minifat_bytes else (_ENDOFCHAIN, 0)
    )
    mini_first, mini_n = add(mini_blob) if mini_blob else (_ENDOFCHAIN, 0)
    big_locs: dict[str, int] = {}
    big_lens: dict[str, int] = {}
    for name, data in big:
        f, n = add(data)
        big_locs[name] = f
        big_lens[name] = n

    prefix = 2 + (dir_sectors - 1)  # FAT sector 0, directory sectors next
    # directory entries
    def dirent(name: str, obj_type: int, start: int, size: int,
               child: int = _FREESECT) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0 : len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm))
        e[66] = obj_type
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, _FREESECT)  # left
        struct.pack_into("<I", e, 72, _FREESECT)  # right
        struct.pack_into("<I", e, 76, child)  # child
        struct.pack_into("<I", e, 116, start if start != _ENDOFCHAIN
                         else _ENDOFCHAIN)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    dir_blob = bytearray()
    dir_blob += dirent(
        "Root Entry", 5,
        (mini_first + prefix) if mini_n else _ENDOFCHAIN,
        len(mini_blob), child=1 if streams else _FREESECT,
    )
    for name, data in streams:
        if name in mini_starts:
            start = mini_starts[name] if data else _ENDOFCHAIN
        else:
            start = big_locs[name] + prefix
        dir_blob += dirent(name, 2, start, len(data))
    dir_padded = pad(bytes(dir_blob), ssz)

    total_sectors = 1 + dir_sectors + len(sector_list)
    fat = [_FREESECT] * (ssz // 4)
    if total_sectors > len(fat):
        raise ValueError("stream set too large for a single FAT sector")
    fat[0] = _FATSECT
    for i in range(dir_sectors):  # directory chain starts at sector 1
        fat[1 + i] = 1 + i + 1 if i < dir_sectors - 1 else _ENDOFCHAIN

    def chain_fat(first: int, n: int) -> None:
        for i in range(n):
            s = prefix + first + i
            fat[s] = s + 1 if i < n - 1 else _ENDOFCHAIN

    if minifat_n:
        chain_fat(minifat_first, minifat_n)
    if mini_n:
        chain_fat(mini_first, mini_n)
    for name, _ in big:
        chain_fat(big_locs[name], big_lens[name])

    fat_bytes = b"".join(struct.pack("<I", e) for e in fat)

    header = bytearray(512)
    header[0:8] = _OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", header, 28, 0xFFFE)  # byte order
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # first directory sector
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into(
        "<I", header, 60,
        (minifat_first + prefix) if minifat_n else _ENDOFCHAIN,
    )
    struct.pack_into("<I", header, 64, minifat_n)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] = FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    return bytes(header) + fat_bytes + dir_padded + b"".join(sector_list)
