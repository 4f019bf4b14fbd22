"""Legacy ``.xls`` (BIFF8) reader/writer on the Python stdlib.

Parity target: the reference loads ``xls`` transparently through
tabulator's xlrd backend (reference ``cli.py:12`` format list). This
container has no xlrd, so the reader below parses the two public
Microsoft specs directly:

- **MS-CFB** (OLE2 compound file): 512-byte header → DIFAT → FAT →
  directory chain → the ``Workbook``/``Book`` stream, with the
  mini-stream / miniFAT path for streams under the 4096-byte cutoff
  (small real-world files land there).
- **MS-XLS** (BIFF8 record stream): workbook-globals substream
  (BOUNDSHEET sheet registry, SST shared strings — including strings
  split across CONTINUE records with their per-continuation
  compression flag) followed by one substream per sheet (NUMBER / RK /
  MULRK / LABELSST / LABEL / RSTRING / BOOLERR / FORMULA+STRING
  cells).

Behavior parity with the sibling xlsx/ods readers: first row is the
header, numbers come back as int when integral, bools as bools,
strings as str; date cells stay as their serial numbers (the xlsx
reader has the same behavior — number-format-driven date detection is
out of scope for all three). BIFF5/BIFF7 workbooks (stream named
``Book``) are read with the same record set; their 8-bit strings
decode as latin-1.

SCALE NOTE: like xlsx/ods, .xls is a driver-side interchange format —
the container is not splittable and the sheet limit is 64k rows. The
reader materializes rows on the driver and hands Spark a parallelized
DataFrame; anything bigger belongs in csv/parquet.

``write_xls`` is a fixture/export helper (same policy as
``write_xlsx``/``write_ods``): a minimal standards-structured CFB +
BIFF8 file (SST + LABELSST strings, NUMBER/BOOLERR cells; records
split at the 8224-byte BIFF limit, mini-stream used under the CFB
cutoff) validated against this module's reader.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = -2  # 0xFFFFFFFE
_FATSECT = -3  # 0xFFFFFFFD
_FREESECT = -1  # 0xFFFFFFFF
_MAX_RECORD = 8224  # BIFF8 maximum record DATA length


# ---------------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------------


def _cfb_streams(data: bytes) -> dict[str, bytes]:
    """Parse an OLE2 compound file → {stream name: bytes}."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (legacy .xls)")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    msz = 1 << struct.unpack_from("<H", data, 32)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        # sector 0 starts after one HEADER-SIZED slot: 512 bytes in a
        # v3 file (ssz=512) but a full 4096-byte sector in a v4 file —
        # (i+1)*ssz covers both (MS-CFB §2.2)
        off = (i + 1) * ssz
        return data[off : off + ssz]

    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s < 0:
            break
        vals = struct.unpack(f"<{ssz // 4}i", sector(s))
        difat.extend(vals[:-1])
        s = vals[-1]
    fat: list[int] = []
    for fs in difat:
        if fs >= 0:
            fat.extend(struct.unpack(f"<{ssz // 4}i", sector(fs)))

    def chain(start: int) -> bytes:
        out, s, hops = bytearray(), start, 0
        while s >= 0:
            out += sector(s)
            s = fat[s]
            hops += 1
            if hops > len(fat) + 1:
                raise ValueError("corrupt CFB: FAT chain loop")
        return bytes(out)

    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata), 128):
        e = dirdata[off : off + 128]
        if len(e) < 128:
            break
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "ignore")
        typ = e[66]
        start = struct.unpack_from("<i", e, 116)[0]
        size = struct.unpack_from("<I", e, 120)[0]
        entries.append((name, typ, start, size))
    root = next((e for e in entries if e[1] == 5), None)
    ministream = chain(root[2])[: root[3]] if root and root[2] >= 0 else b""
    minifat: list[int] = []
    if minifat_start >= 0 and n_minifat:
        mdata = chain(minifat_start)
        minifat = list(struct.unpack(f"<{len(mdata) // 4}i", mdata))

    def minichain(start: int, size: int) -> bytes:
        out, s, hops = bytearray(), start, 0
        while s >= 0:
            out += ministream[s * msz : (s + 1) * msz]
            s = minifat[s]
            hops += 1
            if hops > len(minifat) + 1:
                raise ValueError("corrupt CFB: miniFAT chain loop")
        return bytes(out[:size])

    streams: dict[str, bytes] = {}
    for name, typ, start, size in entries:
        if typ != 2:
            continue
        streams[name] = minichain(start, size) if size < mini_cutoff else chain(start)[:size]
    return streams


# ---------------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------------


def _records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


class _Chunks:
    """Reader over an SST record's data + its CONTINUE records. BIFF8
    unicode strings restart their compression flag at every CONTINUE
    boundary crossed INSIDE character data — the one piece of state a
    flat concatenation would lose."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.chunks[self.ci]) - self.pos

    def _advance(self) -> bool:
        while self.ci + 1 < len(self.chunks):
            self.ci += 1
            self.pos = 0
            if len(self.chunks[self.ci]):
                return True
        return False

    def eof(self) -> bool:
        return self._remaining() == 0 and self.ci + 1 >= len(self.chunks)

    def read(self, n: int) -> bytes:
        """Plain read crossing chunk boundaries (headers / skip data —
        no per-continuation flag byte)."""
        out = bytearray()
        while n:
            if self._remaining() == 0:
                if not self._advance():
                    raise ValueError("corrupt SST: truncated record data")
            take = min(n, self._remaining())
            out += self.chunks[self.ci][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        """XLUnicodeRichExtendedString (MS-XLS 2.5.293)."""
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        high = flags & 0x01
        crun = struct.unpack("<H", self.read(2))[0] if flags & 0x08 else 0
        cbext = struct.unpack("<I", self.read(4))[0] if flags & 0x04 else 0
        parts: list[str] = []
        need = cch
        while need:
            if self._remaining() == 0:
                if not self._advance():
                    raise ValueError("corrupt SST: truncated string")
                high = self.read(1)[0] & 0x01  # per-continuation grbit
            unit = 2 if high else 1
            take = min(need, self._remaining() // unit)
            if take == 0:
                # a lone byte of a 2-byte char at chunk end never occurs
                # in conformant files; fail loud rather than misalign
                raise ValueError("corrupt SST: split utf-16 code unit")
            raw = self.chunks[self.ci][self.pos : self.pos + take * unit]
            self.pos += take * unit
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            need -= take
        if crun:
            self.read(4 * crun)
        if cbext:
            self.read(cbext)
        return "".join(parts)


def _decode_rk(rk: int):
    """RK-encoded number: bit0 = ×1/100, bit1 = int30 vs truncated f64."""
    div = rk & 0x01
    if rk & 0x02:
        v = rk >> 2
        if v & (1 << 29):  # sign-extend the 30-bit int
            v -= 1 << 30
        num: float | int = v
    else:
        num = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if div:
        num = num / 100
        return int(num) if float(num).is_integer() and abs(num) < 2**53 else num
    return num


def _num(f: float):
    return int(f) if float(f).is_integer() and abs(f) < 2**53 else f


def _short_string(data: bytes, pos: int) -> str:
    """ShortXLUnicodeString (u8 length) — BOUNDSHEET names."""
    cch = data[pos]
    if data[pos + 1] & 0x01:
        return data[pos + 2 : pos + 2 + 2 * cch].decode("utf-16-le")
    return data[pos + 2 : pos + 2 + cch].decode("latin-1")


def _parse_workbook(stream: bytes) -> tuple[list[str], dict[str, dict[tuple[int, int], object]]]:
    """BIFF8 workbook stream → (sheet names in order,
    {sheet name: {(row, col): value}})."""
    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    sst: list[str] = []
    biff5 = False
    recs = list(_records(stream))
    for i, (op, data, _pos) in enumerate(recs):
        if op == 0x0809 and len(data) >= 4:  # BOF
            ver = struct.unpack_from("<H", data, 0)[0]
            biff5 = ver < 0x0600
        elif op == 0x0085:  # BOUNDSHEET
            if biff5:
                cch = data[6]
                name = data[7 : 7 + cch].decode("latin-1")
            else:
                name = _short_string(data, 6)
            sheets.append((name, struct.unpack_from("<I", data, 0)[0]))
        elif op == 0x00FC:  # SST (+ CONTINUE run)
            chunks = [data]
            j = i + 1
            while j < len(recs) and recs[j][0] == 0x003C:
                chunks.append(recs[j][1])
                j += 1
            rd = _Chunks(chunks)
            rd.read(8)  # cstTotal, cstUnique
            while not rd.eof():
                sst.append(rd.read_string())
        elif op == 0x000A and sheets:  # EOF of the globals substream
            break

    out: dict[str, dict[tuple[int, int], object]] = {}
    for name, start in sheets:
        cells: dict[tuple[int, int], object] = {}
        pending_formula: tuple[int, int] | None = None
        for op, data, _pos in _records(stream[start:]):
            if op == 0x000A:  # EOF — end of this sheet substream
                break
            if op == 0x0203:  # NUMBER
                r, c = struct.unpack_from("<HH", data, 0)
                cells[(r, c)] = _num(struct.unpack_from("<d", data, 6)[0])
            elif op == 0x027E:  # RK
                r, c = struct.unpack_from("<HH", data, 0)
                cells[(r, c)] = _decode_rk(struct.unpack_from("<I", data, 6)[0])
            elif op == 0x00BD:  # MULRK
                r, c0 = struct.unpack_from("<HH", data, 0)
                n = (len(data) - 6) // 6
                for k in range(n):
                    rk = struct.unpack_from("<I", data, 4 + 6 * k + 2)[0]
                    cells[(r, c0 + k)] = _decode_rk(rk)
            elif op == 0x00FD:  # LABELSST
                r, c = struct.unpack_from("<HH", data, 0)
                cells[(r, c)] = sst[struct.unpack_from("<I", data, 6)[0]]
            elif op in (0x0204, 0x00D6):  # LABEL / RSTRING (inline)
                r, c = struct.unpack_from("<HH", data, 0)
                cch = struct.unpack_from("<H", data, 6)[0]
                if biff5:
                    cells[(r, c)] = data[8 : 8 + cch].decode("latin-1")
                elif data[8] & 0x01:
                    cells[(r, c)] = data[9 : 9 + 2 * cch].decode("utf-16-le")
                else:
                    cells[(r, c)] = data[9 : 9 + cch].decode("latin-1")
            elif op == 0x0205:  # BOOLERR
                r, c = struct.unpack_from("<HH", data, 0)
                val, is_err = data[6], data[7]
                cells[(r, c)] = None if is_err else bool(val)
            elif op == 0x0006:  # FORMULA — cached result only
                r, c = struct.unpack_from("<HH", data, 0)
                res = data[6:14]
                if res[6:8] == b"\xff\xff":
                    kind = res[0]
                    if kind == 0:  # string → next STRING record
                        pending_formula = (r, c)
                        cells[(r, c)] = ""
                    elif kind == 1:
                        cells[(r, c)] = bool(res[2])
                    elif kind == 3:
                        cells[(r, c)] = ""
                    else:  # error
                        cells[(r, c)] = None
                else:
                    cells[(r, c)] = _num(struct.unpack("<d", res)[0])
            elif op == 0x0207 and pending_formula is not None:  # STRING
                cch = struct.unpack_from("<H", data, 0)[0]
                if biff5:
                    cells[pending_formula] = data[2 : 2 + cch].decode("latin-1")
                elif data[2] & 0x01:
                    cells[pending_formula] = data[3 : 3 + 2 * cch].decode("utf-16-le")
                else:
                    cells[pending_formula] = data[3 : 3 + cch].decode("latin-1")
                pending_formula = None
            # BLANK/MULBLANK/DIMENSIONS/ROW/formatting records: no value
        out[name] = cells
    return [n for n, _ in sheets], out


def read_xls(path: str, sheet: int | str = 1) -> tuple[list[str], list[list]]:
    """Parse one sheet → (header, data rows); ``sheet`` is a 1-based
    index or a sheet name — the same contract as read_xlsx/read_ods."""
    with open(path, "rb") as fh:
        data = fh.read()
    streams = _cfb_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError(
            f"no Workbook/Book stream in {path!r} (streams: {sorted(streams)}) — not an Excel .xls"
        )
    names, by_sheet = _parse_workbook(wb)
    if not names:
        return [], []
    if isinstance(sheet, str):
        if sheet not in by_sheet:
            raise ValueError(f"no sheet named {sheet!r} in {path!r} (sheets: {names})")
        name = sheet
    else:
        # 1-based like read_xlsx/read_ods; bare list indexing would let
        # sheet=0 / negatives silently select from the END of the book
        if not 1 <= sheet <= len(names):
            raise ValueError(
                f"sheet index {sheet} out of range 1..{len(names)} in {path!r} "
                f"(sheets: {names})"
            )
        name = names[sheet - 1]
    cells = by_sheet[name]
    if not cells:
        return [], []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    rows = [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return header, rows[1:]


def xls_to_dataframe(spark, path: str, sheet: int | str = 1):
    from .xlsx import _typed_dataframe

    header, rows = read_xls(path, sheet)
    return _typed_dataframe(spark, header, rows)


# ---------------------------------------------------------------------------
# writer (fixture/export helper)
# ---------------------------------------------------------------------------


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _sst_records(strings: list[str]) -> bytes:
    """SST split at the BIFF record limit. Whole strings pack
    back-to-back until a record fills; a string that cannot fit whole
    splits MID-character-data across CONTINUE records, each
    continuation restarting with its compression-flag byte (MS-XLS
    XLUnicodeRichExtendedString continuation rule — the same rule the
    reader implements). Cell text past the Excel 32,767-char limit
    raises (a silent u16 wrap would corrupt the record)."""
    head = struct.pack("<II", len(strings), len(strings))
    chunks: list[bytearray] = [bytearray(head)]

    def room() -> int:
        return _MAX_RECORD - len(chunks[-1])

    for s in strings:
        if len(s) > 32767:
            raise ValueError(
                f"cell string of {len(s)} chars exceeds the .xls per-cell limit "
                "(32767); use csv/parquet for long documents"
            )
        # a fresh string needs its 3-byte header plus at least one
        # whole utf-16 code unit in the current record
        if room() < 5:
            chunks.append(bytearray())
        chunks[-1] += struct.pack("<HB", len(s), 0x01)
        enc = s.encode("utf-16-le")
        pos = 0
        while pos < len(enc):
            if room() < 2:
                chunks.append(bytearray(b"\x01"))  # continuation grbit
            take = min(len(enc) - pos, room() - (room() % 2))
            chunks[-1] += enc[pos : pos + take]
            pos += take
    out = _rec(0x00FC, bytes(chunks[0]))
    for c in chunks[1:]:
        out += _rec(0x003C, bytes(c))
    return out


def write_xls(path: str, header: list[str], rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write a minimal BIFF8 .xls (SST+LABELSST strings, NUMBER /
    BOOLERR cells, 1900 date system), wrapped in a standards-structured
    CFB container (mini-stream under the 4096-byte cutoff — the same
    path small real-world files take)."""
    all_rows = [list(header)] + [list(r) for r in rows]
    strings: list[str] = []
    sst_index: dict[str, int] = {}
    for r in all_rows:
        for v in r:
            if isinstance(v, str) and v not in sst_index:
                sst_index[v] = len(strings)
                strings.append(v)

    sheet = bytearray()
    sheet += _rec(0x0809, struct.pack("<HHHHIH", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0x0600))
    for ri, r in enumerate(all_rows):
        for ci, v in enumerate(r):
            if v is None:
                continue
            if isinstance(v, bool):
                sheet += _rec(0x0205, struct.pack("<HHHBB", ri, ci, 15, 1 if v else 0, 0))
            elif isinstance(v, (int, float)):
                sheet += _rec(0x0203, struct.pack("<HHHd", ri, ci, 15, float(v)))
            else:
                sheet += _rec(0x00FD, struct.pack("<HHHI", ri, ci, 15, sst_index[str(v)]))
    sheet += _rec(0x000A, b"")

    globals_ = bytearray()
    globals_ += _rec(0x0809, struct.pack("<HHHHIH", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0x0600))
    globals_ += _rec(0x0042, struct.pack("<H", 1200))  # CODEPAGE utf-16
    globals_ += _rec(0x0022, struct.pack("<H", 0))  # DATEMODE 1900
    name8 = sheet_name.encode("utf-16-le")
    bs_data = struct.pack("<IBBB", 0, 0, 0, len(sheet_name)) + b"\x01" + name8
    bs_at = len(globals_)
    globals_ += _rec(0x0085, bs_data)
    globals_ += _sst_records(strings)
    globals_ += _rec(0x000A, b"")
    # patch the BOUNDSHEET's absolute sheet-BOF position
    struct.pack_into("<I", globals_, bs_at + 4, len(globals_))
    wb = bytes(globals_) + bytes(sheet)
    with open(path, "wb") as fh:
        fh.write(_cfb_write({"Workbook": wb}))


def _cfb_write(streams: dict[str, bytes]) -> bytes:
    """Minimal MS-CFB writer: 512-byte sectors, 64-byte mini sectors,
    streams under 4096 bytes in the mini stream. Sector layout:
    [directory][miniFAT][mini stream][big streams][FAT]."""
    ssz, msz, cutoff = 512, 64, 4096

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\x00" * (-len(b) % unit)

    small = {n: d for n, d in streams.items() if len(d) < cutoff}
    big = {n: d for n, d in streams.items() if len(d) >= cutoff}

    # mini stream: concatenation of 64-byte-padded small streams.
    # Zero-length streams occupy NO mini sectors and get NO miniFAT
    # entries (an entry for an unoccupied sector would shift every
    # later stream's chain off its sector numbers); their directory
    # entries carry start=ENDOFCHAIN, size=0.
    mini = bytearray()
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for n, d in small.items():
        if not d:
            continue
        first = len(mini) // msz
        mini_start[n] = first
        mini += pad(d, msz)
        cnt = (len(d) + msz - 1) // msz
        minifat.extend(list(range(first + 1, first + cnt)) + [_ENDOFCHAIN])
    n_mini = len(mini) // msz
    minifat_bytes = pad(b"".join(struct.pack("<i", v) for v in minifat), ssz) if n_mini else b""

    # directory: root + one entry per stream, padded to sector
    def dir_entry(name: str, typ: int, start: int, size: int, color: int = 1,
                  left: int = -1, right: int = -1, child: int = -1) -> bytes:
        n16 = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0 : len(n16)] = n16
        struct.pack_into("<H", e, 64, len(n16))
        e[66] = typ
        e[67] = color
        struct.pack_into("<iii", e, 68, left, right, child)
        struct.pack_into("<i", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    names = list(streams)
    # fill starts after sector numbers are assigned below — two passes
    n_dir_entries = 1 + len(names)
    n_dir_sects = (n_dir_entries * 128 + ssz - 1) // ssz
    n_minifat_sects = len(minifat_bytes) // ssz
    n_ministream_sects = (len(mini) + ssz - 1) // ssz
    big_padded = {n: pad(d, ssz) for n, d in big.items()}
    n_big_sects = sum(len(d) // ssz for d in big_padded.values())

    n_data = n_dir_sects + n_minifat_sects + n_ministream_sects + n_big_sects
    n_fat_sects = 1
    while (n_data + n_fat_sects) > n_fat_sects * (ssz // 4):
        n_fat_sects += 1

    dir_first = 0
    minifat_first = dir_first + n_dir_sects if n_minifat_sects else _ENDOFCHAIN
    ministream_first = (
        dir_first + n_dir_sects + n_minifat_sects if n_ministream_sects else _ENDOFCHAIN
    )
    big_first: dict[str, int] = {}
    cur = dir_first + n_dir_sects + n_minifat_sects + n_ministream_sects
    for n in big:
        big_first[n] = cur
        cur += len(big_padded[n]) // ssz
    fat_first = cur

    # directory entries in CFB sibling order (name length, then
    # uppercase name), linked as a degenerate-but-valid red-black tree:
    # root's child is the first entry and each sibling's `right` points
    # at the next — every stream stays reachable for conformant
    # tree-walking readers (olefile, Excel), not just linear scanners
    ordered = sorted(names, key=lambda n: (len(n), n.upper()))
    entries = [
        dir_entry(
            "Root Entry", 5, ministream_first if n_ministream_sects else _ENDOFCHAIN,
            len(mini), child=1 if ordered else -1,
        )
    ]
    for i, n in enumerate(ordered):
        right = i + 2 if i + 1 < len(ordered) else -1
        if n in small:
            start = mini_start[n] if small[n] else _ENDOFCHAIN
            entries.append(dir_entry(n, 2, start, len(small[n]), right=right))
        else:
            entries.append(dir_entry(n, 2, big_first[n], len(big[n]), right=right))
    dir_bytes = pad(b"".join(entries), ssz)

    fat = [_FREESECT] * (n_fat_sects * (ssz // 4))

    def link(first: int, count: int) -> None:
        for k in range(count):
            fat[first + k] = first + k + 1 if k + 1 < count else _ENDOFCHAIN

    link(dir_first, n_dir_sects)
    if n_minifat_sects:
        link(minifat_first, n_minifat_sects)
    if n_ministream_sects:
        link(ministream_first, n_ministream_sects)
    for n in big:
        link(big_first[n], len(big_padded[n]) // ssz)
    for k in range(n_fat_sects):
        fat[fat_first + k] = _FATSECT
    fat_bytes = b"".join(struct.pack("<i", v) for v in fat)

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat_sects)
    struct.pack_into("<i", header, 48, dir_first)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into("<i", header, 60, minifat_first)
    struct.pack_into("<I", header, 64, n_minifat_sects)
    struct.pack_into("<i", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_first + k for k in range(n_fat_sects)] + [_FREESECT] * (109 - n_fat_sects)
    struct.pack_into("<109i", header, 76, *difat)

    return (
        bytes(header)
        + dir_bytes
        + minifat_bytes
        + pad(bytes(mini), ssz)
        + b"".join(big_padded.values())
        + fat_bytes
    )
