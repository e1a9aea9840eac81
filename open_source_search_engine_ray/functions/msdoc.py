"""Word binary (.doc) text extraction — the ``antiword`` core, pure
Python.

The reference shells out to ``antiword`` for CT_DOC payloads
(``gbconvert.sh``; ``XmlDoc.cpp`` CT_DOC routing); that binary doesn't
exist in this container, so this module implements the two layers the
text path actually needs from scratch:

1. **CFB / OLE2 compound file** (MS-CFB): header, FAT chains, the
   directory tree, mini-FAT + mini-stream for small streams — enough
   to pull the ``WordDocument`` and ``0Table``/``1Table`` streams.
2. **Word 97+ FIB + piece table** (MS-DOC): non-complex documents read
   ``fcMin..fcMac`` directly; complex documents walk the CLX's PlcPcd
   in the table stream, each PCD giving a (fc, fCompressed) piece —
   cp1252 single-byte when compressed, UTF-16LE otherwise.

``encode_doc`` builds spec-shaped fixture files (both layouts, both
encodings) the same way the media codecs ship their own encoders.
Anything outside scope raises ``ValueError`` and the conversion stage
falls back like any other undecodable payload.
"""

from __future__ import annotations

import struct

import numpy as np

CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC

#: control chars Word stores inline in the text stream → displayable
_DOC_CTRL = {
    0x0D: "\n",  # paragraph mark
    0x07: "\n",  # cell/row mark
    0x0B: "\n",  # hard line break
    0x0C: "\n",  # page break / section mark
    0x1E: "-",  # non-breaking hyphen
    0x1F: "",  # optional hyphen
    0x09: "\t",
}


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------


def _sector(data: bytes, n: int, ssz: int) -> bytes:
    off = 512 + n * ssz
    if off + ssz > len(data):
        raise ValueError("CFB sector out of range")
    return data[off : off + ssz]


def _chain(fat: np.ndarray, start: int, limit: int) -> list:
    out = []
    s = start
    while s != ENDOFCHAIN and s != FREESECT:
        if s >= len(fat) or len(out) > limit:
            raise ValueError("CFB FAT chain corrupt")
        out.append(int(s))
        s = int(fat[s])
    return out


class CfbFile:
    """Minimal MS-CFB reader: directory entries + stream extraction."""

    def __init__(self, data: bytes):
        if data[:8] != CFB_SIG or len(data) < 512:
            raise ValueError("not a CFB (OLE2) file")
        (sect_shift,) = struct.unpack_from("<H", data, 0x1E)
        (mini_shift,) = struct.unpack_from("<H", data, 0x20)
        (n_fat,) = struct.unpack_from("<I", data, 0x2C)
        (dir_start,) = struct.unpack_from("<I", data, 0x30)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 0x38)
        (minifat_start,) = struct.unpack_from("<I", data, 0x3C)
        (n_minifat,) = struct.unpack_from("<I", data, 0x40)
        (difat_start,) = struct.unpack_from("<I", data, 0x44)
        (n_difat,) = struct.unpack_from("<I", data, 0x48)
        if sect_shift not in (9, 12) or mini_shift != 6:
            raise ValueError("unsupported CFB sector shape")
        self.data = data
        self.ssz = 1 << sect_shift
        self.msz = 1 << mini_shift
        # DIFAT: 109 header entries + chained DIFAT sectors
        difat = list(struct.unpack_from("<109I", data, 0x4C))
        s = difat_start
        for _ in range(n_difat):
            if s in (ENDOFCHAIN, FREESECT):
                break
            sec = _sector(data, s, self.ssz)
            more = struct.unpack(f"<{self.ssz // 4}I", sec)
            difat.extend(more[:-1])
            s = more[-1]
        fat_secs = [x for x in difat[:n_fat] if x != FREESECT]
        per = self.ssz // 4
        fat = np.empty(len(fat_secs) * per, np.uint32)
        for i, fs in enumerate(fat_secs):
            fat[i * per : (i + 1) * per] = np.frombuffer(
                _sector(data, fs, self.ssz), "<u4"
            )
        self.fat = fat
        nsec = max(1, (len(data) - 512) // self.ssz)
        # directory
        self.entries = []
        for ds in _chain(fat, dir_start, nsec):
            sec = _sector(data, ds, self.ssz)
            for e in range(self.ssz // 128):
                ent = sec[e * 128 : (e + 1) * 128]
                (nlen,) = struct.unpack_from("<H", ent, 0x40)
                etype = ent[0x42]
                if etype == 0 or nlen < 2:
                    continue
                name = ent[: nlen - 2].decode("utf-16-le", "replace")
                (start,) = struct.unpack_from("<I", ent, 0x74)
                (size,) = struct.unpack_from("<Q", ent, 0x78)
                self.entries.append(
                    {"name": name, "type": etype, "start": start, "size": size}
                )
        roots = [e for e in self.entries if e["type"] == 5]
        if not roots:
            raise ValueError("CFB missing root entry")
        self.root = roots[0]
        # mini FAT + mini stream (the root entry's chain)
        if n_minifat and minifat_start not in (ENDOFCHAIN, FREESECT):
            mf = bytearray()
            for s2 in _chain(fat, minifat_start, nsec):
                mf += _sector(data, s2, self.ssz)
            self.minifat = np.frombuffer(bytes(mf), "<u4")
            ms = bytearray()
            for s2 in _chain(fat, self.root["start"], nsec):
                ms += _sector(data, s2, self.ssz)
            self.ministream = bytes(ms)
        else:
            self.minifat = np.empty(0, np.uint32)
            self.ministream = b""

    def stream(self, name: str) -> bytes:
        for e in self.entries:
            if e["type"] == 2 and e["name"] == name:
                size = e["size"]
                if size < self.mini_cutoff:
                    out = bytearray()
                    nmini = max(1, len(self.ministream) // self.msz)
                    for s in _chain(self.minifat, e["start"], nmini):
                        out += self.ministream[s * self.msz : (s + 1) * self.msz]
                    return bytes(out[:size])
                out = bytearray()
                nsec = max(1, (len(self.data) - 512) // self.ssz)
                for s in _chain(self.fat, e["start"], nsec):
                    out += _sector(self.data, s, self.ssz)
                return bytes(out[:size])
        raise ValueError(f"CFB stream {name!r} not found")


# ---------------------------------------------------------------------------
# Word 97+ text layer
# ---------------------------------------------------------------------------


def _clean(text: str) -> str:
    """Map Word's inline control chars; drop field/object markers."""
    out = []
    for ch in text:
        o = ord(ch)
        if o in _DOC_CTRL:
            out.append(_DOC_CTRL[o])
        elif o < 0x20 or o == 0x01 or 0xF000 <= o <= 0xF0FF:
            continue  # field chars / private-use symbol glyphs
        else:
            out.append(ch)
    return "".join(out)


def doc_extract_text(data: bytes) -> str:
    """Word binary bytes → plain text (main document part).

    Raises ``ValueError`` for non-CFB payloads, pre-Word97 files, or a
    corrupt piece table (callers treat that as any other undecodable
    binary)."""
    cfb = CfbFile(data)
    wd = cfb.stream("WordDocument")
    if len(wd) < 0x200:
        raise ValueError("WordDocument stream too short")
    (ident,) = struct.unpack_from("<H", wd, 0)
    if ident != 0xA5EC:
        raise ValueError("not a Word 97+ binary (wIdent mismatch)")
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    complex_doc = bool(flags & 0x0004)
    which_tbl = 1 if flags & 0x0200 else 0
    (fc_min,) = struct.unpack_from("<I", wd, 0x18)
    (fc_mac,) = struct.unpack_from("<I", wd, 0x1C)
    (ccp_text,) = struct.unpack_from("<I", wd, 0x4C)
    if not complex_doc:
        # non-complex: contiguous text at fcMin..fcMac; 8-bit vs
        # UTF-16 decided like antiword (fExtChar → byte span == 2*cp)
        raw = wd[fc_min:fc_mac]
        if ccp_text and len(raw) >= 2 * ccp_text:
            return _clean(raw[: 2 * ccp_text].decode("utf-16-le", "replace"))
        return _clean(raw.decode("cp1252", "replace"))
    # complex: CLX in the table stream
    (fc_clx,) = struct.unpack_from("<I", wd, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", wd, 0x01A6)
    tbl = cfb.stream(f"{which_tbl}Table")
    clx = tbl[fc_clx : fc_clx + lcb_clx]
    i = 0
    while i < len(clx):
        t = clx[i]
        if t == 1:  # Prc: skip cb(u16) + grpprl
            (cb,) = struct.unpack_from("<H", clx, i + 1)
            i += 3 + cb
        elif t == 2:  # Pcdt
            break
        else:
            raise ValueError("bad CLX entry")
    else:
        raise ValueError("CLX missing Pcdt")
    (lcb,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb]
    n = (lcb - 4) // 12  # n pieces: (n+1) u32 CPs + n 8-byte PCDs
    if n <= 0 or len(plc) < (n + 1) * 4 + n * 8:
        raise ValueError("piece table truncated")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts = []
    for k in range(n):
        pcd = plc[(n + 1) * 4 + k * 8 : (n + 1) * 4 + (k + 1) * 8]
        (fc_raw,) = struct.unpack_from("<I", pcd, 2)
        ncp = cps[k + 1] - cps[k]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            seg = wd[fc // 2 : fc // 2 + ncp]
            parts.append(seg.decode("cp1252", "replace"))
        else:
            seg = wd[fc : fc + 2 * ncp]
            parts.append(seg.decode("utf-16-le", "replace"))
    return _clean("".join(parts))


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def _cfb_build(streams: dict) -> bytes:
    """Minimal single-FAT-sector CFB with the given {name: bytes}
    streams, all ≥ mini cutoff (padded) so only the regular FAT is
    exercised by construction; the reader's mini path is covered by
    test vectors built with a small cutoff variant below."""
    ssz = 512
    blobs = []
    for name, body in streams.items():
        pad = (-len(body)) % ssz
        blobs.append((name, body, body + b"\x00" * pad))
    n_total = sum(len(b[2]) // ssz for b in blobs)
    # layout: sector 0 = FAT, 1 = directory, 2.. = stream data
    fat = [FREESECT] * (ssz // 4)
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN  # single directory sector
    cur = 2
    starts = {}
    for name, body, padded in blobs:
        k = len(padded) // ssz
        starts[name] = cur
        for j in range(k - 1):
            fat[cur + j] = cur + j + 1
        fat[cur + k - 1] = ENDOFCHAIN
        cur += k
    if cur > ssz // 4:
        raise ValueError("fixture too large for one FAT sector")

    def dirent(name: str, etype: int, start: int, size: int) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[: len(nm)] = nm
        struct.pack_into("<H", ent, 0x40, len(nm))
        ent[0x42] = etype
        ent[0x43] = 1  # black
        struct.pack_into("<i", ent, 0x44, -1)  # left
        struct.pack_into("<i", ent, 0x48, -1)  # right
        struct.pack_into(
            "<i", ent, 0x4C, 1 if etype == 5 and len(blobs) else -1
        )  # child
        struct.pack_into("<I", ent, 0x74, start)
        struct.pack_into("<Q", ent, 0x78, size)
        return bytes(ent)

    dirsec = bytearray()
    dirsec += dirent("Root Entry", 5, ENDOFCHAIN, 0)
    prev = None
    for idx, (name, body, _) in enumerate(blobs):
        ent = bytearray(dirent(name, 2, starts[name], len(body)))
        if idx + 1 < len(blobs):
            struct.pack_into("<i", ent, 0x48, idx + 2)  # right sibling
        dirsec += ent
    dirsec += b"\x00" * (ssz - len(dirsec) % ssz if len(dirsec) % ssz else 0)

    hdr = bytearray(512)
    hdr[:8] = CFB_SIG
    struct.pack_into("<H", hdr, 0x18, 0x3E)  # minor
    struct.pack_into("<H", hdr, 0x1A, 3)  # major
    struct.pack_into("<H", hdr, 0x1C, 0xFFFE)  # little-endian
    struct.pack_into("<H", hdr, 0x1E, 9)  # sector shift
    struct.pack_into("<H", hdr, 0x20, 6)  # mini shift
    struct.pack_into("<I", hdr, 0x2C, 1)  # one FAT sector
    struct.pack_into("<I", hdr, 0x30, 1)  # dir start
    struct.pack_into("<I", hdr, 0x38, 4096)  # mini cutoff
    struct.pack_into("<I", hdr, 0x3C, ENDOFCHAIN)
    struct.pack_into("<I", hdr, 0x40, 0)
    struct.pack_into("<I", hdr, 0x44, ENDOFCHAIN)
    struct.pack_into("<I", hdr, 0x48, 0)
    difat = [FREESECT] * 109
    difat[0] = 0
    struct.pack_into("<109I", hdr, 0x4C, *difat)

    out = bytes(hdr) + struct.pack(f"<{ssz // 4}I", *fat) + bytes(dirsec)
    for _, _, padded in blobs:
        out += padded
    return out


def encode_doc(text: str, complex_doc: bool = False, unicode: bool = False) -> bytes:
    """Plain text → minimal spec-shaped Word binary (fixture builder).

    ``complex_doc`` writes a 2-piece CLX piece table in ``0Table``
    (split mid-text, mixed encodings when ``unicode``); otherwise the
    non-complex contiguous layout."""
    text = text.replace("\n", "\r")
    # streams are padded past the 4096 mini cutoff so they live in the
    # regular FAT (the reader's mini-stream path has its own test)
    wd = bytearray(4096)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)  # nFib (Word 97)
    flags = 0x0004 if complex_doc else 0
    struct.pack_into("<H", wd, 0x0A, flags)
    if not complex_doc:
        enc = text.encode("utf-16-le") if unicode else text.encode("cp1252")
        fc_min = 0x400
        wd[fc_min : fc_min + len(enc)] = enc
        struct.pack_into("<I", wd, 0x18, fc_min)
        struct.pack_into("<I", wd, 0x1C, fc_min + len(enc))
        struct.pack_into("<I", wd, 0x4C, len(text) if unicode else 0)
        return _cfb_build({"WordDocument": bytes(wd)})
    # complex: two pieces, second always UTF-16 when unicode
    half = len(text) // 2
    p1, p2 = text[:half], text[half:]
    e1 = p1.encode("cp1252", "replace")
    fc1 = 0x400
    wd[fc1 : fc1 + len(e1)] = e1
    if unicode:
        e2 = p2.encode("utf-16-le")
        fc2_raw = fc1 + len(e1) + (fc1 + len(e1)) % 2  # even fc for u16
        wd[fc2_raw : fc2_raw + len(e2)] = e2
        pcd2_fc = fc2_raw
    else:
        e2 = p2.encode("cp1252", "replace")
        fc2_raw = fc1 + len(e1)
        wd[fc2_raw : fc2_raw + len(e2)] = e2
        pcd2_fc = (fc2_raw * 2) | 0x40000000
    struct.pack_into("<I", wd, 0x18, fc1)
    struct.pack_into("<I", wd, 0x1C, fc1 + len(e1) + len(e2))
    struct.pack_into("<I", wd, 0x4C, len(text))
    # CLX: one Pcdt holding PlcPcd with 2 pieces
    cps = struct.pack("<3I", 0, half, len(text))
    pcd1 = struct.pack("<HIH", 0, (fc1 * 2) | 0x40000000, 0)
    pcd2 = struct.pack("<HIH", 0, pcd2_fc, 0)
    plc = cps + pcd1 + pcd2
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    fc_clx = 0x40
    tbl = bytearray(max(4096, fc_clx + len(clx)))
    tbl[fc_clx : fc_clx + len(clx)] = clx
    struct.pack_into("<I", wd, 0x01A2, fc_clx)
    struct.pack_into("<I", wd, 0x01A6, len(clx))
    return _cfb_build({"WordDocument": bytes(wd), "0Table": bytes(tbl)})
