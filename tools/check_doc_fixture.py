#!/usr/bin/env python3
"""Independent mirror of the legacy .doc fixture path: re-parse the .doc
files dumped by LegacyDocSpec ('fixture dump' writes
target/doc-fixtures/seed*.doc + .txt goldens) with a from-scratch Python
CFB + Word-97 reader — zero shared code with graft.ops.{Cfb,Doc} — and
compare the extracted text against the golden logical text. Agreement is
a real differential check of the container (FAT, mini-FAT, directory)
and the text layer (FIB table-stream flag, CLX/Prc walk, piece table
with per-piece cp1252/UTF-16 encoding, field-instruction suppression).

Run after `sbt "testOnly graft.LegacyDocSpec"`:
    python3 tools/check_doc_fixture.py
"""
import struct
import sys
from pathlib import Path

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF


def cfb_streams(data: bytes):
    assert data[:8] == bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1])
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (first_minifat,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)

    fat_sects = []
    for k in range(109):
        (e,) = struct.unpack_from("<I", data, 76 + 4 * k)
        if e != FREESECT and len(fat_sects) < n_fat:
            fat_sects.append(e)
    fat = []
    for fs in fat_sects:
        off = 512 + fs * 512
        fat.extend(struct.unpack_from("<128I", data, off))

    def chain(start):
        out, s, seen = [], start, set()
        while s != ENDOFCHAIN:
            assert s not in seen, "FAT cycle"
            seen.add(s)
            out.append(s)
            s = fat[s]
        return out

    def read_chain(start, size):
        buf = bytearray()
        for s in chain(start):
            buf.extend(data[512 + s * 512: 512 + s * 512 + 512])
        return bytes(buf[:size])

    dir_bytes = b"".join(
        data[512 + s * 512: 512 + s * 512 + 512] for s in chain(first_dir))

    (root_start,) = struct.unpack_from("<I", dir_bytes, 116)
    (root_size,) = struct.unpack_from("<I", dir_bytes, 120)
    mini_stream = read_chain(root_start, root_size) if root_size else b""

    minifat = []
    if n_minifat:
        mf = read_chain(first_minifat, n_minifat * 512)
        minifat = list(struct.unpack_from(f"<{len(mf)//4}I", mf))

    def read_mini(start, size):
        buf, s, seen = bytearray(), start, set()
        while s != ENDOFCHAIN:
            assert s not in seen, "mini cycle"
            seen.add(s)
            buf.extend(mini_stream[s * 64: s * 64 + 64])
            s = minifat[s]
        return bytes(buf[:size])

    streams = {}
    for e in range(1, len(dir_bytes) // 128):
        off = e * 128
        if dir_bytes[off + 66] != 2:
            continue
        (name_len,) = struct.unpack_from("<H", dir_bytes, off + 64)
        if name_len < 2:
            continue
        name = dir_bytes[off: off + name_len - 2].decode("utf-16-le")
        (start,) = struct.unpack_from("<I", dir_bytes, off + 116)
        (size,) = struct.unpack_from("<I", dir_bytes, off + 120)
        if size == 0:
            streams[name] = b""
        elif size < 4096:
            streams[name] = read_mini(start, size)
        else:
            streams[name] = read_chain(start, size)
    return streams


def doc_text(data: bytes) -> str:
    streams = cfb_streams(data)
    word = streams["WordDocument"]
    assert struct.unpack_from("<H", word, 0)[0] == 0xA5EC
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    table = streams["1Table" if flags & 0x0200 else "0Table"]
    (fc_clx,) = struct.unpack_from("<I", word, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", word, 0x01A6)
    p = fc_clx
    while table[p] == 1:  # Prc blocks
        (cb,) = struct.unpack_from("<H", table, p + 1)
        p += 3 + cb
    assert table[p] == 2, "no Pcdt"
    (lcb,) = struct.unpack_from("<I", table, p + 1)
    p += 5
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n+1}i", table, p)
    pcd_base = p + 4 * (n + 1)
    raw = []
    for i in range(n):
        n_chars = cps[i + 1] - cps[i]
        (fc_raw,) = struct.unpack_from("<I", table, pcd_base + 8 * i + 2)
        if fc_raw & 0x40000000:
            off = (fc_raw & 0x3FFFFFFF) // 2
            raw.append(word[off: off + n_chars].decode("cp1252"))
        else:
            off = fc_raw & 0x3FFFFFFF
            raw.append(word[off: off + 2 * n_chars].decode("utf-16-le"))
    text = "".join(raw)

    paras, buf, depth = [], [], 0
    for c in text:
        if c == "\x13":
            depth += 1
        elif c == "\x14":
            depth -= 1
        elif c == "\x15":
            pass
        elif depth > 0:
            pass
        elif c == "\r":
            paras.append("".join(buf))
            buf = []
        elif c == "\x0b":
            buf.append("\n")
        elif c == "\x07":
            buf.append("\t")
        else:
            buf.append(c)
    if buf:
        paras.append("".join(buf))
    return "\n".join(paras)


def main():
    fixdir = Path("target/doc-fixtures")
    files = sorted(fixdir.glob("seed*.doc"), key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures — run `sbt 'testOnly graft.LegacyDocSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = doc_text(f.read_bytes())
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
