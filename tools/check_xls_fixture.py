#!/usr/bin/env python3
"""Independent mirror of the legacy .xls fixture path: re-parse the .xls
files dumped by XlsBiffSpec ('fixture dump' writes
target/xls-fixtures/seed*.xls + .txt goldens) with a from-scratch Python
BIFF8 reader (container via check_doc_fixture's CFB reader) — zero
shared code with graft.ops.{Cfb,Xls} — and compare the rendered grids
against the golden text. Agreement is a real differential check of the
record stream: SST with per-string compressed/UTF-16 encoding and
reuse, boundsheet ordering, shuffled cell-record assembly, and integral
Number rendering.

Run after `sbt "testOnly graft.XlsBiffSpec"`:
    python3 tools/check_xls_fixture.py
"""
import math
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from check_doc_fixture import cfb_streams  # noqa: E402


def records(wb: bytes, start: int = 0):
    p = start
    while p + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, p)
        yield rid, wb[p + 4: p + 4 + ln], p
        p += 4 + ln
        if rid == 0x000A:
            return


def biff_string(data: bytes, q: int):
    cch, flags = struct.unpack_from("<HB", data, q)
    if flags & 0x01:
        return data[q + 3: q + 3 + 2 * cch].decode("utf-16-le"), q + 3 + 2 * cch
    return data[q + 3: q + 3 + cch].decode("latin-1"), q + 3 + cch


def xls_text(raw: bytes) -> str:
    wb = cfb_streams(raw)["Workbook"]
    sst, sheets = [], []
    for rid, payload, _ in records(wb):
        if rid == 0x00FC:  # SST
            (unique,) = struct.unpack_from("<I", payload, 4)
            q = 8
            for _ in range(unique):
                s, q = biff_string(payload, q)
                sst.append(s)
        elif rid == 0x0085:  # BoundSheet8
            (lb_ply,) = struct.unpack_from("<I", payload, 0)
            sheets.append(lb_ply)
    out = []
    for pos in sheets:
        cells = {}
        for rid, payload, _ in records(wb, pos):
            if rid == 0x00FD:  # LabelSst
                row, col = struct.unpack_from("<HH", payload, 0)
                (isst,) = struct.unpack_from("<I", payload, 6)
                cells[(row, col)] = sst[isst]
            elif rid == 0x0203:  # Number
                row, col = struct.unpack_from("<HH", payload, 0)
                (v,) = struct.unpack_from("<d", payload, 6)
                assert v == math.floor(v), "non-integral number in fixture"
                cells[(row, col)] = str(int(v))
        rows = sorted({r for r, _ in cells})
        out.append("\n".join(
            "\t".join(cells[(r, c)] for c in sorted(
                c for rr, c in cells if rr == r))
            for r in rows))
    return "\n".join(out)


def main():
    fixdir = Path("target/xls-fixtures")
    files = sorted(fixdir.glob("seed*.xls"), key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures — run `sbt 'testOnly graft.XlsBiffSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = xls_text(f.read_bytes())
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
