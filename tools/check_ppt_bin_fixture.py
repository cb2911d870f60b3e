#!/usr/bin/env python3
"""Independent mirror of the legacy .ppt fixture path: re-parse the .ppt
files dumped by PptBinSpec (target/ppt-fixtures/seed*.ppt + .txt
goldens) with a from-scratch Python MS-PPT record-tree walker
(container via check_doc_fixture's CFB reader) — zero shared code with
graft.ops.{Cfb,Ppt} — and compare against the golden. Agreement checks
the record tree, the instance-0-only SlideListWithText collection
(notes must not leak), persist-atom slide splits, and the per-atom
cp1252/UTF-16 decode with \\r normalization.

Run after `sbt "testOnly graft.PptBinSpec"`:
    python3 tools/check_ppt_bin_fixture.py
"""
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from check_doc_fixture import cfb_streams  # noqa: E402


def ppt_text(raw: bytes) -> str:
    doc = cfb_streams(raw)["PowerPoint Document"]
    slides = []
    cur = None

    def walk(from_, to, in_list):
        nonlocal cur
        p = from_
        while p < to:
            ver_inst, rec_type = struct.unpack_from("<HH", doc, p)
            (ln,) = struct.unpack_from("<I", doc, p + 4)
            payload = doc[p + 8: p + 8 + ln]
            if (ver_inst & 0x0F) == 0x0F:
                child_in = rec_type == 0x0FF0 and (ver_inst >> 4) == 0
                walk(p + 8, p + 8 + ln, in_list or child_in)
            elif in_list:
                if rec_type == 0x03F3:  # SlidePersistAtom
                    if cur is not None:
                        slides.append(cur)
                    cur = []
                elif rec_type == 0x0FA8:  # TextBytesAtom
                    cur.append(payload.decode("cp1252").replace("\r", "\n"))
                elif rec_type == 0x0FA0:  # TextCharsAtom
                    cur.append(payload.decode("utf-16-le").replace("\r", "\n"))
            p += 8 + ln

    walk(0, len(doc), False)
    if cur is not None:
        slides.append(cur)
    return "\n".join("\n".join(s) for s in slides)


def main():
    fixdir = Path("target/ppt-fixtures")
    files = sorted(fixdir.glob("seed*.ppt"), key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures — run `sbt 'testOnly graft.PptBinSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = ppt_text(f.read_bytes())
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
