#!/usr/bin/env python3
"""Independent mirror of the RTF fixture path: re-parse the .rtf files
dumped by RtfSpec ('fixture dump' writes target/rtf-fixtures/seed*.rtf
+ .txt goldens) with a from-scratch Python tokenizer — zero shared code
with graft.ops.Rtf — and compare the extracted text against the golden
logical text. Agreement is a real differential check of the grammar:
group scoping, destination pruning (incl. starred groups), \\uN+\\uc
fallback skipping, \\'hh through windows-1252, \\binN raw-byte blindness,
escapes, and source-newline suppression.

Run after `sbt "testOnly graft.RtfSpec"`:
    python3 tools/check_rtf_fixture.py
"""
import sys
from pathlib import Path

SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "annotation",
    "generator", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl",
}

SYMBOL_WORDS = {
    "line": "\n", "lbr": "\n", "tab": "\t", "cell": "\t",
    "emdash": "—", "endash": "–", "lquote": "‘",
    "rquote": "’", "ldblquote": "“", "rdblquote": "”",
    "bullet": "•", "emspace": " ", "enspace": " ", "qmspace": " ",
}


def parse(data: bytes):
    assert data[:5] == b"{\\rtf", "bad magic"
    paras = []
    buf = []
    stack = []
    uc, skip = 1, False
    pending = 0
    p, n = 0, len(data)

    def emit(ch):
        nonlocal pending
        if pending > 0:
            pending -= 1
            return
        if not skip:
            buf.append(ch)

    while p < n:
        c = data[p]
        if c == 0x7B:  # {
            stack.append((uc, skip))
            pending = 0
            p += 1
        elif c == 0x7D:  # }
            assert stack, "unbalanced"
            uc, skip = stack.pop()
            pending = 0
            p += 1
            if not stack:
                if buf:
                    paras.append("".join(buf))
                    buf.clear()
                assert all(b in (0x0D, 0x0A, 0x20, 0x09, 0x00)
                           for b in data[p:]), "trailing content"
                return paras
        elif c == 0x5C:  # backslash
            c1 = data[p + 1]
            if c1 == 0x27:  # \'hh
                v = int(data[p + 2:p + 4].decode("ascii"), 16)
                p += 4
                if pending > 0:
                    pending -= 1
                elif not skip:
                    buf.append(bytes([v]).decode("cp1252"))
            elif c1 in (0x5C, 0x7B, 0x7D):
                emit(chr(c1))
                p += 2
            elif c1 == 0x7E:  # \~
                emit(" ")
                p += 2
            elif c1 == 0x2D:  # \-
                if pending > 0:
                    pending -= 1
                p += 2
            elif c1 == 0x5F:  # \_
                emit("‑")
                p += 2
            elif c1 == 0x2A:  # \*
                skip = True
                p += 2
            else:
                q = p + 1
                w = []
                while q < n and chr(data[q]).isalpha():
                    w.append(chr(data[q]))
                    q += 1
                neg, num, has = False, 0, False
                if q < n and data[q] == 0x2D and chr(data[q + 1]).isdigit():
                    neg = True
                    q += 1
                while q < n and chr(data[q]).isdigit():
                    has = True
                    num = num * 10 + (data[q] - 0x30)
                    q += 1
                if q < n and data[q] == 0x20:
                    q += 1
                p = q
                word = "".join(w)
                arg = -num if neg else num
                if word in ("par", "sect", "page"):
                    pending = 0
                    if not skip:
                        paras.append("".join(buf))
                        buf.clear()
                elif word in SYMBOL_WORDS:
                    emit(SYMBOL_WORDS[word])
                elif word == "uc":
                    uc = arg
                elif word == "u":
                    cp = arg + 65536 if arg < 0 else arg
                    if pending > 0:
                        pending -= 1
                    elif not skip:
                        buf.append(chr(cp))
                        pending = uc
                elif word == "bin":
                    p += arg
                elif word in SKIP_DESTS:
                    skip = True
        elif c in (0x0D, 0x0A, 0x00):
            p += 1
        else:
            emit(chr(c))
            p += 1
    raise AssertionError("unterminated")


def main():
    fixdir = Path("target/rtf-fixtures")
    files = sorted(fixdir.glob("seed*.rtf"),
                   key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures found — run `sbt 'testOnly graft.RtfSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = "\n".join(parse(f.read_bytes()))
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
